"""Name-keyed component registry.

Mirrors the plug-in surface of the reference (`models/__init__.py:12-14` in
taconite/IntrinsicAvatar): every field/deformer/light/BRDF component registers
under a string name and is constructed via ``make(name, config)``.  Unlike the
reference the constructed object is a *static* module description — parameters
live in explicit pytrees returned by each module's ``init(key)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    """Class decorator registering a component under ``name``."""

    def decorator(cls):
        if name in _REGISTRY and _REGISTRY[name] is not cls:
            raise ValueError(f"duplicate registry name: {name!r}")
        _REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return decorator


def make(name: str, config=None, **kwargs):
    """Construct the component registered under ``name``.

    ``config`` is a mapping of static hyperparameters (see
    ``intrinsicavatar_tpu.utils.config``).
    """
    # Import submodules lazily so that registration side effects run.
    _populate()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown component {name!r}; known: {sorted(_REGISTRY)}"
        )
    if config is None:
        return _REGISTRY[name](**kwargs)
    return _REGISTRY[name](config, **kwargs)


def names():
    _populate()
    return sorted(_REGISTRY)


_POPULATED = False


def _populate():
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    # Importing these modules triggers @register decorators.
    import intrinsicavatar_tpu.fields.geometry  # noqa: F401
    import intrinsicavatar_tpu.fields.radiance  # noqa: F401
    import intrinsicavatar_tpu.fields.density  # noqa: F401
    import intrinsicavatar_tpu.fields.material  # noqa: F401
    import intrinsicavatar_tpu.anim.pose  # noqa: F401
    import intrinsicavatar_tpu.anim.deformer  # noqa: F401
    import intrinsicavatar_tpu.anim.non_rigid  # noqa: F401
    import intrinsicavatar_tpu.pbr.envlight  # noqa: F401
    import intrinsicavatar_tpu.pbr.brdf  # noqa: F401
    import intrinsicavatar_tpu.render.renderer  # noqa: F401
    import intrinsicavatar_tpu.train.system  # noqa: F401
