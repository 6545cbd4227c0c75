"""Dataset registry (name-keyed, mirroring `datasets/__init__.py` of the
reference)."""

_DATASETS = {}


def register(name):
    def deco(cls):
        _DATASETS[name] = cls
        return cls
    return deco


def make(name, config, **kwargs):
    _populate()
    return _DATASETS[name](config, **kwargs)


_POPULATED = False


def _populate():
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    import intrinsicavatar_tpu.data.peoplesnapshot  # noqa: F401
    import intrinsicavatar_tpu.data.zju_mocap  # noqa: F401
    import intrinsicavatar_tpu.data.synthetichuman  # noqa: F401
    import intrinsicavatar_tpu.data.rana  # noqa: F401
    import intrinsicavatar_tpu.data.animation  # noqa: F401
    import intrinsicavatar_tpu.data.synthetic  # noqa: F401
    import intrinsicavatar_tpu.data.capsule  # noqa: F401
