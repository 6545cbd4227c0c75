"""Generic OOM-safe chunked apply.

Equivalent of ``chunk_batch`` (`models/utils.py:16-61` in
taconite/IntrinsicAvatar): apply a function over leading-axis chunks of the
tensor arguments and re-assemble Tensor/tuple/dict results.  Host-side
(numpy or device arrays pulled per chunk); for in-jit chunking use
``jax.lax.map`` instead.
"""

from __future__ import annotations

import numpy as np


def chunk_batch(func, chunk_size: int, *args, **kwargs):
    import jax.numpy as jnp

    B = None
    for a in args:
        if hasattr(a, "shape") and getattr(a, "ndim", 0) >= 1:
            B = a.shape[0]
            break
    if B is None:
        return func(*args, **kwargs)

    outs = []
    out_type = None
    for i in range(0, B, chunk_size):
        chunk_args = [
            a[i:i + chunk_size]
            if hasattr(a, "shape") and getattr(a, "ndim", 0) >= 1
            and a.shape[0] == B else a
            for a in args
        ]
        o = func(*chunk_args, **kwargs)
        if o is None:
            continue
        out_type = type(o)
        if isinstance(o, (tuple, list)):
            o = {k: v for k, v in enumerate(o)}
        elif not isinstance(o, dict):
            o = {0: o}
        outs.append(o)
    if out_type is None:
        return None
    cat = {k: jnp.concatenate([o[k] for o in outs], axis=0)
           for k in outs[0]}
    if out_type in (tuple, list):
        return out_type(cat[i] for i in range(len(cat)))
    if out_type is dict:
        return cat
    return cat[0]
