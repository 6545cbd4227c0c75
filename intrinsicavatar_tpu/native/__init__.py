"""Native (C++) host-side data-path runtime.

Builds ``libraysampler.so`` on first import (g++, cached next to the source)
and exposes:

  * :func:`erode_dilate` — separable binary morphology;
  * :class:`NativeEdgeSampler` — drop-in for ``data.samplers.EdgeSampler``
    with the morphology + index draw + row gathers in C++;
  * :class:`Prefetcher` — background-thread batch producer feeding the
    training loop (the role of the reference's torch DataLoader workers,
    `datasets/peoplesnapshot.py` num_workers=8).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import queue
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ray_sampler.cpp")

_lib = None


def _so_path():
    """Build product keyed by the source content hash: a stale or foreign
    binary is never loaded (the .so itself is not committed — see
    .gitignore), and edits to the source always trigger a rebuild."""
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"libraysampler-{h}.so")


def _build(so):
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", so]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        so = _so_path()
        if not os.path.exists(so):
            _build(so)
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.erode_dilate_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, u8p, u8p, u8p]
        lib.edge_sample.argtypes = [u8p, u8p, u8p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_uint64, i32p, i32p, i32p]
        lib.edge_sample.restype = ctypes.c_int
        lib.gather_rows_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                        i32p, ctypes.c_int64, f32p]
        _lib = lib
        return lib
    except Exception:
        return None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def erode_dilate(mask: np.ndarray, k: int):
    """Binary square-kernel erosion+dilation. ``mask`` is [H, W] (0/1)."""
    lib = load()
    if lib is None:
        raise RuntimeError(
            "native library unavailable (g++ build failed); use the numpy "
            "morphology in data.samplers.EdgeSampler instead")
    m = np.ascontiguousarray(mask > 0, np.uint8)
    H, W = m.shape
    er = np.empty_like(m)
    di = np.empty_like(m)
    sc = np.empty_like(m)
    lib.erode_dilate_u8(_u8p(m), H, W, k, _u8p(er), _u8p(di), _u8p(sc))
    return er, di


class NativeEdgeSampler:
    """C++-backed EdgeSampler (semantics of `utils/sampler.py:9-52`)."""

    def __init__(self, num_sample, ratio_mask=0.6, ratio_edge=0.3,
                 kernel_size=16, rng=None):
        self.kernel_size = kernel_size
        self.num_mask = int(num_sample * ratio_mask)
        self.num_edge = int(num_sample * ratio_edge)
        self.num_rand = num_sample - self.num_mask - self.num_edge
        self.num_sample = num_sample
        self.rng = rng or np.random.default_rng()
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native library unavailable")

    def sample(self, mask, *args):
        lib = self.lib
        m = np.ascontiguousarray(mask > 0, np.uint8)
        H, W = m.shape
        er, di = erode_dilate(m, self.kernel_size)
        HW = H * W
        idx = np.empty(self.num_sample, np.int32)
        fg_buf = np.empty(HW, np.int32)
        edge_buf = np.empty(HW, np.int32)
        seed = int(self.rng.integers(1, 2**63 - 1))
        lib.edge_sample(_u8p(m), _u8p(er), _u8p(di), HW,
                        self.num_mask, self.num_edge, self.num_rand,
                        seed, _i32p(idx), _i32p(fg_buf), _i32p(edge_buf))
        out = [np.ascontiguousarray(mask, np.float32).reshape(-1)[idx]]
        for d in args:
            src = np.ascontiguousarray(d, np.float32).reshape(HW, -1)
            dst = np.empty((self.num_sample, src.shape[1]), np.float32)
            lib.gather_rows_f32(_f32p(src), HW, src.shape[1], _i32p(idx),
                                self.num_sample, _f32p(dst))
            out.append(dst)
        return out


class Prefetcher:
    """Background-thread batch producer.

    Wraps any ``(batch, t_idx)`` iterator; overlaps host-side sampling and
    IO with device steps (the reference relies on torch DataLoader workers).
    """

    def __init__(self, it, depth: int = 4):
        self.it = it
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for item in self.it:
                if self._stop:
                    return
                self.q.put(item)
        finally:
            self.q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop = True
