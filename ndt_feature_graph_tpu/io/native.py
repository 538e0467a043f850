"""ctypes bindings for the native C++ runtime components (native/):
CARMEN log parsing and the NGF binary grid codec.

The shared library is built on demand with the in-repo Makefile (g++ is
part of the environment; pybind11 is not, hence ctypes — see repo
instructions).  A pure-Python CARMEN fallback keeps the package usable
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libndtg_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def load(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_SO):
            _build()
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    lib.clf_open.restype = ctypes.c_void_p
    lib.clf_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.clf_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_float,
    ]
    lib.clf_close.argtypes = [ctypes.c_void_p]
    lib.ngf_write.restype = ctypes.c_int
    lib.ngf_header.restype = ctypes.c_int
    lib.ngf_read.restype = ctypes.c_int
    _lib = lib
    return _lib


class CarmenLog(NamedTuple):
    ranges: np.ndarray       # (T, B) float32, padded with max_range
    beam_counts: np.ndarray  # (T,) int32
    odom_abs: np.ndarray     # (T, 3) float32 absolute odometry
    times: np.ndarray        # (T,) float64


def read_carmen(path, max_range_pad=81.91) -> CarmenLog:
    """Parse a CARMEN .clf log (FLASER / ROBOTLASER1 records)."""
    lib = load()
    if lib is None:
        return _read_carmen_py(path, max_range_pad)
    n = ctypes.c_int()
    mb = ctypes.c_int()
    h = lib.clf_open(
        path.encode(), ctypes.byref(n), ctypes.byref(mb)
    )
    if not h:
        raise FileNotFoundError(path)
    try:
        t, b = n.value, mb.value
        ranges = np.empty((t, b), np.float32)
        counts = np.empty(t, np.int32)
        odom = np.empty((t, 3), np.float32)
        times = np.empty(t, np.float64)
        lib.clf_fill(
            h,
            ranges.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_float(max_range_pad),
        )
    finally:
        lib.clf_close(h)
    return CarmenLog(ranges, counts, odom, times)


def _read_carmen_py(path, max_range_pad) -> CarmenLog:
    """Pure-Python fallback parser (FLASER only)."""
    scans = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "FLASER":
                continue
            n = int(parts[1])
            r = np.asarray(parts[2 : 2 + n], np.float32)
            odom = np.asarray(parts[2 + n + 3 : 2 + n + 6], np.float32)
            t = float(parts[2 + n + 6]) if len(parts) > 2 + n + 6 else 0.0
            scans.append((r, odom, t))
    if not scans:
        return CarmenLog(
            np.zeros((0, 0), np.float32),
            np.zeros(0, np.int32),
            np.zeros((0, 3), np.float32),
            np.zeros(0, np.float64),
        )
    mb = max(len(s[0]) for s in scans)
    t = len(scans)
    ranges = np.full((t, mb), max_range_pad, np.float32)
    counts = np.empty(t, np.int32)
    odom = np.empty((t, 3), np.float32)
    times = np.empty(t, np.float64)
    for k, (r, o, tt) in enumerate(scans):
        ranges[k, : len(r)] = r
        counts[k] = len(r)
        odom[k] = o
        times[k] = tt
    return CarmenLog(ranges, counts, odom, times)


# ---------------- NGF grid codec ----------------


def write_grid(path, grid, resolution: float):
    """Write an ops.ndt_map.NDTGrid as a native NGF file."""
    lib = load()
    count = np.ascontiguousarray(np.asarray(grid.count), np.float32)
    h, w = count.shape
    origin = np.ascontiguousarray(np.asarray(grid.origin), np.float32)
    psum = np.ascontiguousarray(np.asarray(grid.psum), np.float32)
    outer = np.ascontiguousarray(np.asarray(grid.outer), np.float32)
    occ = np.ascontiguousarray(np.asarray(grid.occ), np.float32)
    if lib is None:
        # Fallback: same layout via numpy.
        with open(path, "wb") as f:
            f.write(b"NGF1")
            np.asarray([h, w], np.int32).tofile(f)
            origin.tofile(f)
            np.asarray([resolution], np.float32).tofile(f)
            count.tofile(f)
            psum.tofile(f)
            outer.tofile(f)
            occ.tofile(f)
        return
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.ngf_write(
        path.encode(), h, w, origin.ctypes.data_as(fp),
        ctypes.c_float(resolution), count.ctypes.data_as(fp),
        psum.ctypes.data_as(fp), outer.ctypes.data_as(fp),
        occ.ctypes.data_as(fp),
    )
    if rc != 0:
        raise IOError(f"ngf_write({path}) failed: {rc}")


def read_grid(path):
    """Read an NGF file -> (NDTGrid, resolution)."""
    import jax.numpy as jnp

    from ndt_feature_graph_tpu.ops.ndt_map import NDTGrid

    lib = load()
    if lib is None:
        with open(path, "rb") as f:
            assert f.read(4) == b"NGF1"
            h, w = np.fromfile(f, np.int32, 2)
            origin = np.fromfile(f, np.float32, 2)
            resolution = float(np.fromfile(f, np.float32, 1)[0])
            count = np.fromfile(f, np.float32, h * w).reshape(h, w)
            psum = np.fromfile(f, np.float32, h * w * 2).reshape(h, w, 2)
            outer = np.fromfile(f, np.float32, h * w * 4).reshape(
                h, w, 2, 2
            )
            occ = np.fromfile(f, np.float32, h * w).reshape(h, w)
    else:
        h = ctypes.c_int()
        w = ctypes.c_int()
        origin = np.empty(2, np.float32)
        res = ctypes.c_float()
        fp = ctypes.POINTER(ctypes.c_float)
        rc = lib.ngf_header(
            path.encode(), ctypes.byref(h), ctypes.byref(w),
            origin.ctypes.data_as(fp), ctypes.byref(res),
        )
        if rc != 0:
            raise IOError(f"ngf_header({path}) failed: {rc}")
        h, w = h.value, w.value
        resolution = res.value
        count = np.empty((h, w), np.float32)
        psum = np.empty((h, w, 2), np.float32)
        outer = np.empty((h, w, 2, 2), np.float32)
        occ = np.empty((h, w), np.float32)
        rc = lib.ngf_read(
            path.encode(), count.ctypes.data_as(fp),
            psum.ctypes.data_as(fp), outer.ctypes.data_as(fp),
            occ.ctypes.data_as(fp),
        )
        if rc != 0:
            raise IOError(f"ngf_read({path}) failed: {rc}")
    grid = NDTGrid(
        origin=jnp.asarray(origin),
        count=jnp.asarray(count),
        psum=jnp.asarray(psum),
        outer=jnp.asarray(outer),
        occ=jnp.asarray(occ),
    )
    return grid, resolution
