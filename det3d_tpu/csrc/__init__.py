"""Native host-side kernels: lazy g++ build + ctypes binding.

The reference ships 10 CUDA/C++ extension packages built at import time
(det3d/utils/buildtools/command.py). Here the device side is all XLA; the
native code that remains is the host data plane's geometry hot paths
(pointops.cc), compiled once into ``_build/libpointops.so`` on first use
and bound over a C ABI. ``DET3D_NATIVE=0`` disables the native path (the
numpy implementations in core/augment.py are the reference semantics).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_BUILD = _DIR / "_build"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_HP_LIB: Optional[ctypes.CDLL] = None
_HP_TRIED = False


def _compile(stem: str) -> Optional[Path]:
    src = _DIR / f"{stem}.cc"
    out = _BUILD / f"lib{stem}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    _BUILD.mkdir(exist_ok=True)
    # no OpenMP: libgomp is not fork-safe (the dataloader forks workers
    # after the parent may have run a parallel region during gt-db
    # creation), and the workers already parallelize across examples
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def _load(stem: str) -> Optional[ctypes.CDLL]:
    if os.environ.get("DET3D_NATIVE", "1") == "0":
        return None
    path = _compile(stem)
    if path is None:
        return None
    try:
        return ctypes.CDLL(str(path))
    except OSError:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    lib = _load("pointops")
    if lib is None:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.points_in_rbbox.argtypes = [f32p, i64, i64, f32p, i64, u8p]
    lib.box_collision.argtypes = [f32p, i64, f32p, i64, u8p]
    lib.intersection_area.argtypes = [f64p, f64p, i64, f64p]
    _LIB = lib
    return _LIB


def get_hostplan_lib() -> Optional[ctypes.CDLL]:
    """Native host-plan builders (hostplan.cc) — C++ twins of the numpy
    twins in ops/sparse_host.py, loaded lazily like get_lib()."""
    global _HP_LIB, _HP_TRIED
    if _HP_LIB is not None or _HP_TRIED:
        return _HP_LIB
    _HP_TRIED = True
    lib = _load("hostplan")
    if lib is None:
        return None
    i32, i64 = ctypes.c_int32, ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.hp_point_lin.argtypes = [f32p, i64, i64, i64, f32p, f32p,
                                 i64, i64, i64, i32p]
    lib.hp_point_order.argtypes = [i32p, i64, i64, i64, i64, i32, i32p]
    lib.hp_voxel_coords.argtypes = [i32p, i32p, i64, i64, i64, i64, i32p]
    lib.hp_subm_windows.argtypes = [i32p, i64, i64, i64, i64,
                                    i64, i64, i64, i32p]
    lib.hp_down_windows.argtypes = [i32p, i64, i32p, i64, i64, i64, i64,
                                    i64p, i64p, i64p, i32p]
    lib.hp_transition.argtypes = [i32p, i64, i64, i64, i64, i64p, i64p,
                                  i64p, i64, i32, i32p, i32p,
                                  ctypes.POINTER(i32)]
    lib.hp_transition.restype = i64
    lib.hp_voxelize_sorted.argtypes = [f32p, i64, i64, i32p, i32p, i64,
                                       i64, i64, i64, i32, f32p, i32p, i32p]
    lib.hp_voxelize_sorted.restype = i64
    lib.hp_voxelize_appearance.argtypes = [f32p, i64, i64, i32p, i32p, i64,
                                           i64, i64, i64, f32p, i32p, i32p]
    lib.hp_voxelize_appearance.restype = i64
    lib.hp_argsort_lin.argtypes = [i32p, i64, i32p]
    lib.hp_block_band.argtypes = [i32p, i64, i64, i64]
    lib.hp_block_band.restype = i64
    _HP_LIB = lib
    return _HP_LIB


def points_in_rbbox(points, boxes):
    """(P, >=3) float, (N, 7) [x y z w l h r] -> (P, N) bool or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    bxs = np.ascontiguousarray(boxes, np.float32)
    out = np.empty((pts.shape[0], bxs.shape[0]), np.uint8)
    lib.points_in_rbbox(pts, pts.shape[0], pts.shape[1], bxs, bxs.shape[0],
                        out)
    return out.astype(bool)


def box_collision(boxes_a, boxes_b):
    """(N, 5), (K, 5) BEV [x y w l r] -> (N, K) bool or None."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(boxes_a, np.float32)
    b = np.ascontiguousarray(boxes_b, np.float32)
    out = np.empty((a.shape[0], b.shape[0]), np.uint8)
    lib.box_collision(a, a.shape[0], b, b.shape[0], out)
    return out.astype(bool)


def intersection_area(corners_a, corners_b):
    """paired (N, 4, 2) x2 -> (N,) float64 or None."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(corners_a, np.float64)
    b = np.ascontiguousarray(corners_b, np.float64)
    out = np.empty((a.shape[0],), np.float64)
    lib.intersection_area(a, b, a.shape[0], out)
    return out
