"""ctypes bindings for the native IO library (mhada_tpu/native/mhada_io.cpp).

Builds ``libmhada_io.so`` on first use (g++, cached next to the source) and
falls back to the pure-numpy implementations when no toolchain is available.
Speeds up the SceneFlow loader hot path: PFM/FLO decode, flow resize with
vector rescaling, and the flow-consistency mask.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmhada_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I32 = ctypes.POINTER(ctypes.c_int)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "libmhada_io.so"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        except OSError:
            return None
        lib.pfm_header.argtypes = [ctypes.c_char_p, _I32, _I32, _I32,
                                   ctypes.POINTER(ctypes.c_float)]
        lib.pfm_read.argtypes = [ctypes.c_char_p, _F32]
        lib.flo_header.argtypes = [ctypes.c_char_p, _I32, _I32]
        lib.flo_read.argtypes = [ctypes.c_char_p, _F32]
        lib.resize_flow.argtypes = [_F32, ctypes.c_int, ctypes.c_int,
                                    _F32, ctypes.c_int, ctypes.c_int]
        lib.resize_flow.restype = None
        lib.flow_warp_mask.argtypes = [_F32, _F32, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_float, _F32]
        lib.flow_warp_mask.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_pfm(path: str) -> Optional[Tuple[np.ndarray, float]]:
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    scale = ctypes.c_float()
    if lib.pfm_header(path.encode(), ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(c), ctypes.byref(scale)) != 0:
        raise ValueError(f"{path}: not a PFM file")
    shape = (h.value, w.value, 3) if c.value == 3 else (h.value, w.value)
    out = np.empty(shape, np.float32)
    if lib.pfm_read(path.encode(), out) != 0:
        raise ValueError(f"{path}: truncated PFM")
    return out, abs(scale.value)


def read_flo(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.flo_header(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise ValueError(f"{path}: bad .flo file")
    out = np.empty((h.value, w.value, 2), np.float32)
    if lib.flo_read(path.encode(), out) != 0:
        raise ValueError(f"{path}: truncated .flo")
    return out


def resize_flow(flow: np.ndarray, out_hw) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    h, w = flow.shape[:2]
    oh, ow = out_hw
    out = np.empty((oh, ow, 2), np.float32)
    lib.resize_flow(np.ascontiguousarray(flow, np.float32), h, w, out, oh, ow)
    return out


def flow_warp_mask(f01: np.ndarray, f10: np.ndarray,
                   threshold: float = 2.0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    h, w = f01.shape[:2]
    out = np.empty((h, w), np.float32)
    lib.flow_warp_mask(
        np.ascontiguousarray(f01, np.float32),
        np.ascontiguousarray(f10, np.float32), h, w, threshold, out,
    )
    return out
