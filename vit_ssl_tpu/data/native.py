"""ctypes binding for the native (C++) batched image decoder.

``csrc/fastloader.cpp`` decodes and resizes a whole batch of image files
into one preallocated uint8 NHWC buffer in a single call — per-sample
Python dispatch disappears and the GIL is released for the entire batch
(its worker threads parallelise across files when cores are available).
Build with ``make -C csrc``; everything degrades gracefully to the
cv2-python path when the shared library hasn't been built.

This is the native-runtime half of the input pipeline; the augmentation
half runs on the TPU (`data/device_augment.py`).
"""

from __future__ import annotations

import ctypes
import logging
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "csrc" / "libfastloader.so"
_lib = None
_checked = False


def _load_library():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not _LIB_PATH.exists():
        logger.debug("native decoder not built (%s missing)", _LIB_PATH)
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vitssl_decode_batch.restype = ctypes.c_int
        lib.vitssl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        _lib = lib
        logger.info("native batched decoder loaded from %s", _LIB_PATH)
    except OSError as e:  # pragma: no cover - environment-dependent
        logger.warning("native decoder failed to load: %s", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load_library() is not None


def decode_batch(
    paths: List[str], out_h: int, out_w: int, num_threads: int = 0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode+resize a batch of files → (uint8 (N, H, W, 3), ok (N,) bool).

    Returns None when the native library is unavailable.
    """
    lib = _load_library()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
    ok = np.zeros((n,), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(max(os.cpu_count() or 1, 1), n)
    lib.vitssl_decode_batch(
        c_paths,
        n,
        out_h,
        out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        num_threads,
    )
    return out, ok.astype(bool)
