"""Native (C++) host-side components, loaded via ctypes.

Build-on-first-use with g++ (cached in the package dir); every native
component has a pure-Python reference implementation it falls back to —
and is tested byte-exact against.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIBS = {}


def build_and_load(name: str) -> Optional[ctypes.CDLL]:
    """Compile native/<name>.cpp → <name>.so (cached) and dlopen it.
    Returns None when no compiler is available (callers fall back)."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = _DIR / f"{name}.cpp"
        so = _DIR / f"{name}.so"
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                       "-o", str(so), str(src)]
                subprocess.run(cmd, check=True, capture_output=True)
                log.info("built native %s", so.name)
            lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.CalledProcessError) as e:
            log.warning("native %s unavailable (%s); using Python fallback",
                        name, e)
            lib = None
        _LIBS[name] = lib
        return lib


_WP_CONFIGURED = False


def wordpiece_lib() -> Optional[ctypes.CDLL]:
    global _WP_CONFIGURED
    lib = build_and_load("wordpiece")
    if lib is not None and not _WP_CONFIGURED:
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int32
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        _WP_CONFIGURED = True
    return lib
