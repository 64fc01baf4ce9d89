"""Native (C++) components: PTB tokenizer + METEOR scorer core.

Build with ``make -C clipcap_tpu/native`` → ``libclipcap_native.so``;
loaded lazily through ctypes.  The Python implementations in
``clipcap_tpu.eval`` define the behavior — the native versions are
cross-tested drop-ins (the reference's equivalents are Java subprocesses,
SURVEY.md §2.2).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libclipcap_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library in place. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True) -> ctypes.CDLL:
    """Load (building if needed) the native library; raises if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if auto_build:
        # make is incremental: a no-op when the .so is newer than the
        # sources, a rebuild when they changed (a stale library would
        # otherwise be loaded with mismatched symbol signatures).
        build()
    lib = ctypes.CDLL(_LIB_PATH)

    lib.ccn_ptb_tokenize.argtypes = [ctypes.c_char_p]
    lib.ccn_ptb_tokenize.restype = ctypes.c_void_p
    lib.ccn_free.argtypes = [ctypes.c_void_p]
    lib.ccn_free.restype = None
    lib.ccn_meteor_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_char_p]
    lib.ccn_meteor_new.restype = ctypes.c_void_p
    lib.ccn_meteor_delete.argtypes = [ctypes.c_void_p]
    lib.ccn_meteor_delete.restype = None
    lib.ccn_meteor_stats.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_double)]
    lib.ccn_meteor_stats.restype = None
    lib.ccn_meteor_score_from_stats.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.ccn_meteor_score_from_stats.restype = ctypes.c_double
    lib.ccn_porter_stem.argtypes = [ctypes.c_char_p]
    lib.ccn_porter_stem.restype = ctypes.c_void_p
    lib.ccn_snowball_stem.argtypes = [ctypes.c_char_p]
    lib.ccn_snowball_stem.restype = ctypes.c_void_p

    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _take_string(lib: ctypes.CDLL, ptr: int) -> str:
    try:
        return ctypes.string_at(ptr).decode("utf-8", errors="replace")
    finally:
        lib.ccn_free(ptr)
