"""Native (C++) runtime components, bound via ctypes.

Build happens lazily on first import (g++ available in the target image); a
missing toolchain degrades gracefully — callers fall back to the pure-python
implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    """Compile scheduler.cpp to a content-hash-named .so (never committed);
    an existing binary is reused only if it was built from the same source."""
    src = os.path.join(_HERE, "scheduler.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_HERE, f"_scheduler_{tag}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", out, src],
                       check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def load_scheduler_lib():
    """Load (building if needed) the native scheduler; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.msched_create.restype = ctypes.c_void_p
        lib.msched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.msched_destroy.argtypes = [ctypes.c_void_p]
        lib.msched_submit.restype = ctypes.c_int32
        lib.msched_submit.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                      ctypes.c_int32, ctypes.c_int32]
        lib.msched_fill.restype = ctypes.c_int32
        lib.msched_fill.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_int32]
        lib.msched_commit.restype = ctypes.c_int32
        lib.msched_commit.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_int32]
        lib.msched_num_active.restype = ctypes.c_int32
        lib.msched_num_active.argtypes = [ctypes.c_void_p]
        lib.msched_num_queued.restype = ctypes.c_int32
        lib.msched_num_queued.argtypes = [ctypes.c_void_p]
        for fn in ("msched_active_mask", "msched_positions"):
            getattr(lib, fn).argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int32)]
        lib.msched_uids.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint64)]
        lib.msched_stats.argtypes = [ctypes.c_void_p] + \
            [ctypes.POINTER(ctypes.c_uint64)] * 3
        _LIB = lib
        return _LIB


class NativeSlotScheduler:
    """Thin OO wrapper over the C core (see scheduler.cpp)."""

    def __init__(self, num_slots: int, max_seq_len: int):
        self.lib = load_scheduler_lib()
        if self.lib is None:
            raise RuntimeError("native scheduler unavailable (no g++?)")
        self.h = self.lib.msched_create(num_slots, max_seq_len)
        if not self.h:
            raise ValueError("bad scheduler params")
        self.num_slots = num_slots

    def __del__(self):
        if getattr(self, "h", None) and self.lib is not None:
            self.lib.msched_destroy(self.h)
            self.h = None

    def submit(self, uid: int, prompt_len: int, max_new: int) -> bool:
        return self.lib.msched_submit(self.h, uid, prompt_len, max_new) == 0

    def fill(self):
        """Admit queued requests -> list of (slot, uid, prompt_len, max_new)."""
        cap = self.num_slots
        slots = (ctypes.c_int32 * cap)()
        uids = (ctypes.c_uint64 * cap)()
        plens = (ctypes.c_int32 * cap)()
        mnews = (ctypes.c_int32 * cap)()
        n = self.lib.msched_fill(self.h, slots, uids, plens, mnews, cap)
        return [(slots[i], uids[i], plens[i], mnews[i]) for i in range(n)]

    def commit(self, slot: int, is_eos: bool) -> int:
        return self.lib.msched_commit(self.h, slot, int(is_eos))

    @property
    def num_active(self) -> int:
        return self.lib.msched_num_active(self.h)

    @property
    def num_queued(self) -> int:
        return self.lib.msched_num_queued(self.h)

    def positions(self):
        out = (ctypes.c_int32 * self.num_slots)()
        self.lib.msched_positions(self.h, out)
        return list(out)

    def active_mask(self):
        out = (ctypes.c_int32 * self.num_slots)()
        self.lib.msched_active_mask(self.h, out)
        return [bool(x) for x in out]

    def stats(self):
        a, f, r = (ctypes.c_uint64(), ctypes.c_uint64(), ctypes.c_uint64())
        self.lib.msched_stats(self.h, ctypes.byref(a), ctypes.byref(f),
                              ctypes.byref(r))
        return {"admitted": a.value, "finished": f.value, "rejected": r.value}
