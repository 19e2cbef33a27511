"""ctypes bindings for the native scheduler/allocator (native/scheduler.cc).

Builds the shared library on first use if g++ is available; falls back to a
pure-Python implementation with the same interface otherwise (hermetic CI).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libchatterbox_sched.so"
_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        # always invoke make: it is an mtime-checked no-op when fresh, and
        # a stale prebuilt .so (missing newer symbols) must be rebuilt
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sched_create.restype = ctypes.c_void_p
        lib.sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.sched_destroy.argtypes = [ctypes.c_void_p]
        lib.sched_add_request.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32]
        lib.sched_pending_count.argtypes = [ctypes.c_void_p]
        lib.sched_pending_count.restype = ctypes.c_int32
        lib.sched_free_count.argtypes = [ctypes.c_void_p]
        lib.sched_free_count.restype = ctypes.c_int32
        lib.sched_active_count.argtypes = [ctypes.c_void_p]
        lib.sched_active_count.restype = ctypes.c_int32
        lib.sched_admit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32]
        lib.sched_admit.restype = ctypes.c_int32
        lib.sched_advance.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.sched_advance.restype = ctypes.c_int32
        lib.sched_harvest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32]
        lib.sched_harvest.restype = ctypes.c_int32
        try:
            lib.sched_pos_caps.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int32)]
            lib.sched_set_policy.argtypes = [ctypes.c_void_p,
                                             ctypes.c_int32, ctypes.c_int32]
        except AttributeError:      # stale .so without the symbol
            pass
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[native] falling back to python scheduler ({e})")
        _lib = None
    return _lib


class NativeScheduler:
    """Continuous-batching request scheduler (C++ core when available)."""

    def __init__(self, n_slots: int, max_model_len: int,
                 order: str = "shortest", min_free: int = 0):
        self.n_slots = n_slots
        self.max_model_len = max_model_len
        self.order = order
        self.min_free = min_free
        self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.sched_create(n_slots, max_model_len)
            self._lib.sched_set_policy(
                self._h, 1 if order == "lpt" else 0, int(min_free))
        else:
            self._pending: List[Tuple[int, int, int]] = []
            self._slots = [None] * n_slots          # uid or None
            self._pos_cap = [0] * n_slots
            self._max_pos = [0] * n_slots           # request's own bound
            self._free = list(range(n_slots))[::-1]

    # -- shared interface --------------------------------------------------
    def add_request(self, uid: int, prompt_len: int, max_new: int):
        if self._lib is not None:
            self._lib.sched_add_request(self._h, uid, prompt_len, max_new)
        else:
            import bisect
            key = (-(prompt_len + max_new) if self.order == "lpt"
                   else prompt_len)
            keys = [(-(p + m) if self.order == "lpt" else p)
                    for p, _, m in self._pending]
            i = bisect.bisect_left(keys, key)
            self._pending.insert(i, (prompt_len, uid, max_new))

    def pending_count(self) -> int:
        if self._lib is not None:
            return self._lib.sched_pending_count(self._h)
        return len(self._pending)

    def free_count(self) -> int:
        if self._lib is not None:
            return self._lib.sched_free_count(self._h)
        return len(self._free)

    def active_count(self) -> int:
        if self._lib is not None:
            return self._lib.sched_active_count(self._h)
        return sum(1 for s in self._slots if s is not None)

    def admit(self, cap: int):
        """Returns (slots, uids) for the admitted wave (possibly empty)."""
        if self._lib is not None:
            slots = (ctypes.c_int32 * cap)()
            uids = (ctypes.c_int64 * cap)()
            plens = (ctypes.c_int32 * cap)()
            n = self._lib.sched_admit(self._h, slots, uids, plens, cap)
            return list(slots[:n]), list(uids[:n])
        if not self._pending:
            return [], []
        hyst = min(self.min_free, self.n_slots) if self.min_free > 0 \
            else max(1, self.n_slots // 4)
        min_wave = min(len(self._pending), hyst)
        if len(self._free) < min_wave:
            return [], []
        # age-cohort steering (mirrors scheduler.cc sched_admit): fresh
        # requests fill the half with the lower max position first
        half = self.n_slots // 2
        if half > 0:
            max_a = max((c for s, c in zip(self._slots[:half],
                                           self._pos_cap[:half])
                         if s is not None), default=0)
            max_b = max((c for s, c in zip(self._slots[half:],
                                           self._pos_cap[half:])
                         if s is not None), default=0)
            prefer_a = max_a <= max_b
            self._free.sort(
                key=lambda x: (((x < half) == prefer_a), -x))
        take = min(len(self._free), len(self._pending), cap)
        out_s, out_u = [], []
        for _ in range(take):
            plen, uid, mx = self._pending.pop(0)
            slot = self._free.pop()
            self._slots[slot] = uid
            self._pos_cap[slot] = plen
            self._max_pos[slot] = plen + mx + 1
            out_s.append(slot)
            out_u.append(uid)
        return out_s, out_u

    def advance(self, n_steps: int) -> int:
        """Advance position caps by a decode chunk; returns global upper."""
        if self._lib is not None:
            return self._lib.sched_advance(self._h, n_steps)
        upper = 0
        for i in range(self.n_slots):
            if self._slots[i] is not None:
                # clamped to the request's own final-position bound so a
                # done-but-unharvested lane never drags the shared window
                # bucket up (mirrors scheduler.cc sched_advance)
                self._pos_cap[i] = min(self.max_model_len,
                                       self._pos_cap[i] + n_steps,
                                       max(self._max_pos[i],
                                           self._pos_cap[i]))
                upper = max(upper, self._pos_cap[i])
        return upper

    def pos_caps(self) -> np.ndarray:
        """Per-slot position upper bounds ([n_slots] int32; 0 = free slot).
        Feeds the engine's age-grouped pool split."""
        if self._lib is not None:
            caps = (ctypes.c_int32 * self.n_slots)()
            self._lib.sched_pos_caps(self._h, caps)
            return np.asarray(caps[:], np.int32)
        return np.asarray(
            [c if s is not None else 0
             for s, c in zip(self._slots, self._pos_cap)], np.int32)

    def harvest(self, done_flags: np.ndarray):
        """Free slots flagged done; returns (slots, uids)."""
        if self._lib is not None:
            flags = np.ascontiguousarray(done_flags, np.uint8)
            slots = (ctypes.c_int32 * self.n_slots)()
            uids = (ctypes.c_int64 * self.n_slots)()
            n = self._lib.sched_harvest(
                self._h, flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                slots, uids, self.n_slots)
            return list(slots[:n]), list(uids[:n])
        out_s, out_u = [], []
        for i in range(self.n_slots):
            if self._slots[i] is not None and done_flags[i]:
                out_s.append(i)
                out_u.append(self._slots[i])
                self._slots[i] = None
                self._pos_cap[i] = 0
                self._free.append(i)
        return out_s, out_u

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            try:
                self._lib.sched_destroy(self._h)
            except Exception:
                pass
