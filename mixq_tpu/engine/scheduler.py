"""Continuous-batching slot scheduler: ctypes binding to the native C++
implementation (native/scheduler.cpp), with a pure-Python fallback carrying
identical semantics (used when the shared library hasn't been built).

Semantics: FCFS admission into free slots; a request occupies one KV-cache
slot from admission until it hits max_new_tokens / the sequence budget / an
explicit finish (EOS).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from collections import deque
from dataclasses import dataclass
from typing import List, Optional, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmixq_sched.so")


def _load_native() -> Optional[ctypes.CDLL]:
    src = os.path.join(_NATIVE_DIR, "scheduler.cpp")
    stale = (os.path.exists(src) and os.path.exists(_LIB_PATH)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if (not os.path.exists(_LIB_PATH) or stale) and os.path.exists(src):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            if stale:   # source changed but rebuild failed: don't run stale
                return None
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sched_create.restype = ctypes.c_void_p
    lib.sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sched_add_request.restype = ctypes.c_int32
    lib.sched_add_request.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.sched_admit.restype = ctypes.c_int32
    lib.sched_admit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.sched_on_token.restype = ctypes.c_int32
    lib.sched_on_token.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.sched_finish.restype = ctypes.c_int32
    lib.sched_finish.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    try:
        lib.sched_restore_slot.restype = ctypes.c_int32
        lib.sched_restore_slot.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    except AttributeError:      # stale prebuilt .so without the symbol
        return None
    lib.sched_active_slots.restype = ctypes.c_int32
    lib.sched_active_slots.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.sched_slot_info.restype = ctypes.c_int32
    lib.sched_slot_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
    lib.sched_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.ngram_create.restype = ctypes.c_void_p
    lib.ngram_create.argtypes = [ctypes.c_int32]
    lib.ngram_destroy.argtypes = [ctypes.c_void_p]
    _i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ngram_reset.restype = ctypes.c_int32
    lib.ngram_reset.argtypes = [ctypes.c_void_p, ctypes.c_int32, _i32p,
                                ctypes.c_int32]
    lib.ngram_append.restype = ctypes.c_int32
    lib.ngram_append.argtypes = [ctypes.c_void_p, ctypes.c_int32, _i32p,
                                 ctypes.c_int32]
    lib.ngram_propose.restype = ctypes.c_int32
    lib.ngram_propose.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32, _i32p]
    return lib


# built/loaded lazily on first NativeScheduler construction — importing this
# module must stay side-effect free (no subprocess `make` at import time)
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_native()
        _LIB_TRIED = True
    return _LIB


class NativeScheduler:
    """ctypes wrapper over native/scheduler.cpp."""

    def __init__(self, n_slots: int, max_seq: int):
        global _LIB
        _LIB = _get_lib()
        assert _LIB is not None, "native scheduler library not available"
        self._h = _LIB.sched_create(n_slots, max_seq)
        assert self._h, "sched_create failed"
        self.n_slots = n_slots

    def __del__(self):
        if getattr(self, "_h", None):
            _LIB.sched_destroy(self._h)
            self._h = None

    def add_request(self, req_id: int, prompt_len: int,
                    max_new_tokens: int) -> int:
        return _LIB.sched_add_request(self._h, req_id, prompt_len,
                                      max_new_tokens)

    def admit(self, cap: Optional[int] = None) -> List[Tuple[int, int]]:
        cap = cap or self.n_slots
        ids = (ctypes.c_int64 * cap)()
        slots = (ctypes.c_int32 * cap)()
        n = _LIB.sched_admit(self._h, ids, slots, cap)
        return [(ids[i], slots[i]) for i in range(n)]

    def on_token(self, slot: int) -> int:
        return _LIB.sched_on_token(self._h, slot)

    def finish(self, slot: int) -> int:
        return _LIB.sched_finish(self._h, slot)

    def restore_slot(self, slot: int, req_id: int, prompt_len: int,
                     max_new_tokens: int, generated: int) -> int:
        """Re-occupy `slot` with an in-flight request (engine snapshot
        restore — slot ids are KV-cache row ids and must be preserved)."""
        return _LIB.sched_restore_slot(self._h, slot, req_id, prompt_len,
                                       max_new_tokens, generated)

    def active_slots(self) -> List[int]:
        out = (ctypes.c_int32 * self.n_slots)()
        n = _LIB.sched_active_slots(self._h, out, self.n_slots)
        return list(out[:n])

    def slot_info(self, slot: int):
        out = (ctypes.c_int64 * 4)()
        if _LIB.sched_slot_info(self._h, slot, out) != 0:
            return None
        return tuple(out)

    def stats(self):
        out = (ctypes.c_int64 * 4)()
        _LIB.sched_stats(self._h, out)
        return {"queued": out[0], "active": out[1], "finished": out[2],
                "free": out[3]}


@dataclass
class _Req:
    id: int
    prompt_len: int
    max_new_tokens: int
    generated: int = 0


class PythonScheduler:
    """Pure-Python fallback with the same contract."""

    def __init__(self, n_slots: int, max_seq: int):
        self.n_slots = n_slots
        self.max_seq = max_seq
        self._queue: deque = deque()
        self._slots: List[Optional[_Req]] = [None] * n_slots
        self._finished = 0

    def add_request(self, req_id, prompt_len, max_new_tokens) -> int:
        if prompt_len <= 0 or prompt_len >= self.max_seq:
            return -2
        room = self.max_seq - prompt_len
        mnt = min(max_new_tokens, room)
        if mnt <= 0:
            return -2
        self._queue.append(_Req(req_id, prompt_len, mnt))
        return 0

    def admit(self, cap=None):
        cap = cap or self.n_slots
        out = []
        for slot in range(self.n_slots):
            if len(out) >= cap or not self._queue:
                break
            if self._slots[slot] is None:
                r = self._queue.popleft()
                self._slots[slot] = r
                out.append((r.id, slot))
        return out

    def on_token(self, slot) -> int:
        r = self._slots[slot]
        if r is None:
            return -1
        r.generated += 1
        if (r.generated >= r.max_new_tokens
                or r.prompt_len + r.generated >= self.max_seq):
            self._slots[slot] = None
            self._finished += 1
            return 1
        return 0

    def finish(self, slot) -> int:
        if self._slots[slot] is None:
            return -1
        self._slots[slot] = None
        self._finished += 1
        return 0

    def restore_slot(self, slot, req_id, prompt_len, max_new_tokens,
                     generated) -> int:
        if not (0 <= slot < self.n_slots) or self._slots[slot] is not None:
            return -1
        if (prompt_len <= 0 or max_new_tokens <= 0 or generated < 0
                or generated >= max_new_tokens):
            return -2
        self._slots[slot] = _Req(req_id, prompt_len, max_new_tokens,
                                 generated)
        return 0

    def active_slots(self):
        return [i for i, r in enumerate(self._slots) if r is not None]

    def slot_info(self, slot):
        r = self._slots[slot]
        if r is None:
            return None
        return (r.id, r.prompt_len, r.generated, r.max_new_tokens)

    def stats(self):
        active = len(self.active_slots())
        return {"queued": len(self._queue), "active": active,
                "finished": self._finished, "free": self.n_slots - active}


def make_scheduler(n_slots: int, max_seq: int, prefer_native: bool = True):
    if prefer_native and _get_lib() is not None:
        return NativeScheduler(n_slots, max_seq)
    return PythonScheduler(n_slots, max_seq)


class NativeDrafter:
    """Per-slot prompt-lookup n-gram drafter over the native token
    histories (native/scheduler.cpp ngram_*): the speculative-decoding
    host hot loop — an O(history) backward scan per slot per verify
    step — runs as a flat int32 scan instead of Python list slicing."""

    def __init__(self, n_slots: int):
        global _LIB
        _LIB = _get_lib()
        assert _LIB is not None, "native library not available"
        self._h = _LIB.ngram_create(n_slots)
        assert self._h, "ngram_create failed"

    def __del__(self):
        if getattr(self, "_h", None):
            _LIB.ngram_destroy(self._h)
            self._h = None

    @staticmethod
    def _arr(tokens):
        return (ctypes.c_int32 * len(tokens))(*tokens)

    def reset(self, slot: int, tokens) -> None:
        _LIB.ngram_reset(self._h, slot, self._arr(tokens), len(tokens))

    def append(self, slot: int, tokens) -> None:
        _LIB.ngram_append(self._h, slot, self._arr(tokens), len(tokens))

    def propose(self, slot: int, n: int, k: int) -> List[int]:
        out = (ctypes.c_int32 * max(k, 1))()
        got = _LIB.ngram_propose(self._h, slot, n, k, out)
        return list(out[:got])


class PythonDrafter:
    """Pure-Python fallback with the same contract."""

    def __init__(self, n_slots: int):
        self._hist: List[List[int]] = [[] for _ in range(n_slots)]

    def reset(self, slot, tokens):
        self._hist[slot] = list(tokens)

    def append(self, slot, tokens):
        self._hist[slot].extend(tokens)

    def propose(self, slot, n, k):
        from mixq_tpu.engine.speculative import propose_ngram

        return propose_ngram(self._hist[slot], n, k)


def make_drafter(n_slots: int, prefer_native: bool = True):
    if prefer_native and _get_lib() is not None:
        return NativeDrafter(n_slots)
    return PythonDrafter(n_slots)
