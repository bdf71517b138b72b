"""ctypes bindings to the native host runtime (``native/mcpoker.cpp``).

The device engine (JAX) is the batch path; this native single-table engine
serves the latency path — interactive server actions in microseconds rather
than per-action jitted dispatch. Semantics are identical (property-tested
against the array engine and the oracle in ``tests/test_native.py``).

The shared library builds on demand with ``make`` on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmcpoker.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "mcpoker.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-B", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mc_eval7.restype = ctypes.c_uint32
    lib.mc_eval7.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib.mc_eval5.restype = ctypes.c_uint32
    lib.mc_eval5.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib.mc_eval7_batch.restype = None
    lib.mc_eval7_batch.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                   ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_uint32)]
    lib.mc_eval7_cmp.restype = ctypes.c_uint32
    lib.mc_eval7_cmp.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib.mc_eval7_cmp_batch.restype = None
    lib.mc_eval7_cmp_batch.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                       ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_uint32)]
    lib.mc_table_new.restype = ctypes.c_void_p
    lib.mc_table_new.argtypes = [ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32)]
    lib.mc_table_free.argtypes = [ctypes.c_void_p]
    lib.mc_table_clamp.restype = ctypes.c_int32
    lib.mc_table_clamp.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mc_table_act.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mc_table_act_raw.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mc_table_settle.argtypes = [ctypes.c_void_p]
    lib.mc_table_set_stacks.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_int32)]
    lib.mc_table_snapshot.restype = ctypes.c_int32
    lib.mc_table_snapshot.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _i32(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.int32))


def eval7(cards: Sequence[int]) -> int:
    lib = _load()
    a = _i32(cards)
    assert a.shape == (7,)
    return int(lib.mc_eval7(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))))


def eval7_batch(cards) -> np.ndarray:
    lib = _load()
    a = _i32(cards)
    assert a.ndim == 2 and a.shape[1] == 7
    out = np.empty((a.shape[0],), dtype=np.uint32)
    lib.mc_eval7_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), a.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def eval7_cmp_batch(cards) -> np.ndarray:
    """Comparison-only keys (C++ twin of ``eval_masks_cmp_impl``)."""
    lib = _load()
    a = _i32(cards)
    assert a.ndim == 2 and a.shape[1] == 7
    out = np.empty((a.shape[0],), dtype=np.uint32)
    lib.mc_eval7_cmp_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), a.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


class NativeTable:
    """Single interactive table on the native engine (seat == hand-order
    position; the server maps seats to player ids)."""

    def __init__(self, n: int, small: int, big: int, deck: Sequence[int],
                 stacks: Optional[Sequence[int]] = None):
        self._lib = _load()
        d = _i32(deck)
        assert d.shape == (52,)
        s = _i32(stacks) if stacks is not None else None
        self._ptr = self._lib.mc_table_new(
            n, small, big, d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if s is not None else None)
        if not self._ptr:
            raise ValueError("invalid table configuration")
        self.n = n

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.mc_table_free(self._ptr)
            self._ptr = None

    def clamp(self, action: int) -> int:
        return int(self._lib.mc_table_clamp(self._ptr, action))

    def act(self, action: int, validate: bool = True):
        if validate:
            self._lib.mc_table_act(self._ptr, action)
        else:
            self._lib.mc_table_act_raw(self._ptr, action)

    def settle(self):
        self._lib.mc_table_settle(self._ptr)

    def set_stacks(self, stacks: Sequence[int]):
        """Overwrite live spendable stacks (hand-order space) — the global
        per-player stack-ref semantics of database.clj:8-12."""
        s = _i32(stacks)
        assert s.shape == (self.n,)
        self._lib.mc_table_set_stacks(
            self._ptr, s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))

    def snapshot(self) -> dict:
        buf = np.zeros((4096,), dtype=np.int32)
        k = self._lib.mc_table_snapshot(
            self._ptr, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buf.shape[0])
        assert k > 0
        v = buf[:k].tolist()
        n = v[0]
        i = 8
        stacks = v[i:i + n]
        i += n
        n_bets = v[i]
        i += 1
        bets = []
        for _ in range(n_bets):
            amt, mem, orig, cnt = v[i:i + 4]
            i += 4
            bets.append((amt, _mask_set(mem, n), _mask_set(orig, n), cnt))
        n_pots = v[i]
        i += 1
        pots = []
        for _ in range(n_pots):
            amt, mem, orig, cnt = v[i:i + 4]
            i += 4
            pots.append((amt, _mask_set(mem, n), _mask_set(orig, n), cnt))
        cursor = v[i]
        n_order = v[i + 1]
        order = v[i + 2:i + 2 + n_order]
        return {
            "stage": v[1], "time": v[2], "n_revealed": v[3],
            "over": bool(v[4]), "head": None if v[5] < 0 else v[5],
            "in_hand": _mask_set(v[6], n), "remaining": _mask_set(v[7], n),
            "stacks": stacks, "bets": bets, "pots": pots,
            "cursor": cursor, "order": order,
        }


def _mask_set(mask: int, n: int) -> frozenset:
    return frozenset(s for s in range(n) if (mask >> s) & 1)
