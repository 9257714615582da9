"""ctypes bindings for the native (C++) data-plane kernels.

``native/miner_data.cpp`` implements the per-epoch sampling loop and the
UnBERT packer; numpy implementations in ``samplers.py`` /
``unbert_packing.py`` remain the behavioral reference and fallback.  The
library auto-builds on first import when g++ is available; set
``MINER_TPU_NO_NATIVE=1`` to disable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

ABI_VERSION = 2  # must match miner_data_abi_version() in miner_data.cpp

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The ABI version is part of the filename: dlopen caches handles by NAME, so
# rebuilding a stale library in place and re-dlopening the same path returns
# the old mapping within one process. A versioned name sidesteps that.
_LIB_PATH = os.path.join(_REPO_ROOT, "native", f"libminer_data.v{ABI_VERSION}.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "miner_data.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # compile to a temp path then atomically rename: a stale .so may still
    # be mmapped by this process (ABI-triggered rebuild) and must not be
    # truncated in place
    tmp = _LIB_PATH + ".tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception as e:
        log.warning("native build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    try:
        return ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.warning("could not load native library: %s", e)
        return None


def _abi_ok(lib: ctypes.CDLL) -> bool:
    try:
        fn = lib.miner_data_abi_version
    except AttributeError:
        return False
    fn.restype = ctypes.c_int32
    fn.argtypes = []
    return fn() == ABI_VERSION


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("MINER_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH):
        if not _build():
            return None
    lib = _load()
    if lib is not None and not _abi_ok(lib) and os.path.exists(_SRC_PATH):
        # stale build from an older source revision: rebuild in place
        log.info("native library ABI stale; rebuilding %s", _LIB_PATH)
        del lib
        lib = _load() if _build() else None
    if lib is None:
        return None
    if not _abi_ok(lib):
        log.warning("native library ABI mismatch (want %d); using the "
                     "numpy fallback", ABI_VERSION)
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.miner_sample_epoch.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        i32p, i32p, i32p, i32p, f32p,
    ]
    lib.miner_sample_epoch.restype = None
    lib.miner_pack_unbert.argtypes = [
        ctypes.c_int64, ctypes.c_int,
        i32p, i32p, ctypes.c_int64,
        i32p, i32p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p,
    ]
    lib.miner_pack_unbert.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def sample_epoch(seed: int, epoch: int, mode: str, num_events: int, C: int,
                 V: int, N: int, pos_row: np.ndarray, neg_flat: np.ndarray,
                 neg_offsets: np.ndarray):
    lib = get_lib()
    assert lib is not None
    cand = np.zeros((num_events, C), dtype=np.int32)
    label = np.zeros((num_events, C), dtype=np.float32)
    lib.miner_sample_epoch(
        seed & 0xFFFFFFFFFFFFFFFF, epoch, 1 if mode == "hard" else 0,
        num_events, C, V, N,
        np.ascontiguousarray(pos_row, np.int32),
        np.ascontiguousarray(neg_flat, np.int32),
        np.ascontiguousarray(neg_offsets, np.int32),
        cand, label,
    )
    return cand, label


def pack_unbert(tokens: np.ndarray, lens: np.ndarray, cand_rows: np.ndarray,
                hist_rows: np.ndarray, seq_max_len: int, news_max_len: int,
                hist_max_len: int, cls_id: int, sep_id: int, pad_id: int,
                legacy_layout: bool = False):
    lib = get_lib()
    assert lib is not None
    B = len(cand_rows)
    H = hist_rows.shape[1]
    S = 3 + hist_max_len
    out = {
        "input_ids": np.zeros((B, seq_max_len), np.int32),
        "input_mask": np.zeros((B, seq_max_len), np.int32),
        "segment_ids": np.zeros((B, seq_max_len), np.int32),
        "news_segment_ids": np.zeros((B, seq_max_len), np.int32),
        "sentence_ids": np.zeros((B, S), np.int32),
        "sentence_mask": np.zeros((B, S), np.int32),
        "sentence_segment_ids": np.zeros((B, S), np.int32),
    }
    lib.miner_pack_unbert(
        B, H,
        np.ascontiguousarray(tokens, np.int32),
        np.ascontiguousarray(lens, np.int32), tokens.shape[1],
        np.ascontiguousarray(cand_rows, np.int32),
        np.ascontiguousarray(hist_rows, np.int32),
        seq_max_len, news_max_len, hist_max_len, cls_id, sep_id, pad_id,
        1 if legacy_layout else 0,
        out["input_ids"], out["input_mask"], out["segment_ids"],
        out["news_segment_ids"], out["sentence_ids"], out["sentence_mask"],
        out["sentence_segment_ids"],
    )
    return out
