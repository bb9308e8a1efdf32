"""Native C++ host runtime (built lazily with g++, bound via ctypes).

Provides the host-side hot paths the reference implements in C++
(DBoW3 vocabulary/database, matcher popcounts, NMS); falls back to the
pure-python implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "native.cpp")
_SO = os.path.join(_DIR, "_ldso_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.bow_transform.argtypes = [c_u32p, ctypes.c_int, c_u32p, c_i32p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      c_i32p, c_i32p]
        lib.hamming_match.argtypes = [c_u32p, ctypes.c_int, c_u32p,
                                      ctypes.c_int, ctypes.c_float,
                                      ctypes.c_int, c_i32p, c_i32p]
        lib.bow_bucketed_match.argtypes = [c_u32p, c_i32p, ctypes.c_int,
                                           c_u32p, c_i32p, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_int,
                                           c_i32p, c_i32p]
        lib.db_create.restype = ctypes.c_void_p
        lib.db_destroy.argtypes = [ctypes.c_void_p]
        lib.db_add.argtypes = [ctypes.c_void_p, ctypes.c_int32, c_i32p,
                               c_f32p, ctypes.c_int]
        lib.db_query.argtypes = [ctypes.c_void_p, c_i32p, c_f32p, ctypes.c_int,
                                 c_i32p, ctypes.c_int, c_i32p, c_f32p,
                                 ctypes.c_int]
        lib.db_query.restype = ctypes.c_int
        lib.radius_nms.argtypes = [c_f32p, c_f32p, c_f32p, ctypes.c_int,
                                   ctypes.c_float, c_u8p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bow_transform(desc: np.ndarray, node_desc: np.ndarray,
                  children: np.ndarray, word_id: np.ndarray,
                  k: int, L: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    desc = np.ascontiguousarray(desc, np.uint32)
    node_desc = np.ascontiguousarray(node_desc, np.uint32)
    children = np.ascontiguousarray(children, np.int32)
    word_id = np.ascontiguousarray(word_id, np.int32)
    out = np.empty(len(desc), np.int32)
    lib.bow_transform(_ptr(desc, ctypes.c_uint32), len(desc),
                      _ptr(node_desc, ctypes.c_uint32),
                      _ptr(children, ctypes.c_int32), len(node_desc),
                      k, L, _ptr(word_id, ctypes.c_int32),
                      _ptr(out, ctypes.c_int32))
    return out


def hamming_match(da: np.ndarray, db: np.ndarray, nn_ratio: float = 0.9,
                  th_low: int = 50):
    lib = get_lib()
    if lib is None:
        return None
    da = np.ascontiguousarray(da, np.uint32)
    db = np.ascontiguousarray(db, np.uint32)
    match = np.empty(len(da), np.int32)
    dist = np.empty(len(da), np.int32)
    lib.hamming_match(_ptr(da, ctypes.c_uint32), len(da),
                      _ptr(db, ctypes.c_uint32), len(db),
                      nn_ratio, th_low, _ptr(match, ctypes.c_int32),
                      _ptr(dist, ctypes.c_int32))
    return match, dist


def bow_bucketed_match(da: np.ndarray, nodes_a: np.ndarray,
                       db: np.ndarray, nodes_b: np.ndarray,
                       nn_ratio: float = 0.75, th_low: int = 50):
    """SearchByBoW (FeatureMatcher.cc:66-124): match only within shared
    vocabulary-tree nodes, NN-ratio per bucket. Returns (match, dist) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    da = np.ascontiguousarray(da, np.uint32)
    db = np.ascontiguousarray(db, np.uint32)
    nodes_a = np.ascontiguousarray(nodes_a, np.int32)
    nodes_b = np.ascontiguousarray(nodes_b, np.int32)
    match = np.empty(len(da), np.int32)
    dist = np.empty(len(da), np.int32)
    lib.bow_bucketed_match(_ptr(da, ctypes.c_uint32),
                           _ptr(nodes_a, ctypes.c_int32), len(da),
                           _ptr(db, ctypes.c_uint32),
                           _ptr(nodes_b, ctypes.c_int32), len(db),
                           nn_ratio, th_low, _ptr(match, ctypes.c_int32),
                           _ptr(dist, ctypes.c_int32))
    return match, dist


def radius_nms(u: np.ndarray, v: np.ndarray, score: np.ndarray,
               radius: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    u = np.ascontiguousarray(u, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    score = np.ascontiguousarray(score, np.float32)
    keep = np.empty(len(u), np.uint8)
    lib.radius_nms(_ptr(u, ctypes.c_float), _ptr(v, ctypes.c_float),
                   _ptr(score, ctypes.c_float), len(u), radius,
                   _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


class NativeDatabase:
    """Inverted-index database backed by the C++ module."""

    def __init__(self):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.db_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.db_destroy(self._h)
            self._h = None

    def add(self, kf_id: int, words: np.ndarray, weights: np.ndarray):
        words = np.ascontiguousarray(words, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        self._lib.db_add(self._h, kf_id, _ptr(words, ctypes.c_int32),
                         _ptr(weights, ctypes.c_float), len(words))

    def query(self, words: np.ndarray, weights: np.ndarray,
              exclude: np.ndarray, max_results: int = 5):
        words = np.ascontiguousarray(words, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        exclude = np.ascontiguousarray(exclude, np.int32)
        out_ids = np.empty(max_results, np.int32)
        out_scores = np.empty(max_results, np.float32)
        m = self._lib.db_query(self._h, _ptr(words, ctypes.c_int32),
                               _ptr(weights, ctypes.c_float), len(words),
                               _ptr(exclude, ctypes.c_int32), len(exclude),
                               _ptr(out_ids, ctypes.c_int32),
                               _ptr(out_scores, ctypes.c_float), max_results)
        return [(int(out_ids[i]), float(out_scores[i])) for i in range(m)]
