"""Inverted-index keyframe database (DBoW3::Database replacement).

Reference usage: LoopClosing adds every KF's BoW vector and queries for the
best-scoring candidates outside an exclusion window
(src/frontend/LoopClosing.cc:95-143). Host-side python here; flagged as a
candidate for the native C++ module (SURVEY.md §2.2 note: "keep file-format
loader on host").
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ldso_tpu.loop.vocab import Vocabulary


class KeyframeDatabase:
    """Uses the native C++ inverted index when the toolchain is available
    (ldso_tpu/native), with a pure-python fallback."""

    def __init__(self, vocab: Vocabulary):
        self.vocab = vocab
        self.inverted: Dict[int, List[int]] = {}   # word -> [kf_id]
        self.bows: Dict[int, Dict[int, float]] = {}  # kf_id -> bow vector
        self._native = None
        try:
            from ldso_tpu.native import NativeDatabase
            self._native = NativeDatabase()
        except Exception:  # noqa: BLE001 (no toolchain)
            self._native = None

    def add(self, kf_id: int, bow: Dict[int, float]):
        self.bows[kf_id] = bow
        for w in bow:
            self.inverted.setdefault(w, []).append(kf_id)
        if self._native is not None:
            import numpy as np
            words = np.fromiter(bow.keys(), np.int32, len(bow))
            weights = np.fromiter(bow.values(), np.float32, len(bow))
            self._native.add(kf_id, words, weights)

    def query(self, bow: Dict[int, float], exclude: set,
              max_results: int = 5) -> List[Tuple[int, float]]:
        """Best-scoring stored keyframes sharing at least one word."""
        if self._native is not None:
            import numpy as np
            words = np.fromiter(bow.keys(), np.int32, len(bow))
            weights = np.fromiter(bow.values(), np.float32, len(bow))
            exc = np.fromiter(exclude, np.int32, len(exclude))
            return self._native.query(words, weights, exc, max_results)
        cands = set()
        for w in bow:
            cands.update(self.inverted.get(w, ()))
        cands -= exclude
        scored = [(kf, Vocabulary.score(bow, self.bows[kf])) for kf in cands]
        scored.sort(key=lambda t: -t[1])
        return scored[:max_results]
