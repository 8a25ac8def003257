"""Sloppy-phrase frequency: greedy minimal-window matcher.

Semantics note (documented divergence): the reference's
``SloppyPhraseScorer`` (``Search/SloppyPhraseScorer.cs``) runs a
priority-queue repositioning algorithm whose corner cases around
repeated terms are subtle; this engine instead pins the following
deterministic spec, shared verbatim between the Spark UDF and the
pure-Python oracle (so Spark↔oracle identity is exact):

- offsets applied first (``q_i = position - expected_offset``);
- sweep the classic k-sorted-lists minimal windows: at each step the
  current window spans one candidate per term; its length is
  ``L = max - min``;
- a window with ``L <= slop`` MATCHES, contributes
  ``1 / (1 + L)`` (the reference's sloppyFreq,
  ``Similarities/Similarity.cs`` SloppyFreq analog) to the phrase
  frequency in float32, and consumes all its elements (greedy
  non-overlapping, left-to-right);
- otherwise the smallest element advances.

For ``slop = 0`` this reduces to exact-phrase counting (all offsets
equal), and the engine uses the vectorized exact path instead.
"""

from __future__ import annotations

import numpy as np


def sloppy_phrase_freq(offset_positions: list[np.ndarray], slop: int) -> np.float32:
    """float32 sloppy frequency over offset-adjusted, sorted position
    arrays (one per phrase term)."""
    k = len(offset_positions)
    lists = [np.asarray(p, dtype=np.int64) for p in offset_positions]
    ptrs = [0] * k
    acc = np.float32(0.0)
    while True:
        vals = []
        for i in range(k):
            if ptrs[i] >= len(lists[i]):
                return acc
            vals.append(int(lists[i][ptrs[i]]))
        lo, hi = min(vals), max(vals)
        L = hi - lo
        if L <= slop:
            acc = np.float32(acc + np.float32(1.0 / (1.0 + L)))
            for i in range(k):
                ptrs[i] += 1
        else:
            ptrs[vals.index(lo)] += 1
