"""ctypes front-end for the C++ METEOR core (drop-in for
clipcap_tpu.eval.meteor.Meteor on the exact+stem configuration)."""
from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence, Tuple

from clipcap_tpu.native import load

_STAT_KEYS = ("matches", "chunks", "w_matched_h", "w_matched_r", "w_len_h", "w_len_r")


class Meteor:
    def __init__(self):
        self._lib = load()

    def method(self) -> str:
        return "METEOR"

    def _stats(self, hyp: str, ref: str):
        buf = (ctypes.c_double * 6)()
        self._lib.ccn_meteor_stats(hyp.encode("utf-8"), ref.encode("utf-8"), buf)
        return list(buf)

    def _score(self, stats) -> float:
        buf = (ctypes.c_double * 6)(*stats)
        return float(self._lib.ccn_meteor_score_from_stats(buf))

    def score_segment(self, hypothesis: str, references: Sequence[str]) -> float:
        return max((self._score(self._stats(hypothesis, r)) for r in references),
                   default=0.0)

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        keys = list(gts.keys())
        per_image: List[float] = []
        agg = [0.0] * 6
        for key in keys:
            hyp = res[key][0]
            best_score, best_stats = 0.0, None
            for ref in gts[key]:
                st = self._stats(hyp, ref)
                sc = self._score(st)
                if best_stats is None or sc > best_score:
                    best_score, best_stats = sc, st
            per_image.append(best_score)
            agg = [a + b for a, b in zip(agg, best_stats)]
        return self._score(agg), per_image
