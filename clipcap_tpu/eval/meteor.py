"""METEOR scorer — native re-implementation of the METEOR 1.5 algorithm.

The reference drives ``meteor-1.5.jar`` over a stdio line protocol
(/root/reference/clipcap/eval/pycocoevalcap/meteor/meteor.py:21-63).  This
module re-implements the scoring algorithm (Denkowski & Lavie 2014) in
Python — no JVM:

* **Matcher stages**: exact → stem (Porter) → synonym → paraphrase, with
  METEOR 1.5's English stage weights (1.0 / 0.6 / 0.8 / 0.6).  Synonym and
  paraphrase stages activate only when resource tables are supplied (the
  jar's WordNet / ``paraphrase-en.gz`` data files are not shipped in this
  environment; pass ``synonyms=`` / ``paraphrase_path=`` to enable).
* **Alignment**: maximal matching resolved left-to-right, ties broken to
  minimize crossings (the jar's beam search optimizes the same objective).
* **Scoring**: content/function-word weighted P and R (delta = 0.75),
  parameterized harmonic mean (alpha = 0.85), fragmentation penalty
  ``gamma * (chunks / matches) ** beta`` with gamma = 0.6, beta = 1.4
  (METEOR 1.5 English task defaults for 'rank'), max over references per
  segment, corpus score from aggregated sufficient statistics — the same
  aggregate the jar's ``EVAL`` line computes.

A C++ drop-in with the jar's ``SCORE |||`` / ``EVAL |||`` stdio protocol is
planned under ``clipcap_tpu/native`` (SURVEY.md §2.2); this implementation
defines the behavior either way.
"""
from __future__ import annotations

import gzip
import math
from typing import Dict, List, Optional, Sequence, Set, Tuple

from clipcap_tpu.eval.porter import porter_stem

# METEOR 1.5 English 'rank' task parameters.
ALPHA = 0.85
BETA = 1.4
GAMMA = 0.6
DELTA = 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)  # exact, stem, synonym, paraphrase

# Compact English function-word list (METEOR's function.words resource is a
# corpus-derived list; this covers the high-frequency closed classes).
FUNCTION_WORDS: Set[str] = set("""
a an the this that these those some any each every no
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself ourselves themselves
am is are was were be been being do does did doing have has had having
will would shall should may might must can could ought
and or but nor so yet for if while although though because since unless until when whenever
where wherever whether as than that which who whom whose what
in on at by with from into onto of to up down over under above below between among
through during before after about against along around behind beside besides beyond
despite except inside outside toward towards upon within without
not n't there here then now just only also very too quite rather
""".split())


def load_paraphrase_table(path: str) -> Dict[str, Set[str]]:
    """Load a paraphrase table in the meteor ``paraphrase-en.gz`` line format
    (``phrase ||| paraphrase ||| ...`` or tab/space separated pairs)."""
    table: Dict[str, Set[str]] = {}
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = [p.strip() for p in line.split("|||")]
            if len(parts) < 2:
                parts = line.split("\t")
            if len(parts) >= 2 and parts[0] and parts[1]:
                table.setdefault(parts[0], set()).add(parts[1])
    return table


def get_meteor(synonyms: Optional[Dict[str, Set[str]]] = None,
               paraphrase_path: Optional[str] = None):
    """Return the C++ METEOR core when built (exact+stem configuration),
    else this Python implementation.  Resource-table configurations always
    use the Python scorer (the native core implements the default stages)."""
    if synonyms is None and paraphrase_path is None:
        try:
            from clipcap_tpu.native import meteor as native

            return native.Meteor()
        except Exception:
            pass
    return Meteor(synonyms=synonyms, paraphrase_path=paraphrase_path)


class Meteor:
    def __init__(
        self,
        synonyms: Optional[Dict[str, Set[str]]] = None,
        paraphrase_path: Optional[str] = None,
    ):
        self.synonyms = synonyms or {}
        self.paraphrases = load_paraphrase_table(paraphrase_path) if paraphrase_path else {}

    def method(self) -> str:
        return "METEOR"

    # ------------------------------------------------------------------
    # Alignment
    # ------------------------------------------------------------------

    def _match_stage(self, stage: int, h: str, r: str) -> bool:
        if stage == 0:
            return h == r
        if stage == 1:
            return porter_stem(h) == porter_stem(r)
        if stage == 2:
            return r in self.synonyms.get(h, ()) or h in self.synonyms.get(r, ())
        if stage == 3:
            return r in self.paraphrases.get(h, ()) or h in self.paraphrases.get(r, ())
        return False

    def _align(self, hyp: List[str], ref: List[str]) -> List[Tuple[int, int, int]]:
        """Return matches as (hyp_idx, ref_idx, stage), each word used once.

        Stages run in priority order over still-unmatched words; within a
        stage, hypothesis words match the closest unmatched reference
        position (minimizing crossings, the jar's beam-search objective).
        """
        h_used = [False] * len(hyp)
        r_used = [False] * len(ref)
        matches: List[Tuple[int, int, int]] = []
        n_stages = 4 if (self.synonyms or self.paraphrases) else 2
        for stage in range(n_stages):
            for i, hw in enumerate(hyp):
                if h_used[i]:
                    continue
                best_j = -1
                best_dist = None
                for j, rw in enumerate(ref):
                    if r_used[j]:
                        continue
                    if self._match_stage(stage, hw, rw):
                        dist = abs(i - j)
                        if best_dist is None or dist < best_dist:
                            best_dist = dist
                            best_j = j
                if best_j >= 0:
                    h_used[i] = True
                    r_used[best_j] = True
                    matches.append((i, best_j, stage))
        return matches

    @staticmethod
    def _count_chunks(matches: List[Tuple[int, int, int]]) -> int:
        """Chunks = maximal runs contiguous and monotonic in both strings."""
        if not matches:
            return 0
        ordered = sorted(matches)
        chunks = 1
        for (i0, j0, _), (i1, j1, _) in zip(ordered, ordered[1:]):
            if not (i1 == i0 + 1 and j1 == j0 + 1):
                chunks += 1
        return chunks

    # ------------------------------------------------------------------
    # Scoring
    # ------------------------------------------------------------------

    def _segment_stats(self, hyp: List[str], ref: List[str]):
        """Sufficient statistics for one (hyp, ref) pair."""
        matches = self._align(hyp, ref)

        def weighted(indices_words) -> float:
            total = 0.0
            for idx, word, stage in indices_words:
                w = STAGE_WEIGHTS[stage]
                total += w * (DELTA if word not in FUNCTION_WORDS else (1.0 - DELTA))
            return total

        h_matched = [(i, hyp[i], s) for i, _, s in matches]
        r_matched = [(j, ref[j], s) for _, j, s in matches]
        w_h = weighted(h_matched)
        w_r = weighted(r_matched)

        def total_weight(words: Sequence[str]) -> float:
            return sum(DELTA if w not in FUNCTION_WORDS else (1.0 - DELTA) for w in words)

        return {
            "matches": len(matches),
            "chunks": self._count_chunks(matches),
            "w_matched_h": w_h,
            "w_matched_r": w_r,
            "w_len_h": total_weight(hyp),
            "w_len_r": total_weight(ref),
        }

    @staticmethod
    def _score_from_stats(st: dict) -> float:
        if st["matches"] == 0 or st["w_len_h"] == 0 or st["w_len_r"] == 0:
            return 0.0
        p = st["w_matched_h"] / st["w_len_h"]
        r = st["w_matched_r"] / st["w_len_r"]
        if p == 0 or r == 0:
            return 0.0
        fmean = (p * r) / (ALPHA * p + (1 - ALPHA) * r)
        frag = st["chunks"] / st["matches"]
        # A single contiguous chunk carries no fragmentation penalty.
        if st["matches"] > 1:
            penalty = GAMMA * (frag ** BETA)
        else:
            penalty = 0.0
        return (1.0 - penalty) * fmean

    def score_segment(self, hypothesis: str, references: Sequence[str]) -> float:
        hyp = hypothesis.split()
        best = 0.0
        for ref in references:
            best = max(best, self._score_from_stats(self._segment_stats(hyp, ref.split())))
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        """coco-caption interface: per-image score = best ref; corpus score =
        score of aggregated sufficient statistics over each image's best
        reference (matching the jar's EVAL aggregation)."""
        keys = list(gts.keys())
        per_image: List[float] = []
        agg = {"matches": 0, "chunks": 0, "w_matched_h": 0.0, "w_matched_r": 0.0,
               "w_len_h": 0.0, "w_len_r": 0.0}
        for key in keys:
            hyp = res[key][0].split()
            best_score, best_stats = 0.0, None
            for ref in gts[key]:
                st = self._segment_stats(hyp, ref.split())
                sc = self._score_from_stats(st)
                if best_stats is None or sc > best_score:
                    best_score, best_stats = sc, st
            per_image.append(best_score)
            for k in agg:
                agg[k] += best_stats[k]
        return self._score_from_stats(agg), per_image
