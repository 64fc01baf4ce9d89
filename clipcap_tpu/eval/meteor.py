"""METEOR scorer — native re-implementation of the METEOR 1.5 algorithm.

The reference drives ``meteor-1.5.jar`` over a stdio line protocol with
``-l en -norm -a data/paraphrase-en.gz``
(/root/reference/clipcap/eval/pycocoevalcap/meteor/meteor.py:21-63).  This
module re-implements that scorer (Denkowski & Lavie 2011, 2014) in Python —
no JVM:

* **Normalization** (``-norm``): lowercase + punctuation split, applied to
  both hypothesis and references.
* **Matcher stages**: exact → stem → synonym → paraphrase.  The stem stage
  uses the Snowball English ("Porter2") stemmer — the same algorithm as the
  jar's ``org.tartarus.snowball.ext.englishStemmer``
  (clipcap_tpu/eval/snowball.py, validated against nltk's independent
  implementation).  The synonym stage activates when a synonym table is
  supplied (the jar reads WordNet, which is not distributable here); the
  paraphrase stage activates when ``paraphrase-en.gz`` is present
  (fetched by ``python -m clipcap_tpu.init``).  Paraphrase matches are
  phrase-level: a match may cover multi-word spans on both sides, exactly
  like the jar's paraphrase matcher.
* **Alignment**: beam search over the candidate match set with the jar's
  objective — lexicographically maximize (total words covered,
  −chunks, −total start-position distance).  Verified against exhaustive
  search on small sentences in tests/test_eval.py.
* **Scoring**: METEOR 1.5 English defaults (the WMT-rank-tuned parameters
  the jar uses for ``-l en`` with no ``-t`` flag; Denkowski & Lavie 2011,
  Table 3): alpha=0.85, beta=0.2, gamma=0.6, delta=0.75, stage weights
  (1.0, 0.6, 0.8, 0.6).  Content/function-word weighted P and R, harmonic
  mean, fragmentation penalty ``gamma * (chunks / mean_matches) ** beta``,
  best reference per segment by score, corpus score from summed sufficient
  statistics (the jar's ``EVAL`` aggregation).

Known divergence from the jar (documented, not fixable offline): the jar
ships a corpus-derived function-word list (``function/en.words`` inside the
jar) and WordNet synonym data; this module uses a hand-curated
closed-class function-word list and leaves the synonym stage off unless a
table is passed.  Segment scores are exact for the algorithm as published;
absolute agreement with the jar additionally requires those two resources.
"""
from __future__ import annotations

import gzip
import math
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Set, Tuple

from clipcap_tpu.eval.snowball import snowball_stem

# METEOR 1.5 English defaults (WMT rank-tuned; used by `-l en` with no -t).
ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)  # exact, stem, synonym, paraphrase
BEAM_WIDTH = 40  # the jar's aligner beam size

# Compact English function-word list (the jar's function/en.words resource
# is corpus-derived; this covers the high-frequency closed classes).
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

# ASCII punctuation except apostrophe; non-ASCII passes through as word
# characters (keeps the C++ core byte-compatible on UTF-8 input).
_PUNCT_RE = re.compile(r"([!-&(-/:-@\[-`{-~])")

_STATS_KEYS = ("matches_h", "matches_r", "chunks",
               "w_matched_h", "w_matched_r", "w_len_h", "w_len_r")


def normalize(text: str) -> List[str]:
    """`-norm`-style preprocessing: lowercase + split punctuation into
    separate tokens (inputs in the coco pipeline are already PTB-tokenized
    and lowercased, so this is usually the identity past lowercasing)."""
    text = text.lower()
    text = _PUNCT_RE.sub(r" \1 ", text)
    return text.split()


def load_paraphrase_table(path: str) -> Dict[str, Set[str]]:
    """Load a paraphrase table in the meteor ``paraphrase-en.gz`` line format
    (``phrase ||| paraphrase`` lines, or tab-separated pairs)."""
    table: Dict[str, Set[str]] = {}
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = [p.strip() for p in line.split("|||")]
            if len(parts) < 2:
                parts = [p.strip() for p in line.split("\t")]
            if len(parts) >= 2 and parts[0] and parts[1]:
                table.setdefault(parts[0], set()).add(parts[1])
    return table


def default_paraphrase_path() -> Optional[str]:
    """The paraphrase table fetched by ``python -m clipcap_tpu.init``
    (or pointed at via $CLIPCAP_METEOR_PARAPHRASE)."""
    env = os.environ.get("CLIPCAP_METEOR_PARAPHRASE")
    if env and os.path.exists(env):
        return env
    cached = os.path.expanduser("~/.cache/clipcap_tpu/meteor/paraphrase-en.gz")
    if os.path.exists(cached):
        return cached
    return None


def get_meteor(synonyms: Optional[Dict[str, Set[str]]] = None,
               paraphrase_path: Optional[str] = None):
    """Return the C++ METEOR core when built, else the Python scorer.
    ``paraphrase_path`` defaults to the init-fetched table when present.
    Synonym-table configurations use the Python scorer."""
    if paraphrase_path is None:
        paraphrase_path = default_paraphrase_path()
    if synonyms is None:
        try:
            from clipcap_tpu.native import meteor as native

            return native.Meteor(paraphrase_path=paraphrase_path)
        except Exception:
            pass
    return Meteor(synonyms=synonyms, paraphrase_path=paraphrase_path)


@dataclass(frozen=True)
class Match:
    """One match: hyp span [h, h+hl) ↔ ref span [r, r+rl), via ``stage``."""
    h: int
    hl: int
    r: int
    rl: int
    stage: int


class Meteor:
    def __init__(
        self,
        synonyms: Optional[Dict[str, Set[str]]] = None,
        paraphrase_path: Optional[str] = None,
        alpha: float = ALPHA,
        beta: float = BETA,
        gamma: float = GAMMA,
        delta: float = DELTA,
        stage_weights: Sequence[float] = STAGE_WEIGHTS,
    ):
        self.synonyms = synonyms or {}
        self.paraphrases = (
            load_paraphrase_table(paraphrase_path) if paraphrase_path else {}
        )
        self._max_phrase = max(
            (len(p.split()) for p in self.paraphrases), default=1
        )
        self.alpha, self.beta, self.gamma, self.delta = alpha, beta, gamma, delta
        self.stage_weights = tuple(stage_weights)

    def method(self) -> str:
        return "METEOR"

    # ------------------------------------------------------------------
    # Alignment
    # ------------------------------------------------------------------

    def _candidates(self, hyp: List[str], ref: List[str]) -> List[Match]:
        """All possible matches, every stage.  A word pair is attributed to
        its highest-priority (lowest-index) matching stage, like the jar."""
        cands: List[Match] = []
        h_stem = [snowball_stem(w) for w in hyp]
        r_stem = [snowball_stem(w) for w in ref]
        for i, hw in enumerate(hyp):
            for j, rw in enumerate(ref):
                if hw == rw:
                    cands.append(Match(i, 1, j, 1, 0))
                elif h_stem[i] == r_stem[j]:
                    cands.append(Match(i, 1, j, 1, 1))
                elif self.synonyms and (
                    rw in self.synonyms.get(hw, ())
                    or hw in self.synonyms.get(rw, ())
                ):
                    cands.append(Match(i, 1, j, 1, 2))
        if self.paraphrases:
            cands.extend(self._paraphrase_candidates(hyp, ref))
        return cands

    def _paraphrase_candidates(self, hyp: List[str], ref: List[str]) -> List[Match]:
        def spans(words):
            out = {}
            for a in range(len(words)):
                for ln in range(1, min(self._max_phrase, len(words) - a) + 1):
                    out.setdefault(" ".join(words[a:a + ln]), []).append((a, ln))
            return out

        h_spans, r_spans = spans(hyp), spans(ref)
        cands: List[Match] = []
        seen = set()
        for h_phrase, h_locs in h_spans.items():
            for r_phrase in self.paraphrases.get(h_phrase, ()):
                for r_loc in r_spans.get(r_phrase, ()):
                    for h_loc in h_locs:
                        key = (h_loc, r_loc)
                        if key not in seen:
                            seen.add(key)
                            cands.append(Match(h_loc[0], h_loc[1],
                                               r_loc[0], r_loc[1], 3))
        for r_phrase, r_locs in r_spans.items():
            for h_phrase in self.paraphrases.get(r_phrase, ()):
                for h_loc in h_spans.get(h_phrase, ()):
                    for r_loc in r_locs:
                        key = (h_loc, r_loc)
                        if key not in seen:
                            seen.add(key)
                            cands.append(Match(h_loc[0], h_loc[1],
                                               r_loc[0], r_loc[1], 3))
        return cands

    @staticmethod
    def _count_chunks(matches: Sequence[Match]) -> int:
        """Chunks = maximal runs of matches adjacent in both sentences."""
        if not matches:
            return 0
        ordered = sorted(matches, key=lambda m: (m.h, m.r))
        chunks = 1
        for a, b in zip(ordered, ordered[1:]):
            if not (b.h == a.h + a.hl and b.r == a.r + a.rl):
                chunks += 1
        return chunks

    @classmethod
    def _objective(cls, matches: Sequence[Match]) -> Tuple[int, int, int]:
        """Jar aligner objective, to MAXIMIZE lexicographically:
        (words covered, −chunks, −total |h−r| start distance)."""
        covered = sum(m.hl + m.rl for m in matches)
        dist = sum(abs(m.h - m.r) for m in matches)
        return (covered, -cls._count_chunks(matches), -dist)

    def _align(self, hyp: List[str], ref: List[str]) -> List[Match]:
        """Beam search (width 40, like the jar) over the candidate set."""
        cands = self._candidates(hyp, ref)
        cands.sort(key=lambda m: (m.h, m.r, m.stage, m.hl, m.rl))
        # state: (h_mask, r_mask, matches tuple)
        beam: List[Tuple[int, int, Tuple[Match, ...]]] = [(0, 0, ())]
        for m in cands:
            h_bits = ((1 << m.hl) - 1) << m.h
            r_bits = ((1 << m.rl) - 1) << m.r
            new = []
            for hm, rm, chosen in beam:
                if not (hm & h_bits) and not (rm & r_bits):
                    new.append((hm | h_bits, rm | r_bits, chosen + (m,)))
            if new:
                beam.extend(new)
                beam.sort(key=lambda s: self._objective(s[2]), reverse=True)
                del beam[BEAM_WIDTH:]
        return list(max((s[2] for s in beam), key=self._objective))

    # ------------------------------------------------------------------
    # Scoring
    # ------------------------------------------------------------------

    def _word_weight(self, w: str) -> float:
        return (1.0 - self.delta) if w in FUNCTION_WORDS else self.delta

    def _segment_stats(self, hyp: List[str], ref: List[str]) -> dict:
        """Sufficient statistics for one (hyp, ref) pair."""
        matches = self._align(hyp, ref)

        w_h = w_r = 0.0
        for m in matches:
            sw = self.stage_weights[m.stage]
            w_h += sw * sum(self._word_weight(hyp[k]) for k in range(m.h, m.h + m.hl))
            w_r += sw * sum(self._word_weight(ref[k]) for k in range(m.r, m.r + m.rl))

        return {
            "matches_h": sum(m.hl for m in matches),
            "matches_r": sum(m.rl for m in matches),
            "chunks": self._count_chunks(matches),
            "w_matched_h": w_h,
            "w_matched_r": w_r,
            "w_len_h": sum(self._word_weight(w) for w in hyp),
            "w_len_r": sum(self._word_weight(w) for w in ref),
        }

    def _score_from_stats(self, st: dict) -> float:
        if st["matches_h"] == 0 or st["w_len_h"] == 0 or st["w_len_r"] == 0:
            return 0.0
        p = st["w_matched_h"] / st["w_len_h"]
        r = st["w_matched_r"] / st["w_len_r"]
        if p == 0 or r == 0:
            return 0.0
        fmean = (p * r) / (self.alpha * p + (1 - self.alpha) * r)
        mean_matches = 0.5 * (st["matches_h"] + st["matches_r"])
        frag = st["chunks"] / mean_matches if st["chunks"] else 0.0
        penalty = self.gamma * (frag ** self.beta)
        return (1.0 - penalty) * fmean

    def score_segment(self, hypothesis: str, references: Sequence[str]) -> float:
        hyp = normalize(hypothesis)
        best = 0.0
        for ref in references:
            best = max(best, self._score_from_stats(
                self._segment_stats(hyp, normalize(ref))))
        return best

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        """coco-caption interface: per-image score = best ref; corpus score =
        score of summed sufficient statistics over each image's best
        reference (the jar's EVAL aggregation)."""
        keys = list(gts.keys())
        per_image: List[float] = []
        agg = dict.fromkeys(_STATS_KEYS, 0.0)
        for key in keys:
            hyp = normalize(res[key][0])
            best_score, best_stats = 0.0, None
            for ref in gts[key]:
                st = self._segment_stats(hyp, normalize(ref))
                sc = self._score_from_stats(st)
                if best_stats is None or sc > best_score:
                    best_score, best_stats = sc, st
            per_image.append(best_score)
            for k in agg:
                agg[k] += best_stats[k]
        return self._score_from_stats(agg), per_image
