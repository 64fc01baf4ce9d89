"""SPICE scorer — native scene-graph harness.

The reference shells out to ``spice-1.0.jar`` (Stanford scene-graph parser +
CoreNLP dependency parsing + lmdb cache,
/root/reference/clipcap/eval/pycocoevalcap/spice/spice.py:60-93).  Full
dependency parsing is the documented hard part of replacing it
(SURVEY.md §2.2); this module implements the SPICE *harness* natively:

* a rule-based semantic-tuple extractor over PTB-tokenized captions —
  objects (head nouns), attributes (adjective/noun modifiers), and
  relations (verb and preposition links) from chunked noun phrases;
* the SPICE metric itself: F1 over the union of proposition tuples between
  the candidate graph and the merged reference graph (Anderson et al. 2016),
  with per-category subscores (All/Object/Attribute/Relation) in the same
  output shape the Java scorer emits.

The extractor is a deterministic approximation of the CoreNLP
scene-graph pipeline — scores are internally consistent and rank models the
same way, but absolute values can differ from Java SPICE.  The F-scoring
harness accepts externally parsed graphs too (``score_graphs``), so a
stronger parser can be dropped in without touching the metric.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

from clipcap_tpu.eval.meteor import FUNCTION_WORDS
from clipcap_tpu.eval.porter import porter_stem

Tuples = Set[Tuple[str, ...]]

# Small closed classes for the chunker.
ARTICLES = {"a", "an", "the", "some", "any", "this", "that", "these", "those",
            "his", "her", "its", "their", "our", "my", "your", "no", "each",
            "every", "both", "few", "several", "many", "much", "two", "three",
            "four", "five", "six", "seven", "eight", "nine", "ten"}
PREPOSITIONS = {"in", "on", "at", "by", "with", "near", "under", "over",
                "above", "below", "behind", "beside", "between", "among",
                "around", "inside", "outside", "against", "along", "across",
                "through", "onto", "into", "atop", "upon", "underneath",
                "next", "of", "to", "from"}
COPULAS = {"is", "are", "was", "were", "be", "been", "being", "looks",
           "seems", "appears"}
CONJUNCTIONS = {"and", "or"}

_ADJ_SUFFIXES = ("ful", "ous", "ish", "ive", "less", "able", "ible", "al",
                 "ic", "y", "ed", "en")

# Closed class of caption-frequent adjectives that don't end in an
# adjectival suffix — used to recognize coordinated attributes
# ("a red and blue umbrella") where the first conjunct would otherwise
# chunk as its own object NP.
ADJECTIVES = {
    "red", "blue", "green", "black", "white", "brown", "gray", "grey",
    "orange", "purple", "pink", "yellow", "golden", "dark", "light",
    "big", "small", "large", "little", "tall", "short", "long", "old",
    "young", "new", "wide", "narrow", "high", "low", "bright", "open",
    "full", "empty", "wet", "dry", "clean", "dirty",
}


def _looks_like_adjective(word: str) -> bool:
    return word in ADJECTIVES or (
        word.endswith(_ADJ_SUFFIXES) and word not in FUNCTION_WORDS
    )

# Common caption verbs, INFLECTED forms only — base forms ("park", "top",
# "watch", …) double as nouns far too often in captions to risk; captions
# overwhelmingly use 3rd-person/past/participial forms anyway.
VERBS = {
    "runs", "ran", "sits", "sat", "stands", "stood", "sleeps", "slept",
    "walks", "walked", "plays", "played", "holds", "held", "wears", "wore",
    "rides", "rode", "jumps", "jumped", "eats", "ate", "drinks", "drank",
    "flies", "flew", "swims", "swam", "drives", "drove", "watches",
    "watched", "carries", "carried", "catches", "caught", "throws",
    "threw", "kicks", "kicked", "hits", "reads", "writes", "wrote",
    "talks", "talked", "smiled", "waved", "pointed", "leans", "leaned",
    "rests", "rested", "grazes", "grazed", "perches", "perched", "lays",
    "lies", "hangs", "hung", "parked", "fills", "filled", "covers",
    "covered", "topped", "surrounds", "surrounded", "stares", "grabs",
    "pulls", "pushes",
}


def _is_verb(word: str, prev_word: str | None) -> bool:
    """Heuristic POS: finite/participial verb.  -ing words are verbs unless
    directly after an article ('a painting' is a noun)."""
    if word in VERBS:
        return True
    if word.endswith("ing") and len(word) > 4 and prev_word not in ARTICLES:
        return True
    return False


def _looks_adjectival(word: str, next_word: str) -> bool:
    """Heuristic POS: a word modifying a following noun."""
    if word in ARTICLES or word in PREPOSITIONS or word in COPULAS:
        return False
    if next_word is None:
        return False
    return True  # inside a noun phrase, all non-final content words modify the head


def extract_tuples(tokens: Sequence[str]) -> Tuples:
    """Caption tokens → semantic proposition tuples.

    Grammar sketch (greedy, left-to-right):
      NP  := ART* (MOD)* HEAD        → object(HEAD) + attribute(HEAD, MOD)*
      NP1 P NP2                      → relation(HEAD1, P, HEAD2)
      NP1 V NP2  (V = non-copula content verb between NPs)
                                     → relation(HEAD1, V, HEAD2)
      NP COP ADJ                     → attribute(HEAD, ADJ)
    """
    words = [w for w in tokens if w]
    tuples: Tuples = set()

    # Chunk into NPs and connectors.
    chunks: List[Tuple[str, object]] = []  # ("np", (head, mods)) | ("link", word)
    i = 0
    n = len(words)
    while i < n:
        w = words[i]
        if w in CONJUNCTIONS:
            chunks.append(("conj", w))
            i += 1
            continue
        if w in PREPOSITIONS or w in COPULAS or (w in FUNCTION_WORDS and w not in ARTICLES):
            chunks.append(("link", w))
            i += 1
            continue
        if _is_verb(w, words[i - 1] if i else None):
            chunks.append(("link", w))
            i += 1
            continue
        # NP: optional articles, then content words until a link/verb/end.
        j = i
        while j < n and words[j] in ARTICLES:
            j += 1
        content = []
        while j < n and words[j] not in PREPOSITIONS and words[j] not in COPULAS \
                and words[j] not in CONJUNCTIONS and words[j] not in FUNCTION_WORDS \
                and not (content and _is_verb(words[j], words[j - 1])):
            content.append(words[j])
            j += 1
        if content:
            head = content[-1]
            mods = content[:-1]
            chunks.append(("np", (head, mods)))
            i = j
        else:
            # bare function word not caught above
            chunks.append(("link", words[i]))
            i += 1

    # Coordinated attributes: an NP whose head is adjectival, joined by a
    # conjunction to a following NP, contributes its words as modifiers of
    # that NP's head ("a red and blue umbrella" → (umbrella, red),
    # (umbrella, blue) — Java SPICE distributes conjoined amods the same way).
    i = 0
    while i + 2 < len(chunks):
        if (chunks[i][0] == "np" and chunks[i + 1][0] == "conj"
                and chunks[i + 2][0] == "np"):
            head_a, mods_a = chunks[i][1]
            head_b, mods_b = chunks[i + 2][1]
            if _looks_like_adjective(head_a) and not _looks_like_adjective(head_b):
                chunks[i + 2] = ("np", (head_b, mods_a + [head_a] + mods_b))
                del chunks[i:i + 2]
                continue
        i += 1

    # Coordination groups: NP (conj NP)* — conjoined heads share relations
    # ("a man and a woman sitting on a bench" → both (man, sitting, bench)
    # and (woman, sitting, bench), matching the parser's distributed nsubj).
    group_of: Dict[int, List[int]] = {}
    idx = 0
    while idx < len(chunks):
        if chunks[idx][0] != "np":
            idx += 1
            continue
        group = [idx]
        j = idx
        while (j + 2 < len(chunks) and chunks[j + 1][0] == "conj"
               and chunks[j + 2][0] == "np"):
            j += 2
            group.append(j)
        for g in group:
            group_of[g] = group
        idx = j + 1

    # Emit object/attribute tuples.
    np_list = [(idx, c[1]) for idx, c in enumerate(chunks) if c[0] == "np"]
    for _, (head, mods) in np_list:
        tuples.add((head,))
        for m in mods:
            tuples.add((head, m))

    # Relations: NP (link...) NP with the link word(s) as the relation label.
    # Scan starts at the LAST member of a subject coordination group and the
    # relation is distributed over every subject head; a coordinated object
    # group likewise receives the relation on each of its heads.
    for a in range(len(chunks)):
        if chunks[a][0] != "np" or group_of[a][-1] != a:
            continue
        # find next NP
        links: List[str] = []
        for b in range(a + 1, len(chunks)):
            kind, val = chunks[b]
            if kind in ("link", "conj"):
                if kind == "link" and val not in COPULAS:
                    links.append(val)  # type: ignore[arg-type]
                if kind == "conj":
                    break  # conjunction with no object NP: new clause
                continue
            if kind == "np":
                # Relation label priority: verb, then preposition, then last
                # link ('girl standing on court' → (girl, standing, court)).
                rel = next((l for l in links if _is_verb(l, None)), None)
                if rel is None:
                    rel = next((l for l in links if l in PREPOSITIONS), None)
                if rel is None and links:
                    rel = links[-1]
                if rel:
                    for ga in group_of[a]:
                        for gb in group_of[b]:
                            tuples.add((chunks[ga][1][0], rel, chunks[gb][1][0]))
                break

    # Intransitive verbs: NP V with no object NP before a conjunction/end
    # becomes an attribute-like 2-tuple ('a cat sleeps' → (cat, sleeps)).
    for a in range(len(chunks)):
        if chunks[a][0] != "link" or not _is_verb(chunks[a][1], None):
            continue
        prev_np = next((chunks[b][1][0] for b in range(a - 1, -1, -1)
                        if chunks[b][0] == "np"), None)
        if prev_np is None:
            continue
        has_object = False
        for b in range(a + 1, len(chunks)):
            if chunks[b][0] == "conj":
                break
            if chunks[b][0] == "np":
                has_object = True
                break
        if not has_object:
            tuples.add((prev_np, chunks[a][1]))

    # Copular attributes: NP COP content-word
    for a in range(len(chunks) - 2):
        if chunks[a][0] == "np" and chunks[a + 1] == ("link", chunks[a + 1][1]) \
                and chunks[a + 1][1] in COPULAS and chunks[a + 2][0] == "np":
            head = chunks[a][1][0]
            attr_head, attr_mods = chunks[a + 2][1]
            tuples.add((head, attr_head))
            for m in attr_mods:
                tuples.add((head, m))

    return tuples


def _stem_tuple(t: Tuple[str, ...]) -> Tuple[str, ...]:
    return tuple(porter_stem(w) for w in t)


def _f1(cand: Tuples, ref: Tuples) -> Dict[str, float]:
    cand_s = {_stem_tuple(t) for t in cand}
    ref_s = {_stem_tuple(t) for t in ref}
    tp = len(cand_s & ref_s)
    p = tp / len(cand_s) if cand_s else 0.0
    r = tp / len(ref_s) if ref_s else 0.0
    f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {"p": p, "r": r, "f": f}


def _by_category(tuples: Tuples, arity: int) -> Tuples:
    return {t for t in tuples if len(t) == arity}


class Spice:
    def method(self) -> str:
        return "SPICE"

    def score_graphs(self, cand: Tuples, refs_merged: Tuples) -> Dict:
        """SPICE F-scores for pre-extracted tuple sets (per-category maps in
        the Java scorer's output shape, spice.py:80-93)."""
        return {
            "All": _f1(cand, refs_merged),
            "Object": _f1(_by_category(cand, 1), _by_category(refs_merged, 1)),
            "Attribute": _f1(_by_category(cand, 2), _by_category(refs_merged, 2)),
            "Relation": _f1(_by_category(cand, 3), _by_category(refs_merged, 3)),
        }

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[Dict]]:
        keys = list(gts.keys())
        per_image: List[Dict] = []
        fs: List[float] = []
        for key in keys:
            cand = extract_tuples(res[key][0].split())
            merged: Tuples = set()
            for ref in gts[key]:
                merged |= extract_tuples(ref.split())
            scores = self.score_graphs(cand, merged)
            per_image.append(scores)
            fs.append(scores["All"]["f"])
        mean_f = sum(fs) / len(fs) if fs else 0.0
        return mean_f, per_image
