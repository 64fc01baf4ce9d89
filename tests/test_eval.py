"""Native caption-metric harness: tokenizer behavior, scorer math sanity,
and the full evaluate_metrics_from_lists surface."""
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# PTB tokenization
# ---------------------------------------------------------------------------


def test_ptb_tokenize_basic():
    from clipcap_tpu.eval.tokenization import ptb_tokenize_line

    assert ptb_tokenize_line("A man, riding a horse.") == ["a", "man", "riding", "a", "horse"]
    # Brackets survive: CoreNLP -lowerCase emits "-lrb-", which the
    # reference's UPPERCASE strip list misses (ptbtokenizer.py:25-26).
    assert ptb_tokenize_line("The dog's ball (red).") == [
        "the", "dog", "'s", "ball", "-lrb-", "red", "-rrb-"]
    assert ptb_tokenize_line("I can't swim...") == ["i", "ca", "n't", "swim"]
    assert ptb_tokenize_line("") == []


def test_ptb_tokenize_corenlp_fixtures():
    """Golden fixtures for the full reference pipeline output (PTBTokenizer
    -preserveLines -lowerCase → strip PUNCTUATIONS).  No JVM exists in this
    environment, so these are hand-derived from the documented PTB/CoreNLP
    behavior (assimilation splits, clitic splits, bracket escapes surviving
    the case-mismatched strip, number/acronym tokens) rather than captured
    jar output — each case notes the rule it pins."""
    from clipcap_tpu.eval.tokenization import ptb_tokenize_line

    fixtures = [
        # clitic splits: n't keeps the n, possessive 's separates
        ("A man doesn't like the dog's bone.",
         "a man does n't like the dog 's bone"),
        ("It's the cat's toy, isn't it?",
         "it 's the cat 's toy is n't it"),
        # irregular clitic stems: can't -> ca n't, won't -> wo n't
        ("Can't stop, won't stop!", "ca n't stop wo n't stop"),
        # assimilations: cannot/gonna/wanna/gotta split
        ("I cannot see; he's gonna jump.", "i can not see he 's gon na jump"),
        ("We wanna play, you gotta wait.", "we wan na play you got ta wait"),
        # bracket escapes survive the strip (case-mismatch quirk)
        ("A dog (a brown one) runs.", "a dog -lrb- a brown one -rrb- runs"),
        ("Scores [10] {high}.", "scores -lsb- 10 -rsb- -lcb- high -rcb-"),
        # numbers keep internal . , : — stripping happens token-level only
        ("It costs 1,000.50 at 2:30 pm.", "it costs 1,000.50 at 2:30 pm"),
        ("about 3.5 meters", "about 3.5 meters"),
        # acronyms with internal periods stay one token
        ("the u.s. flag at 9 a.m.", "the u.s. flag at 9 a.m."),
        # hyphenated words stay whole; standalone dashes are stripped
        ("a state-of-the-art - model -- yes", "a state-of-the-art model yes"),
        # ellipsis and terminal punctuation stripped
        ("wait... what?!", "wait what"),
        # contractions with 're/'ve/'ll/'d/'m
        ("They're we've you'll I'd I'm.", "they 're we 've you 'll i 'd i 'm"),
    ]
    for raw, expected in fixtures:
        assert " ".join(ptb_tokenize_line(raw)) == expected, raw


def test_ptb_tokenizer_interface():
    from clipcap_tpu.eval.tokenization import PTBTokenizer

    tok = PTBTokenizer()
    out = tok.tokenize({0: [{"caption": "A Cat!"}, {"caption": "Two dogs."}]})
    assert out == {0: ["a cat", "two dogs"]}


# ---------------------------------------------------------------------------
# Scorers
# ---------------------------------------------------------------------------


def _gts_res(pairs):
    gts = {i: refs for i, (_, refs) in enumerate(pairs)}
    res = {i: [hyp] for i, (hyp, _) in enumerate(pairs)}
    return gts, res


def test_bleu_perfect_match():
    from clipcap_tpu.eval.bleu import Bleu

    gts, res = _gts_res([
        ("a man rides a horse", ["a man rides a horse", "a person on a horse"]),
        ("a cat sits on a mat", ["a cat sits on a mat", "a kitten on a rug"]),
    ])
    scores, per_image = Bleu(4).compute_score(gts, res)
    for s in scores:
        assert s == pytest.approx(1.0, abs=1e-6)
    assert len(per_image) == 4 and len(per_image[0]) == 2


def test_bleu_partial_match_hand_computed():
    from clipcap_tpu.eval.bleu import Bleu

    # hyp: "the cat sat" vs ref: "the cat sat down"
    # 1-gram: 3/3, 2-gram: 2/2, 3-gram: 1/1; BP = exp(1 - 4/3)
    gts, res = _gts_res([("the cat sat", ["the cat sat down"])])
    scores, _ = Bleu(4).compute_score(gts, res)
    bp = math.exp(1 - 4 / 3)
    assert scores[0] == pytest.approx(bp * 1.0, rel=1e-5)
    assert scores[1] == pytest.approx(bp * 1.0, rel=1e-5)
    assert scores[2] == pytest.approx(bp * 1.0, rel=1e-5)


def test_rouge_l():
    from clipcap_tpu.eval.rouge import Rouge

    gts, res = _gts_res([("the cat sat on the mat", ["the cat sat on the mat"])])
    score, scores = Rouge().compute_score(gts, res)
    assert score == pytest.approx(1.0)

    # LCS("a b c d", "a c b d") = 3 ("a b d" or "a c d")
    gts, res = _gts_res([("a b c d", ["a c b d"])])
    score, _ = Rouge().compute_score(gts, res)
    p = r = 3 / 4
    beta = 1.2
    expected = (1 + beta**2) * p * r / (r + beta**2 * p)
    assert score == pytest.approx(expected, rel=1e-6)


def test_cider_identical_corpus():
    from clipcap_tpu.eval.cider import Cider

    gts, res = _gts_res([
        ("a man rides a horse", ["a man rides a horse", "a man rides a horse"]),
        ("a cat sits on a mat", ["a cat sits on a mat", "a cat sits on a mat"]),
        ("a red bus in town", ["a red bus in town", "a red bus in town"]),
    ])
    score, scores = Cider().compute_score(gts, res)
    # Perfect match → cosine 1 per n with nonzero idf terms → 10.0
    assert score == pytest.approx(10.0, abs=1e-6)
    assert len(scores) == 3


def test_cider_mismatch_lower():
    from clipcap_tpu.eval.cider import Cider

    gts, res = _gts_res([
        ("a dog", ["a man rides a horse"]),
        ("a cat sits on a mat", ["a cat sits on a mat"]),
    ])
    score, scores = Cider().compute_score(gts, res)
    assert scores[0] < scores[1]


def test_meteor_exact_and_stem():
    from clipcap_tpu.eval.meteor import Meteor

    m = Meteor()
    # Stem stage: "rides" vs "riding" matches via Snowball stems.
    s_stem = m.score_segment("the man rides", ["the man riding"])
    s_none = m.score_segment("the man rides", ["the man walks"])
    assert s_stem > s_none

    # Word-order fragmentation lowers the score.
    s_ordered = m.score_segment("a b c d e f", ["a b c d e f"])
    s_shuffled = m.score_segment("f e d c b a", ["a b c d e f"])
    assert s_ordered > s_shuffled


def test_meteor_analytic_fixtures():
    """Hand-derived scores from the METEOR 1.5 formulas (Denkowski & Lavie
    2011 §2; English defaults alpha=.85 beta=.2 gamma=.6 delta=.75, stage
    weights 1/.6/.8/.6).  Each expected value is written out from the
    published scoring equations, independent of the implementation.

    The jar itself cannot run here (no JVM, no network for the jar blob —
    see .MISSING_LARGE_BLOBS in the reference), so these fixtures pin the
    *algorithm*; jar-bitwise agreement additionally needs the jar's
    corpus-derived function-word list and WordNet data (documented in
    eval/meteor.py).
    """
    from clipcap_tpu.eval.meteor import Meteor

    m = Meteor()

    # A: identical sentences. Tokens: the(f) cat sat on(f) the(f) mat.
    # P = R = 1, fmean = 1, matches = 6, chunks = 1,
    # pen = .6 * (1/6)^.2 → score = 1 - pen.
    expected_a = 1.0 - 0.6 * (1.0 / 6.0) ** 0.2
    got_a = m.score_segment("the cat sat on the mat", ["the cat sat on the mat"])
    assert abs(got_a - expected_a) < 1e-12

    # B: one stem match. the(f=.25) man(.75) rides~riding (stem, w=.6).
    # w_matched = .25 + .75 + .6*.75 = 1.45 both sides, w_len = 1.75,
    # P = R = 29/35, 1 chunk over 3 matches.
    expected_b = (1.0 - 0.6 * (1.0 / 3.0) ** 0.2) * (29.0 / 35.0)
    got_b = m.score_segment("the man rides", ["the man riding"])
    assert abs(got_b - expected_b) < 1e-12

    # C: full swap. "b a" vs "a b": both matched, 2 chunks of 2 matches →
    # frag = 1, pen = .6; P = R = 1.
    expected_c = 1.0 - 0.6
    got_c = m.score_segment("b a", ["a b"])
    assert abs(got_c - expected_c) < 1e-12

    # D: no matches at all.
    assert m.score_segment("xyzzy", ["qwerty"]) == 0.0


def test_meteor_paraphrase_stage(tmp_path):
    from clipcap_tpu.eval.meteor import Meteor

    table = tmp_path / "paraphrase.txt"
    table.write_text("sofa ||| couch\nnext to ||| beside\n")
    m = Meteor(paraphrase_path=str(table))
    base = Meteor()

    # Single-word paraphrase: sofa ↔ couch (w=.6 content match on both
    # sides): w_matched = 1.5 + .6*.75 = 1.95, w_len = 2.25, 1 chunk of 5.
    expected = (1.0 - 0.6 * (1.0 / 5.0) ** 0.2) * (1.95 / 2.25)
    got = m.score_segment("a cat on the sofa", ["a cat on the couch"])
    assert abs(got - expected) < 1e-12
    assert got > base.score_segment("a cat on the sofa", ["a cat on the couch"])

    # Multi-word phrase match: "next to" (2 words) ↔ "beside" (1 word,
    # itself a function word). hyp: a(f) dog next to(f) a(f) tree; all
    # matched, single chunk.
    # w_matched_h = .25+.75+.6*(.75+.25)+.25+.75 = 2.6, w_len_h = 3.0
    # w_matched_r = .25+.75+.6*.25+.25+.75 = 2.15,      w_len_r = 2.25
    # matches_h = 6, matches_r = 5 → frag = 1 / 5.5.
    p = 2.6 / 3.0
    r = 2.15 / 2.25
    fmean = p * r / (0.85 * p + 0.15 * r)
    expected2 = (1.0 - 0.6 * (1.0 / 5.5) ** 0.2) * fmean
    got2 = m.score_segment("a dog next to a tree", ["a dog beside a tree"])
    assert abs(got2 - expected2) < 1e-12
    # table direction is symmetric (jar matches both ways)
    got3 = m.score_segment("a dog beside a tree", ["a dog next to a tree"])
    assert got3 > base.score_segment("a dog beside a tree",
                                     ["a dog next to a tree"])


def test_meteor_beam_alignment_is_optimal():
    """The aligner must find the jar objective's optimum: maximize words
    covered, then minimize chunks, then minimize total start distance.
    Brute-force all non-conflicting match subsets on small sentences."""
    import random

    from clipcap_tpu.eval.meteor import Meteor

    m = Meteor()

    def brute(hyp, ref):
        cands = m._candidates(hyp, ref)
        best = ()

        def rec(k, hm, rm, chosen):
            nonlocal best
            if k == len(cands):
                if m._objective(tuple(chosen)) > m._objective(best):
                    best = tuple(chosen)
                return
            c = cands[k]
            hb = ((1 << c.hl) - 1) << c.h
            rb = ((1 << c.rl) - 1) << c.r
            rec(k + 1, hm, rm, chosen)
            if not (hm & hb) and not (rm & rb):
                chosen.append(c)
                rec(k + 1, hm | hb, rm | rb, chosen)
                chosen.pop()

        rec(0, 0, 0, [])
        return best

    rng = random.Random(0)
    vocab = "a cat dog sat sit sitting on the mat rug big red".split()
    for _ in range(100):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 7))]
        ref = [rng.choice(vocab) for _ in range(rng.randint(1, 7))]
        got = m._align(hyp, ref)
        assert m._objective(tuple(got)) == m._objective(brute(hyp, ref)), (hyp, ref)


def test_snowball_stemmer_matches_nltk():
    """The METEOR stem stage uses the Snowball English (Porter2) stemmer —
    the same algorithm as the jar's tartarus englishStemmer. nltk ships an
    independent implementation: use it as the oracle over a broad generated
    vocabulary. (nltk's region bookkeeping is string-based and diverges from
    the official position-based semantics on a handful of *synthetic* words,
    e.g. fabricated '-ization' forms — those are excluded; ours follows the
    official algorithm.)"""
    import re

    nltk = pytest.importorskip("nltk")
    from nltk.stem.snowball import SnowballStemmer

    from clipcap_tpu.eval.snowball import snowball_stem

    oracle = SnowballStemmer("english")
    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    words = set(re.findall(r"[a-z']+", open(survey).read().lower()))
    words |= set("""
        running ran runs easily fairly sky skies dying lying tying news
        proceed exceeded succeeding inning outing canning herring earring
        generate generated generously communication communities arsenal
        relational conditional rational valency hesitancy digitizer
        agreement disagreement hopefulness goodness revival allowance
        inference airliner gyroscopic adjustable defensible irritant
        replacement adjustment dependent adoption communism activate
        angularity homologous effective bowdlerize probate cease controlling
        rolling ties cries gas this by yellow vying enjoy enjoyed boys
        conspicuous absolutely fluently luxuriated hopping hopeful
    """.split())
    for base in list(words):
        for suf in ("", "s", "es", "ed", "ing", "ly", "ness", "ment",
                    "ful", "ies", "ied", "er", "ous", "ive", "'s"):
            words.add(base + suf)
    checked, mismatched = 0, []
    for w in sorted(words):
        if not re.fullmatch(r"[a-z'][a-z']*", w):
            continue
        checked += 1
        got, want = snowball_stem(w), oracle.stem(w)
        if got != want:
            mismatched.append((w, got, want))
    # nltk maintains its regions as sliced strings and mistracks them
    # through some suffix replacements (e.g. 'relationally' → nltk
    # 'relate' vs official position semantics 'relat'); it also skips the
    # official post-step-1a exception check on inflected forms.  Those
    # divergences are nltk's, verified by hand against the published
    # position-based definition — bound them rather than chase them.
    assert checked > 10000
    assert len(mismatched) < 0.005 * checked, mismatched[:20]

    # Exact agreement required on plain high-frequency morphology.
    for w in ("running runs ran easily skies dying news proceeded riding "
              "rides ride caresses ponies cats feed agreed sized hopping "
              "tanned falling hissing failing filing happy generously "
              "conditional rational hesitancy communication").split():
        assert snowball_stem(w) == oracle.stem(w), w


def test_meteor_compute_score_interface():
    from clipcap_tpu.eval.meteor import Meteor

    gts, res = _gts_res([
        ("a man on a horse", ["a man rides a horse", "a person on a horse"]),
        ("a cat", ["a dog", "a cat"]),
    ])
    score, per_image = Meteor().compute_score(gts, res)
    assert 0.0 < score <= 1.0
    assert len(per_image) == 2


def test_porter_stemmer():
    from clipcap_tpu.eval.porter import porter_stem

    assert porter_stem("riding") == porter_stem("rides") == porter_stem("ride")
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("cat") == "cat"


def test_spice_tuples_and_f1():
    from clipcap_tpu.eval.spice import Spice, extract_tuples

    t = extract_tuples("a red car on the street".split())
    assert ("car",) in t
    assert ("car", "red") in t
    assert ("car", "on", "street") in t

    gts, res = _gts_res([
        ("a red car on the street", ["a red car on the street",
                                     "a crimson automobile parked outside"]),
    ])
    score, per_image = Spice().compute_score(gts, res)
    assert 0.0 < score <= 1.0
    assert set(per_image[0].keys()) == {"All", "Object", "Attribute", "Relation"}


# ---------------------------------------------------------------------------
# Full facade
# ---------------------------------------------------------------------------


def test_evaluate_metrics_from_lists_end_to_end():
    from clipcap_tpu.eval.metrics import evaluate_metrics_from_lists

    preds = ["a man rides a horse", "a cat sits on the mat"]
    refs = [
        ["a man rides a horse", "a man on a horse", "a person rides a horse",
         "a rider on a horse", "a horse carries a man"],
        ["a cat sits on the mat", "a cat on a mat", "a kitten rests on a rug",
         "the cat is sitting", "a small cat on the mat"],
    ]
    metrics, per_file = evaluate_metrics_from_lists(preds, refs)
    for key in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "SPICE", "SPIDEr"):
        assert key in metrics, key
    assert metrics["SPIDEr"] == pytest.approx(
        0.5 * (metrics["CIDEr"] + metrics["SPICE"]), abs=1e-9
    )
    assert metrics["Bleu_1"] > 0.9
    assert len(per_file) == 2
    # Five-reference assertion preserved (reference metrics.py:140).
    with pytest.raises(AssertionError):
        evaluate_metrics_from_lists(["x"], [["only", "four", "refs", "here"]])


def test_evaluate_metrics_csv_front_end(tmp_path):
    import csv

    from clipcap_tpu.eval.metrics import evaluate_metrics

    pred_rows = [{"file_name": f"f{i}.wav", "caption_predicted": c}
                 for i, c in enumerate(["a man rides a horse", "a cat on a mat"])]
    ref_rows = []
    for i, base in enumerate(["a man rides a horse", "a cat on a mat"]):
        row = {"file_name": f"f{i}.wav"}
        for j in range(1, 6):
            row[f"caption_reference_{j:02d}"] = base
        ref_rows.append(row)

    out = evaluate_metrics(pred_rows, ref_rows)
    assert "spider" in out and "cider" in out
    assert out["bleu_1"]["score"] == pytest.approx(1.0, abs=1e-6)
    assert set(out["cider"]["scores"].keys()) == {"f0.wav", "f1.wav"}


# ---------------------------------------------------------------------------
# Oracle parity: score the same corpora with the reference's vendored
# pure-Python scorers (loaded standalone from /root/reference — the heavy
# package __init__ is never executed) and require near-bitwise agreement.
# ---------------------------------------------------------------------------

REFERENCE_EVAL = "/root/reference/clipcap/eval/pycocoevalcap"


def _load_reference_scorers():
    import importlib.util
    import sys
    import types

    if not os.path.isdir(REFERENCE_EVAL):
        pytest.skip("reference checkout not available")

    for name in ("clipcap", "clipcap.eval", "clipcap.eval.pycocoevalcap",
                 "clipcap.eval.pycocoevalcap.bleu",
                 "clipcap.eval.pycocoevalcap.cider",
                 "clipcap.eval.pycocoevalcap.rouge"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m

    def load(name, path):
        full = f"clipcap.eval.pycocoevalcap.{name}"
        if full in sys.modules and hasattr(sys.modules[full], "__file__"):
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    load("bleu.bleu_scorer", f"{REFERENCE_EVAL}/bleu/bleu_scorer.py")
    bleu = load("bleu.bleu", f"{REFERENCE_EVAL}/bleu/bleu.py")
    load("cider.cider_scorer", f"{REFERENCE_EVAL}/cider/cider_scorer.py")
    cider = load("cider.cider", f"{REFERENCE_EVAL}/cider/cider.py")
    rouge = load("rouge.rouge", f"{REFERENCE_EVAL}/rouge/rouge.py")
    return bleu.Bleu, cider.Cider, rouge.Rouge


def _random_corpus(rng, n_items, n_refs):
    vocab = ("a the dog cat man woman runs sits sleeps park couch red blue "
             "big small on in under near with ball tree street water").split()

    def sent():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))

    gts = {f"id{i}": [sent() for _ in range(n_refs)] for i in range(n_items)}
    res = {f"id{i}": [sent()] for i in range(n_items)}
    # make some predictions (near-)perfect to exercise the high-score paths
    for i in range(0, n_items, 3):
        res[f"id{i}"] = [gts[f"id{i}"][0]]
    return gts, res


def test_scorers_match_reference_oracle():
    import random

    RefBleu, RefCider, RefRouge = _load_reference_scorers()
    from clipcap_tpu.eval.bleu import Bleu
    from clipcap_tpu.eval.cider import Cider
    from clipcap_tpu.eval.rouge import Rouge

    rng = random.Random(7)
    for trial in range(3):
        gts, res = _random_corpus(rng, n_items=17 + trial, n_refs=2 + trial)

        ref_b, _ = RefBleu(4).compute_score(gts, res)
        our_b, _ = Bleu(4).compute_score(gts, res)
        np.testing.assert_allclose(our_b, ref_b, rtol=1e-10, atol=1e-12)

        ref_c, ref_cs = RefCider().compute_score(gts, res)
        our_c, our_cs = Cider().compute_score(gts, res)
        np.testing.assert_allclose(our_c, ref_c, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(our_cs, float).ravel(),
                                   np.asarray(ref_cs, float).ravel(),
                                   rtol=1e-9, atol=1e-12)

        ref_r, _ = RefRouge().compute_score(gts, res)
        our_r, _ = Rouge().compute_score(gts, res)
        np.testing.assert_allclose(our_r, ref_r, rtol=1e-10, atol=1e-12)


def test_spice_extraction_canonical_captions():
    """Behavioral contract for the rule-based scene-graph extractor:
    canonical caption shapes must yield the right objects, attributes, and
    relations (subjects stay objects when followed by verbs)."""
    from clipcap_tpu.eval.spice import extract_tuples

    t = extract_tuples("a brown dog runs in the green park".split())
    assert ("dog",) in t and ("park",) in t
    assert ("dog", "brown") in t and ("park", "green") in t
    assert ("dog", "runs", "park") in t

    t = extract_tuples("a young girl standing on top of a tennis court".split())
    assert ("girl",) in t and ("girl", "young") in t
    assert ("court", "tennis") in t

    # intransitive verb → attribute-like 2-tuple
    t = extract_tuples("a cat sleeps".split())
    assert ("cat",) in t and ("cat", "sleeps") in t

    # -ing after an article is a noun, not a verb
    t = extract_tuples("a painting of a red house".split())
    assert ("painting",) in t and ("painting", "of", "house") in t

    # copular attribute
    t = extract_tuples("the dog is brown".split())
    assert ("dog", "brown") in t


def test_spice_relative_clause_subject_binding():
    """A LEADING relative pronoun binds the predicate to the nearest noun —
    subject lifting through PP chains must not fire (round-4 review
    finding: 'a woman with a dog that is on a leash' wrongly lifted to
    (woman, on, leash)).  After a verb, 'that' is a determiner and normal
    lifting applies; of-chain container lifting is unaffected."""
    from clipcap_tpu.eval.spice import extract_tuples

    t = extract_tuples("a woman with a dog that is on a leash".split())
    assert ("dog", "on", "leash") in t and ("woman", "on", "leash") not in t
    assert ("woman", "with", "dog") in t

    t = extract_tuples("a woman with a dog that is chasing a ball".split())
    assert ("dog", "chasing", "ball") in t
    assert ("woman", "chasing", "ball") not in t

    # relative-clause subject survives VP coordination
    t = extract_tuples("a dog that is sitting and wearing a hat".split())
    assert ("dog", "sitting") in t and ("dog", "wearing", "hat") in t

    # copular predicate WITHOUT a rel pronoun still lifts to the clause
    # subject through non-of chains
    t = extract_tuples("a man in a red hat is on a motorcycle".split())
    assert ("man", "on", "motorcycle") in t

    # container lifting through of-chains still applies under a rel clause
    t = extract_tuples("a bowl of soup that is on the counter".split())
    assert ("bowl", "on", "counter") in t

    # post-verb 'that' is a determiner, not a clause opener
    t = extract_tuples("a boy chasing that ball".split())
    assert ("boy", "chasing", "ball") in t


def test_spice_score_sanity():
    from clipcap_tpu.eval.spice import Spice

    gts = {"a": ["a brown dog runs in the green park"] * 5}
    res_same = {"a": ["a brown dog runs in the green park"]}
    res_diff = {"a": ["a blue airplane flies over the ocean"]}
    perfect, _ = Spice().compute_score(gts, res_same)
    assert perfect == 1.0
    poor, _ = Spice().compute_score(gts, res_diff)
    assert poor < 0.35


def test_generate_scores_standalone_driver():
    """utils/scoring.py (reference utils/scoring.py:4-40): all five scorers,
    per-item score dicts in the reference's output shape."""
    from clipcap_tpu.utils.scoring import generate_scores

    gts = {"x": ["a dog runs in the park"] * 5,
           "y": ["a cat sleeps on the couch"] * 5}
    res = {"x": ["a dog runs in the park"], "y": ["a bird flies away"]}
    out = generate_scores(gts, res)
    methods = [o["method"] for o in out]
    assert methods == ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
                       "METEOR", "ROUGE_L", "CIDEr", "SPICE"]
    for o in out:
        assert len(list(o["scores"])) == 2
    bleu1 = out[0]
    assert bleu1["scores"][0] > 0.99  # exact match


def test_spice_shared_multiword_collapse():
    """Both extractors must tokenize identically: the chunker and the
    parser share ONE multiword-preposition collapse (review r5 — two
    hand-maintained copies can drift)."""
    from clipcap_tpu.eval import spice, spice_parser

    assert spice_parser.collapse_multiword is spice.collapse_multiword
    assert spice.collapse_multiword("a cat in front of a tv".split()) == [
        "a", "cat", "in front of", "a", "tv"]


def test_spice_model_cache_env_override(monkeypatch):
    """CLIPCAP_SPICE_MODEL_CACHE pins the single cache location; without
    it the packaged copy is tried first, then the user cache dir (for
    read-only installs)."""
    from clipcap_tpu.eval import spice_parser

    monkeypatch.setenv("CLIPCAP_SPICE_MODEL_CACHE", "/tmp/x.gz")
    assert spice_parser._cache_paths() == ["/tmp/x.gz"]
    monkeypatch.delenv("CLIPCAP_SPICE_MODEL_CACHE")
    paths = spice_parser._cache_paths()
    assert len(paths) == 2 and paths[0].endswith(
        "eval/data/spice_model_cache.json.gz")


def test_spice_coordination_distribution():
    """Conjunction handling: coordinated subjects/objects share relations;
    coordinated adjectives distribute onto the shared head (the
    VERDICT-flagged weak spots of the rule-based extractor)."""
    from clipcap_tpu.eval.spice import extract_tuples

    t = extract_tuples("a man and a woman sitting on a bench".split())
    assert ("man", "sitting", "bench") in t
    assert ("woman", "sitting", "bench") in t

    t = extract_tuples("a red and blue umbrella on the beach".split())
    assert ("umbrella", "red") in t and ("umbrella", "blue") in t
    assert ("red",) not in t  # adjective must not leak as an object

    t = extract_tuples("a pizza is topped with cheese and mushrooms".split())
    assert ("pizza", "topped", "cheese") in t
    assert ("pizza", "topped", "mushrooms") in t

    # Regression (ADVICE r2): noun conjuncts whose head happens to match the
    # adjectival-suffix heuristic ("boy", "baby", "lady") must NOT merge as
    # coordinated attributes — both heads keep their objects and share the
    # relation, as Java SPICE's distributed nsubj does.
    t = extract_tuples("a boy and a girl sitting on a bench".split())
    assert ("boy",) in t and ("girl",) in t
    assert ("boy", "sitting", "bench") in t
    assert ("girl", "sitting", "bench") in t
    assert ("girl", "boy") not in t

    # Regression (review r3): a singular modifier under a plural head at a
    # conjunction boundary is a compound noun ("palm trees", "tennis
    # courts"), NOT an elided asyndetic conjunct — it must stay an
    # attribute, not split into a standalone object that the coordination
    # group then distributes relations to.
    t = extract_tuples("rows of palm trees and a bench".split())
    assert ("trees", "palm") in t
    assert ("palm",) not in t
    # Plural modifiers are still real asyndetic lists.
    t = extract_tuples("plates cups and bowls on a table".split())
    assert ("plates", "on", "table") in t
    assert ("cups", "on", "table") in t
    assert ("bowls", "on", "table") in t


def test_spice_extractor_accuracy_floor():
    """Hand-annotated scene-graph tuples (Anderson et al. 2016 semantics:
    object = head noun, attribute = (head, mod), relation = (subj, rel,
    obj)) over typical COCO-style captions.  No JVM exists offline, so the
    gold graphs are hand-derived per the published SPICE semantics rather
    than captured from spice-1.0.jar; this quantifies extractor quality and
    pins it against regressions (stemming applied on both sides, as the
    scorer does)."""
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.eval.spice import extract_tuples

    gold = [
        ("a brown dog runs in the green park",
         {("dog",), ("park",), ("dog", "brown"), ("park", "green"),
          ("dog", "runs", "park")}),
        ("two men playing frisbee on a sunny field",
         {("men",), ("men", "two"), ("frisbee",), ("field",),
          ("field", "sunny"), ("men", "playing", "frisbee")}),
        ("a cat sleeps on a red couch",
         {("cat",), ("couch",), ("couch", "red"), ("cat", "sleeps", "couch")}),
        ("a man and a woman riding horses on the beach",
         {("man",), ("woman",), ("horses",), ("beach",),
          ("man", "riding", "horses"), ("woman", "riding", "horses")}),
        ("a large white airplane parked at an airport",
         {("airplane",), ("airport",), ("airplane", "large"),
          ("airplane", "white"), ("airplane", "parked", "airport")}),
        ("a pizza topped with cheese and pepperoni",
         {("pizza",), ("cheese",), ("pepperoni",),
          ("pizza", "topped", "cheese"), ("pizza", "topped", "pepperoni")}),
        ("a young girl holds a red and yellow kite",
         {("girl",), ("kite",), ("girl", "young"), ("kite", "red"),
          ("kite", "yellow"), ("girl", "holds", "kite")}),
        ("the dog is brown", {("dog",), ("dog", "brown")}),
        ("a group of people standing around a table",
         {("group",), ("people",), ("table",), ("group", "of", "people"),
          ("people", "standing", "table")}),
        ("a bird perched on a tree branch",
         {("bird",), ("branch",), ("branch", "tree"),
          ("bird", "perched", "branch")}),
    ]

    def stem_set(ts):
        return {tuple(porter_stem(w) for w in t) for t in ts}

    tp = fp = fn = 0
    for caption, want in gold:
        got_s = stem_set(extract_tuples(caption.split()))
        want_s = stem_set(want)
        tp += len(got_s & want_s)
        fp += len(got_s - want_s)
        fn += len(want_s - got_s)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    # Current measured: keep a floor so regressions fail loudly.
    assert precision >= 0.85, (precision, recall)
    assert recall >= 0.90, (precision, recall)


def test_meteor_synonym_stage_wordnet_format(tmp_path):
    """Synonym stage driven by the jar's resource formats: english.synsets
    (word id id ...) + english.exceptions (variant base ...).  Two words
    match iff their synset-id sets intersect; exceptions inherit their base
    forms' ids.  Score checked analytically (stage weight 0.8)."""
    from clipcap_tpu.eval.meteor import Meteor, Synonyms

    synsets = tmp_path / "english.synsets"
    synsets.write_text(
        "big 100 200\nlarge 200 300\ndog 400\nhound 400\n"
        "goose 700\nbird 700 800\n")
    exceptions = tmp_path / "english.exceptions"
    exceptions.write_text("geese goose\n")
    syn = Synonyms.load(str(synsets), str(exceptions))

    assert syn.are_synonyms("big", "large")
    assert syn.are_synonyms("dog", "hound")
    assert not syn.are_synonyms("big", "dog")
    assert syn.are_synonyms("geese", "bird")  # via inherited goose ids

    m = Meteor(synonyms=syn)
    # "a big dog" vs "a large hound": a=exact (w 1.0), big~large and
    # dog~hound synonym (w 0.8); function 'a' weight .25, content .75.
    w_matched = 1.0 * 0.25 + 0.8 * 0.75 + 0.8 * 0.75
    w_len = 0.25 + 0.75 + 0.75
    p = w_matched / w_len
    fmean = p * p / (0.85 * p + 0.15 * p)
    expected = (1.0 - 0.6 * (1.0 / 3.0) ** 0.2) * fmean
    got = m.score_segment("a big dog", ["a large hound"])
    assert abs(got - expected) < 1e-12
    assert got > Meteor().score_segment("a big dog", ["a large hound"])

    # Flat round-trip (the form materialized for the C++ core).
    flat = tmp_path / "flat.txt"
    syn.save_flat(str(flat))
    syn2 = Synonyms.load_flat(str(flat))
    assert syn2.are_synonyms("geese", "bird")
    assert Meteor(synonyms=syn2).score_segment(
        "a big dog", ["a large hound"]) == got


def test_meteor_function_words_file(tmp_path):
    """A function-word list in the jar's en.words format (one word per
    line, # comments) replaces the built-in closed-class fallback."""
    from clipcap_tpu.eval.meteor import Meteor, load_function_words

    f = tmp_path / "en.words"
    f.write_text("# METEOR function words\na\nthe\ndog\n")
    words = load_function_words(str(f))
    assert words == {"a", "the", "dog"}

    custom = Meteor(function_words=words)
    default = Meteor()
    # 'dog' demoted to function word changes the weighted stats.
    got = custom.score_segment("a dog runs", ["a dog walks"])
    # matched: a (.25) + dog (.25 as function); unmatched runs (content .75)
    w_matched = 0.25 + 0.25
    w_len = 0.25 + 0.25 + 0.75
    p = w_matched / w_len
    fmean = p * p / (0.85 * p + 0.15 * p)
    expected = (1.0 - 0.6 * (1.0 / 2.0) ** 0.2) * fmean
    assert abs(got - expected) < 1e-12
    assert got != default.score_segment("a dog runs", ["a dog walks"])


def test_meteor_resource_defaults_via_env(tmp_path, monkeypatch):
    """get_meteor picks up init-fetched resources through the env
    overrides and configures whichever core it returns with them."""
    from clipcap_tpu.eval import meteor as M

    synsets = tmp_path / "english.synsets"
    synsets.write_text("sofa 1\ncouch 1\n")
    fwords = tmp_path / "en.words"
    fwords.write_text("a\nthe\non\n")
    monkeypatch.setenv("CLIPCAP_METEOR_SYNONYMS", str(synsets))
    monkeypatch.setenv("CLIPCAP_METEOR_FUNCTION_WORDS", str(fwords))
    monkeypatch.delenv("CLIPCAP_METEOR_PARAPHRASE", raising=False)

    scorer = M.get_meteor(paraphrase_path=None)
    got = scorer.score_segment("a cat on the sofa", ["a cat on the couch"])
    # synonym stage must fire: sofa~couch share synset 1 (weight 0.8).
    w_matched = 0.25 + 0.75 + 0.25 + 0.25 + 0.8 * 0.75
    w_len = 0.25 + 0.75 + 0.25 + 0.25 + 0.75
    p = w_matched / w_len
    fmean = p * p / (0.85 * p + 0.15 * p)
    expected = (1.0 - 0.6 * (1.0 / 5.0) ** 0.2) * fmean
    assert abs(got - expected) < 1e-9

    # Python fallback scorer agrees exactly with whatever core was used.
    py = M.Meteor(synonyms=M.Synonyms.load(str(synsets)),
                  function_words=M.load_function_words(str(fwords)))
    assert abs(py.score_segment("a cat on the sofa",
                                ["a cat on the couch"]) - got) < 1e-12


def test_init_extracts_meteor_jar_resources(tmp_path, monkeypatch):
    """init pulls function/en.words and synonym/english.* out of the
    meteor-1.5.jar zip into the meteor cache dir."""
    import zipfile

    from clipcap_tpu.init import base as init_base

    jar = tmp_path / "meteor-1.5.jar"
    with zipfile.ZipFile(jar, "w") as z:
        z.writestr("function/en.words", "a\nthe\n")
        z.writestr("synonym/english.synsets", "big 1\nlarge 1\n")
        z.writestr("synonym/english.exceptions", "larger large\n")
        z.writestr("Meteor.class", "\x00")
    out = tmp_path / "cache"
    out.mkdir()
    monkeypatch.setattr(init_base, "_METEOR_DIR", str(out))
    assert init_base._extract_meteor_resources(str(jar))
    assert (out / "en.words").read_text() == "a\nthe\n"
    assert (out / "english.synsets").exists()
    assert (out / "english.exceptions").exists()


def test_spice_extractor_heldout_accuracy():
    """Round-3 gold corpus (55 captions), annotated BEFORE the extractor
    was extended to cover it: relative clauses, participial post-nominal
    modifiers, of-NPs, passives, 3+-conjunct and asyndetic coordination
    (comma-stripped lists), post-verbal adjectives, copular coordination,
    and subject lifting through post-nominal PPs.  Semantics per Anderson
    et al. 2016 (objects = head nouns, attributes, relations), stemmed on
    both sides like the scorer.  The round-2 fixture set (10 captions,
    test_spice_extractor_accuracy_floor) pinned P>=0.85/R>=0.90; this set
    measured P=0.839/R=0.878 before the round-3 extensions and 1.00/1.00
    after — floors pinned at 0.95 to leave room for lexicon drift without
    letting regressions through.  (Current measurement ~0.996/0.992: the
    compound-noun guard on asyndetic splits — "palm trees and a bench"
    stays a compound — costs the genuinely ambiguous mass-noun list
    "lettuce tomatoes and cheese", the right trade for caption text.)"""
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.eval.spice import extract_tuples

    gold = GOLD_HELDOUT

    def stem_set(ts):
        return {tuple(porter_stem(w) for w in t) for t in ts}

    tp = fp = fn = 0
    for caption, want in gold:
        got_s = stem_set(extract_tuples(caption.split()))
        want_s = stem_set(want)
        tp += len(got_s & want_s)
        fp += len(got_s - want_s)
        fn += len(want_s - got_s)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    assert len(gold) >= 50
    assert precision >= 0.95, (precision, recall)
    assert recall >= 0.95, (precision, recall)


GOLD_HELDOUT = [
    # --- relative clauses ---
    ("a man who is riding a horse",
     {("man",), ("horse",), ("man", "riding", "horse")}),
    ("a woman who holds a red umbrella",
     {("woman",), ("umbrella",), ("umbrella", "red"), ("woman", "holds", "umbrella")}),
    ("a dog that sits on the porch",
     {("dog",), ("porch",), ("dog", "sits", "porch")}),
    ("a boy who is eating a sandwich",
     {("boy",), ("sandwich",), ("boy", "eating", "sandwich")}),
    ("the girl that wears a blue dress",
     {("girl",), ("dress",), ("dress", "blue"), ("girl", "wears", "dress")}),
    # --- participial post-nominal modifiers ---
    ("a dog wearing a hat",
     {("dog",), ("hat",), ("dog", "wearing", "hat")}),
    ("a man holding a baby in a park",
     {("man",), ("baby",), ("park",), ("man", "holding", "baby"),
      ("baby", "in", "park")}),
    ("a woman sitting on a wooden bench",
     {("woman",), ("bench",), ("bench", "wooden"), ("woman", "sitting", "bench")}),
    ("two birds flying over the water",
     {("birds",), ("birds", "two"), ("water",),
      ("birds", "flying", "water")}),
    ("a child playing with a toy truck",
     {("child",), ("truck",), ("truck", "toy"), ("child", "playing", "truck")}),
    ("a cat lying on a striped blanket",
     {("cat",), ("blanket",), ("blanket", "striped"), ("cat", "lying", "blanket")}),
    # --- of-NPs ---
    ("a group of people standing around a table",
     {("group",), ("people",), ("table",), ("group", "of", "people"),
      ("people", "standing", "table")}),
    ("a bowl of soup on the counter",
     {("bowl",), ("soup",), ("counter",), ("bowl", "of", "soup"),
      ("bowl", "on", "counter")}),
    ("a herd of sheep grazing in a field",
     {("herd",), ("sheep",), ("field",), ("herd", "of", "sheep"),
      ("sheep", "grazing", "field")}),
    ("a slice of pizza on a white plate",
     {("slice",), ("pizza",), ("plate",), ("plate", "white"),
      ("slice", "of", "pizza"), ("slice", "on", "plate")}),
    ("a bunch of bananas hanging from a hook",
     {("bunch",), ("bananas",), ("hook",), ("bunch", "of", "bananas"),
      ("bananas", "hanging", "hook")}),
    # --- passives ---
    ("a table covered with books",
     {("table",), ("books",), ("table", "covered", "books")}),
    ("a bench is covered in snow",
     {("bench",), ("snow",), ("bench", "covered", "snow")}),
    ("a wall painted with bright colors",
     {("wall",), ("colors",), ("colors", "bright"), ("wall", "painted", "colors")}),
    ("a cake topped with fresh strawberries",
     {("cake",), ("strawberries",), ("strawberries", "fresh"),
      ("cake", "topped", "strawberries")}),
    ("a street lined with tall trees",
     {("street",), ("trees",), ("trees", "tall"), ("street", "lined", "trees")}),
    ("a plate is filled with pasta",
     {("plate",), ("pasta",), ("plate", "filled", "pasta")}),
    # --- coordination, incl. 3+ conjuncts ---
    ("a man and a woman walking on the beach",
     {("man",), ("woman",), ("beach",), ("man", "walking", "beach"),
      ("woman", "walking", "beach")}),
    ("a table with plates cups and bowls",
     {("table",), ("plates",), ("cups",), ("bowls",),
      ("table", "with", "plates"), ("table", "with", "cups"),
      ("table", "with", "bowls")}),
    ("a boy and a girl and a dog playing in the yard",
     {("boy",), ("girl",), ("dog",), ("yard",), ("boy", "playing", "yard"),
      ("girl", "playing", "yard"), ("dog", "playing", "yard")}),
    ("a sandwich with lettuce tomatoes and cheese",
     {("sandwich",), ("lettuce",), ("tomatoes",), ("cheese",),
      ("sandwich", "with", "lettuce"), ("sandwich", "with", "tomatoes"),
      ("sandwich", "with", "cheese")}),
    ("a red and white boat on the lake",
     {("boat",), ("lake",), ("boat", "red"), ("boat", "white"),
      ("boat", "on", "lake")}),
    # --- plain NPs / attributes / copulas (coverage breadth) ---
    ("an old man with a long white beard",
     {("man",), ("beard",), ("man", "old"), ("beard", "long"),
      ("beard", "white"), ("man", "with", "beard")}),
    ("the kitchen counter is clean",
     {("counter",), ("counter", "kitchen"), ("counter", "clean")}),
    ("a tall glass of orange juice",
     {("glass",), ("juice",), ("glass", "tall"), ("juice", "orange"),
      ("glass", "of", "juice")}),
    ("a small brown puppy sleeps in a basket",
     {("puppy",), ("basket",), ("puppy", "small"), ("puppy", "brown"),
      ("puppy", "sleeps", "basket")}),
    ("the sky is dark and cloudy",
     {("sky",), ("sky", "dark"), ("sky", "cloudy")}),
    ("a double decker bus drives down the street",
     {("bus",), ("street",), ("bus", "double"), ("bus", "decker"),
      ("bus", "drives", "street")}),
    ("a laptop sits open on a desk",
     {("laptop",), ("desk",), ("laptop", "sits", "desk")}),
    ("a vase full of purple flowers",
     {("vase",), ("flowers",), ("flowers", "purple"), ("vase", "full"),
      ("vase", "of", "flowers")}),
    # --- relations with verb+prep, motion, etc. ---
    ("a surfer rides a large wave in the ocean",
     {("surfer",), ("wave",), ("ocean",), ("wave", "large"),
      ("surfer", "rides", "wave"), ("wave", "in", "ocean")}),
    ("a train travels over a bridge near the mountains",
     {("train",), ("bridge",), ("mountains",),
      ("train", "travels", "bridge"), ("bridge", "near", "mountains")}),
    ("a skier jumps off a snowy cliff",
     {("skier",), ("cliff",), ("cliff", "snowy"), ("skier", "jumps", "cliff")}),
    ("a clock hangs above the wooden door",
     {("clock",), ("door",), ("door", "wooden"), ("clock", "hangs", "door")}),
    ("a boat floats under the stone bridge",
     {("boat",), ("bridge",), ("bridge", "stone"), ("boat", "floats", "bridge")}),
    ("a police officer stands next to a motorcycle",
     {("officer",), ("officer", "police"), ("motorcycle",),
      ("officer", "stands", "motorcycle")}),
    # --- participial + relative mixtures, longer captions ---
    ("a young woman reading a book under a tree",
     {("woman",), ("book",), ("tree",), ("woman", "young"),
      ("woman", "reading", "book"), ("book", "under", "tree")}),
    ("an elephant standing in the tall grass near a river",
     {("elephant",), ("grass",), ("river",), ("grass", "tall"),
      ("elephant", "standing", "grass"), ("grass", "near", "river")}),
    ("a man in a black jacket riding a bicycle",
     {("man",), ("jacket",), ("bicycle",), ("jacket", "black"),
      ("man", "in", "jacket"), ("man", "riding", "bicycle")}),
    ("a pizza that is topped with mushrooms and olives",
     {("pizza",), ("mushrooms",), ("olives",),
      ("pizza", "topped", "mushrooms"), ("pizza", "topped", "olives")}),
    ("a kitten sleeping inside a cardboard box",
     {("kitten",), ("box",), ("box", "cardboard"),
      ("kitten", "sleeping", "box")}),
    ("a batter swings at a baseball during a game",
     {("batter",), ("baseball",), ("game",),
      ("batter", "swings", "baseball"), ("baseball", "during", "game")}),
    ("a man wearing glasses talks on a cell phone",
     {("man",), ("glasses",), ("phone",), ("phone", "cell"),
      ("man", "wearing", "glasses"), ("man", "talks", "phone")}),
    ("several boats docked at a busy harbor",
     {("boats",), ("harbor",), ("harbor", "busy"),
      ("boats", "docked", "harbor")}),
    ("a stop sign stands at the corner of the street",
     {("sign",), ("sign", "stop"), ("corner",), ("street",),
      ("sign", "stands", "corner"), ("corner", "of", "street")}),
    ("a little girl holds an ice cream cone",
     {("girl",), ("girl", "little"), ("cone",), ("cone", "ice"),
      ("cone", "cream"), ("girl", "holds", "cone")}),
    ("two zebras drinking water from a small pond",
     {("zebras",), ("zebras", "two"), ("water",), ("pond",),
      ("pond", "small"), ("zebras", "drinking", "water"),
      ("water", "from", "pond")}),
    ("a kite flies high above the sandy beach",
     {("kite",), ("beach",), ("beach", "sandy"), ("kite", "flies", "beach")}),
    ("a bathroom with a white sink and a mirror",
     {("bathroom",), ("sink",), ("mirror",), ("sink", "white"),
      ("bathroom", "with", "sink"), ("bathroom", "with", "mirror")}),
    ("an airplane that flies through the cloudy sky",
     {("airplane",), ("sky",), ("sky", "cloudy"),
      ("airplane", "flies", "sky")}),
]


def test_spice_extractor_heldout_r3b_accuracy():
    """Second held-out gold corpus (25 captions), annotated by the Anderson
    et al. 2016 scene-graph semantics BEFORE the extractor grew the
    features it probes: numeric attributes (CoreNLP nummod → attribute),
    multiword prepositions ("in front of", "next to", "on top of"),
    possessive 's (→ a "have" relation with the stream continuing on the
    possessed NP), "while" clause boundaries, VP coordination with objects
    ("smiling and holding a balloon"), attributive past participles
    ("parked cars", "sliced bread"), and -ing nouns in non-post-article
    positions ("a brick building").  Conventions follow the first corpus:
    verb relations absorb their preposition into a 3-tuple, PPs attach to
    the nearest preceding NP.  Two KNOWN divergences are annotated as the
    correct graphs and left failing (the of-distribution into an
    article-bearing conjunct in "rows of palm trees and a bench"), so the
    floors sit just under the measured P=0.98/R=0.97."""
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.eval.spice import extract_tuples

    def stem_set(ts):
        return {tuple(porter_stem(w) for w in t) for t in ts}

    tp = fp = fn = 0
    for caption, want in GOLD_HELDOUT_R3B:
        got_s = stem_set(extract_tuples(caption.split()))
        want_s = stem_set(want)
        tp += len(got_s & want_s)
        fp += len(got_s - want_s)
        fn += len(want_s - got_s)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    assert len(GOLD_HELDOUT_R3B) >= 25
    assert precision >= 0.95, (precision, recall)
    assert recall >= 0.95, (precision, recall)


GOLD_HELDOUT_R3B = [
    # --- numeric attributes ---
    ("two dogs playing in the snow",
     {("dogs",), ("dogs", "two"), ("snow",), ("dogs", "playing", "snow")}),
    ("three people standing on a beach",
     {("people",), ("people", "three"), ("beach",),
      ("people", "standing", "beach")}),
    ("a table with four chairs around it",
     {("table",), ("chairs",), ("chairs", "four"),
      ("table", "with", "chairs")}),
    ("five birds perched on a wire",
     {("birds",), ("birds", "five"), ("wire",), ("birds", "perched", "wire")}),
    # --- existentials ---
    ("there is a cat on the bed",
     {("cat",), ("bed",), ("cat", "on", "bed")}),
    ("there are two boats in the water",
     {("boats",), ("boats", "two"), ("water",), ("boats", "in", "water")}),
    # --- multiword prepositions ---
    ("a dog in front of a house",
     {("dog",), ("house",), ("dog", "in front of", "house")}),
    ("a bench next to a tree",
     {("bench",), ("tree",), ("bench", "next to", "tree")}),
    ("a motorcycle parked in front of a brick building",
     {("motorcycle",), ("building",), ("building", "brick"),
      ("motorcycle", "parked", "building")}),
    ("a cup of coffee on top of a wooden table",
     {("cup",), ("coffee",), ("table",), ("table", "wooden"),
      ("cup", "of", "coffee"), ("cup", "on top of", "table")}),
    ("a police officer stands next to a motorcycle",
     {("officer",), ("officer", "police"), ("motorcycle",),
      ("officer", "stands", "motorcycle")}),
    # --- possessives ---
    ("a man 's hat on a chair",
     {("man",), ("hat",), ("chair",), ("man", "have", "hat"),
      ("hat", "on", "chair")}),
    ("a dog 's tail wagging in the air",
     {("dog",), ("tail",), ("air",), ("dog", "have", "tail"),
      ("tail", "wagging", "air")}),
    # --- chained participials / VP coordination / while ---
    ("a man sitting on a bench reading a newspaper",
     {("man",), ("bench",), ("newspaper",), ("man", "sitting", "bench"),
      ("man", "reading", "newspaper")}),
    ("a woman standing in the kitchen holding a plate",
     {("woman",), ("kitchen",), ("plate",), ("woman", "standing", "kitchen"),
      ("woman", "holding", "plate")}),
    ("a child smiling while holding a balloon",
     {("child",), ("balloon",), ("child", "smiling"),
      ("child", "holding", "balloon")}),
    ("a child smiling and holding a balloon",
     {("child",), ("balloon",), ("child", "smiling"),
      ("child", "holding", "balloon")}),
    ("a man standing and waving",
     {("man",), ("man", "standing"), ("man", "waving")}),
    ("a dog runs while a cat sleeps",
     {("dog",), ("cat",), ("dog", "runs"), ("cat", "sleeps")}),
    ("a woman walks her dog while talking on a phone",
     {("woman",), ("dog",), ("phone",), ("woman", "walks", "dog"),
      ("woman", "talking", "phone")}),
    # --- attributive participles + -ing nouns ---
    ("a tall building behind a row of parked cars",
     {("building",), ("building", "tall"), ("row",), ("cars",),
      ("cars", "parked"), ("row", "of", "cars"),
      ("building", "behind", "row")}),
    ("a plate of sliced bread on the table",
     {("plate",), ("bread",), ("bread", "sliced"), ("table",),
      ("plate", "of", "bread"), ("plate", "on", "table")}),
    ("an old painting hanging on the wall",
     {("painting",), ("painting", "old"), ("wall",),
      ("painting", "hanging", "wall")}),
    # --- compound nouns at conjunctions + of-NPs ---
    ("rows of palm trees and a bench on the beach",
     {("rows",), ("trees",), ("trees", "palm"), ("bench",), ("beach",),
      ("rows", "of", "trees"), ("rows", "on", "beach"),
      ("bench", "on", "beach")}),
    ("a tennis player swinging a racket on a tennis court",
     {("player",), ("player", "tennis"), ("racket",), ("court",),
      ("court", "tennis"), ("player", "swinging", "racket"),
      ("racket", "on", "court")}),
    ("a group of people standing around a table",
     {("group",), ("people",), ("table",), ("group", "of", "people"),
      ("people", "standing", "table")}),
]


# ---------------------------------------------------------------------------
# jar-protocol stdio drop-ins (SURVEY §2.2: SCORE/EVAL + PTBTokenizer lines)
# ---------------------------------------------------------------------------


def _drive_meteor_protocol(write, readline, gts, res):
    """Replay the reference Meteor driver's exact I/O sequence
    (/root/reference .../meteor/meteor.py compute_score): one SCORE line
    per image collecting stats, one EVAL line, then n per-image scores and
    the final aggregate score."""
    keys = list(gts.keys())
    stats = []
    for k in keys:
        hyp = res[k][0].replace("|||", "").replace("  ", " ")
        write("SCORE ||| " + " ||| ".join(gts[k]) + " ||| " + hyp + "\n")
        stats.append(readline().strip())
    write("EVAL ||| " + " ||| ".join(stats) + "\n")
    per_image = [float(readline().strip()) for _ in keys]
    corpus = float(readline().strip())
    return corpus, per_image


def _meteor_protocol_fixture():
    gts = {
        "a": ["a man rides a brown horse", "a person riding a horse outside"],
        "b": ["two dogs play in the snow", "dogs playing in snow"],
        "c": ["a plate of food on a table", "food sits on a white plate"],
    }
    res = {
        "a": ["a man riding a horse"],
        "b": ["two dogs playing in the snow"],
        "c": ["a plate of food sitting on the table"],
    }
    return gts, res


def test_meteor_stdio_protocol_matches_compute_score():
    import io

    from clipcap_tpu.eval.meteor import get_meteor
    from clipcap_tpu.eval.meteor_stdio import serve

    gts, res = _meteor_protocol_fixture()
    scorer = get_meteor()

    lines_in = []
    expected_corpus, expected_per_image = scorer.compute_score(gts, res)

    # Build the full request stream up front (the server is line-driven and
    # stateless between verbs, so batching requests is equivalent).
    keys = list(gts.keys())
    for k in keys:
        lines_in.append("SCORE ||| " + " ||| ".join(gts[k]) + " ||| " + res[k][0])
    out1 = io.StringIO()
    serve(io.StringIO("\n".join(lines_in) + "\n"), out1, scorer)
    stats = out1.getvalue().strip().split("\n")
    assert len(stats) == len(keys)

    out2 = io.StringIO()
    serve(io.StringIO("EVAL ||| " + " ||| ".join(stats) + "\n"), out2, scorer)
    vals = [float(v) for v in out2.getvalue().strip().split("\n")]
    per_image, corpus = vals[:-1], vals[-1]

    assert per_image == pytest.approx(expected_per_image, abs=1e-12)
    assert corpus == pytest.approx(expected_corpus, abs=1e-12)


def test_meteor_stdio_subprocess_jar_argv():
    """The console entry accepts the jar's exact argv and serves the
    protocol over real pipes, end to end."""
    import subprocess

    gts, res = _meteor_protocol_fixture()
    from clipcap_tpu.eval.meteor import get_meteor

    expected_corpus, expected_per_image = get_meteor().compute_score(gts, res)

    proc = subprocess.Popen(
        [sys.executable, "-m", "clipcap_tpu.eval.meteor_stdio",
         "-", "-", "-stdio", "-l", "en", "-norm"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        corpus, per_image = _drive_meteor_protocol(
            lambda s: (proc.stdin.write(s), proc.stdin.flush()),
            proc.stdout.readline, gts, res)
    finally:
        proc.stdin.close()
        proc.wait(timeout=30)
    assert per_image == pytest.approx(expected_per_image, abs=1e-12)
    assert corpus == pytest.approx(expected_corpus, abs=1e-12)


def test_meteor_stdio_rejects_unknown_verb():
    import io

    from clipcap_tpu.eval.meteor_stdio import serve

    with pytest.raises(ValueError):
        serve(io.StringIO("FROB ||| x\n"), io.StringIO())


def test_ptbtok_cli_lines():
    import subprocess

    from clipcap_tpu.eval.tokenization import ptb_tokenize_line

    lines = ["A man, riding a horse.", "The dog's ball (red).", "I can't swim..."]
    proc = subprocess.run(
        [sys.executable, "-m", "clipcap_tpu.eval.tokenization",
         "-preserveLines", "-lowerCase"],
        input="\n".join(lines) + "\n", capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=60, check=True,
    )
    got = proc.stdout.rstrip("\n").split("\n")
    assert got == [" ".join(ptb_tokenize_line(l)) for l in lines]


def test_meteor_compact_synonym_table_default(monkeypatch, tmp_path):
    """Without init-fetched WordNet tables the synonym stage runs on the
    shipped compact curated table BY DEFAULT (VERDICT r4 #6) — through
    whichever scorer get_meteor picks (native C++ core or Python) — and
    CLIPCAP_METEOR_SYNONYMS=none disables it."""
    from clipcap_tpu.eval import meteor as M

    # Isolate from any init-fetched resources in ~/.cache.
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.delenv("CLIPCAP_METEOR_SYNONYMS", raising=False)

    live = M.get_meteor()
    s_live = live.score_segment("a sofa in a room", ["a couch in a room"])

    monkeypatch.setenv("CLIPCAP_METEOR_SYNONYMS", "none")
    bare = M.get_meteor()
    s_bare = bare.score_segment("a sofa in a room", ["a couch in a room"])
    assert s_live > s_bare  # sofa~couch only matches via the synonym stage

    # Same-stem and exact behavior are unchanged by the table.
    assert live.score_segment("dogs run", ["dog runs"]) == \
        bare.score_segment("dogs run", ["dog runs"])

    # Explicit init-fetched tables still take precedence over the fallback.
    monkeypatch.delenv("CLIPCAP_METEOR_SYNONYMS", raising=False)
    cache = tmp_path / ".cache" / "clipcap_tpu" / "meteor"
    cache.mkdir(parents=True, exist_ok=True)
    (cache / "english.synsets").write_text("sofa 1\nfuton 1\n")
    assert M.default_synonym_paths()[0] == str(cache / "english.synsets")
    jar_tier = M.get_meteor()
    assert jar_tier.score_segment("a sofa here", ["a futon here"]) > \
        bare.score_segment("a sofa here", ["a futon here"])


def test_synonyms_from_groups(tmp_path):
    """Group-file loader: line ordinal = group id, multi-group words get
    the union, comments/blanks/singletons skipped."""
    from clipcap_tpu.eval.meteor import Synonyms

    f = tmp_path / "groups.txt"
    f.write_text("# comment\n\ncouch sofa settee\n"
                 "bike bicycle\nmotorcycle bike\nlonely\n")
    syn = Synonyms.from_groups(str(f))
    assert syn.are_synonyms("couch", "settee")
    # 'bike' bridges both of its groups.
    assert syn.are_synonyms("bicycle", "bike")
    assert syn.are_synonyms("motorcycle", "bike")
    # ...but bicycle and motorcycle are in different groups: no intersect.
    assert not syn.are_synonyms("bicycle", "motorcycle")
    assert not syn.are_synonyms("lonely", "couch")
    assert "lonely" not in syn.word_ids


def test_shipped_compact_table_quality():
    """The shipped table loads, is non-trivial, and stays out of the way of
    the exact/stem stages (no function words, no self-defeating groups)."""
    from clipcap_tpu.eval.meteor import (FUNCTION_WORDS, Synonyms,
                                         compact_synonyms_path)

    syn = Synonyms.from_groups(compact_synonyms_path())
    assert len(syn.word_ids) > 1500
    # Spot-check caption-domain pairs.
    for a, b in [("sofa", "couch"), ("photo", "picture"), ("kid", "child"),
                 ("bicycle", "bike"), ("street", "road"), ("big", "large")]:
        assert syn.are_synonyms(a, b), (a, b)
    # High-frequency closed-class words must not appear (they would inflate
    # function-word matches at synonym weight).
    assert not (set(syn.word_ids) & FUNCTION_WORDS)
