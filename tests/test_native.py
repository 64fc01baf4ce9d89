"""Native C++ components must match the Python behavioral spec exactly."""
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _native_or_skip():
    from clipcap_tpu import native

    if not native.available():
        pytest.skip("native library not built and no compiler available")
    return native


def test_native_builds():
    _native_or_skip()


def test_native_ptb_tokenizer_matches_python():
    native = _native_or_skip()
    from clipcap_tpu.eval.tokenization import ptb_tokenize_line as py_tok
    from clipcap_tpu.native.ptb_tokenizer import ptb_tokenize_line as c_tok

    cases = [
        "A man, riding a horse.",
        "The dog's ball (red).",
        "I can't swim...",
        "Mother-in-law's o'clock -- yes!",
        "",
        "Hello   world?!",
        "it's 3.5 p.m.",
        "they're we've you'll i'd i'm cannot",
        "don't isn't won't ain't",
        "[brackets] {braces} (parens)",
        "semi;colon and co:lon",
        "UPPER Case MiXeD",
        "numbers 123 45a6",
    ]
    for text in cases:
        assert c_tok(text) == py_tok(text), text

    # fuzz
    vocab = ["cat", "dog's", "can't", "red,", "jump.", "(hi)", "--", "a", "I'm",
             "3.5", "...", "o'clock", "semi;", "it's!"]
    rng = random.Random(0)
    for _ in range(300):
        text = " ".join(rng.choices(vocab, k=rng.randint(0, 10)))
        assert c_tok(text) == py_tok(text), text


def test_native_porter_matches_python():
    native = _native_or_skip()
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.native import _take_string, load

    lib = load()
    words = ("riding rides ride caresses ponies ties caress cats feed agreed "
             "plastered bled motoring sing conflated troubled sized hopping "
             "tanned falling hissing fizzed failing filing happy sky "
             "relational conditional rational valenci hesitanci digitizer "
             "conformabli radicalli differentli vileli analogousli "
             "vietnamization predication operator feudalism decisiveness "
             "hopefulness callousness formaliti sensitiviti sensibiliti "
             "triplicate formative formalize electriciti electrical hopeful "
             "goodness revival allowance inference airliner gyroscopic "
             "adjustable defensible irritant replacement adjustment dependent "
             "adoption communism activate angulariti homologous effective "
             "bowdlerize probate rate cease controll roll").split()
    for w in words:
        c = _take_string(lib, lib.ccn_porter_stem(w.encode()))
        assert c == porter_stem(w), w


def test_native_snowball_matches_python():
    native = _native_or_skip()
    from clipcap_tpu.eval.snowball import snowball_stem
    from clipcap_tpu.native import _take_string, load

    lib = load()
    words = ("running ran runs easily fairly skis skies dying lying tying "
             "news howe atlas cosmos bias andes inning outings cannings "
             "proceeded exceeding succeeds generate generated generously "
             "communication communities arsenal relational conditional "
             "rational valency hesitancy digitizer agreement hopefulness "
             "goodness revival allowance inference airliner gyroscopic "
             "adjustable defensible irritant replacement adjustment dependent "
             "adoption communism activate angularity homologous effective "
             "bowdlerize probate cease controlling rolling ties cries gas "
             "this by yellow vying enjoy enjoyed boys conspicuous absolutely "
             "fluently hopping hopeful misunderstanding y'all dog's").split()
    for w in words:
        for suf in ("", "s", "ed", "ing", "ly", "ness", "'s"):
            t = w + suf
            c = _take_string(lib, lib.ccn_snowball_stem(t.encode()))
            assert c == snowball_stem(t), t


def test_native_meteor_matches_python():
    native = _native_or_skip()
    from clipcap_tpu.eval.meteor import Meteor as PyMeteor
    from clipcap_tpu.native.meteor import Meteor as CMeteor

    py, c = PyMeteor(), CMeteor()
    vocab = ("a the cat dog man woman rides riding walks red blue on in with "
             "quickly sits mat horse park tree").split()
    rng = random.Random(1)
    for _ in range(100):
        hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 12)))
        refs = [" ".join(rng.choices(vocab, k=rng.randint(1, 12))) for _ in range(3)]
        assert abs(py.score_segment(hyp, refs) - c.score_segment(hyp, refs)) < 1e-12

    gts = {i: [" ".join(rng.choices(vocab, k=8)) for _ in range(3)] for i in range(8)}
    res = {i: [" ".join(rng.choices(vocab, k=7))] for i in range(8)}
    sp, lp = py.compute_score(gts, res)
    sc, lc = c.compute_score(gts, res)
    assert abs(sp - sc) < 1e-12
    assert all(abs(x - y) < 1e-12 for x, y in zip(lp, lc))


def test_native_meteor_paraphrase_matches_python(tmp_path):
    native = _native_or_skip()
    import gzip
    import random

    from clipcap_tpu.eval.meteor import Meteor as PyMeteor
    from clipcap_tpu.native.meteor import Meteor as CMeteor

    table = tmp_path / "paraphrase-test.gz"
    with gzip.open(table, "wt") as f:
        f.write("sofa ||| couch\nnext to ||| beside\nlarge dog ||| big hound\n")
    py = PyMeteor(paraphrase_path=str(table))
    c = CMeteor(paraphrase_path=str(table))

    vocab = ("a the sofa couch next to beside large big dog hound cat sits "
             "on near tree red").split()
    rng = random.Random(7)
    for _ in range(100):
        hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 10)))
        refs = [" ".join(rng.choices(vocab, k=rng.randint(1, 10))) for _ in range(2)]
        assert abs(py.score_segment(hyp, refs) - c.score_segment(hyp, refs)) < 1e-12


def test_get_meteor_prefers_native(tmp_path):
    native = _native_or_skip()
    from clipcap_tpu.eval.meteor import Meteor as PyMeteor, get_meteor
    from clipcap_tpu.native.meteor import Meteor as CMeteor

    assert isinstance(get_meteor(), CMeteor)
    # the native core handles the paraphrase-table configuration too
    table = tmp_path / "paraphrase.txt"
    table.write_text("sofa ||| couch\n")
    assert isinstance(get_meteor(paraphrase_path=str(table)), CMeteor)
    # synonym-table configuration falls back to the Python scorer
    assert isinstance(get_meteor(synonyms={"cat": {"feline"}}), PyMeteor)


def test_get_tokenizer_prefers_native():
    native = _native_or_skip()
    from clipcap_tpu.eval.tokenization import get_tokenizer
    from clipcap_tpu.native.ptb_tokenizer import PTBTokenizer as CTok

    assert isinstance(get_tokenizer(), CTok)


def test_native_meteor_thread_safety():
    """The reference serializes its METEOR Java subprocess behind a lock
    (meteor.py:30). Our C++ core is stateless (const tables only) — verify
    concurrent scoring from many threads matches single-threaded results."""
    import concurrent.futures

    from clipcap_tpu.eval.meteor import get_meteor

    m = get_meteor()
    pairs = [(f"a dog runs in the park {i}", [f"the dog is running in a park {i}"])
             for i in range(32)]
    expected = [m.score_segment(h, r) for h, r in pairs]

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(lambda p: m.score_segment(*p), pairs))
    assert got == expected


def test_native_meteor_full_resources_matches_python(tmp_path):
    """C++ core with ALL jar resources (paraphrase + flat synonyms + en.words
    function list) must agree with the Python scorer to 1e-12 on random
    sentences (the Python implementation is the behavioral spec)."""
    _native_or_skip()
    import gzip
    import random

    from clipcap_tpu.eval.meteor import (
        Meteor as PyMeteor, Synonyms, _flat_synonyms_path,
        load_function_words)
    from clipcap_tpu.native.meteor import Meteor as CMeteor

    table = tmp_path / "paraphrase-test.gz"
    with gzip.open(table, "wt") as f:
        f.write("sofa ||| couch\nnext to ||| beside\n")
    synsets = tmp_path / "english.synsets"
    synsets.write_text("big 1 2\nlarge 2\ndog 3\nhound 3\ncat 4\nkitten 4\n")
    exceptions = tmp_path / "english.exceptions"
    exceptions.write_text("bigger big\n")
    fwords = tmp_path / "en.words"
    fwords.write_text("a\nthe\non\nnear\nto\n")

    flat = _flat_synonyms_path(str(synsets), str(exceptions))
    py = PyMeteor(paraphrase_path=str(table),
                  synonyms=Synonyms.load(str(synsets), str(exceptions)),
                  function_words=load_function_words(str(fwords)))
    c = CMeteor(paraphrase_path=str(table), function_words_path=str(fwords),
                synonyms_path=flat)

    vocab = ("a the sofa couch next to beside big bigger large dog hound "
             "cat kitten sits on near tree red").split()
    rng = random.Random(11)
    for _ in range(100):
        hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 10)))
        refs = [" ".join(rng.choices(vocab, k=rng.randint(1, 10)))
                for _ in range(2)]
        assert abs(py.score_segment(hyp, refs) - c.score_segment(hyp, refs)) < 1e-12
