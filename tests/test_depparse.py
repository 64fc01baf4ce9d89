"""Unit tests for the SPICE dependency-parsing stack: treebank integrity,
deterministic regeneration, model serialization round-trip, and tagging /
parsing fidelity on the training distribution."""
import os

import pytest
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clipcap_tpu.eval.data.gen_treebank import OUT_PATH, generate
from clipcap_tpu.eval.depparse import ArcStandardParser, read_treebank
from clipcap_tpu.eval.postag import PerceptronTagger
from clipcap_tpu.eval.spice_parser import get_models, parse_tokens


def test_treebank_committed_matches_generator():
    """The committed treebank is exactly what the (seeded) generator
    produces — no hand edits, fully reproducible."""
    sentences = generate()
    lines = []
    for rows in sentences:
        lines.append("# text = " + " ".join(r[0] for r in rows))
        for i, (w, t, h, l) in enumerate(rows, start=1):
            lines.append(f"{i}\t{w}\t{t}\t{h}\t{l}")
        lines.append("")
    with open(OUT_PATH) as fh:
        committed = fh.read().splitlines()
    assert committed[0].startswith("#")
    assert committed[1:] == lines, "run python -m clipcap_tpu.eval.data.gen_treebank"


def test_treebank_is_projective_single_root():
    trees = read_treebank(OUT_PATH)  # read_treebank asserts both properties
    assert len(trees) >= 600
    labels = {l for t in trees for l in t.labels}
    assert "root" in labels and "nsubj" in labels and "case" in labels


def test_models_fit_training_distribution():
    """Tagging accuracy and LAS on the treebank itself — a capacity check
    (generalization is measured by the five gold corpora)."""
    tagger, parser = get_models()
    trees = read_treebank(OUT_PATH)
    tot = tag_ok = uas = las = 0
    for t in trees:
        tags = tagger.tag(t.words)
        heads, labels = parser.parse(t.words, t.tags)
        for i in range(len(t.words)):
            tot += 1
            tag_ok += tags[i] == t.tags[i]
            uas += heads[i] == t.heads[i]
            las += heads[i] == t.heads[i] and labels[i] == t.labels[i]
    assert tag_ok / tot >= 0.99, tag_ok / tot
    assert uas / tot >= 0.99, uas / tot
    assert las / tot >= 0.99, las / tot


def test_model_serialization_roundtrip():
    tagger, parser = get_models()
    t2 = PerceptronTagger.from_dict(tagger.to_dict())
    p2 = ArcStandardParser.from_dict(parser.to_dict())
    for s in ("a man riding a horse on the beach",
              "two dogs that are playing in the snow",
              "a bowl of fruit next to a window"):
        words = s.split()
        tags = tagger.tag(words)
        assert t2.tag(words) == tags
        assert p2.parse(words, tags) == parser.parse(words, tags)


@pytest.mark.slow
def test_committed_model_cache_matches_fresh_training():
    """The committed model cache IS what ships in the package: retraining
    from the committed treebank (deterministic seed) must reproduce it
    bit-for-bit, so a cached install and a cache-less retrain parse
    identically on every machine (~55 s train)."""
    import gzip
    import json

    from clipcap_tpu.eval import spice_parser as sp

    tagger, parser = sp._train()
    with gzip.open(sp._cache_paths()[0], "rt") as fh:
        blob = json.load(fh)
    assert blob["digest"] == sp._treebank_digest()
    assert blob["tagger"] == json.loads(json.dumps(tagger.to_dict()))
    assert blob["parser"] == json.loads(json.dumps(parser.to_dict()))


def test_parse_tokens_structure():
    words, tags, heads, labels = parse_tokens(
        "a dog sitting on a wooden bench".split())
    assert words == ["a", "dog", "sitting", "on", "a", "wooden", "bench"]
    assert tags[1] == "NN" and tags[2] == "VBG" and tags[6] == "NN"
    # dog is the fragment root; sitting modifies dog; bench is sitting's obl
    assert heads[1] == 0
    assert heads[words.index("sitting")] == 2
    assert labels[words.index("sitting")] == "acl"
    assert heads[words.index("bench")] == 3
    assert labels[words.index("bench")] == "obl"


def test_multiword_prep_collapse_in_pipeline():
    words, tags, heads, labels = parse_tokens(
        "a cat in front of a door".split())
    assert "in front of" in words
    assert tags[words.index("in front of")] == "IN"


def test_parser_empty_and_tiny_inputs():
    from clipcap_tpu.eval.spice_parser import extract_tuples_parsed

    assert extract_tuples_parsed([]) == set()
    assert extract_tuples_parsed(["dog"]) == {("dog",)}
