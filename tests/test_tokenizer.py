"""Byte-level BPE: parity with transformers' slow GPT2Tokenizer on the same
vocab/merges files (built in-test — no network)."""
import json

import pytest

from clipcap_tpu.utils.tokenizer import ByteTokenizer, GPT2Tokenizer, bytes_to_unicode


def _build_tiny_bpe(tmp_path):
    """Construct a small but real byte-level BPE vocab: all 256 byte symbols
    plus a few merges, mirroring the GPT-2 artifact format."""
    byte_syms = list(bytes_to_unicode().values())
    merges = ["Ġ t", "Ġt h", "Ġth e", "h e", "l l", "ll o", "Ġ a", "c a", "ca t"]
    vocab = {}
    for i, s in enumerate(sorted(byte_syms)):
        vocab[s] = len(vocab)
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text("#version: 0.2\n" + "\n".join(merges) + "\n", encoding="utf-8")
    return str(vf), str(mf)


def test_bpe_parity_with_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    vf, mf = _build_tiny_bpe(tmp_path)

    theirs = transformers.GPT2Tokenizer(vocab_file=vf, merges_file=mf)
    ours = GPT2Tokenizer.from_files(vf, mf)

    samples = [
        "hello the cat",
        "the cathello  llll",
        " a the",
        "unicode: héllo ∆",
        "punct!? ... end.",
        "",
    ]
    for s in samples:
        assert ours.encode(s) == theirs.encode(s), s
        assert ours.decode(ours.encode(s)) == s


def test_eos_handling(tmp_path):
    vf, mf = _build_tiny_bpe(tmp_path)
    tok = GPT2Tokenizer.from_files(vf, mf)
    ids = tok.encode("<|endoftext|>the cat")
    assert ids[0] == tok.eos_token_id
    assert tok.decode(ids) == "<|endoftext|>the cat"


def test_byte_fallback_roundtrip():
    with pytest.warns(UserWarning):
        tok = ByteTokenizer()
    s = "hello <|endoftext|> world"
    assert tok.decode(tok.encode(s)) == s
    assert tok.encode(".")[0] == ord(".")
