"""RoBERTa tokenization for the CLAP text tower (laion_clap tokenizes
captions with RobertaTokenizer, max_length 77).

Resolution order, network-optional like every loader here:
1. local vocab/merges dir via ``CLIPCAP_ROBERTA_TOKENIZER`` (RoBERTa's
   vocab.json/merges.txt use the same byte-level BPE format as GPT-2, so the
   framework's own BPE engine drives them — only the special tokens differ);
2. HF ``roberta-base`` through transformers (works when cached);
3. deterministic hash fallback (stable ids, exact rerank requires 1/2).
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

BOS, PAD, EOS = 0, 1, 2
CONTEXT_LENGTH = 77

_resolved = None


def _resolve():
    global _resolved
    if _resolved is not None:
        return _resolved

    path = os.environ.get("CLIPCAP_ROBERTA_TOKENIZER")
    if path and os.path.isdir(path):
        from clipcap_tpu.utils.tokenizer import GPT2Tokenizer

        tok = GPT2Tokenizer.from_files(
            os.path.join(path, "vocab.json"), os.path.join(path, "merges.txt"))
        # GPT2Tokenizer requires an eos entry; RoBERTa vocab names it </s>.
        _resolved = ("bpe", tok)
        return _resolved
    try:
        from transformers import RobertaTokenizer

        _resolved = ("hf", RobertaTokenizer.from_pretrained("roberta-base"))
        return _resolved
    except Exception:
        _resolved = ("hash", None)
        return _resolved


def roberta_tokenize(
    texts: Sequence[str],
    context_length: int = CONTEXT_LENGTH,
    vocab_size: int = 50265,
) -> Tuple[np.ndarray, np.ndarray]:
    """texts → (ids [B, L] int32, attention_mask [B, L] int32)."""
    kind, tok = _resolve()
    ids_batch: List[List[int]] = []
    for text in texts:
        if kind == "hf":
            ids = tok.encode(text, add_special_tokens=True)
        elif kind == "bpe":
            ids = [BOS] + tok.encode(" " + text.strip()) + [EOS]
        else:
            body = [4 + (hash(("clap", w)) % (vocab_size - 8))
                    for w in text.lower().split()]
            ids = [BOS] + body + [EOS]
        ids_batch.append(ids[:context_length])

    out = np.full((len(texts), context_length), PAD, np.int32)
    mask = np.zeros((len(texts), context_length), np.int32)
    for i, ids in enumerate(ids_batch):
        out[i, :len(ids)] = ids
        mask[i, :len(ids)] = 1
    return out, mask
