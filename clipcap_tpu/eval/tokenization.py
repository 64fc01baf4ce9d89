"""PTB-style tokenization for caption scoring.

The reference shells out to Java
(``edu.stanford.nlp.process.PTBTokenizer -preserveLines -lowerCase`` via
/root/reference/clipcap/eval/pycocoevalcap/tokenizer/ptbtokenizer.py:32-57)
and then strips a fixed punctuation list (:25-26,69-70).  This module is the
native equivalent: the same observable behavior — lowercase, split PTB-style
(contractions, punctuation as separate tokens), drop the punctuation list —
without a JVM.  A C++ implementation with the identical interface lives in
``clipcap_tpu/native`` and is used when built; this Python version is the
always-available fallback and the behavioral spec.
"""
from __future__ import annotations

import re
from typing import Dict, List

# The exact punctuation list the reference wrapper strips
# (ptbtokenizer.py:25-26).
PUNCTUATIONS = [
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
]
_PUNCT_SET = set(PUNCTUATIONS)

# PTB contraction / clitic splits (the subset that matters for lowercase
# caption text).
_CONTRACTIONS = re.compile(r"\b(can)(not)\b")
_CLITICS = re.compile(r"(?i)('s|'re|'ve|'ll|'d|'m|n't)\b")

_BRACKETS = {
    "(": "-LRB-", ")": "-RRB-", "{": "-LCB-", "}": "-RCB-",
    "[": "-LSB-", "]": "-RSB-",
}

# Tokens: ellipses, multi-hyphens, clitics, words (incl. internal hyphens &
# digits/commas/periods inside numbers), or single non-space symbols.
_TOKEN = re.compile(
    r"\.\.\.|--|'s|'re|'ve|'ll|'d|'m|n't|"
    r"[a-z0-9]+(?:[-'][a-z0-9]+)*|"
    r"[^\sa-z0-9]"
)


def ptb_tokenize_line(line: str) -> List[str]:
    """Tokenize one caption: lowercase → PTB split → strip punctuation."""
    text = line.lower().strip()
    text = _CONTRACTIONS.sub(r"\1 \2", text)
    # Separate clitics so the word regex picks them apart: "dog's" → "dog 's"
    text = _CLITICS.sub(r" \1", text)
    tokens = []
    for tok in _TOKEN.findall(text):
        tok = _BRACKETS.get(tok, tok)
        if tok in _PUNCT_SET:
            continue
        tokens.append(tok)
    return tokens


class PTBTokenizer:
    """Drop-in equivalent of the reference's Java-bridge tokenizer
    (pycocoevalcap/tokenizer/ptbtokenizer.py): maps
    ``{id: [{"caption": str}, ...]}`` → ``{id: [tokenized_str, ...]}``."""

    def tokenize(self, captions_for_image: Dict) -> Dict:
        out: Dict = {}
        for key, caps in captions_for_image.items():
            out[key] = []
            for cap in caps:
                text = cap["caption"] if isinstance(cap, dict) else cap
                out[key].append(" ".join(ptb_tokenize_line(text)))
        return out


def get_tokenizer() -> PTBTokenizer:
    """Return the native C++ tokenizer when built, else the Python one."""
    try:
        from clipcap_tpu.native import ptb_tokenizer as native

        return native.PTBTokenizer()
    except Exception:
        return PTBTokenizer()
