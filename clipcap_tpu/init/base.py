"""One-time asset bootstrap — ``python -m clipcap_tpu.init``.

Reference analog (/root/reference/clipcap/init/base.py:9-27 +
get_stanford_models.sh): downloads the Stanford CoreNLP jars SPICE needs.
This framework's scorers are native (no jars), so ``init`` instead fetches
the *optional* external assets that upgrade offline fallbacks to exact
behavior:

* OpenAI CLIP checkpoints (→ ~/.cache/clip/) for pretrained encoders;
* the CLIP BPE merges file (exact rerank tokenization);
* GPT-2 tokenizer files (vocab.json/merges.txt → $CLIPCAP_TOKENIZER_PATH);
* METEOR paraphrase table (enables the paraphrase matcher stage).

All downloads are best-effort: in a zero-egress environment every item
reports and is skipped; the framework keeps working with its documented
fallbacks.
"""
from __future__ import annotations

import os
import sys
import urllib.request

_CLIP_BASE = "https://openaipublic.azureedge.net/clip/models"
ASSETS = {
    "clip-vit-b-32": (
        f"{_CLIP_BASE}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
        "~/.cache/clip/ViT-B-32.pt",
    ),
    "clip-vit-l-14": (
        f"{_CLIP_BASE}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
        "~/.cache/clip/ViT-L-14.pt",
    ),
    "clip-bpe": (
        "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
        "~/.cache/clip/bpe_simple_vocab_16e6.txt.gz",
    ),
    "gpt2-vocab": (
        "https://huggingface.co/gpt2/resolve/main/vocab.json",
        "~/.cache/clipcap_tpu/gpt2/vocab.json",
    ),
    "gpt2-merges": (
        "https://huggingface.co/gpt2/resolve/main/merges.txt",
        "~/.cache/clipcap_tpu/gpt2/merges.txt",
    ),
    # CLAP text-tower tokenizer (exact audio rerank; point
    # CLIPCAP_ROBERTA_TOKENIZER at the download dir).
    "roberta-vocab": (
        "https://huggingface.co/roberta-base/resolve/main/vocab.json",
        "~/.cache/clipcap_tpu/roberta/vocab.json",
    ),
    "roberta-merges": (
        "https://huggingface.co/roberta-base/resolve/main/merges.txt",
        "~/.cache/clipcap_tpu/roberta/merges.txt",
    ),
    # METEOR paraphrase table (the file the reference jar loads via
    # `-a data/paraphrase-en.gz`, meteor.py:21-28; enables the paraphrase
    # matcher stage in both the Python and C++ METEOR cores).
    "meteor-paraphrase-en": (
        "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/data/paraphrase-en.gz",
        "~/.cache/clipcap_tpu/meteor/paraphrase-en.gz",
    ),
}


def _fetch(url: str, dest: str) -> bool:
    dest = os.path.expanduser(dest)
    if os.path.exists(dest):
        print(f"  already present: {dest}")
        return True
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    try:
        print(f"  fetching {url}")
        urllib.request.urlretrieve(url, dest)  # nosec - explicit user action
        return True
    except Exception as e:
        print(f"  skipped ({e})")
        return False


def init() -> int:
    print("clipcap_tpu.init: fetching optional assets (best-effort)")
    got_any = False
    for name, (url, dest) in ASSETS.items():
        print(f"[{name}]")
        got_any |= _fetch(url, dest)
    if not got_any:
        print(
            "No assets could be fetched (offline?). The framework still runs "
            "with random-weight encoders and fallback tokenizers; place the "
            "files listed above manually for exact pretrained behavior."
        )
    return 0


if __name__ == "__main__":
    sys.exit(init())
