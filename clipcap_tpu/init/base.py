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
    # The reference's meteor-1.5.jar itself (a zip archive): fetched for its
    # embedded resources — `function/en.words` (the corpus-derived
    # function-word list) and `synonym/english.*` (the WordNet synonym
    # tables) — which upgrade the native METEOR's fallbacks to the jar's own
    # data (extracted below by ``_extract_meteor_resources``).
    "meteor-jar": (
        "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/meteor-1.5.jar",
        "~/.cache/clipcap_tpu/meteor/meteor-1.5.jar",
    ),
}

_METEOR_DIR = "~/.cache/clipcap_tpu/meteor"


def _extract_meteor_resources(jar_path: str) -> bool:
    """Pull METEOR's scoring resources out of meteor-1.5.jar (a zip):
    ``function/en.words`` → en.words, ``synonym/english*`` → english.* —
    the exact data the jar scores with
    (/root/reference/clipcap/eval/pycocoevalcap/meteor/meteor.py:21-28
    runs the jar; its English task loads these from its own classpath)."""
    import zipfile

    jar_path = os.path.expanduser(jar_path)
    out_dir = os.path.expanduser(_METEOR_DIR)
    if not os.path.exists(jar_path):
        return False
    extracted = []
    try:
        with zipfile.ZipFile(jar_path) as z:
            for name in z.namelist():
                base = os.path.basename(name)
                if not base:
                    continue
                if (name.endswith("function/en.words")
                        or "/en.words" in name or name == "en.words"):
                    dest = os.path.join(out_dir, "en.words")
                elif "synonym" in name and "english" in base:
                    dest = os.path.join(out_dir, base)
                else:
                    continue
                with z.open(name) as src, open(dest + ".tmp", "wb") as dst:
                    dst.write(src.read())
                os.replace(dest + ".tmp", dest)
                extracted.append(os.path.basename(dest))
    except Exception as e:
        print(f"  meteor resource extraction failed: {e}")
        return False
    if extracted:
        print(f"  extracted from jar: {', '.join(sorted(extracted))}")
    else:
        print("  no function/synonym resources found inside the jar")
    return bool(extracted)


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
        got = _fetch(url, dest)
        got_any |= got
        if got and name == "meteor-jar":
            _extract_meteor_resources(dest)
    if not got_any:
        print(
            "No assets could be fetched (offline?). The framework still runs "
            "with random-weight encoders and fallback tokenizers; place the "
            "files listed above manually for exact pretrained behavior."
        )
    return 0


if __name__ == "__main__":
    sys.exit(init())
