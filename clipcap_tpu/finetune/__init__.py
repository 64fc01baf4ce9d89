"""Finetune stage.

The reference ships this as an empty ``# TODO`` stub
(/root/reference/clipcap/finetune/__init__.py:1); its actual finetune path
is ``clipcap.train --train-language-model True`` with DeepSpeed
(model/args.py:23-28, train.py:46-51).  Here the same flag drives the full
path natively: ``--train-language-model True`` unfreezes the LM, enables
activation rematerialization in the train step, and ZeRO-1 moment sharding
covers the LM optimizer state.  ``finetune.start_finetuning`` is a thin
alias that forces the flag for discoverability.
"""
from __future__ import annotations

import sys


def start_finetuning() -> int:
    from clipcap_tpu.train.train import start_training

    if "--train-language-model" not in " ".join(sys.argv):
        sys.argv += ["--train-language-model", "true"]
    return start_training()
