"""Eval driver — ``python -m clipcap_tpu.eval``.

Reference parity with the *designed* path of
/root/reference/clipcap/eval/base.py:34-118 — which ships with generation
commented out and predictions hardcoded to ``eval2.json`` (:35-80, a
documented defect).  Here the generation loop is ENABLED: per eval sample,
encoder forward → mapper prefix → nucleus sampling → encoder-similarity
rerank → prediction; ``--predictions-json`` reproduces the score-only mode.
Scores come from the native metric harness (BLEU/METEOR/ROUGE-L/CIDEr/
SPICE/SPIDEr — no Java).
"""
from __future__ import annotations

import json
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace
from pprint import pprint
from typing import Callable, Tuple

import numpy as np
import pandas as pd

from clipcap_tpu.eval.args import add_eval_args
from clipcap_tpu.eval.dataset import EvalDataset
from clipcap_tpu.eval.metrics import evaluate_metrics_from_lists
from clipcap_tpu.encoders.base import get_encoder_from_model
from clipcap_tpu.inference.args import add_inference_args
from clipcap_tpu.inference.generate import generate_nucleus_sampling
from clipcap_tpu.models.clipcap import load
from clipcap_tpu.utils.braceexpand import braceexpand


def prepare_model(args: Namespace):
    model, tokenizer = load(
        args.model_path, args.config_path,
        device=args.device, from_checkpoint=args.is_checkpoint,
    )
    encode_method, sample_processor = get_encoder_from_model(model, device=args.device)
    return model, tokenizer, encode_method, sample_processor


def generate_predictions(args: Namespace) -> dict:
    """The generation loop the reference disabled (eval/base.py:35-77)."""
    import jax.numpy as jnp
    import tqdm

    model, tokenizer, encode_method, sample_processor = prepare_model(args)

    def safe_processor(path):
        """warn-and-continue on undecodable files (the eval folder may hold
        caption .txt files next to media; the reference globs '*' too)."""
        try:
            return sample_processor(path)
        except Exception as e:
            print(f"warning: cannot decode '{path}' ({e}), skipping")
            return None

    dataset = EvalDataset(safe_processor, args.sample_path)
    predictions = {}
    for filename, sample in tqdm.tqdm(dataset, desc="eval", total=len(dataset)):
        if sample is None:
            continue
        media_features = encode_method(np.asarray(sample)[None])
        prefix = model.transformer_mapper(jnp.asarray(media_features))
        captions = generate_nucleus_sampling(
            model, tokenizer, prefix,
            number_to_generate=args.number_to_generate,
            top_p=args.top_p, top_k=args.top_k,
            temperature=args.temperature, seed=args.seed,
        )
        similarities = encode_method.similarity(sample, captions)
        predictions[filename] = captions[int(np.argmax(similarities))]
    return predictions


def eval(args: Namespace) -> int:
    if args.predictions_json:
        with open(args.predictions_json, "r") as f:
            predictions = json.load(f)
    else:
        predictions = generate_predictions(args)

    if args.save_predictions:
        with open(args.save_predictions, "w") as f:
            json.dump(predictions, f)

    reference_df = pd.read_csv(args.reference_csv)
    predictions_list, references_list, ids = [], [], []
    for index, row in reference_df.iterrows():
        filename = row[args.csv_filename_column]
        if filename not in predictions:
            print(f"warning: no prediction for '{filename}', skipping")
            continue
        references = [row[key] for key in braceexpand(args.csv_reference_caption_columns)]
        references_list.append(references)
        predictions_list.append(predictions[filename])
        ids.append(index)

    scores, per_file = evaluate_metrics_from_lists(predictions_list, references_list, ids)

    if args.save_file is not None:
        with open(args.save_file, "w+") as f:
            json.dump(scores, f)
    pprint(scores)
    return 0


def run_eval() -> int:
    parser = ArgumentParser(description=__doc__, formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_eval_args(parser)
    parser = add_inference_args(parser)
    args = parser.parse_args()
    return eval(args)


if __name__ == "__main__":
    exit(run_eval())
