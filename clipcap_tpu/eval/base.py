"""Eval driver — ``python -m clipcap_tpu.eval``.

Reference parity with the *designed* path of
/root/reference/clipcap/eval/base.py:34-118 — which ships with generation
commented out and predictions hardcoded to ``eval2.json`` (:35-80, a
documented defect).  Here the generation loop is ENABLED and batched:
encoder forward → mapper prefix → nucleus sampling → encoder-similarity
rerank, ``--eval-batch-size`` samples per device dispatch;
``--predictions-json`` reproduces the score-only mode.
Scores come from the native metric harness (BLEU/METEOR/ROUGE-L/CIDEr/
SPICE/SPIDEr — no Java).
"""
from __future__ import annotations

import json
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser, Namespace
from pprint import pprint

import numpy as np
import pandas as pd

from clipcap_tpu.eval.args import add_eval_args
from clipcap_tpu.eval.dataset import EvalDataset
from clipcap_tpu.eval.metrics import evaluate_metrics_from_lists
from clipcap_tpu.encoders.base import get_encoder_from_model
from clipcap_tpu.inference.args import add_inference_args
from clipcap_tpu.models.clipcap import load
from clipcap_tpu.utils.braceexpand import braceexpand


def prepare_model(args: Namespace):
    model, tokenizer = load(
        args.model_path, args.config_path,
        device=args.device, from_checkpoint=args.is_checkpoint,
    )
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    if isinstance(tokenizer, ByteTokenizer) and not getattr(
        args, "allow_fallback_tokenizer", False
    ):
        raise RuntimeError(
            "eval needs the real GPT-2 tokenizer: only the byte-level "
            "fallback is available, so generated captions would not match a "
            "pretrained GPT-2 and every score would be meaningless. Run "
            "clipcap-init (or set CLIPCAP_TOKENIZER_PATH) to fetch the vocab "
            "files, or pass --allow-fallback-tokenizer to proceed anyway "
            "(smoke tests only)."
        )
    if getattr(args, "int8_weights", False):
        from clipcap_tpu.ops.quant import quantize_gpt2_int8

        model.params["lm"] = quantize_gpt2_int8(model.params["lm"])
    encode_method, sample_processor = get_encoder_from_model(model, device=args.device)
    return model, tokenizer, encode_method, sample_processor


def generate_predictions(args: Namespace) -> dict:
    """The generation loop the reference disabled (eval/base.py:35-77) —
    batched across samples: the whole (encoder → mapper → nucleus-decode)
    chain runs ``eval_batch_size`` samples × ``number_to_generate``
    candidates per XLA dispatch instead of the reference's one-sample-at-a-
    time loop (decode is HBM-bound on LM weight reads, so batching is the
    difference between ~2 and >100 captions/s on a v5e chip)."""
    import jax
    import jax.numpy as jnp
    import tqdm

    from clipcap_tpu.inference.engine import SamplingParams, decode
    from clipcap_tpu.inference.generate import _decode_texts

    model, tokenizer, encode_method, sample_processor = prepare_model(args)

    def safe_processor(path):
        """warn-and-continue on undecodable files (the eval folder may hold
        caption .txt files next to media; the reference globs '*' too)."""
        try:
            return sample_processor(path)
        except Exception as e:
            print(f"warning: cannot decode '{path}' ({e}), skipping")
            return None

    n_gen = max(1, args.number_to_generate)
    eb = max(1, getattr(args, "eval_batch_size", 32) or 32)
    sp = SamplingParams(
        max_new_tokens=67, temperature=args.temperature,
        top_k=int(args.top_k) if args.top_k else 0,
        top_p=float(args.top_p) if args.top_p else 1.0,
        repetition_penalty=1.0, sentence_length_factor=0.0,
        stop_token=tokenizer.encode(".")[0], include_stop_token=True,
        mode="nucleus",
        int8_kv=getattr(args, "int8_kv_cache", False),
    )

    gen_dtype = jnp.bfloat16 if getattr(args, "fp_precision", 32) == 16 else jnp.float32
    from clipcap_tpu.inference.serving import (
        decode_sharded, maybe_serving_mesh, prepare_model_for_mesh)

    mesh = maybe_serving_mesh(args)
    model = prepare_model_for_mesh(model, mesh)  # --mesh-model: TP packing
    if mesh is not None and (eb * n_gen) % mesh.shape["data"]:
        raise ValueError(
            f"--eval-batch-size*{n_gen} candidates ({eb * n_gen}) must "
            f"be a multiple of --mesh-data {mesh.shape['data']}")
    dataset = EvalDataset(safe_processor, args.sample_path)
    predictions = {}
    names, samples = [], []
    progress = tqdm.tqdm(desc="eval", total=len(dataset))

    def flush():
        if not names:
            return
        batch = np.stack(samples)
        pad = eb - len(names)  # fixed batch shape: one compile for all batches
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[:1], pad, axis=0)])
        features = encode_method(batch)
        prefix = model.transformer_mapper(jnp.asarray(features))
        tiled = jnp.repeat(prefix, n_gen, axis=0)          # [eb·n, P, D]
        if mesh is not None:
            result = decode_sharded(model.params["lm"], model.lm_config,
                                    tiled, jax.random.PRNGKey(args.seed),
                                    sp, mesh, gen_dtype)
        else:
            result = decode(model.params["lm"], model.lm_config, tiled,
                            jax.random.PRNGKey(args.seed), sp, dtype=gen_dtype)
        all_caps = []
        for i in range(len(names)):
            row = type(result)(tokens=result.tokens[i * n_gen:(i + 1) * n_gen],
                               lengths=result.lengths[i * n_gen:(i + 1) * n_gen])
            all_caps.append(_decode_texts(tokenizer, [], row))

        if hasattr(encode_method, "encode_text"):
            # Batched rerank: one text-tower pass for ALL candidates, cosine
            # against the sample embeddings we already computed (per-sample
            # similarity() re-encodes the sample each call).
            text = encode_method.encode_text([c for caps in all_caps for c in caps])
            feats = np.asarray(features, dtype=np.float32)
            if feats.ndim == 3:  # windowed embeddings: rerank on the global view
                feats = feats[:, 0]
            feats = feats / np.maximum(
                np.linalg.norm(feats, axis=-1, keepdims=True), 1e-9)
            for i, name in enumerate(names):
                sims = feats[i] @ text[i * n_gen:(i + 1) * n_gen].T
                predictions[name] = all_caps[i][int(np.argmax(sims))]
        else:  # third-party encoders without a text tower
            for i, name in enumerate(names):
                sims = encode_method.similarity(samples[i], all_caps[i])
                predictions[name] = all_caps[i][int(np.argmax(sims))]
        progress.update(len(names))
        names.clear()
        samples.clear()

    for filename, sample in dataset:
        if sample is None:
            continue
        names.append(filename)
        samples.append(np.asarray(sample))
        if len(names) == eb:
            flush()
    flush()
    progress.close()
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
