"""Child program for the two-process multi-host integration test.

Run as ``python tests/_multihost_child.py <out.json>`` with the standard JAX
multi-process envs set (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
``JAX_PROCESS_ID``) and ``XLA_FLAGS=--xla_force_host_platform_device_count=2``
so each process contributes 2 virtual CPU devices to a 4-device global mesh.

Exercises the real multi-host path end to end:

* ``parallel.distributed.maybe_initialize`` — the hook every CLI calls
  (reference analog: Lightning/NCCL bring-up, pyspark cluster init);
* ``preprocess.distributor.MultiHostDistributor`` partition striping by
  ``jax.process_index()`` (reference
  /root/reference/clipcap/preprocess/distributor.py:24-48);
* one ZeRO-1-sharded train step over the GLOBAL mesh, each process feeding
  its local half of the batch via ``jax.make_array_from_process_local_data``
  (reference analog: DDP data sharding, train.py:77-88);
* ``tp`` mode: tensor parallelism across the REAL process boundary — a
  (data=1, model=4) mesh whose Megatron ``model`` axis spans both
  processes, running the full train step (``lm_tp=True``) and the
  sharded beam/decode serving path (``inference/serving.py``).  The
  reference has no TP at all (SURVEY.md §2.3); this validates that the
  per-block psums XLA emits from the shardings ride a genuine
  inter-process transport, not just in-process device buffers.
"""
import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize registers TPU first

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clipcap_tpu.parallel.distributed import maybe_initialize  # noqa: E402


def main(out_path: str, mode: str = "train", data_dir: str = "",
         out_dir: str = "") -> None:
    assert maybe_initialize() is True
    pi, pc = jax.process_index(), jax.process_count()
    assert pc == int(os.environ["JAX_NUM_PROCESSES"])

    if mode == "preprocess":
        # Full preprocess stage with the multihost distributor: this
        # process embeds + writes only its own partition stripe (reference
        # analog: one pyspark task per partition, distributor.py:24-48).
        from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

        from clipcap_tpu.encoders.args import add_encoder_args
        from clipcap_tpu.preprocess.args import add_preprocess_args
        from clipcap_tpu.preprocess.preprocess import preprocess

        parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
        parser = add_preprocess_args(parser)
        parser = add_encoder_args(parser)
        rc = preprocess(parser.parse_args([
            "--input-dataset", data_dir, "--output-folder", out_dir,
            "--input-format", "files", "--batch-size", "3", "--workers", "1",
            "--output-partition-count", "5",
            "--distribution-strategy", "multihost",
            "--encoder-model-name", "clip",
            "--encoder-model-variant", "test-tiny",
        ]))
        with open(out_path, "w") as f:
            json.dump({"process": pi, "rc": rc}, f)
        return

    if mode == "train_cli":
        # The REAL train CLI across two processes: global batch split per
        # process, disjoint contiguous dataset ranges, one jitted step
        # over the 4-device global mesh, checkpoints written by process 0
        # only (train/train.py multi-host wiring, review r5).
        from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

        from clipcap_tpu.models.args import add_model_args
        from clipcap_tpu.train.args import add_training_args
        from clipcap_tpu.train.train import train as run_train

        parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
        parser = add_training_args(parser)
        parser = add_model_args(parser)
        args = parser.parse_args([
            "--input-dataset", data_dir, "--output-folder", out_dir,
            "--language-model", "gpt2-test", "--batch-size", "8",
            "--epochs", "2", "--scheduler-warmup-steps", "1",
            "--logging-frequency", "1",
            "--prefix-length", "4", "--projection-length", "4",
            "--transformer-layers", "2", "--transformer-attention-heads", "4",
        ])
        rc = run_train(args)
        with open(out_path, "w") as f:
            json.dump({"process": pi, "rc": rc}, f)
        return

    if mode == "tp":
        run_tp(out_path, pi)
        return

    # --- MultiHostDistributor: partition ids striped by process index ----
    from clipcap_tpu.preprocess.distributor import get_distributor

    claimed = []
    get_distributor("multihost", claimed.append, 7)()

    # --- one sharded train step over the global mesh ---------------------
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.train.state import create_train_state, make_optimizer
    from clipcap_tpu.train.step import make_train_step

    model = ge._tiny_model(train_language_model=True)
    tx = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=50,
                        train_language_model=True)
    state = create_train_state(model.params, tx)

    n_global = jax.device_count()
    mesh = make_mesh(MeshConfig(data=n_global), devices=jax.devices())
    step_fn, state = make_train_step(
        mesh, state, tx, model.lm_config, model.mapper_config,
        prefix_length=model.config.prefix_length, dtype=jnp.float32,
        zero1=True,
    )

    # Deterministic global batch; each process holds only its own half.
    B, T, E = 8, 8, 32
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 512, size=(B, T)).astype(np.int32)
    tokens[:, -2:] = -1
    embeds = rng.normal(size=(B, E)).astype(np.float32)
    lo, hi = pi * B // pc, (pi + 1) * B // pc
    tok_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), tokens[lo:hi], (B, T))
    emb_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), embeds[lo:hi], (B, E))

    losses = []
    for _ in range(3):  # step 0 is the schedule's zero-lr step
        state, metrics = step_fn(state, tok_g, emb_g)
        losses.append(float(metrics["loss"]))

    with open(out_path, "w") as f:
        json.dump({
            "process": pi,
            "process_count": pc,
            "global_devices": n_global,
            "local_devices": jax.local_device_count(),
            "claimed": claimed,
            "losses": losses,
        }, f)


def run_tp(out_path: str, pi: int) -> None:
    """Tensor-parallel train + serve over a ``model`` axis that crosses the
    process boundary (VERDICT r4 #5).  Mesh is (data=1, model=4) with two
    devices per process, so every Megatron per-block psum is a real
    inter-process collective.  The batch/prefix are replicated (data=1):
    both processes feed identical full copies."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from clipcap_tpu.inference.beam import BeamParams
    from clipcap_tpu.inference.engine import SamplingParams
    from clipcap_tpu.inference.serving import (beam_search_sharded,
                                               decode_sharded)
    from clipcap_tpu.models.mapper import mapper_apply
    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.parallel.tp import pack_qkv_head_major
    from clipcap_tpu.train.state import create_train_state, make_optimizer
    from clipcap_tpu.train.step import make_train_step

    model = ge._tiny_model(train_language_model=True)
    lm, lm_cfg = pack_qkv_head_major(model.params["lm"], model.lm_config)
    params = dict(model.params, lm=lm)
    tx = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=50,
                        train_language_model=True)
    state = create_train_state(params, tx)

    n_global = jax.device_count()  # 4; n_head=4 divides it
    mesh = make_mesh(MeshConfig(data=1, model=n_global), devices=jax.devices())
    step_fn, state = make_train_step(
        mesh, state, tx, lm_cfg, model.mapper_config,
        prefix_length=model.config.prefix_length, dtype=jnp.float32,
        zero1=True, lm_tp=True,
    )

    B, T, E = 8, 8, 32
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 512, size=(B, T)).astype(np.int32)
    tokens[:, -2:] = -1
    embeds = rng.normal(size=(B, E)).astype(np.float32)
    tok_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), tokens, (B, T))
    emb_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), embeds, (B, E))

    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, tok_g, emb_g)
        losses.append(float(metrics["loss"]))

    # Serve with the POST-step params (state was donated; its LM tree is
    # live model-sharded across both processes — exactly the layout
    # serving._params_spec expects, so no resharding happens).
    prefix = np.asarray(mapper_apply(state.params["mapper"],
                                     model.mapper_config,
                                     jnp.asarray(embeds), dtype=jnp.float32))
    bp = BeamParams(beam_size=3, max_new_tokens=6, stop_token=511)
    beam = beam_search_sharded(state.params["lm"], lm_cfg, prefix, bp,
                               mesh, jnp.float32)
    sp = SamplingParams(max_new_tokens=5, mode="greedy", stop_token=511)
    dec = decode_sharded(state.params["lm"], lm_cfg, prefix,
                         jax.random.PRNGKey(0), sp, mesh, jnp.float32)

    with open(out_path, "w") as f:
        json.dump({
            "process": pi,
            "global_devices": n_global,
            "losses": losses,
            "beam_tokens": np.asarray(
                beam.tokens.addressable_data(0)).tolist(),
            "beam_scores": np.asarray(
                beam.scores.addressable_data(0)).tolist(),
            "decode_tokens": np.asarray(
                dec.tokens.addressable_data(0)).tolist(),
        }, f)


if __name__ == "__main__":
    main(*sys.argv[1:])
