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
  (reference analog: DDP data sharding, train.py:77-88).
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


if __name__ == "__main__":
    main(*sys.argv[1:])
