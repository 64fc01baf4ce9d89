"""Device mesh + sharding layer: the framework's single distributed backend.

The reference has no first-party communication code — it delegates to NCCL
via pytorch-lightning DDP / DeepSpeed ZeRO (/root/reference/clipcap/train/
train.py:77-85) and to pyspark for preprocess scale-out
(/root/reference/clipcap/preprocess/distributor.py:24-48).  The TPU-native
equivalent is one coherent backend (SURVEY.md §5.8):

* a named ``jax.sharding.Mesh`` over ICI (axes ``("data", "model")``),
* ``NamedSharding`` annotations + ``jax.jit`` — XLA inserts the collectives
  (gradient all-reduce = ``psum`` emitted by the partitioner),
* ZeRO-1 analog: optimizer state sharded along ``data``,
* multi-host: ``jax.distributed.initialize`` + per-process data sharding by
  ``jax.process_index()`` (preprocess partitioning and train input feeding).

Nothing here talks to specific hardware: the same code drives one chip, a
v5e pod slice, or the 8-device virtual CPU mesh used in tests.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh layout. ``data`` is the batch/DP axis; ``model`` is reserved for
    tensor-parallel sharding of the LM (gpt2-xl fits per-chip, so model=1 is
    the default and TP is optional headroom, SURVEY.md §2.3)."""

    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: Optional[int] = None) -> tuple[int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        model = max(1, self.model)
        data = self.data if self.data > 0 else n // model
        if data * model != n:
            raise ValueError(
                f"mesh {data}x{model} does not tile {n} devices; "
                "pass explicit MeshConfig(data=..., model=...)"
            )
        return data, model


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    data, model = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_params(mesh: Mesh, params: Params) -> Params:
    """Replicate params across the mesh (the model is small relative to HBM;
    the reference keeps full replicas per GPU too)."""
    sh = replicated(mesh)
    return jax.device_put(params, sh)


def _zero1_spec(leaf: jax.Array | np.ndarray, mesh: Mesh) -> NamedSharding:
    """ZeRO-1 analog: shard a leaf's largest divisible axis over ``data``.

    Falls back to replication for leaves with no axis divisible by the data
    axis size (tiny biases/scales — their memory is negligible anyway).
    """
    n_data = mesh.shape["data"]
    shape = getattr(leaf, "shape", ())
    for axis in np.argsort([-int(s) for s in shape]):
        if shape[axis] % n_data == 0 and shape[axis] >= n_data:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_opt_state_zero1(mesh: Mesh, opt_state: Any) -> Any:
    """Sharding pytree for optimizer state: moments sharded over ``data``
    (ZeRO-1; reference analog is ``--deepspeed-strategy deepspeed_stage_*``,
    /root/reference/clipcap/train/args.py:87-92)."""
    return jax.tree_util.tree_map(lambda leaf: _zero1_spec(leaf, mesh), opt_state)


def opt_state_shardings(mesh: Mesh, opt_state: Any, zero1: bool = True) -> Any:
    if zero1:
        return shard_opt_state_zero1(mesh, opt_state)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, opt_state)


def process_shard(items: list, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """Partition a work list across hosts (preprocess scale-out; the TPU
    answer to the reference's pyspark distributor, SURVEY.md §2.2)."""
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return items[pi::pc]
