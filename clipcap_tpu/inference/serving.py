"""Multi-chip serving: data-sharded decode/beam over a named mesh.

The reference serves strictly single-device (its decode loops run one
sample at a time on one GPU, /root/reference/clipcap/inference/demo.py).
Here the batched decode engines are pure jittable functions, so scale-out
is an annotation, not a rewrite: params replicated, the batch dim sharded
over the ``data`` axis, XLA partitions the whole token loop — each chip
runs its shard's searches with zero per-step collectives (SURVEY.md §2.3).

Exposed through ``--mesh-data N`` on the inference/eval CLIs; exercised on
the 8-device virtual CPU mesh in tests and in ``dryrun_multichip``.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax

from clipcap_tpu.parallel.mesh import MeshConfig, batch_sharding, make_mesh, replicated


def serving_mesh(data: int):
    """Mesh for data-parallel serving (``--mesh-data``)."""
    return make_mesh(MeshConfig(data=data, model=1),
                     devices=jax.devices()[:data])


@lru_cache(maxsize=None)
def _sharded_decode_fn(mesh, cfg, sp, dtype, precision):
    from clipcap_tpu.inference.engine import decode

    def run(params, prefix, rng):
        return decode.__wrapped__(params, cfg, prefix, rng, sp,
                                  dtype=dtype, precision=precision)

    return jax.jit(
        run,
        in_shardings=(replicated(mesh), batch_sharding(mesh, 3),
                      replicated(mesh)),
        out_shardings=batch_sharding(mesh, 1),
    )


@lru_cache(maxsize=None)
def _sharded_beam_fn(mesh, cfg, bp, dtype, precision):
    from clipcap_tpu.inference.beam import beam_search_batched

    def run(params, prefix):
        return beam_search_batched.__wrapped__(params, cfg, prefix, bp,
                                               dtype=dtype,
                                               precision=precision)

    return jax.jit(
        run,
        in_shardings=(replicated(mesh), batch_sharding(mesh, 3)),
        out_shardings=batch_sharding(mesh, 1),
    )


def decode_sharded(params, cfg, prefix_embeds, rng, sp, mesh, dtype,
                   precision=None):
    """``engine.decode`` with the batch sharded over ``mesh``'s data axis.
    The batch size must divide by the data-axis length."""
    n = mesh.shape["data"]
    if prefix_embeds.shape[0] % n:
        raise ValueError(
            f"serving batch {prefix_embeds.shape[0]} not divisible by "
            f"mesh data axis {n}")
    return _sharded_decode_fn(mesh, cfg, sp, dtype, precision)(
        params, prefix_embeds, rng)


def beam_search_sharded(params, cfg, prefix_embeds, bp, mesh, dtype,
                        precision=None):
    """``beam.beam_search_batched`` with samples sharded over ``mesh``."""
    n = mesh.shape["data"]
    if prefix_embeds.shape[0] % n:
        raise ValueError(
            f"serving batch {prefix_embeds.shape[0]} not divisible by "
            f"mesh data axis {n}")
    return _sharded_beam_fn(mesh, cfg, bp, dtype, precision)(
        params, prefix_embeds)


def maybe_serving_mesh(args) -> Optional[object]:
    """Resolve ``--mesh-data`` from parsed args (None = single device)."""
    n = int(getattr(args, "mesh_data", 0) or 0)
    if n <= 1:
        return None
    have = len(jax.devices())
    if have < n:
        raise ValueError(
            f"--mesh-data {n} but only {have} device(s) visible "
            "(use XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "JAX_PLATFORMS=cpu for a virtual mesh)")
    return serving_mesh(n)
