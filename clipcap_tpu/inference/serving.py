"""Multi-chip serving: data- and tensor-sharded decode/beam over a mesh.

The reference serves strictly single-device (its decode loops run one
sample at a time on one GPU, /root/reference/clipcap/inference/demo.py).
Here the batched decode engines are pure jittable functions, so scale-out
is an annotation, not a rewrite (SURVEY.md §2.3):

* ``--mesh-data N``: params replicated, the batch dim sharded over the
  ``data`` axis — each chip runs its shard's searches with zero per-step
  collectives.
* ``--mesh-model M`` (composable with ``--mesh-data``): Megatron
  tensor-parallel LM over the ``model`` axis (``parallel/tp.py`` —
  head-major-packed c_attn, column/row-parallel blocks, the per-block
  psums emitted by XLA's partitioner).  Splits the weight stream and the
  KV cache M ways — for LMs whose weights+cache exceed one chip's HBM.

Kernel choice under a mesh: the Pallas flash-decode kernel is a
single-chip program — Mosaic custom calls carry no SPMD partitioning
rule, so it must never sit inside a multi-device ``jit`` unguarded.
Data-parallel *beam* serving therefore runs through ``jax.shard_map``
over the ``data`` axis: each chip executes the complete single-chip
program (flash kernel included) on its batch shard — beam search is
deterministic and row-independent, so the per-shard run is
token-identical to the global one.  Tensor-parallel serving and the
*sampling* path instead keep the partitioned-``jit`` form and pin the
XLA attention path (``flash=False``): under TP the KV cache itself is
``model``-sharded (only XLA's partitioner can split the attention), and
the sampling engine draws one batch-shaped categorical per step whose
noise layout is global — per-shard execution would change which noise
lands on which row, breaking parity with the single-device program.

Exercised on the 8-device virtual CPU mesh in tests and
``dryrun_multichip``.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax

from clipcap_tpu.parallel.mesh import MeshConfig, batch_sharding, make_mesh, replicated


def serving_mesh(data: int, model: int = 1):
    """Mesh for sharded serving (``--mesh-data`` x ``--mesh-model``)."""
    return make_mesh(MeshConfig(data=data, model=model),
                     devices=jax.devices()[:data * model])


def _tp(mesh) -> bool:
    return mesh.shape.get("model", 1) > 1


def _params_spec(mesh, cfg):
    """Param shardings: replicated, or — on a mesh with a ``model`` axis —
    Megatron TP specs built over an abstract (eval_shape) param tree, so
    the jitted serving program is cacheable per (mesh, cfg)."""
    if not _tp(mesh):
        return replicated(mesh)
    import dataclasses

    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2
    from clipcap_tpu.parallel.tp import gpt2_tp_shardings, validate_tp

    validate_tp(cfg, mesh.shape["model"])
    # Only the tree STRUCTURE matters for the spec pytree — build it from a
    # tiny skeleton instead of materializing cfg-sized arrays.
    skeleton = init_gpt2(dataclasses.replace(
        GPT2Config(), vocab_size=8, n_positions=8, n_embd=4, n_layer=1,
        n_head=2))
    return gpt2_tp_shardings(mesh, skeleton)


@lru_cache(maxsize=None)
def _sharded_decode_fn(mesh, cfg, sp, dtype, precision):
    from clipcap_tpu.inference.engine import decode

    # flash=False on EVERY serving mesh: the sampling engine's per-step
    # categorical draws batch-global noise, so the program must stay one
    # partitioned jit (not per-shard shard_map) to match the single-device
    # outputs — and a multi-device jit cannot contain the Mosaic kernel.
    def run(params, prefix, rng):
        return decode.__wrapped__(params, cfg, prefix, rng, sp,
                                  dtype=dtype, precision=precision,
                                  flash=False)

    return jax.jit(
        run,
        in_shardings=(_params_spec(mesh, cfg), batch_sharding(mesh, 3),
                      replicated(mesh)),
        out_shardings=batch_sharding(mesh, 1),
    )


@lru_cache(maxsize=None)
def _sharded_beam_fn(mesh, cfg, bp, dtype, precision):
    from clipcap_tpu.inference.beam import beam_search_batched

    if _tp(mesh):
        # model-sharded KV cache: XLA attention partitions it; the Pallas
        # kernel cannot, so TP pins flash=False inside one partitioned jit.
        def run(params, prefix):
            return beam_search_batched.__wrapped__(params, cfg, prefix, bp,
                                                   dtype=dtype,
                                                   precision=precision,
                                                   flash=False)

        return jax.jit(
            run,
            in_shardings=(_params_spec(mesh, cfg), batch_sharding(mesh, 3)),
            out_shardings=batch_sharding(mesh, 1),
        )

    # Pure data parallelism: shard_map over the data axis — each device
    # runs the complete single-chip beam program on its rows, keeping the
    # flash-decode kernel (and every single-chip tuning) live on real
    # multi-chip serving.  Exact: beam search is deterministic and
    # row-independent, so shard outputs equal the global program's rows.
    P = jax.sharding.PartitionSpec

    def run(params, prefix):
        return beam_search_batched.__wrapped__(params, cfg, prefix, bp,
                                               dtype=dtype,
                                               precision=precision,
                                               flash=None)

    # check_vma off: the beam while_loop's carries start replicated (built
    # from params only) and turn data-varying on the first step, which the
    # static varying-axes checker rejects; out_specs pin the real placement.
    mapped = jax.shard_map(
        run, mesh=mesh, axis_names={"data"},
        in_specs=(P(), P("data")), out_specs=P("data"), check_vma=False)
    return jax.jit(mapped)


def _shard_batch(mesh, prefix_embeds):
    """Validate the batch divides the ``data`` axis and place it on the
    mesh's batch sharding.  The explicit ``device_put`` (a no-op when the
    placement already matches) is what lets callers pass arrays that are
    already committed elsewhere — e.g. a prefix computed eagerly on the
    default device, or replicated on the serving mesh by an upstream
    mapper forward; ``jit in_shardings`` alone REJECTS committed args
    whose sharding differs instead of resharding them."""
    n = mesh.shape["data"]
    if prefix_embeds.shape[0] % n:
        raise ValueError(
            f"serving batch {prefix_embeds.shape[0]} not divisible by "
            f"mesh data axis {n}")
    return jax.device_put(prefix_embeds,
                          batch_sharding(mesh, prefix_embeds.ndim))


def decode_sharded(params, cfg, prefix_embeds, rng, sp, mesh, dtype,
                   precision=None):
    """``engine.decode`` sharded over ``mesh``: batch over ``data``, and —
    when the mesh has a ``model`` axis > 1 — the LM tensor-parallel over
    ``model`` (params must be head-major-packed: ``cfg.qkv_packing ==
    "head"`` via ``parallel.tp.pack_qkv_head_major``)."""
    prefix_embeds = _shard_batch(mesh, prefix_embeds)
    return _sharded_decode_fn(mesh, cfg, sp, dtype, precision)(
        params, prefix_embeds, rng)


def beam_search_sharded(params, cfg, prefix_embeds, bp, mesh, dtype,
                        precision=None):
    """``beam.beam_search_batched`` sharded over ``mesh`` (data batch
    sharding + optional model-axis tensor parallelism, as above)."""
    prefix_embeds = _shard_batch(mesh, prefix_embeds)
    return _sharded_beam_fn(mesh, cfg, bp, dtype, precision)(
        params, prefix_embeds)


def prepare_model_for_mesh(model, mesh):
    """Ready a ``ClipCapModel`` for serving over ``mesh``: on a
    tensor-parallel mesh the LM is re-packed head-major
    (``parallel.tp.pack_qkv_head_major`` — pure layout permutation) so the
    ``model``-axis shardings stay head-aligned. No-op otherwise."""
    if mesh is None or not _tp(mesh):
        return model
    import dataclasses

    from clipcap_tpu.parallel.tp import pack_qkv_head_major

    lm, lm_cfg = pack_qkv_head_major(model.params["lm"], model.lm_config)
    params = dict(model.params)
    params["lm"] = lm
    return dataclasses.replace(model, params=params, lm_config=lm_cfg)


def maybe_serving_mesh(args) -> Optional[object]:
    """Resolve ``--mesh-data`` / ``--mesh-model`` from parsed args
    (None = single device)."""
    n = int(getattr(args, "mesh_data", 0) or 0)
    m = int(getattr(args, "mesh_model", 0) or 0)
    n, m = max(n, 1), max(m, 1)
    if n * m <= 1:
        return None
    have = len(jax.devices())
    if have < n * m:
        raise ValueError(
            f"--mesh-data {n} x --mesh-model {m} but only {have} device(s) "
            "visible (use XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "JAX_PLATFORMS=cpu for a virtual mesh)")
    return serving_mesh(n, m)
