"""The sharded training step.

Reference analog: pytorch-lightning's fit loop around ``training_step``
(/root/reference/clipcap/model/model.py:94-113) with DDP/DeepSpeed doing
NCCL all-reduces behind the scenes (train.py:77-88).

TPU-native shape: ONE jitted pure function ``state, batch → state, metrics``
compiled over a named mesh.  Sharding propagation does the communication:

* batch is sharded over the ``data`` axis → per-device local compute;
* params are replicated → XLA inserts the gradient ``psum`` automatically
  when the (sharded-batch) grads meet the (replicated) params;
* optimizer moments carry ZeRO-1 ``NamedSharding`` (sharded over ``data``)
  → XLA partitions the AdamW update and all-gathers the fresh params, i.e.
  the DeepSpeed ZeRO-1 dataflow without a line of communication code.

The input pytree is donated, so params/moments update in place on-chip.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipcap_tpu.models.clipcap import clipcap_loss
from clipcap_tpu.models.gpt2 import GPT2Config
from clipcap_tpu.models.mapper import MapperConfig
from clipcap_tpu.parallel.mesh import opt_state_shardings, replicated
from clipcap_tpu.train.state import TrainState

Array = jax.Array


def train_step(
    state: TrainState,
    tokens: Array,      # [B, T] int32, -1 pads
    embeddings: Array,  # [B, E] or [B, W, E]
    *,
    tx: optax.GradientTransformation,
    lm_cfg: GPT2Config,
    mapper_cfg: MapperConfig,
    prefix_length: int,
    dtype=jnp.bfloat16,
    precision=None,
    remat: bool = False,
    freeze_lm: bool = False,
) -> Tuple[TrainState, Dict[str, Array]]:
    def loss_fn(params):
        return clipcap_loss(
            params, lm_cfg, mapper_cfg, prefix_length, tokens, embeddings,
            dtype=dtype, precision=precision, remat=remat,
            freeze_lm=freeze_lm,
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
    metrics = {"loss": loss, "step": new_state.step}
    return new_state, metrics


def state_shardings(mesh: Mesh, state: TrainState, zero1: bool = True,
                    lm_tp: bool = False) -> TrainState:
    """Sharding pytree matching a TrainState: params replicated, optimizer
    moments ZeRO-1 sharded over ``data``.

    With ``lm_tp`` (and a ``model`` mesh axis > 1) the LM params instead get
    Megatron column/row shardings over ``model`` (``parallel/tp.py``; params
    must be head-major-packed), and each moment inherits its param's
    ``model`` placement plus ZeRO-1 over ``data`` on the largest free axis.
    """
    rep = replicated(mesh)
    if lm_tp and mesh.shape.get("model", 1) > 1:
        from clipcap_tpu.parallel.tp import (_map_params_shaped,
                                             gpt2_tp_shardings,
                                             tp_moment_spec)

        p_spec = dict(
            jax.tree_util.tree_map(lambda _: rep, state.params),
            lm=gpt2_tp_shardings(mesh, state.params["lm"]),
        )
        def moments(node, specs):
            # manual recursion: masked mu/nu (prefix-only + TP) carry
            # MaskedNode leaves tree_map cannot align with the spec tree —
            # a MaskedNode position mirrors itself (no leaves, no spec)
            from clipcap_tpu.parallel.tp import _is_masked

            if _is_masked(node):
                return node
            if isinstance(node, dict):
                return {k: moments(node[k], specs[k]) for k in node}
            return (tp_moment_spec(node.shape, specs.spec, mesh)
                    if zero1 else specs)

        # optax states embed subtrees shaped exactly like the params
        # (mu/nu) — give those the param-aligned moment shardings;
        # scalars (count etc.) stay replicated.
        opt_spec = _map_params_shaped(state.opt_state, state.params,
                                      lambda node: moments(node, p_spec),
                                      leaf=lambda _: rep)
    else:
        p_spec = jax.tree_util.tree_map(lambda _: rep, state.params)
        opt_spec = opt_state_shardings(mesh, state.opt_state, zero1=zero1)
    return TrainState(step=rep, params=p_spec, opt_state=opt_spec)


def make_train_step(
    mesh: Mesh,
    state: TrainState,
    tx: optax.GradientTransformation,
    lm_cfg: GPT2Config,
    mapper_cfg: MapperConfig,
    prefix_length: int,
    *,
    embeddings_ndim: int = 2,
    dtype=jnp.bfloat16,
    precision=None,
    remat: bool = False,
    zero1: bool = True,
    freeze_lm: bool = False,
    lm_tp: bool = False,
):
    """Compile the training step over ``mesh``.

    Returns ``(step_fn, sharded_state)`` where ``sharded_state`` is the input
    state placed according to the step's input shardings (params replicated,
    moments ZeRO-1) — pass exactly that state to ``step_fn``.

    ``lm_tp``: tensor-parallel LM over the mesh's ``model`` axis — requires
    head-major-packed params (``parallel.tp.pack_qkv_head_major``) and
    ``lm_cfg.qkv_packing == "head"``; XLA's partitioner then emits the
    Megatron per-block psums from the shardings alone.
    """
    if lm_tp:
        from clipcap_tpu.parallel.tp import validate_tp

        validate_tp(lm_cfg, mesh.shape.get("model", 1))
    st_sh = state_shardings(mesh, state, zero1=zero1, lm_tp=lm_tp)
    tok_sh = NamedSharding(mesh, P("data", None))
    emb_sh = NamedSharding(mesh, P("data", *([None] * (embeddings_ndim - 1))))
    rep = replicated(mesh)

    fn = partial(
        train_step,
        tx=tx, lm_cfg=lm_cfg, mapper_cfg=mapper_cfg,
        prefix_length=prefix_length, dtype=dtype, precision=precision,
        remat=remat, freeze_lm=freeze_lm,
    )
    step_fn = jax.jit(
        fn,
        in_shardings=(st_sh, tok_sh, emb_sh),
        out_shardings=(st_sh, {"loss": rep, "step": rep}),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, st_sh)
    return step_fn, sharded_state
