"""Train state + optimizer: the TPU-native analog of the reference's
``configure_optimizers`` (/root/reference/clipcap/model/model.py:67-91).

Reference semantics preserved:

* AdamW at ``optimizer_lr`` (FusedAdam's ``adam_w_mode=True`` ≡ AdamW; on
  TPU the optax update is fused by XLA, so "fused adam" is the default, not
  a special CUDA op).
* ``get_linear_schedule_with_warmup``: linear 0→lr over
  ``scheduler_warmup_steps``, then linear decay lr→0 at ``total_steps``.
* Prefix-only training (``ClipCapModelPrefixOnly.parameters()`` returning
  only the mapper, model.py:116-123) becomes an ``optax.multi_transform``
  over the params pytree: the ``lm`` subtree gets ``set_to_zero`` updates
  and allocates **no** optimizer moments — strictly better than the
  reference, which keeps the frozen LM in the module but out of the
  optimizer.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, Any]


class TrainState(NamedTuple):
    """A pure pytree (works directly with jit donation and NamedSharding)."""

    step: jax.Array          # scalar int32
    params: Params           # {"mapper": ..., "lm": ...}
    opt_state: Any


def linear_warmup_decay(lr: float, warmup_steps: int, total_steps: int):
    """HF ``get_linear_schedule_with_warmup`` (used at model.py:79-83)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(1.0, float(warmup_steps))
        total = jnp.maximum(warm + 1.0, float(total_steps))
        warm_frac = step / warm
        decay_frac = jnp.maximum(0.0, (total - step) / jnp.maximum(1.0, total - warm))
        return lr * jnp.where(step < warm, warm_frac, decay_frac)

    return schedule


def make_optimizer(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    train_language_model: bool = False,
    weight_decay: float = 0.01,
    grad_clip_norm: Optional[float] = None,
    fused: bool = False,
) -> optax.GradientTransformation:
    schedule = linear_warmup_decay(lr, warmup_steps, total_steps)
    if fused:
        # Pallas single-HBM-pass kernel — the TPU answer to DeepSpeed
        # FusedAdam (reference model.py:72-74). Numerically identical to
        # optax.adamw; see clipcap_tpu/ops/fused_adamw.py.
        from clipcap_tpu.ops.fused_adamw import fused_adamw

        adamw = fused_adamw(learning_rate=schedule, weight_decay=weight_decay)
    else:
        adamw = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    if grad_clip_norm:
        adamw = optax.chain(optax.clip_by_global_norm(grad_clip_norm), adamw)

    if train_language_model:
        return adamw

    # Prefix-only: mapper trains, LM is frozen (no moments allocated).
    def label_fn(params: Params):
        return {
            "mapper": jax.tree_util.tree_map(lambda _: "train", params["mapper"]),
            "lm": jax.tree_util.tree_map(lambda _: "freeze", params["lm"]),
        }

    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, label_fn
    )


def create_train_state(params: Params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )
