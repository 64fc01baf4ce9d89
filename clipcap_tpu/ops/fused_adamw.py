"""Pallas fused AdamW — the TPU-native answer to DeepSpeed's FusedAdam CUDA
op (reference model.py:72-74 selects it via ``use_deepspeed_optimisers``;
SURVEY.md §2.2 maps it to "optax adamw fused by XLA; optionally a Pallas
fused AdamW kernel").

One kernel invocation updates param, exp_avg and exp_avg_sq in a single
HBM pass per block (param/moment reads and writes stay in VMEM), instead of
the several fused-but-separate elementwise programs an optax chain can
lower to.  Exposed as an optax ``GradientTransformation`` drop-in whose
updates are numerically identical to ``optax.adamw`` (same bias-corrected
update, decoupled weight decay) — cross-tested in tests/test_pallas.py.

Runs compiled on TPU; everywhere else (tests on the CPU mesh) it runs in
Pallas interpret mode automatically.

**Measured verdict (v5e, gpt2 full finetune, batch 128): optax.adamw is
FASTER in-network** (89 vs 105 ms/step) — XLA already fuses the optax
update chain, and one pallas_call per parameter leaf (~150 for GPT-2) adds
dispatch overhead the single-pass kernel doesn't win back at these sizes.
Kept as the opt-in ``--fused-optimizer`` with exact optax numerics; the
trade may flip for models with few, huge leaves.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Rows of 128 lanes per grid step. Large blocks amortize pallas pipeline
# overhead: 1024×128 fp32 × 7 live buffers ≈ 3.7 MB VMEM (budget ~16 MB).
BLOCK_ROWS = 1024
BLOCK = BLOCK_ROWS * 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _adamw_kernel(scal_ref, p_ref, g_ref, m_ref, v_ref,
                  p_out, m_out, v_out):
    """scal_ref (SMEM): [lr, b1, b2, eps, wd, bc1, bc2] with
    bc1 = 1-b1^t, bc2 = 1-b2^t precomputed on host side of the jit."""
    lr = scal_ref[0]
    b1 = scal_ref[1]
    b2 = scal_ref[2]
    eps = scal_ref[3]
    wd = scal_ref[4]
    bc1 = scal_ref[5]
    bc2 = scal_ref[6]

    g = g_ref[:]
    p = p_ref[:]
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * g * g
    mhat = m / bc1
    vhat = v / bc2
    update = mhat / (jnp.sqrt(vhat) + eps) + wd * p
    # Emit the optax-contract DELTA (apply_updates adds it) — avoids an
    # extra full-size "new_p - p" pass outside the kernel.
    p_out[:] = -lr * update
    m_out[:] = m
    v_out[:] = v


def _apply_leaf(p: Array, g: Array, m: Array, v: Array, scalars: Array):
    """Run the kernel over one leaf.

    Leaves whose size divides 128 lanes get a copy-free [rows, 128] reshape
    and a grid with a masked partial last block (pallas drops out-of-range
    writes); only ragged small leaves pay a pad copy.
    """
    orig_shape = p.shape
    flat = int(np.prod(orig_shape)) if orig_shape else 1
    padded = flat % 128 != 0
    n = ((flat + 127) // 128) * 128

    def prep(x):
        x = x.reshape(-1).astype(jnp.float32)
        if padded:
            x = jnp.pad(x, (0, n - flat))
        return x.reshape(n // 128, 128)

    p2, g2, m2, v2 = prep(p), prep(g), prep(m), prep(v)
    rows = n // 128
    block_rows = min(BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block_rows),)

    spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _adamw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(scalars, p2, g2, m2, v2)
    delta, new_m, new_v = (
        (x.reshape(-1)[:flat] if padded else x.reshape(-1)).reshape(orig_shape)
        for x in out
    )
    return delta.astype(p.dtype), new_m, new_v


class FusedAdamWState(NamedTuple):
    count: Array
    mu: Any
    nu: Any


def fused_adamw(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """optax-compatible fused AdamW (Pallas kernel per leaf)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros())

    def update_fn(grads, state, params=None):
        assert params is not None, "fused_adamw needs params (AdamW decay)"
        count = state.count + 1
        # optax convention: schedules see the 0-based count, bias correction
        # the 1-based one (scale_by_schedule vs scale_by_adam).
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        t = count.astype(jnp.float32)
        scalars = jnp.stack([
            jnp.asarray(lr, jnp.float32),
            jnp.float32(b1), jnp.float32(b2), jnp.float32(eps),
            jnp.float32(weight_decay),
            1.0 - jnp.float32(b1) ** t,
            1.0 - jnp.float32(b2) ** t,
        ])

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)

        deltas, new_m, new_v = [], [], []
        for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
            d, nm, nv = _apply_leaf(p, g, m, v, scalars)
            deltas.append(d)
            new_m.append(nm)
            new_v.append(nv)

        updates = jax.tree_util.tree_unflatten(treedef, deltas)
        return updates, FusedAdamWState(
            count=count,
            mu=jax.tree_util.tree_unflatten(treedef, new_m),
            nu=jax.tree_util.tree_unflatten(treedef, new_v),
        )

    return optax.GradientTransformation(init_fn, update_fn)
