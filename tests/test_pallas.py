"""Pallas kernel tests (interpret mode on the CPU mesh).

The fused AdamW kernel (clipcap_tpu/ops/fused_adamw.py) must be numerically
identical to optax.adamw — same bias-corrected update, decoupled weight
decay — so it can be swapped in via ``--fused-optimizer`` without changing
training math (the reference's DeepSpeed FusedAdam with adam_w_mode=True is
likewise AdamW-exact, model.py:72-74).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clipcap_tpu.ops.fused_adamw import fused_adamw


def _tree_allclose(a, b, atol):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=0)


def _make_params(rng):
    # Mix of shapes: 128-divisible (copy-free path), ragged (pad path),
    # scalar, and a matrix — exercises every _apply_leaf branch.
    return {
        "w": jnp.asarray(rng.standard_normal((64, 128)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((37,)), jnp.float32),
        "scale": jnp.asarray(rng.standard_normal(()), jnp.float32),
        "nested": {"k": jnp.asarray(rng.standard_normal((3, 5, 7)), jnp.float32)},
    }


@pytest.mark.parametrize("schedule", ["const", "callable"])
def test_fused_adamw_matches_optax(rng, schedule):
    params = _make_params(rng)
    lr = 1e-3 if schedule == "const" else (lambda step: 1e-3 / (1.0 + 0.1 * step))
    ref_tx = optax.adamw(learning_rate=lr, weight_decay=0.01)
    fused_tx = fused_adamw(learning_rate=lr, weight_decay=0.01)

    ref_state = ref_tx.init(params)
    fused_state = fused_tx.init(params)

    p_ref, p_fused = params, params
    for step in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).standard_normal(p.shape), jnp.float32
            ),
            params,
        )
        u_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        u_fused, fused_state = fused_tx.update(grads, fused_state, p_fused)
        _tree_allclose(u_ref, u_fused, atol=1e-6)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fused = optax.apply_updates(p_fused, u_fused)

    _tree_allclose(p_ref, p_fused, atol=1e-6)


def test_fused_adamw_under_jit_and_chain(rng):
    """Composes with clip_by_global_norm inside a jitted step, like train.py."""
    params = _make_params(rng)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), fused_adamw(learning_rate=1e-3)
    )
    ref = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=1e-3, weight_decay=0.01),
    )
    state = tx.init(params)
    ref_state = ref.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 3.0, params)

    @jax.jit
    def step(g, s, p):
        u, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, u), s2

    @jax.jit
    def ref_step(g, s, p):
        u, s2 = ref.update(g, s, p)
        return optax.apply_updates(p, u), s2

    new_p, _ = step(grads, state, params)
    ref_p, _ = ref_step(grads, ref_state, params)
    _tree_allclose(new_p, ref_p, atol=1e-6)


def test_fused_adamw_prefix_only_multi_transform(rng):
    """multi_transform('train'/'freeze') — the prefix-only path in state.py."""
    params = {
        "mapper": {"w": jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)},
        "lm": {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
    }

    def label_fn(p):
        return {
            "mapper": jax.tree_util.tree_map(lambda _: "train", p["mapper"]),
            "lm": jax.tree_util.tree_map(lambda _: "freeze", p["lm"]),
        }

    tx = optax.multi_transform(
        {"train": fused_adamw(1e-3), "freeze": optax.set_to_zero()}, label_fn
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["lm"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["mapper"]["w"]).max()) > 0.0
