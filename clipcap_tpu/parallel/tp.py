"""Tensor parallelism for the GPT-2 LM over the mesh's ``model`` axis.

The reference has no tensor parallelism (SURVEY.md §2.3: single-GPU torch +
DeepSpeed ZeRO data parallelism only); this is TPU-native headroom beyond
parity — a Megatron-style sharding expressed entirely through
``jax.sharding.NamedSharding`` annotations, with XLA's SPMD partitioner
inserting the collectives:

* ``c_attn`` / ``c_fc`` are **column-parallel** (output dim sharded over
  ``model``) and ``c_proj`` (both of them) **row-parallel** (contraction dim
  sharded) — each block costs exactly one ``psum`` after attention and one
  after the MLP, the textbook Megatron dataflow, emitted by the partitioner
  from the shardings alone.
* The packed c_attn column layout is re-ordered **head-major**
  (``pack_qkv_head_major``): for each head h the columns q_h | k_h | v_h are
  adjacent, so ANY contiguous split of the packed dim is head-aligned and
  the q/k/v unpack + head reshape in ``models/gpt2.py::_split_qkv`` stays a
  zero-communication relabeling.  (In the HF layout q | k | v a contiguous
  shard of the packed dim crosses the q/k/v boundaries, forcing an
  all-to-all per layer.)  The permutation is a pure once-at-setup weight
  transform; head order itself is unchanged, so attention outputs — and the
  row order of the row-parallel ``attn.c_proj`` — line up with the plain
  layout.
* Embeddings, layer norms, and the tiny mapper stay replicated (wte is
  ~161 MB for gpt2-xl vs ~2.9 GB of block weights; vocab-parallel logits
  are not worth the gather on the serving path).

Layout-transform caveat: params packed head-major are an INTERNAL layout.
Checkpoint export and HF-format import always use the "qkv" layout —
``unpack_qkv_head_major`` restores it (exact inverse, pure permutation).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clipcap_tpu.models.gpt2 import GPT2Config

Params = Any


def _permute_packed(w: jax.Array, H: int, Dh: int, to_head_major: bool) -> jax.Array:
    """Permute the trailing packed dim of c_attn between (3, H, Dh) order
    ("qkv" layout) and (H, 3, Dh) order ("head" layout)."""
    *lead, packed = w.shape
    assert packed == 3 * H * Dh, (w.shape, H, Dh)
    if to_head_major:
        g = w.reshape(*lead, 3, H, Dh)
        g = jnp.moveaxis(g, -3, -2)            # (..., H, 3, Dh)
    else:
        g = w.reshape(*lead, H, 3, Dh)
        g = jnp.moveaxis(g, -2, -3)            # (..., 3, H, Dh)
    return g.reshape(*lead, packed)


def pack_qkv_head_major(params: Params, cfg: GPT2Config) -> Tuple[Params, GPT2Config]:
    """Return (params, cfg) with c_attn columns re-ordered head-major
    (``cfg.qkv_packing == "head"``).  Pure permutation — ``gpt2_apply``
    output is bitwise identical under either layout."""
    if cfg.qkv_packing == "head":
        return params, cfg
    H, Dh = cfg.n_head, cfg.head_dim
    out = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    c_attn = out["h"]["attn"]["c_attn"]
    c_attn["w"] = _permute_packed(c_attn["w"], H, Dh, to_head_major=True)
    c_attn["b"] = _permute_packed(c_attn["b"], H, Dh, to_head_major=True)
    return out, dataclasses.replace(cfg, qkv_packing="head")


def unpack_qkv_head_major(params: Params, cfg: GPT2Config) -> Tuple[Params, GPT2Config]:
    """Inverse of ``pack_qkv_head_major`` — restore the HF/export layout."""
    if cfg.qkv_packing != "head":
        return params, cfg
    H, Dh = cfg.n_head, cfg.head_dim
    out = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    c_attn = out["h"]["attn"]["c_attn"]
    c_attn["w"] = _permute_packed(c_attn["w"], H, Dh, to_head_major=False)
    c_attn["b"] = _permute_packed(c_attn["b"], H, Dh, to_head_major=False)
    return out, dataclasses.replace(cfg, qkv_packing="qkv")


def validate_tp(cfg: GPT2Config, n_model: int) -> None:
    if n_model <= 1:
        return
    if cfg.qkv_packing != "head":
        raise ValueError(
            "tensor-parallel GPT-2 requires the head-major qkv packing — "
            "call parallel.tp.pack_qkv_head_major(params, cfg) first"
        )
    if cfg.n_head % n_model:
        raise ValueError(
            f"model axis {n_model} must divide n_head={cfg.n_head} "
            f"({cfg.name}); choose a divisor (e.g. 5 for gpt2-xl's 25 heads)"
        )


def gpt2_tp_shardings(mesh: Mesh, params: Params) -> Params:
    """NamedSharding pytree for a (head-major-packed) GPT-2 param tree:
    Megatron column/row parallel over ``model``, everything else replicated.
    With ``mesh.shape['model'] == 1`` this degenerates to fully replicated
    (the specs below place nothing on a size-1 axis)."""
    rep = NamedSharding(mesh, P())
    specs = jax.tree_util.tree_map(lambda _: rep, params)
    h = specs["h"]
    col_w = NamedSharding(mesh, P(None, None, "model"))
    col_b = NamedSharding(mesh, P(None, "model"))
    row_w = NamedSharding(mesh, P(None, "model", None))
    h["attn"]["c_attn"] = {"w": col_w, "b": col_b}
    h["attn"]["c_proj"] = {"w": row_w, "b": rep}
    h["mlp"]["c_fc"] = {"w": col_w, "b": col_b}
    h["mlp"]["c_proj"] = {"w": row_w, "b": rep}
    return specs


def _is_masked(node) -> bool:
    """optax.MaskedNode placeholder (the frozen-LM ``multi_transform``
    optimizer stores these at masked leaves inside mu/nu)."""
    return type(node).__name__ == "MaskedNode"


def _shaped_like_params(node, param) -> bool:
    """Dict-skeleton match against the params tree, tolerating
    ``MaskedNode`` anywhere a param (sub)tree would sit — plain
    ``tree_structure`` equality misses the masked mu/nu of a prefix-only
    + TP run, silently replicating every moment (review r5)."""
    if _is_masked(node):
        return True
    if isinstance(param, dict):
        return (isinstance(node, dict) and set(node) == set(param)
                and all(_shaped_like_params(node[k], param[k])
                        for k in node))
    return not isinstance(node, (dict, tuple, list))


def _map_params_shaped(tree: Any, params: Params, fn, leaf=None) -> Any:
    """Apply ``fn`` to every subtree of ``tree`` shaped like ``params``
    (the mu/nu moment trees inside optax states, incl. masked ones),
    recursing through tuples/namedtuples/dicts.  Other leaves pass
    through ``leaf`` (identity when None — e.g. ``lambda _: spec`` turns
    the walk into a sharding-spec builder, train/step.py).  ``fn`` must
    tolerate ``MaskedNode`` leaves inside its subtree.  The single
    home for optax-state traversal: pack/unpack and the TP sharding
    builder must walk the state identically or they diverge silently."""

    def rec(node):
        if isinstance(node, dict) and _shaped_like_params(node, params):
            return fn(node)
        if isinstance(node, tuple):
            children = [rec(c) for c in node]
            return (type(node)(*children) if hasattr(node, "_fields")
                    else tuple(children))
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node if leaf is None else leaf(node)

    return rec(tree)


def pack_train_state(state, lm_cfg: GPT2Config):
    """Head-major-pack a TrainState for a TP run: the LM params AND the
    matching optimizer-moment subtrees get the same column permutation
    (AdamW is elementwise, so permuting moments with their params is
    exact). Returns (state, packed_lm_cfg)."""
    if lm_cfg.qkv_packing == "head":
        return state, lm_cfg

    def tr(params):
        if not jax.tree_util.tree_leaves(params["lm"]):
            return params  # masked moments of a frozen LM: nothing to pack
        lm, _ = pack_qkv_head_major(params["lm"], lm_cfg)
        return dict(params, lm=lm)

    packed_cfg = dataclasses.replace(lm_cfg, qkv_packing="head")
    return type(state)(
        step=state.step,
        params=tr(state.params),
        opt_state=_map_params_shaped(state.opt_state, state.params, tr),
    ), packed_cfg


def unpack_train_state(state, lm_cfg: GPT2Config):
    """Inverse of ``pack_train_state`` — restore the canonical qkv layout
    (what checkpoints store and HF export expects)."""
    if lm_cfg.qkv_packing != "head":
        return state, lm_cfg

    def tr(params):
        if not jax.tree_util.tree_leaves(params["lm"]):
            return params  # masked moments of a frozen LM: nothing to unpack
        lm, _ = unpack_qkv_head_major(params["lm"], lm_cfg)
        return dict(params, lm=lm)

    plain_cfg = dataclasses.replace(lm_cfg, qkv_packing="qkv")
    return type(state)(
        step=state.step,
        params=tr(state.params),
        opt_state=_map_params_shaped(state.opt_state, state.params, tr),
    ), plain_cfg


def tp_moment_spec(leaf_shape: Tuple[int, ...], tp_spec: P, mesh: Mesh) -> NamedSharding:
    """Optimizer-moment sharding for a TP run: keep the param's ``model``
    placement (a shard's moments live with the shard) and additionally
    ZeRO-1 the largest remaining axis over ``data`` when divisible."""
    n_data = mesh.shape["data"]
    spec = list(tp_spec) + [None] * (len(leaf_shape) - len(tuple(tp_spec)))
    free = [(d, i) for i, d in enumerate(leaf_shape)
            if spec[i] is None and d % n_data == 0 and d >= n_data]
    if free:
        _, axis = max(free)
        spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))
