"""Train stack: streaming reader, dataloader contract, optimizer masking,
sharded train step on the 8-device virtual mesh, checkpoint resume."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _WordTokenizer:
    """Deterministic offline stand-in for GPT-2 BPE in dataloader tests."""

    eos_token = "<eos>"
    bos_token = "<eos>"
    eos_token_id = 0
    bos_token_id = 0

    def encode(self, text):
        return [1 + (hash(w) % 100) for w in text.split()]

    def batch_encode_plus(self, texts):
        return {"input_ids": [self.encode(t) for t in texts]}


def _write_dataset(tmp_path, counts=(7, 5, 9), dim=16, windowed=False):
    import pandas as pd

    emb_dir = tmp_path / "embeddings"
    cap_dir = tmp_path / "captions"
    emb_dir.mkdir()
    cap_dir.mkdir()
    rng = np.random.default_rng(0)
    total = 0
    for i, n in enumerate(counts):
        shape = (n, 3, dim) if windowed else (n, dim)
        np.save(emb_dir / f"embeds_{i:03d}.npy", rng.normal(size=shape).astype(np.float32))
        caps = [f"caption number {total + j} with words" for j in range(n)]
        pd.DataFrame({"caption": caps}).to_parquet(cap_dir / f"captions_{i:03d}.parquet")
        total += n
    return str(tmp_path) + "/"


def test_embedding_reader_batches_cross_pieces(tmp_path):
    from clipcap_tpu.train.reader import EmbeddingReader

    path = _write_dataset(tmp_path)
    reader = EmbeddingReader(path + "embeddings", path + "captions")
    assert reader.count == 21
    assert reader.dimension == 16

    batches = list(reader(batch_size=6))
    sizes = [b[0].shape[0] for b in batches]
    assert sizes == [6, 6, 6, 3]
    # Captions stay aligned with embeddings across piece boundaries.
    all_caps = [c for _, meta in batches for c in meta["caption"]]
    assert all_caps == [f"caption number {i} with words" for i in range(21)]


def test_embedding_reader_start_end(tmp_path):
    from clipcap_tpu.train.reader import EmbeddingReader

    path = _write_dataset(tmp_path)
    reader = EmbeddingReader(path + "embeddings", path + "captions")
    batches = list(reader(batch_size=4, start=5, end=13))
    caps = [c for _, meta in batches for c in meta["caption"]]
    assert caps == [f"caption number {i} with words" for i in range(5, 13)]


def test_dataloader_contract(tmp_path):
    """Reference contract (train/dataloader.py:41-63): tokens padded to 64
    with -1; static batch shapes (final batch padded with -1 rows)."""
    from clipcap_tpu.train.dataloader import get_dataloader

    path = _write_dataset(tmp_path)
    loader, emb_size = get_dataloader(path, batch_size=8, tokenizer=_WordTokenizer())
    assert emb_size == 16

    batches = list(loader)
    assert len(batches) == len(loader) == 3
    for tokens, embeds in batches:
        assert tokens.shape == (8, 64)
        assert tokens.dtype == np.int32
        assert embeds.shape == (8, 16)
    # Final batch: rows past the real 5 samples are all pads.
    last_tokens = batches[-1][0]
    assert (last_tokens[5:] == -1).all()
    assert (last_tokens[0] != -1).any()


def _tiny_setup(train_language_model):
    import __graft_entry__ as ge
    from clipcap_tpu.train.state import create_train_state, make_optimizer

    model = ge._tiny_model(train_language_model=train_language_model)
    tx = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=50,
                        train_language_model=train_language_model)
    state = create_train_state(model.params, tx)
    return model, tx, state


def _tiny_batch(n=16, vocab=512, dim=32, T=8):
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, vocab, size=(n, T)).astype(np.int32)
    tokens[:, -2:] = -1  # pads
    embeds = rng.normal(size=(n, dim)).astype(np.float32)
    return tokens, embeds


def test_prefix_only_freezes_lm(tmp_path):
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.train.step import make_train_step

    model, tx, state = _tiny_setup(train_language_model=False)
    mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
    step_fn, state = make_train_step(
        mesh, state, tx, model.lm_config, model.mapper_config,
        prefix_length=model.config.prefix_length, dtype=jnp.float32,
    )
    lm_before = jax.device_get(state.params["lm"])
    mapper_before = jax.device_get(state.params["mapper"])

    tokens, embeds = _tiny_batch()
    # Multiple steps: the warmup schedule makes step 0 a zero-lr step.
    for _ in range(3):
        state, metrics = step_fn(state, jnp.asarray(tokens), jnp.asarray(embeds))
    assert np.isfinite(float(metrics["loss"]))

    lm_after = jax.device_get(state.params["lm"])
    mapper_after = jax.device_get(state.params["mapper"])
    # LM untouched (ClipCapModelPrefixOnly semantics, reference model.py:116-123)
    for a, b in zip(jax.tree_util.tree_leaves(lm_before), jax.tree_util.tree_leaves(lm_after)):
        np.testing.assert_array_equal(a, b)
    # Mapper trained.
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(mapper_before),
                        jax.tree_util.tree_leaves(mapper_after))
    )
    assert changed


def test_full_finetune_loss_decreases():
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.train.step import make_train_step

    model, tx, state = _tiny_setup(train_language_model=True)
    mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
    step_fn, state = make_train_step(
        mesh, state, tx, model.lm_config, model.mapper_config,
        prefix_length=model.config.prefix_length, dtype=jnp.float32, zero1=True,
    )
    tokens, embeds = _tiny_batch()
    tokens_j, embeds_j = jnp.asarray(tokens), jnp.asarray(embeds)

    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, tokens_j, embeds_j)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 8


def test_checkpoint_roundtrip_resume(tmp_path):
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.train.checkpoint import restore_train_state, save_train_state
    from clipcap_tpu.train.state import create_train_state

    model, tx, state = _tiny_setup(train_language_model=False)

    # advance a couple of steps on a single device (no mesh needed here)
    from clipcap_tpu.train.step import train_step

    tokens, embeds = _tiny_batch()
    for _ in range(2):
        state, _ = train_step(
            state, jnp.asarray(tokens), jnp.asarray(embeds), tx=tx,
            lm_cfg=model.lm_config, mapper_cfg=model.mapper_config,
            prefix_length=model.config.prefix_length, dtype=jnp.float32,
        )

    path = str(tmp_path / "ckpt.npz")
    save_train_state(path, jax.device_get(state))

    fresh = create_train_state(model.params, tx)
    restored = restore_train_state(path, fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_dryrun_multichip_self_provisions():
    # The driver runs dryrun on a 1-chip host: when fewer devices exist than
    # requested, the entry point must re-exec itself with a virtual CPU mesh
    # instead of asserting (round-1 MULTICHIP failure). Requesting more than
    # conftest's 8 devices forces the subprocess branch.
    import __graft_entry__ as ge

    ge.dryrun_multichip(12)


def test_linear_warmup_decay_schedule():
    from clipcap_tpu.train.state import linear_warmup_decay

    sched = linear_warmup_decay(lr=1.0, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(55)) - 0.5) < 1e-6
    assert float(sched(100)) == 0.0


def test_sharded_beam_serving_matches_unsharded():
    """Batched beam search data-sharded over the 8-device mesh must produce
    identical results to the unsharded run (serving-side scale-out)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2
    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    bp = BeamParams(beam_size=3, max_new_tokens=8, stop_token=5)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.normal(size=(16, 4, 32)) * 0.02, jnp.float32)

    ref = beam_search_batched(params, cfg, prefix, bp, dtype=jnp.float32)

    mesh = make_mesh(MeshConfig(data=8, model=1), devices=jax.devices()[:8])

    def run(p, pe):
        return beam_search_batched.__wrapped__(p, cfg, pe, bp, dtype=jnp.float32)

    sharded = jax.jit(
        run,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data", None))),
        out_shardings=NamedSharding(mesh, P("data")),
    )(params, prefix)

    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(sharded.scores),
                               atol=1e-5)


def test_maybe_initialize_single_host_noop(monkeypatch):
    from clipcap_tpu.parallel import distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.maybe_initialize() is False  # no coordinator: no-op


def test_deepspeed_strategy_stage23_rejected():
    """Only ZeRO-1 exists; stages 2/3 must error loudly, not silently
    downgrade (reference accepts any stage string,
    /root/reference/clipcap/train/args.py:87-92)."""
    from clipcap_tpu.train.train import resolve_zero_sharding

    assert resolve_zero_sharding(None, True, False) is True
    assert resolve_zero_sharding(None, False, False) is False
    assert resolve_zero_sharding(None, False, True) is True
    assert resolve_zero_sharding("deepspeed_stage_1", False, False) is True
    for bad in ("deepspeed_stage_2", "deepspeed_stage_2_offload",
                "deepspeed_stage_3", "2", "3"):
        with pytest.raises(SystemExit):
            resolve_zero_sharding(bad, False, False)


def test_optimizer_trajectory_matches_torch_reference():
    """N steps of the reference's configure_optimizers recipe — torch AdamW
    (defaults) + HF get_linear_schedule_with_warmup, stepped per-batch
    (/root/reference/clipcap/model/model.py:67-91) — against our optax
    chain, identical weights and grads, parameter trajectories must match.
    """
    import jax.numpy as jnp
    import torch
    from transformers import get_linear_schedule_with_warmup

    from clipcap_tpu.train.state import make_optimizer

    lr, warmup, total, n_steps = 2e-3, 3, 12, 10
    rng = np.random.default_rng(7)
    w0 = rng.normal(size=(5, 4)).astype(np.float32)
    b0 = rng.normal(size=(4,)).astype(np.float32)
    grads = [
        (rng.normal(size=(5, 4)).astype(np.float32),
         rng.normal(size=(4,)).astype(np.float32))
        for _ in range(n_steps)
    ]

    # --- torch reference recipe ---
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.AdamW([tw, tb], lr=lr)
    sched = get_linear_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total)
    torch_traj = []
    for gw, gb in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        opt.step()
        sched.step()
        torch_traj.append((tw.detach().numpy().copy(),
                           tb.detach().numpy().copy()))

    # --- our optax chain (full-finetune path: all params train) ---
    tx = make_optimizer(lr=lr, warmup_steps=warmup, total_steps=total,
                        train_language_model=True)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt_state = tx.init(params)
    for i, (gw, gb) in enumerate(grads):
        g = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
        updates, opt_state = tx.update(g, opt_state, params)
        params = {k: params[k] + updates[k] for k in params}
        np.testing.assert_allclose(np.asarray(params["w"]), torch_traj[i][0],
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(params["b"]), torch_traj[i][1],
                                   atol=2e-6, rtol=1e-5)


def test_sharded_decode_serving_matches_unsharded():
    """The --mesh-data serving path (inference/serving.py): data-sharded
    sampling decode over the 8-device mesh must be result-identical to the
    single-device engine, and the CLI arg helper must resolve the mesh."""
    import argparse

    import numpy as np
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.inference.engine import SamplingParams, decode
    from clipcap_tpu.inference.serving import decode_sharded, maybe_serving_mesh
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    rng = np.random.default_rng(1)
    prefix = jnp.asarray(rng.normal(size=(16, 4, 32)) * 0.02, jnp.float32)
    sp = SamplingParams(max_new_tokens=8, mode="greedy", stop_token=5)

    ref = decode(params, cfg, prefix, jax.random.PRNGKey(0), sp,
                 dtype=jnp.float32)

    mesh = maybe_serving_mesh(argparse.Namespace(mesh_data=8))
    assert mesh is not None and mesh.shape["data"] == 8
    got = decode_sharded(params, cfg, prefix, jax.random.PRNGKey(0), sp,
                         mesh, jnp.float32)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.lengths), np.asarray(got.lengths))

    # Indivisible batches are rejected loudly.
    import pytest

    with pytest.raises(ValueError):
        decode_sharded(params, cfg, prefix[:6], jax.random.PRNGKey(0), sp,
                       mesh, jnp.float32)
    assert maybe_serving_mesh(argparse.Namespace(mesh_data=0)) is None
