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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_dryrun_multichip_self_provisions():
    # The driver runs dryrun on a 1-chip host: when fewer devices exist than
    # requested, the entry point must re-exec itself with a virtual CPU mesh
    # instead of asserting (round-1 MULTICHIP failure). Requesting more than
    # conftest's 8 devices forces the subprocess branch; 9 (odd) keeps the
    # child on the cheap phases — the TP phase needs an even split and is
    # already covered at 8 devices by the in-process test above.
    import __graft_entry__ as ge

    ge.dryrun_multichip(9)


def test_linear_warmup_decay_schedule():
    from clipcap_tpu.train.state import linear_warmup_decay

    sched = linear_warmup_decay(lr=1.0, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert abs(float(sched(55)) - 0.5) < 1e-6
    assert float(sched(100)) == 0.0


@pytest.mark.slow
def test_sharded_beam_serving_matches_unsharded():
    """Batched beam search data-sharded over the 8-device mesh must produce
    identical results to the unsharded run (serving-side scale-out).

    Goes through ``inference.serving.beam_search_sharded``, whose pure-data
    path is a ``shard_map`` over the ``data`` axis: each device runs the
    complete single-chip program on its batch shard.  That structure is
    what keeps the Pallas flash-decode kernel live on real multi-chip
    serving — a Mosaic custom call cannot sit inside a multi-device jit
    (no SPMD partitioning rule) — so a second run pins ``flash=True``
    (interpret mode on CPU) to prove the kernel executes *inside* the
    shard_map and still matches."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.inference.serving import beam_search_sharded, serving_mesh
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    bp = BeamParams(beam_size=3, max_new_tokens=8, stop_token=5)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.normal(size=(16, 4, 32)) * 0.02, jnp.float32)

    ref = beam_search_batched(params, cfg, prefix, bp, dtype=jnp.float32)

    mesh = serving_mesh(8)
    sharded = beam_search_sharded(params, cfg, prefix, bp, mesh, jnp.float32)

    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(sharded.tokens))
    np.testing.assert_allclose(np.asarray(ref.scores), np.asarray(sharded.scores),
                               atol=1e-5)

    # Pallas kernel inside the shard_map (the real multi-chip TPU shape).
    def run_flash(p, pe):
        return beam_search_batched.__wrapped__(p, cfg, pe, bp,
                                               dtype=jnp.float32, flash=True)

    flashed = jax.jit(jax.shard_map(
        run_flash, mesh=mesh, axis_names={"data"},
        in_specs=(P(), P("data")), out_specs=P("data"),
        check_vma=False))(params, prefix)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(flashed.tokens))


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


@pytest.mark.slow
def test_tensor_parallel_train_step_matches_replicated():
    """lm_tp=True on a (data=2, model=4) mesh: Megatron shardings via
    NamedSharding alone. Losses must match the plain data-parallel step
    (same batch, fp32) and the c_attn moment must actually be sharded over
    the model axis."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.parallel.tp import pack_qkv_head_major
    from clipcap_tpu.train.state import create_train_state, make_optimizer
    from clipcap_tpu.train.step import make_train_step

    model, tx, _ = _tiny_setup(train_language_model=True)
    tokens, embeds = _tiny_batch()
    tokens, embeds = jnp.asarray(tokens), jnp.asarray(embeds)

    losses = {}
    for mode in ("dp", "tp"):
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        lm_cfg = model.lm_config
        if mode == "tp":
            params = dict(params)
            params["lm"], lm_cfg = pack_qkv_head_major(params["lm"], lm_cfg)
            mesh = make_mesh(MeshConfig(data=2, model=4),
                             devices=jax.devices()[:8])
        else:
            mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tx_m = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=50,
                              train_language_model=True)
        state = create_train_state(params, tx_m)
        step_fn, state = make_train_step(
            mesh, state, tx_m, lm_cfg, model.mapper_config,
            prefix_length=model.config.prefix_length, dtype=jnp.float32,
            lm_tp=(mode == "tp"),
        )
        if mode == "tp":
            # The packed c_attn weight lives sharded over the model axis,
            # and at least one Adam moment carries a model-sharded spec too.
            w = state.params["lm"]["h"]["attn"]["c_attn"]["w"]
            assert "model" in tuple(w.sharding.spec)
            assert any(
                "model" in tuple(leaf.sharding.spec)
                for leaf in jax.tree_util.tree_leaves(state.opt_state)
                if hasattr(leaf, "sharding")
                and hasattr(leaf.sharding, "spec"))
        seq = []
        for _ in range(3):
            state, metrics = step_fn(state, tokens, embeds)
            seq.append(float(metrics["loss"]))
        losses[mode] = seq

    np.testing.assert_allclose(losses["tp"], losses["dp"], rtol=2e-5)


def test_tensor_parallel_rejects_unpacked_params():
    import jax
    import pytest

    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.train.step import make_train_step

    model, tx, state = _tiny_setup(train_language_model=True)
    mesh = make_mesh(MeshConfig(data=2, model=4), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="head-major"):
        make_train_step(
            mesh, state, tx, model.lm_config, model.mapper_config,
            prefix_length=model.config.prefix_length, lm_tp=True,
        )


def test_tensor_parallel_serving_matches_single_device():
    """Beam search AND sampling decode through the serving layer on a
    (data=2, model=4) tensor-parallel mesh must reproduce the single-device
    results exactly (fp32; TP pins the XLA attention path)."""
    import jax
    import jax.numpy as jnp

    from clipcap_tpu.inference.beam import BeamParams, beam_search_batched
    from clipcap_tpu.inference.engine import SamplingParams, decode
    from clipcap_tpu.inference.serving import (
        beam_search_sharded, decode_sharded, serving_mesh)
    from clipcap_tpu.models.gpt2 import GPT2Config, init_gpt2
    from clipcap_tpu.parallel.tp import pack_qkv_head_major

    cfg = GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, name="t")
    params = init_gpt2(cfg)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.normal(size=(16, 4, 32)) * 0.02, jnp.float32)

    bp = BeamParams(beam_size=3, max_new_tokens=8, stop_token=5)
    ref_beam = beam_search_batched(params, cfg, prefix, bp, dtype=jnp.float32)
    sp = SamplingParams(max_new_tokens=8, mode="greedy", stop_token=5)
    key = jax.random.PRNGKey(0)
    ref_dec = decode(params, cfg, prefix, key, sp, dtype=jnp.float32)

    mesh = serving_mesh(2, 4)
    tp_params, tp_cfg = pack_qkv_head_major(params, cfg)
    got_beam = beam_search_sharded(tp_params, tp_cfg, prefix, bp, mesh,
                                   jnp.float32)
    got_dec = decode_sharded(tp_params, tp_cfg, prefix, key, sp, mesh,
                             jnp.float32)

    np.testing.assert_array_equal(np.asarray(ref_beam.tokens),
                                  np.asarray(got_beam.tokens))
    np.testing.assert_allclose(np.asarray(ref_beam.scores),
                               np.asarray(got_beam.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref_dec.tokens),
                                  np.asarray(got_dec.tokens))

    # Unpacked params on a TP mesh must be rejected loudly.
    with pytest.raises(ValueError, match="head-major"):
        beam_search_sharded(params, cfg, prefix, bp, mesh, jnp.float32)


@pytest.mark.slow
def test_train_cli_tensor_parallel_checkpoints_plain_layout(tmp_path):
    """--mesh-model 4 end-to-end through the train CLI: trains on a
    (2 data x 4 model) virtual mesh, and the saved checkpoints/state stay
    in the canonical qkv layout (loadable by the plain single-device
    pipeline)."""
    from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

    import jax.numpy as jnp
    import yaml

    from clipcap_tpu.models.args import add_model_args
    from clipcap_tpu.train.args import add_training_args
    from clipcap_tpu.train.train import train as run_train

    path = _write_dataset(tmp_path, counts=(8, 8), dim=16)
    with open(tmp_path / "encoder_config.yaml", "w") as f:
        yaml.safe_dump({"encoder_model_name": "clip",
                        "encoder_model_variant": "test-tiny",
                        "encoder_embedding_size": 16}, f)

    models_out = str(tmp_path / "models")
    parser = ArgumentParser(formatter_class=ArgumentDefaultsHelpFormatter)
    parser = add_training_args(parser)
    parser = add_model_args(parser)
    args = parser.parse_args([
        "--input-dataset", path, "--output-folder", models_out,
        "--language-model", "gpt2-test", "--batch-size", "8", "--epochs", "1",
        "--scheduler-warmup-steps", "1", "--logging-frequency", "1",
        "--prefix-length", "4", "--projection-length", "4",
        "--transformer-layers", "2", "--transformer-attention-heads", "4",
        "--train-language-model", "true", "--mesh-model", "4",
    ])
    assert run_train(args) == 0

    # The final checkpoint loads through the PLAIN pipeline and captions.
    from clipcap_tpu.inference.generate import generate
    from clipcap_tpu.models.clipcap import load
    from clipcap_tpu.utils.tokenizer import ByteTokenizer

    model, _ = load(os.path.join(models_out, "clipcap_final.npz"),
                    os.path.join(models_out, "clipcap_config.yaml"))
    assert model.lm_config.qkv_packing == "qkv"
    caps = generate(model, ByteTokenizer(),
                    jnp.zeros((1, 16), jnp.float32), number_to_generate=1,
                    seed=0)
    assert len(caps) == 1 and isinstance(caps[0], str)


def test_pack_unpack_train_state_roundtrip():
    """pack_train_state permutes params AND the matching Adam moments;
    unpack restores both exactly."""
    import jax

    from clipcap_tpu.parallel.tp import pack_train_state, unpack_train_state

    model, tx, state = _tiny_setup(train_language_model=True)
    packed, pcfg = pack_train_state(state, model.lm_config)
    assert pcfg.qkv_packing == "head"
    w0 = np.asarray(state.params["lm"]["h"]["attn"]["c_attn"]["w"])
    wp = np.asarray(packed.params["lm"]["h"]["attn"]["c_attn"]["w"])
    assert not np.array_equal(w0, wp)  # actually permuted

    back, bcfg = unpack_train_state(packed, pcfg)
    assert bcfg.qkv_packing == "qkv"
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tensor_parallel_prefix_only_zero1_moments():
    """Prefix-only (frozen LM, multi_transform with MaskedNode moments) +
    TP: the mapper moments must still ZeRO-1 shard over the data axis —
    plain tree-structure equality in the TP state walker missed the
    masked mu/nu and silently replicated every moment (review r5) — and
    the jitted step must run and match the data-parallel loss."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from clipcap_tpu.parallel.mesh import MeshConfig, make_mesh
    from clipcap_tpu.parallel.tp import pack_qkv_head_major
    from clipcap_tpu.train.state import create_train_state, make_optimizer
    from clipcap_tpu.train.step import make_train_step

    model, _, _ = _tiny_setup(train_language_model=False)
    tokens, embeds = _tiny_batch()
    tokens, embeds = jnp.asarray(tokens), jnp.asarray(embeds)

    losses = {}
    for mode in ("dp", "tp"):
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        lm_cfg = model.lm_config
        if mode == "tp":
            params = dict(params)
            params["lm"], lm_cfg = pack_qkv_head_major(params["lm"], lm_cfg)
            mesh = make_mesh(MeshConfig(data=2, model=4),
                             devices=jax.devices()[:8])
        else:
            mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tx_m = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=50,
                              train_language_model=False)
        state = create_train_state(params, tx_m)
        step_fn, state = make_train_step(
            mesh, state, tx_m, lm_cfg, model.mapper_config,
            prefix_length=model.config.prefix_length, dtype=jnp.float32,
            freeze_lm=True, lm_tp=(mode == "tp"),
        )
        if mode == "tp":
            specs = [leaf.sharding.spec
                     for leaf in jax.tree_util.tree_leaves(state.opt_state)
                     if hasattr(leaf, "sharding")
                     and isinstance(leaf.sharding, NamedSharding)]
            assert any("data" in tuple(s) for s in specs), specs
        seq = []
        for _ in range(3):
            state, metrics = step_fn(state, tokens, embeds)
            seq.append(float(metrics["loss"]))
        losses[mode] = seq

    np.testing.assert_allclose(losses["tp"], losses["dp"], rtol=2e-5)


def test_embedding_reader_chunked_parallel(tmp_path):
    """max_piece_size bounds each in-flight unit (pieces split into row
    chunks) and parallel_pieces drives a real thread pool — order and
    start/end slicing stay exact across chunk and piece boundaries
    (review r5: both knobs were previously accepted but ignored)."""
    import pandas as pd

    from clipcap_tpu.train.reader import EmbeddingReader

    (tmp_path / "embeddings").mkdir()
    (tmp_path / "captions").mkdir()
    total = 0
    for i in range(3):
        n = 37 + i * 10
        np.save(tmp_path / "embeddings" / f"embeds_{i:03d}.npy",
                np.arange(total, total + n,
                          dtype=np.float32)[:, None].repeat(4, 1))
        pd.DataFrame({"caption": [f"c{j}" for j in range(total, total + n)]}
                     ).to_parquet(
            tmp_path / "captions" / f"captions_{i:03d}.parquet")
        total += n
    r = EmbeddingReader(str(tmp_path / "embeddings"),
                        str(tmp_path / "captions"))
    rows, caps = [], []
    for emb, meta in r(batch_size=16, max_piece_size=10, parallel_pieces=3):
        rows.extend(emb[:, 0].astype(int).tolist())
        caps.extend(meta["caption"])
    assert rows == list(range(total))
    assert caps == [f"c{j}" for j in range(total)]
    rows2 = [int(v) for emb, _ in r(batch_size=7, start=23, end=101,
                                    max_piece_size=8, parallel_pieces=2)
             for v in emb[:, 0]]
    assert rows2 == list(range(23, 101))
