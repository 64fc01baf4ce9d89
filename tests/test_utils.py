"""Utilities: dataset merging, checkpoint export, standalone scoring,
package-level API."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_ds(path, n, dim=8, tag="x"):
    import pandas as pd
    import yaml

    (path / "embeddings").mkdir(parents=True)
    (path / "captions").mkdir()
    rng = np.random.default_rng(0)
    np.save(path / "embeddings" / "embeds_0.npy",
            rng.normal(size=(n, dim)).astype(np.float32))
    pd.DataFrame({"caption": [f"{tag} {i}" for i in range(n)]}).to_parquet(
        path / "captions" / "captions_0.parquet")
    with open(path / "encoder_config.yaml", "w") as f:
        yaml.dump({"encoder_model_name": "clip", "encoder_model_variant": "test-tiny",
                   "encoder_embedding_size": dim, "normalize_embeddings": False,
                   "use_windowed_embeddings": False, "window_size": 16,
                   "window_overlap_percentage": 0.0}, f)


def test_merge_preprocessed_datasets(tmp_path):
    from clipcap_tpu.train.reader import EmbeddingReader
    from clipcap_tpu.utils.merge_preprocessed_datasets import merge_datasets

    _write_ds(tmp_path / "a", 4, tag="a")
    _write_ds(tmp_path / "b", 6, tag="b")
    out = tmp_path / "merged"
    assert merge_datasets([str(tmp_path / "a"), str(tmp_path / "b")], str(out)) == 0

    reader = EmbeddingReader(str(out / "embeddings"), str(out / "captions"))
    assert reader.count == 10
    batches = list(reader(batch_size=10))
    caps = batches[0][1]["caption"]
    assert caps == [f"a {i}" for i in range(4)] + [f"b {i}" for i in range(6)]


def test_merge_refuses_mismatched_configs(tmp_path):
    from clipcap_tpu.utils.merge_preprocessed_datasets import merge_datasets

    _write_ds(tmp_path / "a", 2, dim=8)
    _write_ds(tmp_path / "b", 2, dim=16)
    with pytest.raises(ValueError):
        merge_datasets([str(tmp_path / "a"), str(tmp_path / "b")], str(tmp_path / "m"))


def test_export_checkpoint_roundtrip(tmp_path):
    import __graft_entry__ as ge
    import jax

    from clipcap_tpu.train.checkpoint import restore_params, save_train_state
    from clipcap_tpu.train.state import create_train_state, make_optimizer
    from clipcap_tpu.utils.export_checkpoint import export_params

    model = ge._tiny_model()
    tx = make_optimizer(1e-4, 1, 10)
    state = create_train_state(model.params, tx)

    full = str(tmp_path / "full.npz")
    save_train_state(full, jax.device_get(state))

    out = str(tmp_path / "params.npz")
    assert export_params(full, out) == 0
    restored = restore_params(out, model.params)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_scores_standalone():
    from clipcap_tpu.utils.scoring import generate_scores

    gts = {0: [{"caption": "a man rides a horse"}, {"caption": "a person on a horse"}]}
    res = {0: [{"caption": "a man rides a horse"}]}
    out = generate_scores(gts, res)
    methods = {o["method"] for o in out}
    assert {"Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "SPICE"} <= methods
    bleu1 = next(o for o in out if o["method"] == "Bleu_1")
    assert bleu1["score"] == pytest.approx(1.0, abs=1e-6)


def test_package_level_api():
    import clipcap_tpu

    assert callable(clipcap_tpu.load)
    assert callable(clipcap_tpu.get_encoder_from_model)
    assert callable(clipcap_tpu.generate_beam)
    with pytest.raises(AttributeError):
        clipcap_tpu.nonexistent_thing


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp

    from clipcap_tpu.utils.profiling import Timer, annotate, timed, trace

    # timed: returns result + per-round seconds with a device sync.
    def f(x):
        return x * 2

    r, dt = timed(f, jnp.ones((8,)), rounds=3)
    assert float(r[0]) == 2.0 and dt >= 0.0

    # Timer sections accumulate.
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2 and "a" in t.summary()

    # annotate + trace: produce a real profile dir; no-op when logdir falsy.
    with trace(None):
        pass
    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            float(jnp.sum(jnp.ones((4,))))
    assert any(tmp_path.rglob("*.xplane.pb")), "no trace written"


def test_bench_main_fault_isolation(monkeypatch, capsys):
    """bench.py must emit its one-line JSON artifact even when a section
    dies mid-run (observed: the shared TPU tunnel dropping with UNAVAILABLE
    minutes into the gpt2-xl compile) — a lost BENCH_r*.json is worse than
    a partial one."""
    import json

    import bench

    def boom(*a, **k):
        raise RuntimeError("tunnel drop")

    monkeypatch.setattr(bench, "_measure_beam", boom)
    monkeypatch.setattr(bench, "_measure_embeds",
                        lambda *a, **k: (123.0, [123.0], 256))
    monkeypatch.delenv("CLIPCAP_BENCH_SKIP_XL", raising=False)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0.0 and "tunnel drop" in rec["error"]
    assert rec["embeds"]["value"] == 123.0
    assert "tunnel drop" in rec["gpt2_xl"]["error"]
