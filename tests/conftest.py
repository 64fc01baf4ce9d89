"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per the TPU-world playbook we
fake an 8-device mesh on CPU so every sharding/pjit path is exercised for
real (SURVEY.md §4d).

Note: the driver environment registers the TPU backend via sitecustomize at
interpreter startup (jax is partially imported before conftest runs), so
``JAX_PLATFORMS`` env alone is too late — ``jax.config.update`` after import
is the reliable switch.
"""
import os

# XLA flags are read lazily when the CPU client first initializes, so this
# still takes effect here.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Zero-egress environment: make HF hub lookups fail fast instead of retrying.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compile cache for the CPU backend.
# XLA:CPU AOT cache entries record compile-machine pseudo-features
# (+prefer-no-scatter etc.) that fail the load-time host check, so loads
# never succeed (zero speedup) — and a partially-loaded entry leaves the
# in-process collective communicator deadlocked (reproduced: TP train step
# aborts in CollectivePermuteThunk rendezvous with the cache on, passes
# with it off). bench.py keeps the cache: TPU-backend entries load fine.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Tier budget (VERDICT r4 #8): the developer gate
    # `pytest tests/ -q -m "not slow"` stays under ~5 minutes and the full
    # tier `pytest tests/ -q` under ~30 minutes on a single-core CI box.
    # When a feature's main gate is multi-minute, it is marked slow and a
    # cheaper representative of the same feature stays in the fast tier
    # (e.g. TP: test_tensor_parallel_serving_matches_single_device fast,
    # test_head_major_qkv_packing_parity slow).
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration tests (2-process clusters, "
        "full-pipeline CLIs, large virtual-mesh programs, heavy parity "
        "sweeps); deselect with -m 'not slow'")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
