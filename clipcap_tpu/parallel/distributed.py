"""Multi-host bring-up: the `jax.distributed.initialize` hook.

The reference's multi-node story is NCCL-under-PyTorch-Lightning for training
and a pyspark cluster for preprocess (SURVEY.md §5.8).  Here one backend
covers both: every CLI calls :func:`maybe_initialize` at startup, which

* on TPU pods / explicitly-configured clusters, runs
  ``jax.distributed.initialize()`` so every host sees the global device set
  (``jax.devices()``) and its own ``jax.process_index()`` — the key the
  preprocess MultiHostDistributor and the train data sharding key off;
* on a single host (no coordinator configured) is a silent no-op, so the
  same commands work on a laptop, a single chip, and a pod.

Explicit configuration uses the standard JAX envs
(``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or
the TPU-pod metadata that ``jax.distributed.initialize`` auto-detects.
"""
from __future__ import annotations

import os

_initialized = False


def maybe_initialize(verbose: bool = True) -> bool:
    """Initialize jax.distributed when multi-host context is configured.

    Returns True if running (or now initialized) as part of a multi-process
    job, False for plain single-host runs.  Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True

    # Decide from the environment BEFORE touching jax — any backend use
    # (even jax.devices()) makes a later initialize() illegal.
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    megascale = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    multi_host = bool(coordinator) or len(workers) > 1 or bool(megascale)
    if not multi_host:
        return False  # single host — nothing to do

    import jax

    kwargs = {}
    if coordinator:
        missing = [v for v in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but "
                f"{' and '.join(missing)} {'is' if len(missing) == 1 else 'are'} "
                "not — all three env vars are required for multi-host "
                "initialization (see SCALING.md).")
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except RuntimeError as e:
        # Backend already initialized (e.g. library use before the CLI) —
        # report instead of crashing; sharding still works single-process.
        print(f"jax.distributed.initialize skipped: {e}")
        return jax.process_count() > 1
    if verbose:
        print(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return True
