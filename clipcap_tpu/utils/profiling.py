"""Tracing / profiling hooks — the observability subsystem the reference
lacks entirely (SURVEY.md §5.1: "no profiler hooks, timers, or trace exports
anywhere"; the rebuild plan calls for jax.profiler trace points +
synchronized timing).

Three primitives:

* ``trace(logdir)`` — context manager around ``jax.profiler.trace``; view the
  result with TensorBoard's profile plugin or xprof.  Wired into the train
  CLI as ``--profile-dir`` (traces the first few post-compile steps).
* ``annotate(name)`` — named region that shows up on the TraceMe timeline
  (host side) and groups device ops launched inside it.
* ``timed(fn, *args)`` / ``Timer`` — wall-clock timing with an honest
  device-fetch synchronization.  On tunneled/remote TPU backends
  ``block_until_ready`` can complete before device execution finishes (it
  observed only the dispatch); fetching one scalar derived from the result is
  the reliable barrier, so that is what ``_sync`` does.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace into ``logdir``; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (host timeline + device op grouping)."""
    return jax.profiler.TraceAnnotation(name)


def _sync(result: Any) -> None:
    """Barrier on device completion via a scalar fetch (see module doc)."""
    leaves = [x for x in jax.tree_util.tree_leaves(result)
              if isinstance(x, jax.Array)]
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))


def timed(fn: Callable, *args, rounds: int = 1, **kwargs):
    """Run ``fn`` ``rounds`` times; return (last_result, seconds_per_round).

    Synchronizes once after the warmup call and once after the timed loop —
    device execution is in-order, so the final fetch bounds every round.
    """
    result = fn(*args, **kwargs)
    _sync(result)
    t0 = time.perf_counter()
    for _ in range(rounds):
        result = fn(*args, **kwargs)
    _sync(result)
    return result, (time.perf_counter() - t0) / max(1, rounds)


class Timer:
    """Accumulating section timer for loop telemetry (host-side only).

    >>> t = Timer()
    >>> with t.section("data"): batch = next(loader)
    >>> with t.section("step"): state, m = step_fn(state, *batch)
    >>> t.summary()  # {'data': ..., 'step': ...} seconds
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
