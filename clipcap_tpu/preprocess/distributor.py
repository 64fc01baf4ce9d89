"""Distributors: scale preprocess over partitions
(reference /root/reference/clipcap/preprocess/distributor.py:6-48).

The reference's pyspark JVM cluster (with per-task ``CUDA_VISIBLE_DEVICES``
pinning) is replaced by the TPU-native answer (SURVEY.md §2.2): multi-host
JAX.  Each host in the pod runs the same program; ``MultiHostDistributor``
assigns partition ids by ``jax.process_index()`` so the shard lists are
disjoint and every host's chips stay busy.  ``"pyspark"`` is accepted as an
alias for compatibility with reference command lines.
"""
from __future__ import annotations


class SequentialDistributor:
    def __init__(self, runner, output_partition_count: int):
        self.runner = runner
        self.output_partition_count = output_partition_count

    def __call__(self) -> None:
        for i in range(self.output_partition_count):
            self.runner(i)


class MultiHostDistributor:
    """Partition ids striped across pod hosts by process index."""

    def __init__(self, runner, output_partition_count: int):
        self.runner = runner
        self.output_partition_count = output_partition_count

    def __call__(self) -> None:
        # one home for the host-assignment policy (parallel/mesh.py)
        from clipcap_tpu.parallel.mesh import process_shard

        for i in process_shard(list(range(self.output_partition_count))):
            self.runner(i)


def get_distributor(name: str, runner, output_partition_count: int):
    if name == "sequential":
        return SequentialDistributor(runner, output_partition_count)
    if name in ("multihost", "pyspark"):
        return MultiHostDistributor(runner, output_partition_count)
    raise ValueError(f"unknown distribution strategy '{name}'")
