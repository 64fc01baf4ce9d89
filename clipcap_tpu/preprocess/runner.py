"""Runner: drive reader → mapper → writer for one output partition
(reference /root/reference/clipcap/preprocess/runner.py:6-37).

TPU addition: the reader's host-side decode and the mapper's device forward
are overlapped — while the encoder crunches batch N on the chip, the thread
pool is already decoding batch N+1 (the reader yields eagerly and the
encoder call only blocks on device completion).
"""
from __future__ import annotations

from typing import Callable, List, Sequence


class Sampler:
    """Partition i takes every count-th input (reference runner.py:6-12)."""

    def __init__(self, output_partition_id: int, output_partition_count: int):
        self.output_partition_id = output_partition_id
        self.output_partition_count = output_partition_count

    def __call__(self, items: Sequence) -> List:
        return [
            e for i, e in enumerate(items)
            if i % self.output_partition_count == self.output_partition_id
        ]


class Runner:
    def __init__(self, reader_builder: Callable, mapper_builder: Callable,
                 writer_builder: Callable, output_partition_count: int):
        self.reader_builder = reader_builder
        self.mapper_builder = mapper_builder
        self.writer_builder = writer_builder
        self.output_partition_count = output_partition_count

    def __call__(self, i: int) -> None:
        sampler = Sampler(i, self.output_partition_count)
        reader = self.reader_builder(sampler)
        writer = self.writer_builder(i)
        mapper = self.mapper_builder()

        # Section telemetry (utils/profiling.Timer): where a partition's
        # wall-clock goes — host decode (reader) vs device forward (mapper)
        # vs write.  The reference has no observability here at all.
        from clipcap_tpu.utils.profiling import Timer

        timer = Timer()
        samples = 0
        it = iter(reader)
        while True:
            with timer.section("read/decode"):
                batch = next(it, None)
            if batch is None:
                break
            with timer.section("encode"):
                embeddings = mapper(batch)
            with timer.section("write"):
                writer(embeddings)
            samples += len(embeddings["text"])
        with timer.section("write"):
            writer.flush()
        totals = timer.summary()
        wall = max(sum(totals.values()), 1e-9)
        parts = ", ".join(f"{k} {v:.1f}s" for k, v in totals.items())
        print(f"partition {i}: {samples} samples in {wall:.1f}s "
              f"({samples / wall:.1f}/s; {parts})")
