"""Writer: embeddings → npy, captions → parquet (byte-compatible with the
reference's output contract, /root/reference/clipcap/preprocess/writer.py:
``embeddings/embeds_<zfill>.npy`` + ``captions/captions_<zfill>.parquet``
with column ``caption``, plus ``encoder_config.yaml`` at the root).

Datasets written here load in the PyTorch reference's EmbeddingReader and
vice versa.
"""
from __future__ import annotations

import math
from io import BytesIO

import fsspec
import yaml


def save_config(config, output_folder: str) -> None:
    fs, output_folder = fsspec.core.url_to_fs(output_folder)
    fs.makedirs(output_folder, exist_ok=True)
    with fs.open(output_folder + "/encoder_config.yaml", "w") as f:
        yaml.dump(config.to_dict(), f, default_flow_style=False)


class OutputSink:
    """Buffers embeddings/captions for one partition, then flushes them as
    one npy + one parquet (reference writer.py:18-96)."""

    def __init__(self, output_folder: str, partition_id: int, output_partition_count: int):
        self.fs, output_folder = fsspec.core.url_to_fs(output_folder)
        self.output_folder = output_folder
        self.embed_folder = output_folder + "/embeddings"
        self.captions_folder = output_folder + "/captions"
        self.batch_num = partition_id
        self.oom_partition_count = int(math.log10(max(1, output_partition_count))) + 1

        self.fs.makedirs(self.embed_folder, exist_ok=True)
        self.fs.makedirs(self.captions_folder, exist_ok=True)
        self._init_batch()

    def _init_batch(self) -> None:
        self.embeddings = []
        self.captions = []
        self.batch_count = 0

    def add(self, sample: dict) -> None:
        self.batch_count += sample["embeddings"].shape[0]
        self.embeddings.append(sample["embeddings"])
        self.captions.extend(sample["text"])

    def _write_batch(self) -> None:
        import numpy as np
        import pandas as pd

        batch_num_str = str(self.batch_num).zfill(self.oom_partition_count)
        embedding_mat = np.concatenate(self.embeddings)

        with self.fs.open(self.embed_folder + "/embeds_" + batch_num_str + ".npy", "wb") as f:
            npb = BytesIO()
            np.save(npb, embedding_mat)
            f.write(npb.getbuffer())

        df = pd.DataFrame(data={"caption": self.captions})
        with self.fs.open(
            self.captions_folder + "/captions_" + batch_num_str + ".parquet", "wb"
        ) as f:
            df.to_parquet(f)

    def flush(self) -> None:
        if self.batch_count == 0:
            return
        self._write_batch()
        self._init_batch()


class NumpyWriter:
    """Callable writer facade over OutputSink (reference writer.py:85-96)."""

    def __init__(self, partition_id: int, output_folder: str, output_partition_count: int):
        self.sink = OutputSink(output_folder, partition_id, output_partition_count)

    def __call__(self, batch: dict) -> None:
        self.sink.add(batch)

    def flush(self) -> None:
        self.sink.flush()
