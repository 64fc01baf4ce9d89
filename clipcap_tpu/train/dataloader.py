"""Training dataloader: streaming embeddings → (tokens, embeds) batches.

Reference analog: ``EmbedDataset``/``get_dataloader``
(/root/reference/clipcap/train/dataloader.py:11-93): stream with
EmbeddingReader, tokenize captions, pad to ``max_token_length=64`` with
**-1** pads, yield ``(tokens, embeds)``.

TPU-specific differences:
* every batch has a **static shape** — the final partial batch is padded
  with all ``-1`` token rows (they carry zero loss weight) instead of being
  emitted ragged, so one compiled train step serves the whole epoch;
* a background thread tokenizes/pads the next batch while the current one
  trains (host/device overlap);
* batches come out as numpy; ``jax.device_put`` with the batch sharding is
  the caller's (train loop's) job.
"""
from __future__ import annotations

import math
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from clipcap_tpu.train.reader import EmbeddingReader
from clipcap_tpu.utils.tokenizer import get_tokenizer


class EmbedDataset:
    def __init__(
        self,
        data_path: str = "./dataset/",
        language_model: str = "gpt2-xl",
        batch_size: int = 256,
        reader_max_piece_size: int = 50,
        reader_parallel_pieces: int = 10,
        max_token_length: int = 64,
        tokenizer=None,
        pad_final_batch: bool = True,
        start: int = 0,
        end: Optional[int] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ) -> None:
        self.tokenizer = tokenizer if tokenizer is not None else get_tokenizer(language_model)
        self.batch_size = batch_size
        self.reader_max_piece_size = reader_max_piece_size
        self.reader_parallel_pieces = reader_parallel_pieces
        self.max_token_length = max_token_length
        self.pad_final_batch = pad_final_batch
        self.start = start

        if not data_path.endswith("/"):
            data_path += "/"  # keep as string: works for s3/gcs via fsspec too
        self.reader = EmbeddingReader(
            embeddings_folder=data_path + "embeddings",
            metadata_folder=data_path + "captions",
            file_format="parquet_npy",
            meta_columns=["caption"],
        )
        self.end = self.reader.count if end is None else min(end, self.reader.count)
        self.encoder_embedding_size = self.reader.dimension

        # Multi-host: each process streams a CONTIGUOUS disjoint row range
        # (the EmbeddingReader start/end hook), with ``min_steps`` equalized
        # to the largest share so every process emits the same number of
        # (static-shape) batches — a short host pads with all-pad batches
        # instead of starving the collective.  ``batch_size`` here is the
        # PER-PROCESS batch.
        self.min_steps: Optional[int] = None
        if process_count and process_count > 1:
            total = self.end - self.start
            per = math.ceil(total / process_count)
            base = self.start
            self.start = min(base + process_index * per, base + total)
            self.end = min(self.start + per, base + total)
            self.min_steps = math.ceil(per / batch_size)

    def _pad_tokens(self, ids: List[int]) -> np.ndarray:
        out = np.full((self.max_token_length,), -1, dtype=np.int32)
        ids = ids[: self.max_token_length]
        out[: len(ids)] = ids
        return out

    def _pad_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        B = self.batch_size
        tokens = np.full((B, self.max_token_length), -1, np.int32)
        embeds = np.zeros((B,) + tuple(self.reader.embedding_shape),
                          np.float32)
        return tokens, embeds

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        B = self.batch_size
        emitted = 0
        for embeds, meta in self.reader(
            batch_size=B, start=self.start, end=self.end,
            max_piece_size=self.reader_max_piece_size,
            parallel_pieces=self.reader_parallel_pieces,
        ):
            token_lists = self.tokenizer.batch_encode_plus(meta["caption"])["input_ids"]
            tokens = np.stack([self._pad_tokens(t) for t in token_lists])
            embeds = np.asarray(embeds, dtype=np.float32)
            if self.pad_final_batch and tokens.shape[0] < B:
                n = B - tokens.shape[0]
                tokens = np.concatenate(
                    [tokens, np.full((n, self.max_token_length), -1, np.int32)]
                )
                embeds = np.concatenate(
                    [embeds, np.zeros((n,) + embeds.shape[1:], np.float32)]
                )
            emitted += 1
            yield tokens, embeds
        if self.min_steps is not None:
            while emitted < self.min_steps:
                emitted += 1
                yield self._pad_batch()

    def __len__(self) -> int:
        n = math.ceil((self.end - self.start) / self.batch_size)
        return max(n, self.min_steps or 0)


class PrefetchLoader:
    """Wrap an iterable dataset with a bounded background prefetch thread so
    tokenization/disk reads overlap device compute (the TPU answer to torch
    DataLoader worker processes)."""

    def __init__(self, dataset, prefetch: int = 2):
        self.dataset = dataset
        self.prefetch = prefetch

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def produce():
            try:
                for item in self.dataset:
                    q.put(item)
                q.put(SENTINEL)
            except Exception as e:
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                return
            if isinstance(item, Exception):
                raise item
            yield item


def get_dataloader(
    data_path: str = "./dataset/",
    language_model: str = "gpt2-xl",
    batch_size: int = 256,
    tokenizer=None,
    **kwargs,
) -> Tuple[PrefetchLoader, int]:
    """Reference-parity factory (train/dataloader.py:69-93): returns the
    loader plus the discovered encoder embedding size."""
    dataset = EmbedDataset(
        data_path=data_path,
        language_model=language_model,
        batch_size=batch_size,
        tokenizer=tokenizer,
        **kwargs,
    )
    return PrefetchLoader(dataset), dataset.encoder_embedding_size
