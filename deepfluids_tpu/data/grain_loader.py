"""Optional grain-backed input pipeline.

BASELINE.json's north star [B] names "a sharded grain/tf.data loader
feeding pmapped training"; this provides the grain path as an alternative
to the in-repo BatchManager (which remains the default — the datasets fit
in host RAM and the native C++ reader already hides decompress latency).

Grain gives: deterministic global shuffling across epochs, per-host
sharding for multi-host training (each host reads only its slice), and
worker-process prefetch for datasets too large to cache.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from deepfluids_tpu.data.dataset import FieldDataset


class _FieldSource:
    """grain RandomAccessDataSource over a FieldDataset (normalized).

    ``indices`` restricts the source to a subset of frames (the trainer
    passes BatchManager.train_indices under --eval_holdout_scenes)."""

    def __init__(self, dataset_dir: str, field_key: str = "v",
                 indices: np.ndarray | None = None):
        self.dataset_dir = dataset_dir
        self.field_key = field_key
        self.ds = FieldDataset(dataset_dir, cache=False, field_key=field_key)
        self.indices = (np.asarray(indices, np.int64)
                        if indices is not None else None)

    def __len__(self) -> int:
        return len(self.ds) if self.indices is None else len(self.indices)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        j = int(i) if self.indices is None else int(self.indices[int(i)])
        x, y = self.ds.get_normalized(j)
        return {"x": x, "y": y}

    def __repr__(self) -> str:
        # Grain validates checkpoint state via repr(data_source); the
        # default object repr embeds a memory address, which would reject
        # every cross-process restore.  Content-based and stable instead.
        sub = ("all" if self.indices is None
               else f"{len(self.indices)}@{int(self.indices.sum())}")
        return (f"_FieldSource(dir={self.dataset_dir!r}, "
                f"key={self.field_key!r}, n={len(self)}, sub={sub})")


class _DummySource:
    """Length-matched O(1) source: advances a pipeline's sampler/worker
    state without touching the dataset (decode-free resume skip).  Echoes
    the REAL source's repr so grain's state validation accepts the
    transplanted iterator state (record order is the sampler's and
    depends only on (seed, shard, length), never on record contents)."""

    def __init__(self, n: int, repr_str: str):
        self._n = n
        self._repr = repr_str

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        return {"x": np.zeros((1,), np.float32),
                "y": np.zeros((1,), np.float32)}

    def __repr__(self) -> str:
        return self._repr


def make_grain_loader(
    dataset_dir: str,
    batch_size: int,
    seed: int = 0,
    field_key: str = "v",
    num_epochs: int | None = None,
    worker_count: int = 4,
    shard_index: int = 0,
    shard_count: int = 1,
    indices: np.ndarray | None = None,
    skip_batches: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (x [B, ...], y [B, P]) batches through grain.

    Args:
      shard_index/shard_count: per-host sharding for multi-host training
        (pass jax.process_index()/jax.process_count()).
      indices: optional frame-index subset (eval-holdout training).
      skip_batches: start the stream at batch ``skip_batches`` WITHOUT
        decoding the skipped records (resume): a structurally-identical
        pipeline over a dummy source replays the sampler to position and
        its iterator state is transplanted onto the real pipeline —
        record order is the sampler's, which depends only on
        (seed, shard, length), not on record contents.
    Raises ImportError if grain isn't installed — callers fall back to
    BatchManager.
    """
    import grain.python as grain

    source = _FieldSource(dataset_dir, field_key, indices=indices)

    def _loader(src) -> Any:
        sampler = grain.IndexSampler(
            num_records=len(src),
            shard_options=grain.ShardOptions(shard_index=shard_index,
                                             shard_count=shard_count,
                                             drop_remainder=True),
            shuffle=True,
            num_epochs=num_epochs,
            seed=seed,
        )
        return grain.DataLoader(
            data_source=src,
            sampler=sampler,
            operations=[grain.Batch(batch_size=batch_size,
                                    drop_remainder=True)],
            worker_count=worker_count,
        )

    it = iter(_loader(source))
    if skip_batches:
        dummy_it = iter(_loader(_DummySource(len(source), repr(source))))
        for _ in range(skip_batches):
            next(dummy_it)
        it.set_state(dummy_it.get_state())
    for rec in it:
        yield rec["x"], rec["y"]
