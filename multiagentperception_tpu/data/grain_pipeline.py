"""Grain-backed input pipeline: deterministic, checkpointable iteration.

The simple threaded ``DataLoader`` (pipeline.py) restarts its shuffle order
on resume; production multi-week runs need the *data stream itself* to
resume exactly. Grain provides that: the iterator's position is state that
serializes with the training checkpoint (``iterator.get_state()`` /
``set_state()``), sharding-aware sampling, and worker-process decode.

Enable with ``training.data_backend: grain`` (default stays the built-in
loader for reference-parity behavior).
"""

from __future__ import annotations

from typing import Any

import numpy as np


class _DatasetSource:
    """grain RandomAccessDataSource view over an AirsimDataset."""

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, index: int):
        return self._ds[int(index)]

    def __repr__(self) -> str:
        # grain validates repr(data_source) when restoring iterator state; the
        # default repr embeds the object id, which breaks restore-into-a-fresh
        # -loader (checkpoint resume). Identify by content instead.
        root = getattr(self._ds, "root", "?")
        split = getattr(self._ds, "split", "?")
        return f"_DatasetSource(root={root!r}, split={split!r}, n={len(self._ds)})"


class GrainLoader:
    """Drop-in replacement for data.pipeline.DataLoader with checkpointable
    iteration. Yields the same tuples of stacked numpy arrays.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        num_epochs: int | None = None,
        shard_options=None,
        shard_by_process: bool = False,
    ):
        """``shard_by_process`` splits the sample stream across jax processes
        (multi-host DP: each host loads only its slice; the batch then
        shards over the 'data' mesh axis on device). ``shard_options`` takes
        an explicit ``grain.ShardOptions`` for tests/custom topologies."""
        import grain.python as gp

        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self._gp = gp
        if shard_options is None:
            shard_options = (
                gp.ShardByJaxProcess(drop_remainder=True)
                if shard_by_process else gp.NoSharding()
            )
        self.shard_options = shard_options
        self._epoch = 0
        self._it = None

    def _make_loader(self, seed: int, num_epochs: int | None = 1):
        gp = self._gp
        return gp.DataLoader(
            data_source=_DatasetSource(self.dataset),
            sampler=gp.IndexSampler(
                num_records=len(self.dataset),
                shuffle=self.shuffle,
                seed=seed,
                num_epochs=num_epochs,
                shard_options=self.shard_options,
            ),
            operations=[gp.Batch(self.batch_size, drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        # fresh epoch iterator with per-epoch reshuffle (seed + epoch);
        # use persistent_iterator() for cross-checkpoint resume
        loader = self._make_loader(self.seed + self._epoch)
        self._epoch += 1
        return iter(loader)

    # --- checkpointable stream -------------------------------------------
    def persistent_iterator(self):
        """The endless (num_epochs=None, per-epoch reshuffled) iterator whose
        position saves/restores with get_state/set_state — the trainer
        iterates this one and checkpoints its position beside the train
        state, so a resumed run continues exactly mid-epoch."""
        if self._it is None:
            self._it = iter(self._make_loader(self.seed, num_epochs=None))
        return self._it

    def get_state(self) -> bytes:
        return self.persistent_iterator().get_state()

    def set_state(self, state: bytes) -> None:
        self.persistent_iterator().set_state(state)

    def shutdown(self) -> None:
        """Drop the persistent iterator so its worker processes/pipes are
        released (grain exposes no explicit close; collection closes the
        parent-side pipes and the workers exit on EOF). Called by the
        trainer before an rss_limit_gb exec-restart; a later
        persistent_iterator() builds a fresh stream."""
        self._it = None
        import gc

        gc.collect()
