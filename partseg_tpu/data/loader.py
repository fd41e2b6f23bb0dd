"""Batched, per-host-sharded input pipeline on Grain.

TPU-native replacement for edflow's multiprocessing prefetch
(SURVEY.md §2.1 "edflow (external dep)", §2.2 "DataLoader worker
pool"): host workers only decode/crop — the paired augmentation runs
on device inside the jit region (augment/). Per-host sharding follows
jax.process_index/count so every example is read exactly once per
epoch across hosts (SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Any, Iterator

import grain
import jax
import numpy as np


def make_loader(
    dataset: Any,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: int | None = None,
    num_workers: int = 0,
    drop_remainder: bool = True,
    process_index: int | None = None,
    process_count: int | None = None,
    backend: str = "grain",
    start_batch: int = 0,
) -> Iterator[dict]:
    """Wrap an indexable dict-example dataset into a batched iterator.

    `batch_size` is the per-host batch (global_batch / process_count).
    Yields dicts of stacked numpy arrays. backend="native" routes
    image-only training pipelines through the C++ decode pool
    (partseg_native); "grain" is the default and the only choice for
    landmark-annotated eval splits.

    `start_batch` seeks the stream: the first yielded batch is batch
    #start_batch of the equivalent start_batch=0 stream. Because the
    train loop consumes exactly one batch per step, the iterator state
    IS the step number — resume passes start_batch=restored_step and
    gets the exact uninterrupted batch sequence (SURVEY.md §5.4
    data-iterator checkpointing, with zero extra checkpoint state).
    """
    pidx = jax.process_index() if process_index is None else process_index
    pcnt = jax.process_count() if process_count is None else process_count

    if backend == "native":
        from partseg_tpu.data.native import native_loader

        return native_loader(
            dataset, batch_size, shuffle=shuffle, seed=seed,
            num_threads=max(num_workers, 1) * 2,
            process_index=pidx, process_count=pcnt,
            start_batch=start_batch,
        )

    ds = grain.MapDataset.source(dataset)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if pcnt > 1:
        ds = ds[pidx::pcnt]                        # per-host shard
    if num_epochs is None:
        ds = ds.repeat(None)
    elif num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder, batch_fn=_stack)
    if start_batch:
        ds = ds[start_batch:]                      # exact O(1) seek
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=max(num_workers, 1), prefetch_buffer_size=8)
    )
    return iter(it)


def _stack(examples: list[dict]) -> dict:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples]) for k in keys}


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread with a bounded queue so host
    batch assembly overlaps the device step (the torch-DataLoader
    pipelining role)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
