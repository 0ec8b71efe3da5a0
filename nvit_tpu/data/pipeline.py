"""Input pipeline: shuffled batching, per-host/per-shard sharding, and
device prefetch.

≙ reference train.py:310-352 (DataLoader + DistributedSampler + pin_memory +
non_blocking H2D).  TPU-native shape:

* the host side produces raw uint8 CHW batches (zero-copy views into the
  in-memory array for CIFAR/synthetic; threaded PIL decode for ImageNet);
* batches are pushed to device asynchronously (``jax.device_put`` — JAX
  dispatch is async, so the next batch's H2D overlaps the current step, ≙
  pin_memory + non_blocking);
* normalization + AutoAugment run on device (data/augment.py);
* under SPMD, ``sharding`` places each batch directly as a sharded global
  array over the mesh's data axis (≙ DistributedSampler: each shard sees
  B/num_shards examples — but here a single process feeds the whole array).

Epoch shuffling is seeded per epoch (≙ DistributedSampler.set_epoch +
seed, train.py:316, 864-865); ``drop_last=True`` for train (train.py:341).
"""

from __future__ import annotations

import collections
import concurrent.futures
import threading
from typing import Iterator

import jax
import numpy as np

from nvit_tpu.data.datasets import ArrayDataset, ImageFolderDataset

Batch = tuple[np.ndarray, np.ndarray]  # (images u8 [B,C,H,W], labels i32 [B])


def epoch_indices(
    n: int, *, epoch: int, seed: int, shuffle: bool,
    shard_index: int = 0, shard_count: int = 1,
) -> np.ndarray:
    """Per-epoch index order, optionally sharded across hosts.

    ``idx[shard_index::shard_count]`` after a seeded shuffle is exactly the
    reference's DistributedSampler contract (train.py:310-320): same seed on
    every host, disjoint strided slices, reshuffled per epoch via set_epoch.
    """
    idx = np.arange(n)
    if shuffle:
        rng = np.random.RandomState(seed + epoch)  # ≙ sampler.set_epoch
        idx = rng.permutation(n)
    if shard_count > 1:
        # equal-length shards (≙ DistributedSampler drop_last): hosts must
        # stay in lockstep — a one-longer shard would desync SPMD collectives
        idx = idx[: len(idx) - (len(idx) % shard_count)]
        idx = idx[shard_index::shard_count]
    return idx


def iterate_array(
    ds: ArrayDataset, *, batch_size: int, epoch: int = 0, seed: int = 42,
    shuffle: bool = True, drop_last: bool = True,
    shard_index: int = 0, shard_count: int = 1, start_batch: int = 0,
) -> Iterator[Batch]:
    from nvit_tpu.data import native

    idx = epoch_indices(len(ds), epoch=epoch, seed=seed, shuffle=shuffle,
                        shard_index=shard_index, shard_count=shard_count)
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    for start in range(max(0, start_batch) * batch_size, end, batch_size):
        sel = idx[start : start + batch_size]
        # multithreaded memcpy gather (native C++), numpy fallback inside
        yield native.gather_rows(ds.images, sel), ds.labels[sel]


def iterate_folder(
    ds: ImageFolderDataset, *, batch_size: int, epoch: int = 0, seed: int = 42,
    shuffle: bool = True, drop_last: bool = True, num_workers: int = 4,
    shard_index: int = 0, shard_count: int = 1, start_batch: int = 0,
) -> Iterator[Batch]:
    """Threaded decode pipeline for JPEG-folder datasets (≙ DataLoader
    num_workers, train.py:339).  Decodes `num_workers` batches ahead."""
    idx = epoch_indices(len(ds), epoch=epoch, seed=seed, shuffle=shuffle,
                        shard_index=shard_index, shard_count=shard_count)
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    starts = list(range(max(0, start_batch) * batch_size, end, batch_size))
    if not starts:
        return

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=max(1, num_workers))

    def decode_batch(start: int) -> Batch:
        sel = idx[start : start + batch_size]
        return ds.decode_batch(sel), ds.labels[sel]

    try:
        pending = collections.deque()
        ahead = max(1, num_workers)
        for s in starts[:ahead]:
            pending.append(pool.submit(decode_batch, s))
        next_submit = ahead
        while pending:
            fut = pending.popleft()
            if next_submit < len(starts):
                pending.append(pool.submit(decode_batch, starts[next_submit]))
                next_submit += 1
            yield fut.result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def make_epoch_iterator(
    ds, *, batch_size: int, epoch: int, seed: int, shuffle: bool, drop_last: bool = True,
    num_workers: int = 4, shard_index: int = 0, shard_count: int = 1,
    start_batch: int = 0,
) -> Iterator[Batch]:
    """``start_batch`` skips the first N batches of the (deterministic,
    epoch-seeded) order without decoding them — mid-epoch resume lands on
    the exact batch the interrupted launch would have seen next, so the
    training batch sequence is a pure function of iter_num across
    relaunches (the reference replays the epoch from its start,
    train.py:885)."""
    if isinstance(ds, ImageFolderDataset):
        return iterate_folder(
            ds, batch_size=batch_size, epoch=epoch, seed=seed, shuffle=shuffle,
            drop_last=drop_last, num_workers=num_workers,
            shard_index=shard_index, shard_count=shard_count, start_batch=start_batch,
        )
    return iterate_array(
        ds, batch_size=batch_size, epoch=epoch, seed=seed, shuffle=shuffle, drop_last=drop_last,
        shard_index=shard_index, shard_count=shard_count, start_batch=start_batch,
    )


def device_prefetch(
    it: Iterator[Batch], *, size: int = 2, sharding=None
) -> Iterator[tuple[jax.Array, jax.Array]]:
    """Push up to ``size`` batches to device ahead of consumption.

    ≙ pin_memory + non_blocking H2D overlap (train.py:886-890): a background
    thread keeps `size` device transfers in flight while the jitted step runs.
    ``sharding`` (a NamedSharding over the data axis) makes the arrays land
    directly as sharded global arrays.
    """
    q: collections.deque = collections.deque()
    lock = threading.Condition()
    done = object()
    state = {"stop": False}  # set by the consumer's finally (early abandon)

    def put(batch: Batch):
        imgs, labels = batch
        if sharding is not None:
            if jax.process_count() > 1:
                # multi-host SPMD: each process contributes its local shard of
                # the GLOBAL batch (host-local [B/P, ...] → global [B, ...])
                return (
                    jax.make_array_from_process_local_data(sharding, imgs),
                    jax.make_array_from_process_local_data(sharding, labels),
                )
            return jax.device_put(imgs, sharding), jax.device_put(labels, sharding)
        return jax.device_put(imgs), jax.device_put(labels)

    def producer():
        try:
            for batch in it:
                dev = put(batch)
                with lock:
                    while len(q) >= size and not state["stop"]:
                        lock.wait()
                    if state["stop"]:
                        return  # consumer abandoned the iterator (e.g. a
                        # capped eval pass) — exit instead of waiting forever
                    q.append(dev)
                    lock.notify_all()
        except BaseException as e:  # re-raised in the consumer — a corrupt
            # shard must fail the epoch, not silently end it early
            with lock:
                q.append(_ProducerError(e))
                lock.notify_all()
        else:
            with lock:
                q.append(done)
                lock.notify_all()

    t = threading.Thread(target=producer, daemon=True, name="nvit-prefetch")
    t.start()
    try:
        while True:
            with lock:
                while not q:
                    lock.wait()
                item = q.popleft()
                lock.notify_all()
            if item is done:
                return
            if isinstance(item, _ProducerError):
                raise item.exc
            yield item
    finally:
        # runs on normal exhaustion AND on early abandonment (the trainer's
        # capped eval passes break out of this generator every eval): release
        # the producer thread and the device buffers it has pinned, and close
        # the source iterator so its resources (e.g. iterate_folder's thread
        # pool) are freed — otherwise each abandoned iterator leaks a blocked
        # thread plus `size`+1 device-resident batches
        with lock:
            state["stop"] = True
            q.clear()
            lock.notify_all()
        t.join(timeout=5)
        close = getattr(it, "close", None)
        if close is not None:
            try:
                close()
            except Exception:  # a still-running producer mid-next(it) —
                pass  # thread is daemon; the stop flag ends it at the next batch


class _ProducerError:
    """Wraps an exception raised on the prefetch producer thread so the
    consumer can re-raise it (instead of treating it as end-of-epoch)."""

    def __init__(self, exc: BaseException):
        self.exc = exc
