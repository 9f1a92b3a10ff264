"""Train/test loaders: threaded mapping + batching + device prefetch.

Counterpart of ``DiverGen/divergen/data/custom_dataset_dataloader.py:88-127``
(``build_custom_train_loader``) / detectron2 ``build_detection_train_loader``
and BSGAL's ``build_prefetch_train_loader``
(``BSGAL/bsgal/data/custom_dataset_dataloader.py:133-301``). The torch
DataLoader worker-process pool is replaced by a thread pool (cv2/numpy
release the GIL in decode/resize) feeding a bounded queue, plus a
device-prefetch stage that keeps ``PREFETCH_TO_DEVICE`` batches resident so
the TPU never waits on host preprocessing (BASELINE.json north star).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def _stack_samples(samples: List[dict]) -> Dict[str, np.ndarray]:
    """List of mapper outputs → batch dict of stacked arrays (gt nested)."""
    out: Dict = {}
    keys = [k for k in samples[0] if k not in ("gt", "tfms", "image_id")]
    for k in keys:
        out[k] = np.stack([s[k] for s in samples])
    if "gt" in samples[0]:
        out["gt"] = {
            k: np.stack([s["gt"][k] for s in samples]) for k in samples[0]["gt"]
        }
    out["image_ids"] = np.array([s.get("image_id", -1) for s in samples])
    out["tfms"] = [s.get("tfms") for s in samples]
    return out


class TrainLoader:
    """Infinite batches: sampler indices → mapper (thread pool) → stack."""

    def __init__(
        self,
        dataset: Sequence[dict],
        mapper: Callable,
        sampler,
        batch_size: int,
        num_workers: int = 4,
        queue_size: int = 8,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.mapper = mapper
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = max(num_workers, 1)
        self.queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._seed = seed
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._started = False

    def _map_one(self, args):
        idx, sample_seed = args
        rng = np.random.default_rng(sample_seed)
        return self.mapper(self.dataset[idx], rng)

    def _produce(self):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        it = iter(self.sampler)
        counter = 0
        pending: "queue.Queue" = queue.Queue()
        # pipeline: keep 2 batches of futures in flight
        def submit_batch():
            nonlocal counter
            futs = []
            for _ in range(self.batch_size):
                idx = next(it)
                try:
                    futs.append(pool.submit(self._map_one, (idx, self._seed * 1_000_003 + counter)))
                except RuntimeError:
                    # interpreter/pool shutdown raced the daemon producer —
                    # treat as a stop signal instead of dying noisily
                    self._stop.set()
                    return
                counter += 1
            pending.put(futs)

        submit_batch()
        submit_batch()
        while not self._stop.is_set():
            futs = pending.get()
            samples = []
            for f in futs:
                try:
                    samples.append(f.result())
                except FileNotFoundError:
                    continue
            # backfill failed decodes synchronously
            while len(samples) < self.batch_size:
                idx = next(it)
                try:
                    samples.append(self._map_one((idx, self._seed * 1_000_003 + counter)))
                except FileNotFoundError:
                    pass
                counter += 1
            submit_batch()
            self.queue.put(_stack_samples(samples))
        pool.shutdown(wait=False)

    def __iter__(self) -> Iterator[Dict]:
        if not self._started:
            self._thread.start()
            self._started = True
        while True:
            yield self.queue.get()

    def stop(self):
        self._stop.set()


def device_prefetch(batches: Iterator[Dict], size: int = 2) -> Iterator[Dict]:
    """Move batches to device ahead of consumption (async dispatch makes
    device_put non-blocking; keeping `size` in flight hides transfer)."""
    import jax

    buf: List[Dict] = []

    def put(b):
        tfms = b.pop("tfms", None)
        out = jax.tree.map(
            lambda x: jax.device_put(x)
            if isinstance(x, np.ndarray) and x.dtype.kind not in "USO"
            else x,  # string/object arrays (filename provenance) stay on host
            b,
        )
        if tfms is not None:
            out["tfms"] = tfms
        return out

    it = iter(batches)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
        while True:
            nxt = put(next(it))
            yield buf.pop(0)
            buf.append(nxt)
    except StopIteration:
        yield from buf


def build_test_loader(dataset: Sequence[dict], mapper: Callable, batch_size: int = 1,
                      rank: int = 0, world_size: int = 1) -> Iterator[List[dict]]:
    """Finite, ordered, rank-sharded (InferenceSampler path)."""
    from .samplers import InferenceSampler

    for idx in InferenceSampler(len(dataset), rank, world_size):
        yield [mapper(dataset[idx], np.random.default_rng(idx))]
