"""DataModule: dataset construction + shard-batch iteration with background
prefetch (reference minsu3d/data/data_module.py, minus torch DataLoader).

Train iteration yields device-stacked shard batches: a (D, ...) leading axis
over the data mesh, each shard holding ``batch_size`` scenes concatenated.
Val/test iterate one scene per batch (reference data_module.py:29-39).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from minsu3d_tpu.data.batching import collate, device_arrays, plan_spec, shard_caps
from minsu3d_tpu.data.dataset import DATASETS


class DataModule:
    def __init__(self, cfg, scenes: dict | None = None):
        """``scenes``: optional {split: list[scene-dict]} injection for
        synthetic/benchmark runs without data on disk."""
        self.cfg = cfg
        self.dataset_cls = DATASETS[cfg.data.dataset]
        self._injected = scenes or {}
        self._sets: dict = {}

    def setup(self, split: str):
        if split not in self._sets:
            inj = self._injected.get(split)
            self._sets[split] = self.dataset_cls(
                self.cfg, split, scenes=inj) if inj is not None else self.dataset_cls(self.cfg, split)
        return self._sets[split]

    def steps_per_epoch(self, num_shards: int) -> int:
        n = len(self.setup("train"))
        per_step = self.cfg.data.batch_size * num_shards
        return max(n // per_step, 1)

    @property
    def num_workers(self) -> int:
        return int(self.cfg.data.get("num_workers", 1))

    def train_batches(self, num_shards: int, seed: int, prefetch: int = 2,
                      process_index: int = 0, process_count: int = 1) -> Iterator[dict]:
        """One epoch of stacked shard batches, background-prefetched by a
        ``data.num_workers``-thread pool (reference DataLoader num_workers,
        data_module.py:26 — augment/voxelize/plan-build are numpy/C and
        release the GIL, so threads scale them).

        ``num_shards`` is the GLOBAL device count. In a multi-process run
        every process builds the same seed-deterministic global scene order
        but collates ONLY its own ``num_shards / process_count`` shards; the
        trainer assembles the global array with
        ``jax.make_array_from_process_local_data``."""
        ds = self.setup("train")
        caps = shard_caps(self.cfg, "train")
        plan = plan_spec(self.cfg, "train")
        bs = self.cfg.data.batch_size
        if num_shards % process_count:
            raise ValueError(f"global shards {num_shards} not divisible by "
                             f"process count {process_count}")
        local = num_shards // process_count
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(ds))
        per_step = bs * num_shards
        steps = max(len(ds) // per_step, 1)
        if len(ds) < per_step:  # tiny datasets: sample with replacement
            order = rng.choice(len(ds), per_step * steps)

        def make(step: int) -> dict:
            shards = []
            for s in range(process_index * local, (process_index + 1) * local):
                lo = step * per_step + s * bs
                items = [ds[int(i)] for i in order[lo : lo + bs]]
                shards.append(device_arrays(collate(items, caps, plan)))
            return {k: np.stack([sh[k] for sh in shards]) for k in shards[0]}

        yield from _pool_iter(make, steps, self.num_workers, prefetch)

    def eval_batches(self, split: str, prefetch: int = 2) -> Iterator[tuple]:
        """(scan_id, batch, item) per scene, batch_size=1, eval caps."""
        ds = self.setup(split)
        caps = shard_caps(self.cfg, split)
        plan = plan_spec(self.cfg, split)

        def make(i: int):
            item = ds[i]
            b = collate([item], caps, plan)
            return b["scan_ids"][0], device_arrays(b), item

        yield from _pool_iter(make, len(ds), self.num_workers, prefetch)


def _pool_iter(make, n: int, workers: int, depth: int):
    """In-order results from a ``workers``-thread pool, at most
    ``max(workers, depth)`` items in flight (bounds host memory)."""
    if n <= 0:
        return
    if workers <= 1:
        yield from _prefetch_iter(make, n, depth)
        return
    from concurrent.futures import ThreadPoolExecutor

    window = min(max(workers, depth), n)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = {i: ex.submit(make, i) for i in range(window)}
        for i in range(n):
            item = futures.pop(i).result()  # re-raises worker exceptions
            nxt = i + window
            if nxt < n:
                futures[nxt] = ex.submit(make, nxt)
            yield item


def _prefetch_iter(make, n: int, depth: int):
    if n <= 0:
        return
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        for i in range(n):
            if stop.is_set():
                return
            try:
                q.put(make(i))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
                return

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        for _ in range(n):
            item = q.get()
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
