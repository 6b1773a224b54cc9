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

    def train_batches(self, num_shards: int, seed: int, prefetch: int = 2) -> Iterator[dict]:
        """One epoch of stacked (D, ...) shard batches, background-prefetched."""
        ds = self.setup("train")
        caps = shard_caps(self.cfg, "train")
        plan = plan_spec(self.cfg, "train")
        bs = self.cfg.data.batch_size
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(ds))
        per_step = bs * num_shards
        steps = max(len(ds) // per_step, 1)
        if len(ds) < per_step:  # tiny datasets: sample with replacement
            order = rng.choice(len(ds), per_step * steps)

        def make(step: int) -> dict:
            shards = []
            for s in range(num_shards):
                lo = step * per_step + s * bs
                items = [ds[int(i)] for i in order[lo : lo + bs]]
                shards.append(device_arrays(collate(items, caps, plan)))
            return {k: np.stack([sh[k] for sh in shards]) for k in shards[0]}

        yield from _prefetch_iter(make, steps, prefetch)

    def eval_batches(self, split: str, prefetch: int = 2) -> Iterator[tuple]:
        """(scan_id, batch, item) per scene, batch_size=1, eval caps."""
        ds = self.setup(split)
        caps = shard_caps(self.cfg, split)
        plan = plan_spec(self.cfg, split)

        def make(i: int):
            item = ds[i]
            b = collate([item], caps, plan)
            return b["scan_ids"][0], device_arrays(b), item

        yield from _prefetch_iter(make, len(ds), prefetch)


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
