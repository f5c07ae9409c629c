"""Threaded, prefetching data loader (build_dataloader parity).

Replaces the reference's torch DataLoader + Distributed(Group)Sampler wiring
(config :180-181): worker threads run the numpy/native pipeline, a bounded
queue overlaps host preprocessing with device steps, and per-process sharding
comes from parallel.dist.shard_indices.  The native csrc kernels release the
GIL during IO/transform, so threads scale on real hosts.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np

from unibev_tpu.data.nuscenes_dataset import collate
from unibev_tpu.parallel.dist import shard_indices


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        return n if self.drop_last else -(-len(self.dataset) // self.batch_size)

    def _indices(self) -> np.ndarray:
        return shard_indices(len(self.dataset), shuffle=self.shuffle,
                             seed=self.seed + self.epoch,
                             drop_last=self.drop_last)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idxs = self._indices()
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = self.epoch   # fresh per-epoch augmentations
        self.epoch += 1
        batches = [idxs[i:i + self.batch_size]
                   for i in range(0, len(idxs) - self.batch_size + 1,
                                  self.batch_size)]
        if not self.drop_last and len(idxs) % self.batch_size:
            batches.append(idxs[-(len(idxs) % self.batch_size):])

        if self.num_workers == 0:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        for pos, b in enumerate(batches):
            job_q.put((pos, b))
        results: Dict[int, Any] = {}
        lock = threading.Lock()
        next_pos = [0]

        def worker():
            while True:
                try:
                    pos, b = job_q.get_nowait()
                except queue.Empty:
                    return
                batch = collate([self.dataset[int(i)] for i in b])
                with lock:
                    results[pos] = batch
                    while next_pos[0] in results:
                        out_q.put(results.pop(next_pos[0]))
                        next_pos[0] += 1

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for _ in range(len(batches)):
            yield out_q.get()
        for t in threads:
            t.join()
