"""Threaded prefetching batch loader (torch-DataLoader replacement).

The reference relies on torch DataLoader (4 workers, prefetch 2 —
train_image.py:35-41).  TPU-native equivalent: a thread pool decoding/
augmenting numpy batches ahead of the device, overlapping host work with TPU
steps.  Threads (not processes) suffice because PIL/cv2/numpy release the GIL
for the heavy parts.
"""

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _stack(samples):
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return tuple(
            _stack([s[i] for s in samples]) for i in range(len(first))
        )
    return np.stack(samples)


class DataLoader:
    """Iterate minibatches of stacked numpy arrays.

    dataset: indexable returning array or tuple-of-arrays.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(
                None if self.seed is None else self.seed + self._epoch
            )
            rng.shuffle(order)
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that aborts when the consumer stopped early, so the
            # producer thread can't block forever on a full queue
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending = []
                it = iter(batches)
                try:
                    for _ in range(self.prefetch + self.num_workers):
                        idxs = next(it, None)
                        if idxs is None:
                            break
                        pending.append(pool.submit(self._load_batch, idxs))
                    while pending:
                        fut = pending.pop(0)
                        idxs = next(it, None)
                        if idxs is not None:
                            pending.append(pool.submit(self._load_batch, idxs))
                        if not put(fut.result()):
                            return
                finally:
                    put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def _load_batch(self, idxs):
        return _stack([self.dataset[i] for i in idxs])
