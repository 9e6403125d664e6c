"""Prefetching data loader: sampler + dataset + collate on worker threads.

Replaces the reference's paddle.io.DataLoader worker subprocesses
(ppasr/trainer.py:107-112) with a thread pool + bounded prefetch queue —
numpy/scipy release the GIL in the hot ops, and host→device transfer overlaps
with the next batch's featurization.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

from ppasr_tpu.data.dataset import collate_fn


class DataLoader:
    def __init__(self, dataset, batch_sampler, num_workers: int = 4,
                 prefetch_factor: int = 2, time_bucket: int = 16,
                 label_bucket: int = 8, shuffle_in_batch: bool = True,
                 pad_to=None):
        """``pad_to=(frames, labels)``: constant minimum pad target
        (dataset_conf.pad_to_max). Samplers may instead yield
        ``(indices, (pad_t, pad_u))`` tuples for per-batch targets —
        multi-process DP ranks use that to agree on global batch shapes."""
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch_factor)
        self.time_bucket = time_bucket
        self.label_bucket = label_bucket
        self.shuffle_in_batch = shuffle_in_batch
        self.pad_to = pad_to

    def __len__(self):
        return len(self.batch_sampler)

    def _load_batch(self, indices):
        pad_to = self.pad_to
        if isinstance(indices, tuple):
            indices, pad_to = indices
            if self.pad_to is not None:
                pad_to = (max(pad_to[0], self.pad_to[0]),
                          max(pad_to[1], self.pad_to[1]))
        # native C++ batch path (raw-waveform datasets): whole read →
        # augment → normalize chain on a GIL-free thread pool
        loader = getattr(self.dataset, 'load_raw_batch', None)
        if loader is not None and getattr(self.dataset, '_native_raw',
                                          False):
            if self.shuffle_in_batch:
                indices = list(indices)
                import random as _r
                _r.shuffle(indices)
            batch = loader(indices, label_bucket=self.label_bucket,
                           pad_to=pad_to, n_threads=self.num_workers)
            if batch is not None:
                return batch
        items = [self.dataset[i] for i in indices]
        return collate_fn(items, self.time_bucket, self.label_bucket,
                          shuffle=self.shuffle_in_batch, pad_to=pad_to)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch * self.num_workers)
        stop = threading.Event()
        _SENTINEL = object()

        def producer():
            # bounded submission: at most workers+prefetch futures in
            # flight — Executor.map would eagerly submit the WHOLE epoch
            # and pin every collated batch in RAM when featurization
            # outruns the consumer; it also couldn't stop early
            from collections import deque
            max_inflight = self.num_workers + self.prefetch
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    pending = deque()
                    it = iter(self.batch_sampler)
                    exhausted = False
                    while not stop.is_set():
                        while not exhausted and len(pending) < max_inflight:
                            try:
                                indices = next(it)
                            except StopIteration:
                                exhausted = True
                                break
                            pending.append(
                                pool.submit(self._load_batch, indices))
                        if not pending:
                            break
                        q.put(pending.popleft().result())
                    for f in pending:
                        f.cancel()
                finally:
                    q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
