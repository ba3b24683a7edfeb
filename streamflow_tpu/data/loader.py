"""Host-side input pipeline: shuffled, prefetching batch loader over a
ClipDataset/MixedDataset (replacing torch DataLoader: workers=8, shuffle,
drop_last — reference core/mf_datasets.py:1453-1454).

Each worker owns an explicitly seeded np.random.Generator (epoch- and
index-dependent), so augmentation is reproducible regardless of worker
scheduling — unlike the reference, which seeds global RNGs per worker once
(core/mf_datasets.py:170-177).

The loader overlaps disk+augmentation with device compute via a thread pool
(cv2/PIL release the GIL) and a bounded prefetch queue of device-ready
numpy batches.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    """``process_index``/``process_count`` shard the (seed-consistent) global
    shuffle per host for multi-host training: every host draws the SAME
    permutation, then takes its strided slice — disjoint coverage with no
    coordination traffic. ``batch_size`` is the PER-HOST batch size."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count

    def _host_len(self):
        return len(self.ds) // self.process_count

    def __len__(self):
        n = self._host_len()
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Yield batches {'images','flows','valids'} stacked on axis 0."""
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        if self.process_count > 1:
            # strided per-host slice of the shared permutation, truncated so
            # every host sees the same number of batches (no host can run
            # ahead into a collective the others never reach)
            order = order[self.process_index::self.process_count]
            order = order[: self._host_len()]
        nb = len(self)

        def load_one(flat_idx: int):
            idx = int(order[flat_idx])
            rng = np.random.default_rng(
                (self.seed, epoch, flat_idx, self.process_index, 0x5F3759DF))
            return self.ds.load(idx, rng)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    lo = b * self.bs
                    samples = list(pool.map(load_one, range(lo, lo + self.bs)))
                    # stack every array key the dataset provides (bithings
                    # adds flows_bw/valids_bw; eval datasets add frame_ids)
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    q.put(batch)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()

    def __iter__(self):
        return self.epoch(0)


def prefetch_to_device(batches, mesh=None, depth: int = 2):
    """Host->device double buffering: keep ``depth`` batches already
    transferred (and sharded over the mesh's 'data' axis when given) while
    the device computes on the current one. The reference has no analogue —
    its DataLoader hands CPU tensors to a blocking .cuda() copy every step
    (train_mf.py:231-234)."""
    import collections

    import jax

    if mesh is not None and jax.process_count() > 1:
        # multi-host: assemble each host's slice into one global sharded
        # array (batch axis = per_host_bs * process_count globally)
        from streamflow_tpu.parallel.multihost import form_global_batch

        put = lambda b: form_global_batch(mesh, b)
    elif mesh is not None:
        from streamflow_tpu.parallel import shard_batch

        put = lambda b: shard_batch(mesh, b)
    else:
        put = lambda b: jax.tree_util.tree_map(jax.device_put, b)

    buf = collections.deque()
    it = iter(batches)
    try:
        while True:
            while len(buf) < depth:
                buf.append(put(next(it)))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()
