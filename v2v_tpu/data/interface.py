"""Dataset composition + a torch-free batching loader.

Replaces the reference's pandas/ConcatDataset/DataLoader stack
(data/data_interface.py:6-27, train.py:52-65): file-of-paths -> concat of
per-file datasets; list-of-config -> concat of concats. The loader
shuffles with a per-epoch seed, collates numpy batches, prefetches with
threads, and shards sample indices per host (the DistributedSampler
replacement — each JAX process takes a disjoint slice).
"""
from __future__ import annotations

import bisect
import queue
import threading
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np

from ..config import resolve_target


class ConcatDataset:
    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self) -> int:
        return self.cum[-1] if self.cum else 0

    def __getitem__(self, idx: int):
        ds_idx = bisect.bisect_right(self.cum, idx)
        prev = self.cum[ds_idx - 1] if ds_idx > 0 else 0
        return self.datasets[ds_idx][idx - prev]


def read_path_list(data_file: str) -> List[str]:
    with open(data_file) as f:
        return [line.strip() for line in f if line.strip()]


def make_concat_dataset(configs: Dict[str, Any]) -> ConcatDataset:
    """One config block -> ConcatDataset over its data_file paths
    (data/data_interface.py:6-21)."""
    data_paths = read_path_list(configs["data_file"])
    begin = configs.get("begin_seq", 0)
    end = configs.get("end_seq", len(data_paths))
    cls = resolve_target(configs["class_name"])
    return ConcatDataset([cls(p, configs) for p in data_paths[begin:end]])


def make_concat_multi_dataset(configs: List[Dict[str, Any]]) -> ConcatDataset:
    return ConcatDataset([make_concat_dataset(c) for c in configs])


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack numpy/scalar fields into a leading batch dim; keep
    strings/lists as python lists."""
    out: Dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Prefetching loader with per-host index sharding.

    worker_type:
      * "thread" — shared-memory, safe for datasets holding open file
        handles (h5). cv2 releases the GIL during decode but the numpy
        crop/collate work serializes.
      * "process" — forked workers (the torch-DataLoader model); true
        parallelism for decode-heavy video datasets. The dataset must be
        fork-safe (WebVid opens its VideoCapture per item; h5 datasets
        with open handles should stay on threads).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, process_index: int = 0,
                 process_count: int = 1, prefetch: int = 4,
                 worker_type: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.worker_type = worker_type
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (DistributedSampler replacement)
        return idx[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self.num_workers <= 1:
            for bidx in batches:
                yield collate([self.dataset[int(i)] for i in bidx])
            return
        if self.worker_type == "process":
            yield from self._process_iter(batches)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        task_q: "queue.Queue" = queue.Queue()
        for pos, bidx in enumerate(batches):
            task_q.put((pos, bidx))
        stop = threading.Event()     # consumer abandoned iteration

        def worker():
            while not stop.is_set():
                try:
                    pos, bidx = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = collate([self.dataset[int(i)] for i in bidx])
                except Exception as e:       # surface errors to consumer
                    batch = e
                # bounded put that re-checks the stop flag: a worker
                # blocked forever in put() leaks the thread AND up to
                # `prefetch` collated batches every time the consumer
                # breaks early (harness max_batches, exceptions, ...)
                while not stop.is_set():
                    try:
                        out_q.put((pos, batch), timeout=0.2)
                        break
                    except queue.Full:
                        continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        results: Dict[int, Any] = {}
        try:
            next_pos = 0
            received = 0
            while received < nb:
                pos, batch = out_q.get()
                received += 1
                results[pos] = batch
                while next_pos in results:
                    b = results.pop(next_pos)
                    next_pos += 1
                    if isinstance(b, Exception):
                        raise b
                    yield b
        finally:
            stop.set()
            # drain so blocked putters wake promptly
            while True:
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
            for t in threads:
                t.join(timeout=5)

    def _process_iter(self, batches) -> Iterator[Dict[str, Any]]:
        """Forked worker pool: each worker collates whole batches and
        ships them back pickled through an mp queue; batches are
        re-ordered on the consumer side so iteration order matches the
        thread/serial paths exactly."""
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        nb = len(batches)
        nw = min(self.num_workers, nb)
        task_q = ctx.Queue()
        out_q = ctx.Queue(maxsize=max(2, self.prefetch))
        for pos, bidx in enumerate(batches):
            task_q.put((pos, [int(i) for i in bidx]))
        for _ in range(nw):
            task_q.put(None)

        dataset = self.dataset

        def worker():
            try:
                import cv2
                cv2.setNumThreads(1)   # one decode thread per process
            except Exception:
                pass
            while True:
                item = task_q.get()
                if item is None:
                    return
                pos, bidx = item
                try:
                    out_q.put((pos, collate([dataset[i] for i in bidx]),
                               None))
                except Exception as e:
                    import traceback
                    out_q.put((pos, None,
                               f"{e!r}\n{traceback.format_exc()}"))

        procs = [ctx.Process(target=worker, daemon=True) for _ in range(nw)]
        for p in procs:
            p.start()
        try:
            results: Dict[int, Any] = {}
            next_pos = 0
            received = 0
            while received < nb:
                pos, batch, err = out_q.get()
                received += 1
                if err is not None:
                    raise RuntimeError(f"loader worker failed: {err}")
                results[pos] = batch
                while next_pos in results:
                    yield results.pop(next_pos)
                    next_pos += 1
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5)
