"""
Host-side data feeding.

Replaces the reference's MONAI CacheDataset + torch DataLoader worker pool
(entrypoints/segmentation/train.py:441-453, 591-622). TPU-first split of
labour:

- deterministic, shape-normalising preprocessing runs ONCE per volume on the
  host and is cached (RAM and/or .npy disk cache) — the analogue of
  ``CacheDataset(cache_rate=1)``;
- all RANDOM augmentation moves to device as jit-compiled JAX (see
  adell_mri_tpu.transforms), so the per-step host cost is a cache lookup and
  one host->device transfer;
- a background thread keeps one batch ahead of the device (double buffering),
  replacing multiprocessing workers (irrelevant here: augmentation is not on
  the host anymore).
"""

import hashlib
import os
import queue
import threading
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

from adell_mri_tpu.data.collate import safe_collate
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class CachedVolumeDataset:
    """
    Applies ``load_fn`` (datalist entry -> dict of fixed-shape numpy arrays)
    lazily and caches results.

    Args:
        datalist: list of entries (``Dataset.to_datalist`` output).
        load_fn: host preprocessing returning ``{key: np.ndarray | scalar}``.
            Must be deterministic — randomness belongs on device.
        cache_rate: fraction of the dataset kept in RAM after first load.
        cache_dir: optional directory for an .npz disk cache keyed by a hash
            of the entry; survives across runs (CacheDataset analogue).
    """

    def __init__(
        self,
        datalist: List[Dict[str, Any]],
        load_fn: Callable[[Dict[str, Any]], Dict[str, Any]],
        cache_rate: float = 1.0,
        cache_dir: Optional[str] = None,
        cache_fingerprint: str = "",
    ):
        self.datalist = datalist
        self.load_fn = load_fn
        self.cache_rate = cache_rate
        self.cache_dir = cache_dir
        # preprocessing-config fingerprint folded into the disk-cache key so
        # re-running with a different spacing/size/keys against the same
        # --cache_dir can never serve stale arrays (entrypoints pass
        # repr(<transforms dataclass>))
        self.cache_fingerprint = cache_fingerprint
        self._ram: Dict[int, Dict[str, Any]] = {}
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)

    def _disk_path(self, entry: Dict[str, Any]) -> str:
        key = hashlib.sha1(
            (repr(sorted(entry.items())) + self.cache_fingerprint).encode()
        ).hexdigest()[:20]
        return os.path.join(self.cache_dir, key + ".npz")

    def __len__(self) -> int:
        return len(self.datalist)

    def __getitem__(self, i: int) -> Optional[Dict[str, Any]]:
        if i in self._ram:
            return self._ram[i]
        entry = self.datalist[i]
        sample = None
        if self.cache_dir is not None:
            path = self._disk_path(entry)
            if os.path.exists(path):
                try:
                    with np.load(path, allow_pickle=True) as z:
                        sample = {k: z[k] for k in z.files}
                except Exception as e:
                    # a process killed mid-write leaves a truncated .npz;
                    # treat it as a miss and recompute instead of crashing
                    # the run on the same file forever
                    logger.warning(
                        "corrupt cache %s (%s); recomputing", path, e
                    )
                    sample = None
                    try:
                        os.remove(path)
                    except OSError:
                        pass
        if sample is None:
            try:
                sample = self.load_fn(entry)
            except Exception as e:  # drop unreadable samples like safe_collate
                logger.warning("failed to load %s: %s", entry.get("identifier", i), e)
                return None
            if self.cache_dir is not None and sample is not None:
                # atomic write: savez to a temp file object (a str path
                # would get ".npz" appended) then rename over the target,
                # so a kill mid-save can never leave a truncated cache
                path = self._disk_path(entry)
                tmp = f"{path}.tmp{os.getpid()}"
                try:
                    with open(tmp, "wb") as f:
                        np.savez(f, **sample)
                    os.replace(tmp, path)
                except Exception as e:
                    logger.warning("cache write failed %s: %s", path, e)
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        if sample is not None and (
            self.cache_rate >= 1.0 or (i / max(1, len(self))) < self.cache_rate
        ):
            self._ram[i] = sample
        return sample


class DataLoader:
    """
    Iterates fixed-shape numpy batches with background prefetch.

    Args:
        dataset: indexable returning sample dicts (or None to drop).
        sampler: iterable of indices defining one epoch.
        batch_size: samples per batch.
        collate_fn: batch assembly (default safe_collate).
        drop_last: drop trailing partial batch (keeps shapes static for jit).
        prefetch: number of batches prepared ahead by the worker thread.
    """

    def __init__(
        self,
        dataset,
        sampler: Iterable[int] = None,
        batch_size: int = 1,
        collate_fn: Callable = safe_collate,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.prefetch = prefetch

    def _indices(self) -> List[int]:
        if self.sampler is None:
            return list(range(len(self.dataset)))
        return list(self.sampler)

    def __len__(self) -> int:
        # use the sampler's own __len__ — materializing it (list(sampler))
        # would consume an RNG epoch draw, making the actual epoch indices
        # depend on how many times len() was called before iteration
        if self.sampler is None:
            n = len(self.dataset)
        else:
            try:
                n = len(self.sampler)
            except TypeError:
                # refusing beats the list(sampler) fallback: draining a
                # one-shot sampler here empties the next epoch, and a
                # re-iterable RNG sampler would consume an epoch draw
                # (exactly what the comment above promises not to do)
                raise TypeError(
                    "len(DataLoader) needs a sampler with __len__; "
                    f"{type(self.sampler).__name__} has none — iterate "
                    "without len(), or give the sampler a __len__"
                )
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self, indices: Sequence[int]):
        for start in range(0, len(indices), self.batch_size):
            chunk = indices[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            samples = [self.dataset[i] for i in chunk]
            batch = self.collate_fn(samples)
            if batch:
                yield batch

    def __iter__(self):
        indices = self._indices()
        if self.prefetch <= 0:
            yield from self._batches(indices)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # timed put so an abandoned consumer (break mid-epoch) can't
            # leave the worker blocked forever holding volume batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self._batches(indices):
                    if not _put(batch):
                        return
                _put(sentinel)
            except BaseException as exc:  # propagate, don't truncate epochs
                _put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=5.0)
