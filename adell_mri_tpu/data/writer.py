"""
Async NIfTI writer.

Parity target: adell_mri/utils/sitk_writer.py:17 — background queue +
workers writing predictions with copied geometry. Threads instead of
multiprocessing (gzip/IO release the GIL; this host has one core anyway).
"""

import queue
import threading
from typing import Optional

import numpy as np

from adell_mri_tpu.data.nifti import write_nifti


class AsyncNiftiWriter:
    def __init__(self, n_workers: int = 2, max_pending: Optional[int] = None):
        # bounded queue = backpressure: a sharded-TPU producer outruns
        # gzip writers by orders of magnitude, and an unbounded queue
        # accumulates full-resolution volumes until the host OOMs
        if max_pending is None:
            max_pending = 4 * n_workers
        self.queue: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self.errors: list = []
        self.workers = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(n_workers)
        ]
        for w in self.workers:
            w.start()

    def _worker(self):
        while True:
            item = self.queue.get()
            if item is None:
                self.queue.task_done()
                break
            path, data, affine = item
            try:
                write_nifti(path, data, affine)
            except Exception as exc:
                # record and keep serving — a worker dying on one bad path
                # (e.g. missing directory) would strand queued predictions
                # and deadlock close()'s queue.join()
                self.errors.append((path, exc))
            finally:
                self.queue.task_done()

    def put(self, path: str, data: np.ndarray, affine: Optional[np.ndarray] = None):
        # force an OWNED host copy: np.asarray of a CPU-backend jax.Array
        # (or a caller-reused buffer) can be a zero-copy view that gets
        # overwritten before the background thread writes it
        a = np.asarray(data)
        if not a.flags.owndata:
            a = np.array(a)
        self.queue.put((path, a, affine))

    def close(self):
        self.queue.join()
        for _ in self.workers:
            self.queue.put(None)
        for w in self.workers:
            w.join()
        if self.errors:
            failed = ", ".join(p for p, _ in self.errors[:5])
            raise RuntimeError(
                f"{len(self.errors)} prediction(s) failed to write "
                f"({failed}{'...' if len(self.errors) > 5 else ''}); "
                f"first error: {self.errors[0][1]!r}"
            )
