"""
File-based device mutex.

Parity target: adell_mri/utils/pl_utils.py — GPULock (:22-123): a
lock-file-per-device mutex so concurrent jobs on a shared machine do not
land on the same accelerator. TPU-native: one lock per chip index (a TPU
chip has no MIG-style sharing, so exclusive acquisition is the only mode).
"""

import os
import time
from typing import List, Optional

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

_LOCK_DIR = os.environ.get("ADELL_LOCK_DIR", "/tmp/adell_device_locks")


class DeviceLock:
    """
    Acquires an exclusive lock file for one of ``n_devices`` accelerator
    slots. Stale locks (owner pid dead) are reclaimed.
    """

    def __init__(self, n_devices: Optional[int] = None, lock_dir: str = _LOCK_DIR):
        if n_devices is None:
            import jax

            n_devices = jax.device_count()
        self.n_devices = n_devices
        self.lock_dir = lock_dir
        os.makedirs(lock_dir, exist_ok=True)
        self.held: List[int] = []

    def _path(self, idx: int) -> str:
        return os.path.join(self.lock_dir, f"device_{idx}.lock")

    def _stale(self, path: str) -> bool:
        try:
            with open(path) as f:
                pid = int(f.read().strip() or 0)
            if pid <= 0:
                return True
            os.kill(pid, 0)  # raises if gone
            return False
        except (ProcessLookupError, ValueError, FileNotFoundError):
            return True
        except PermissionError:
            return False

    def acquire(self, n: int = 1, timeout: float = 0.0, poll: float = 5.0):
        """Locks ``n`` devices; returns their indices. With timeout=0 a
        single pass is made and failure raises immediately."""
        deadline = time.monotonic() + timeout
        while True:
            for idx in range(self.n_devices):
                if len(self.held) >= n:
                    return list(self.held)
                path = self._path(idx)
                if os.path.exists(path) and not self._stale(path):
                    continue
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    if self._stale(path):
                        os.unlink(path)
                        try:
                            fd = os.open(
                                path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                            )
                        except FileExistsError:
                            continue
                    else:
                        continue
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                self.held.append(idx)
                logger.info("locked device %d", idx)
            if len(self.held) >= n:
                return list(self.held)
            if time.monotonic() >= deadline:
                self.release()
                raise TimeoutError(
                    f"could not lock {n} of {self.n_devices} devices"
                )
            time.sleep(poll)

    def release(self):
        for idx in self.held:
            try:
                os.unlink(self._path(idx))
            except FileNotFoundError:
                pass
        self.held = []

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *a):
        self.release()
        return False
