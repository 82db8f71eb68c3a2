"""
File-based device mutex.

Parity target: adell_mri/utils/pl_utils.py — GPULock (:22-123): a
lock-file-per-device mutex so concurrent jobs on a shared machine do not
land on the same accelerator. TPU-native: one lock per chip index (a TPU
chip has no MIG-style sharing, so exclusive acquisition is the only mode).

Locking is ``fcntl.flock`` on a persistent per-device file — the kernel
releases the lock when the holder dies, so there is no stale-pid heuristic
and none of its reclaim races (two waiters that both judge a pid-file stale
unlink each other's fresh locks; the reference's pid-file scheme has that
window). The pid is still written into the file for debuggability.
"""

import fcntl
import os
import time
from typing import Dict, List, Optional

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

_LOCK_DIR = os.environ.get("ADELL_LOCK_DIR", "/tmp/adell_device_locks")


class DeviceLock:
    """
    Acquires an exclusive kernel lock for one of ``n_devices`` accelerator
    slots. Locks auto-release when the owning process exits.
    """

    def __init__(self, n_devices: Optional[int] = None, lock_dir: str = _LOCK_DIR):
        if n_devices is None:
            import jax

            n_devices = jax.device_count()
        self.n_devices = n_devices
        self.lock_dir = lock_dir
        os.makedirs(lock_dir, exist_ok=True)
        self.held: List[int] = []
        self._fds: Dict[int, int] = {}

    def _path(self, idx: int) -> str:
        return os.path.join(self.lock_dir, f"device_{idx}.lock")

    def _try_lock(self, idx: int) -> bool:
        # on the shared machine this mutex exists for, the lock file may
        # belong to ANOTHER user (0o644): O_RDWR raises EACCES there, but
        # flock(LOCK_EX) works on a read-only fd, so fall back instead of
        # crashing the whole acquire (the pid note is then skipped)
        writable = True
        try:
            fd = os.open(self._path(idx), os.O_CREAT | os.O_RDWR, 0o644)
        except PermissionError:
            try:
                fd = os.open(self._path(idx), os.O_RDONLY)
                writable = False
            except OSError:
                logger.warning(
                    "device %d lock file unreadable; treating as busy", idx
                )
                return False
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            return False
        if writable:
            os.ftruncate(fd, 0)
            os.write(fd, str(os.getpid()).encode())
        self._fds[idx] = fd
        self.held.append(idx)
        logger.info("locked device %d", idx)
        return True

    def _release_one(self, idx: int):
        fd = self._fds.pop(idx, None)
        if fd is not None:
            try:
                os.close(fd)
            except OSError:
                pass
        if idx in self.held:
            self.held.remove(idx)

    def acquire(self, n: int = 1, timeout: float = 0.0, poll: float = 5.0):
        """Locks devices until ``n`` are held in total; returns their
        indices. With timeout=0 a single pass is made and failure raises
        immediately. A timeout rolls back only the locks taken within
        THIS call — devices from an earlier successful acquire() stay
        held (the job may be computing on them)."""
        deadline = time.monotonic() + timeout
        newly: List[int] = []
        while True:
            for idx in range(self.n_devices):
                if len(self.held) >= n:
                    return list(self.held)
                if idx in self._fds:
                    continue
                if self._try_lock(idx):
                    newly.append(idx)
            if len(self.held) >= n:
                return list(self.held)
            if time.monotonic() >= deadline:
                for idx in newly:
                    self._release_one(idx)
                raise TimeoutError(
                    f"could not lock {n} of {self.n_devices} devices"
                )
            time.sleep(poll)

    def release(self):
        # closing the fd releases the flock; the file itself stays (an
        # unlink would open the unlink-vs-flock race where a new waiter
        # locks a directory entry another process is about to replace)
        for idx, fd in self._fds.items():
            try:
                os.close(fd)
            except OSError:
                pass
        self._fds = {}
        self.held = []

    def __del__(self):
        # drop the flocks if the object is abandoned without release();
        # otherwise the leaked fds keep the devices locked for the whole
        # process lifetime
        self.release()

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *a):
        self.release()
        return False
