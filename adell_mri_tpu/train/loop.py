"""
The training loop — replaces lightning.Trainer for this framework.

Parity surface (SURVEY.md §3.1): epochs over a DataLoader, on-device
augmentation folded into the step, periodic validation
(check_val_every_n_epoch), checkpointing with monitor/mode, early stopping,
CSV/experiment logging, resume-from-last. Single-program multi-device: the
loop shards each host batch over the mesh and the jitted step does the rest.
"""

import itertools
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from adell_mri_tpu.parallel.mesh import shard_batch
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class TrainLoop:
    def __init__(
        self,
        train_step: Callable,  # (state, batch, rng) -> (state, metrics)
        eval_step: Optional[Callable] = None,  # (params, batch, rng) -> metrics
        augment_fn: Optional[Callable] = None,  # (key, batch) -> batch (jitted)
        mesh=None,
        max_epochs: int = 100,
        check_val_every_n_epoch: int = 1,
        early_stopping: Optional[int] = None,
        monitor: str = "val_loss",
        mode: str = "min",
        ckpt_manager=None,
        metric_logger=None,
        seed: int = 42,
        eval_on_ema: bool = False,
        callbacks=(),
        nan_guard=None,
        nan_guard_every: int = 1,
        profile_dir: Optional[str] = None,
        profile_steps=(10, 15),
        steps_per_epoch: Optional[int] = None,
    ):
        self.train_step = train_step
        self.eval_step = eval_step
        # eval steps built by make_eval_step accept batch-norm running
        # stats; older/task-specific eval closures may not
        import inspect

        try:
            self._eval_takes_vars = eval_step is not None and (
                "variables" in inspect.signature(eval_step).parameters
            )
        except (TypeError, ValueError):
            self._eval_takes_vars = False
        self.augment_fn = jax.jit(augment_fn) if augment_fn else None
        self.mesh = mesh
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.early_stopping = early_stopping
        self.monitor = monitor
        self.mode = mode
        self.ckpt_manager = ckpt_manager
        self.metric_logger = metric_logger
        self.rng = jax.random.PRNGKey(seed)
        self.eval_on_ema = eval_on_ema
        self.callbacks = list(callbacks)
        self.nan_guard = nan_guard
        self.nan_guard_every = max(1, int(nan_guard_every))
        # jax.profiler trace window (SURVEY §5 tracing/profiling): capture
        # steps [start, stop) of the run into profile_dir for xprof/
        # tensorboard; replaces Lightning's profiler hook
        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)
        self._global_step = 0
        self._profiling = False
        # cap on train batches per epoch (Lightning limit_train_batches)
        self.steps_per_epoch = steps_per_epoch

    def _put(self, batch: Dict, pad: bool = False) -> Dict:
        batch = {
            k: v
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jax.Array))
        }
        if self.mesh is not None:
            # train batches pad to the data axes (all chips work, constant
            # shapes); validation replicates partial tails (exact metrics)
            return shard_batch(batch, self.mesh, pad=pad)
        return batch

    def _epoch(self, state, loader, epoch: int):
        # metrics accumulate as device scalars (lazy adds) — converting per
        # step would block dispatch pipelining, serializing host and device
        metric_sums: Dict[str, jax.Array] = {}
        n = 0
        t0 = time.perf_counter()
        n_samples = 0
        # cap BEFORE fetching: a post-fetch break would load+discard one
        # full volume batch per epoch
        batches = (
            itertools.islice(loader, self.steps_per_epoch)
            if self.steps_per_epoch is not None
            else loader
        )
        for batch in batches:
            self._profile_tick()
            # count REAL samples before padding (pad duplicates rows to
            # fill the data axes — counting them inflated samples_per_sec)
            real = batch.get("image")
            if not hasattr(real, "shape"):
                real = next(
                    v for v in batch.values() if hasattr(v, "shape")
                )
            n_samples += real.shape[0]
            batch = self._put(batch, pad=True)
            self.rng, aug_key, step_key = jax.random.split(self.rng, 3)
            if self.augment_fn is not None:
                batch = self.augment_fn(aug_key, batch)
            state, metrics = self.train_step(state, batch, step_key)
            n += 1
            for k, v in metrics.items():
                if np.ndim(v) == 0:
                    metric_sums[k] = (
                        metric_sums[k] + v if k in metric_sums else v
                    )
            if self.nan_guard is not None and n % self.nan_guard_every == 0:
                self.nan_guard.check(metric_sums, state, batch, epoch, n)
        dt = time.perf_counter() - t0
        out = {k: float(v) / max(n, 1) for k, v in metric_sums.items()}
        out["samples_per_sec"] = n_samples / dt if dt > 0 else 0.0
        return state, out

    def _profile_tick(self):
        if self.profile_dir is None:
            return
        start, stop = self.profile_steps
        if self._global_step == start and not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            logger.info(
                "profiler: tracing steps %d-%d -> %s", start, stop,
                self.profile_dir,
            )
        elif self._global_step == stop and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
        self._global_step += 1

    def _validate(self, state, loader):
        params = (
            state.ema_params
            if (self.eval_on_ema and state.ema_params is not None)
            else state.params
        )
        metric_sums: Dict[str, jax.Array] = {}
        n_samples = 0
        for batch in loader:
            batch = self._put(batch)
            self.rng, key = jax.random.split(self.rng)
            if self._eval_takes_vars:
                metrics = self.eval_step(
                    params, batch, key,
                    variables=getattr(state, "variables", None),
                )
            else:
                metrics = self.eval_step(params, batch, key)
            # weight per-batch means by batch size: a partial final batch
            # must not count as much as a full one ("exact metrics");
            # prefer the canonical image leaf over dict order (an aux leaf
            # like a class-weight vector could lead the dict)
            ref_leaf = batch.get("image")
            if not hasattr(ref_leaf, "shape"):
                ref_leaf = next(
                    v for v in batch.values() if hasattr(v, "shape")
                )
            bs = ref_leaf.shape[0]
            n_samples += bs
            for k, v in metrics.items():
                if np.ndim(v) == 0:
                    metric_sums[k] = (
                        metric_sums[k] + v * bs if k in metric_sums else v * bs
                    )
            for cb in self.callbacks:
                hook = getattr(cb, "on_validation_batch", None)
                if hook is not None:
                    hook(params, batch, metrics)
        out = {
            f"val_{k}": float(v) / max(n_samples, 1)
            for k, v in metric_sums.items()
        }
        for cb in self.callbacks:
            hook = getattr(cb, "on_validation_end", None)
            if hook is not None:
                out.update(hook(params) or {})
        return out

    def fit(self, state, train_loader, val_loader=None, start_epoch: int = 0):
        """``start_epoch`` resumes an interrupted run: pass the restored
        checkpoint step (epochs are saved as step epoch+1) so epoch
        numbering, checkpoint steps and schedules continue seamlessly."""
        best = None
        patience = 0
        history = []
        ctx = self.mesh or _nullcontext()
        with ctx:
            for epoch in range(start_epoch, self.max_epochs):
                state, train_metrics = self._epoch(state, train_loader, epoch)
                all_metrics = dict(train_metrics)
                if (
                    val_loader is not None
                    and self.eval_step is not None
                    and (epoch + 1) % self.check_val_every_n_epoch == 0
                ):
                    all_metrics.update(self._validate(state, val_loader))
                history.append(all_metrics)
                if self.metric_logger is not None:
                    self.metric_logger.log_metrics(all_metrics, step=epoch)
                if self.ckpt_manager is not None:
                    self.ckpt_manager.save(
                        epoch + 1, state, metrics=all_metrics
                    )
                stop = False
                for cb in self.callbacks:
                    hook = getattr(cb, "on_epoch_end", None)
                    if hook is None:
                        continue
                    self.rng, cb_key = jax.random.split(self.rng)
                    if hook(state, all_metrics, epoch, rng=cb_key) == "stop":
                        stop = True
                if stop:
                    break
                if self.early_stopping and self.monitor in all_metrics:
                    value = all_metrics[self.monitor]
                    better = best is None or (
                        value < best if self.mode == "min" else value > best
                    )
                    if better:
                        best, patience = value, 0
                    else:
                        patience += 1
                        if patience >= self.early_stopping:
                            logger.info(
                                "early stopping at epoch %d (%s=%.5g)",
                                epoch,
                                self.monitor,
                                best,
                            )
                            break
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
        if self.ckpt_manager is not None and hasattr(
            self.ckpt_manager, "wait"
        ):
            # commit the in-flight async save before handing the directory
            # to whatever runs next (test/predict re-open it, possibly via
            # a FRESH manager instance that knows nothing about this one's
            # writer thread)
            self.ckpt_manager.wait()
        return state, history


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
