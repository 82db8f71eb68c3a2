"""
Checkpointing with embedded metadata.

Parity targets: adell_mri/utils/pl_callbacks.py — ModelCheckpointWithMetadata
(:466-535: transform args, network config, train/val pids stored WITH the
weights so prediction can rebuild preprocessing from the checkpoint alone,
consumed at entrypoints/generative/generate.py:26-50); utils/pl_utils.py
get_ckpt_callback (:255-342: ``{name}_fold{f}`` naming, resume-from-last,
"finished" detection); utils/torch_utils.py load_checkpoint_to_model (:16,
exclude_from_state_dict regexes) and conditional_parameter_freezing (:119).

TPU-native: orbax for the array tree (sharded-state safe), JSON sidecar for
metadata.
"""

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class CheckpointManager:
    """
    Directory layout: ``{root}/{name}_fold{fold}/{step}/...`` via orbax,
    with ``metadata.json`` at the run level and ``best.json`` tracking the
    monitored metric.
    """

    def __init__(
        self,
        root: str,
        name: str = "model",
        fold: int = 0,
        metadata: Optional[Dict[str, Any]] = None,
        monitor: str = "val_loss",
        mode: str = "min",
        max_to_keep: int = 2,
    ):
        self.dir = os.path.abspath(os.path.join(root, f"{name}_fold{fold}"))
        os.makedirs(self.dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        # retention is done manually in save(): orbax's own max_to_keep
        # keeps the most RECENT steps and would garbage-collect the step
        # best.json points at (early stopping: best at epoch 5, stop at 15
        # -> every best_step() restore would hit a deleted directory)
        self.max_to_keep = max_to_keep
        self._mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None, create=True
            ),
        )
        if metadata is not None:
            self.save_metadata(metadata)

    def begin_run(self, resume: bool = False):
        """Call at the start of a TRAINING run. A fresh (non-resume) run
        must not inherit ``best.json`` from whatever previously trained
        into this directory: the old best would win every monitored
        comparison, retention would protect its step forever, and
        test/predict (``best_step()``) would silently serve the OLD
        run's weights. ``save()`` fixes the analogous orbax same-step
        resurrection; this is the best.json half."""
        if resume:
            return
        path = os.path.join(self.dir, "best.json")
        if os.path.exists(path):
            logger.info(
                "fresh run: clearing stale best.json in %s", self.dir
            )
            os.remove(path)

    # -- metadata ----------------------------------------------------------
    def save_metadata(self, metadata: Dict[str, Any]):
        # record the monitored metric so cross-fold best selection
        # (predict --fold -1) knows the comparison direction
        metadata = {"monitor": self.monitor, "mode": self.mode, **metadata}
        with open(os.path.join(self.dir, "metadata.json"), "w") as f:
            json.dump(metadata, f, default=str, indent=1)

    def load_metadata(self) -> Dict[str, Any]:
        path = os.path.join(self.dir, "metadata.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    # -- save/restore ------------------------------------------------------
    @staticmethod
    def _host_copy(x):
        # the host copy is MANDATORY: train steps donate the state buffers
        # (steps.py donate_argnums), so the device arrays are invalidated
        # by the next step. np.asarray alone is NOT enough — on the CPU
        # backend a jax.Array's __array__ can return a zero-copy view of
        # the device buffer, which donation then reuses under the async
        # writer. Force ownership whenever the result aliases.
        a = np.asarray(x)
        if not a.flags.owndata:
            a = np.array(a)
        return a

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None):
        # snapshot to host-owned numpy before returning control to the
        # train loop (see _host_copy) — only the snapshot stays valid for
        # the async writer
        tree = jax.tree.map(self._host_copy, _savable(state))
        # async save: orbax's default manager writes on a background
        # thread; serialize against the PREVIOUS save here instead of
        # blocking the train loop on this one (wait_until_finished after
        # save stalled an epoch boundary by the full disk-write time)
        self._mngr.wait_until_finished()
        # last-write-wins (Lightning semantics): orbax silently SKIPS a
        # save whose step already exists, which resurrects stale weights
        # when a run is restarted from scratch into the same directory
        if step in self._mngr.all_steps():
            self._mngr.delete(step)
        self._mngr.save(step, args=ocp.args.StandardSave(tree))
        if metrics and self.monitor in metrics:
            value = float(metrics[self.monitor])
            best = self._best()
            # NaN is never better AND never defends the title: a NaN
            # monitored metric recorded as best would win every later
            # comparison (x < nan and x > nan are both False), pinning
            # garbage weights for the whole run
            best_value = None if best is None else float(best["value"])
            if best_value is not None and np.isnan(best_value):
                best_value = None
            better = not np.isnan(value) and (
                best_value is None
                or (self.mode == "min" and value < best_value)
                or (self.mode == "max" and value > best_value)
            )
            if better:
                with open(os.path.join(self.dir, "best.json"), "w") as f:
                    json.dump({"step": step, "value": value}, f)
        # retention: the most recent ``max_to_keep`` steps, ALWAYS
        # protecting the best step (best.json must stay restorable) and
        # the save scheduled above (whether or not the async writer has
        # registered it in all_steps() yet)
        if self.max_to_keep is not None:
            steps = sorted(set(self._mngr.all_steps()) | {step})
            protect = set(steps[-self.max_to_keep:]) | {step}
            best = self._best()
            if best is not None:
                protect.add(int(best["step"]))
            for s in steps:
                if s not in protect and s in self._mngr.all_steps():
                    self._mngr.delete(s)

    def _best(self) -> Optional[Dict]:
        path = os.path.join(self.dir, "best.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None

    def wait(self):
        """Blocks until any in-flight async save has committed to disk.
        Call before process exit or before handing the directory to
        another consumer (test/predict entrypoints re-open it)."""
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mngr.wait_until_finished()
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        best = self._best()
        if best is None:
            return self.latest_step()
        step = int(best["step"])
        # best.json is written when the save is SCHEDULED (the async
        # writer commits later), so a crash between the two can leave it
        # pointing at a step that never landed — fall back to the latest
        # committed step instead of crashing every downstream restore
        self._mngr.wait_until_finished()
        if step not in self._mngr.all_steps():
            latest = self.latest_step()
            logger.warning(
                "best.json points at uncommitted step %d (interrupted "
                "async save?); falling back to latest committed step %s",
                step, latest,
            )
            return latest
        return step

    def restore(self, step: Optional[int] = None, target: Any = None):
        # an in-flight async save of exactly this step must land first
        self._mngr.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        restored = self._mngr.restore(step)
        if target is not None:
            # partial restore: the saved tree may hold more than the target
            # (opt_state, ema); graft only the paths the target has
            want = _flatten(_savable(target))
            have = _flatten(restored)
            restored = _unflatten(
                {k: have.get(k, v) for k, v in want.items()}
            )
        return restored

    def delete_steps(self):
        """Removes every saved step's weight payload, keeping metadata.json
        and best.json (parity: ref --delete_checkpoints — metrics survive,
        weights go)."""
        import shutil

        self._mngr.wait_until_finished()

        for entry in os.listdir(self.dir):
            path = os.path.join(self.dir, entry)
            if os.path.isdir(path) and entry.isdigit():
                shutil.rmtree(path, ignore_errors=True)

    def status(self, max_steps: int) -> str:
        """'finished' | 'resume' | 'fresh' (parity: pl_utils.py:323-341)."""
        latest = self.latest_step()
        if latest is None:
            return "fresh"
        return "finished" if latest >= max_steps else "resume"

    def resume(self, state: Any):
        """Restores the latest saved step INTO ``state`` and returns
        ``(state, start_epoch)`` — the consumer half of status()=='resume'
        (--resume_from_last): params, opt_state, ema and mutable variables
        continue where the interrupted run stopped, and ``start_epoch``
        (the saved step; epochs save as step epoch+1) goes to
        TrainLoop.fit(start_epoch=...). A fresh directory returns the
        state unchanged with start_epoch 0."""
        step = self.latest_step()
        if step is None:
            return state, 0
        try:
            # structured restore: the live state as template keeps the
            # optax NamedTuple structure intact (a bare restore() returns
            # plain dicts that optax cannot consume)
            target = _savable(state)
            restored = self._mngr.restore(
                step, args=ocp.args.StandardRestore(target)
            )
            replace = {"params": restored["params"]}
            if "step" in restored:
                import jax.numpy as jnp

                replace["step"] = jnp.asarray(restored["step"], jnp.int32)
            for key in ("opt_state", "ema_params", "variables"):
                if key in restored and getattr(state, key, None) is not None:
                    replace[key] = restored[key]
            state = state.replace(**replace)
        except Exception as e:
            # structure drift (e.g. optimizer changed between runs): keep
            # the trained weights at least
            logger.warning(
                "structured resume failed (%s); restoring params only", e
            )
            restored = self.restore(step, target=state)
            state = state.replace(params=restored["params"])
        logger.info("resumed from step %d", step)
        return state, int(step)


def _savable(state: Any) -> Dict[str, Any]:
    """Extracts the array tree from a TrainState or passes a dict through."""
    if hasattr(state, "params"):
        tree = {"params": state.params, "step": state.step}
        if getattr(state, "ema_params", None) is not None:
            tree["ema_params"] = state.ema_params
        if getattr(state, "opt_state", None) is not None:
            tree["opt_state"] = state.opt_state
        if getattr(state, "variables", None):
            tree["variables"] = state.variables
        return tree
    return state


# ---------------------------------------------------------------------------
# warm-start machinery (parity: utils/torch_utils.py:16,119)
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat: Dict[str, Any]):
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root


def load_params_into(
    params: Any,
    loaded: Any,
    exclude_patterns: Sequence[str] = (),
    rename: Optional[Dict[str, str]] = None,
) -> Tuple[Any, List[str]]:
    """
    Copies matching leaves of ``loaded`` into ``params`` by path, skipping
    paths matching ``exclude_patterns`` regexes and shape mismatches
    (parity: load_checkpoint_to_model, torch_utils.py:16).
    Returns (new_params, list of skipped paths).
    """
    flat_p = _flatten(params)
    flat_l = _flatten(loaded)
    if rename:
        renamed = {}
        for k, v in flat_l.items():
            for old, new in rename.items():
                k = re.sub(old, new, k)
            renamed[k] = v
        flat_l = renamed
    skipped = []
    out = dict(flat_p)
    excl = [re.compile(p) for p in exclude_patterns]
    for k, v in flat_l.items():
        if any(e.search(k) for e in excl):
            skipped.append(k)
            continue
        if k in out and np.shape(out[k]) == np.shape(v):
            out[k] = v
        else:
            skipped.append(k)
    return _unflatten(out), skipped


def freeze_mask_by_regex(
    params: Any,
    freeze_patterns: Sequence[str] = (),
    not_freeze_patterns: Sequence[str] = (),
):
    """
    Boolean mask tree: True = trainable (parity:
    conditional_parameter_freezing, torch_utils.py:119). Use with
    optax.masked or multi_transform.
    """
    frz = [re.compile(p) for p in freeze_patterns]
    keep = [re.compile(p) for p in not_freeze_patterns]
    flat = _flatten(params)
    mask = {}
    for k in flat:
        frozen = any(p.search(k) for p in frz) and not any(
            p.search(k) for p in keep
        )
        mask[k] = not frozen
    return _unflatten(mask)


def correct_classification_bias(params, labels, positive=1):
    """
    Sets the final classification bias to the train-set log-odds so the
    network starts calibrated (parity: correct_classification_bias,
    utils/torch_utils.py:169). The head bias is the LAST 1-D bias leaf of
    size 1 or n_classes in flattened path order.
    """
    labels = np.asarray(labels)
    p = float(np.mean(labels == positive))
    p = min(max(p, 1e-6), 1 - 1e-6)
    log_odds = float(np.log(p / (1 - p)))
    flat = _flatten(params)
    bias_paths = [
        k
        for k, v in flat.items()
        if k.endswith("bias") and getattr(v, "ndim", 0) == 1
        and v.shape[0] <= 16
    ]
    if not bias_paths:
        logger.warning("no classification bias leaf found; skipping")
        return params
    target = bias_paths[-1]
    v = flat[target]
    flat[target] = np.full_like(np.asarray(v), log_odds)
    logger.info("set %s to log-odds %.4f", target, log_odds)
    return _unflatten(flat)
