"""
Shared multi-checkpoint prediction helpers for the classification-family
``predict``/``test`` entrypoints (parity: adell_mri/utils/prediction_utils.py:6-56
``get_ensemble_prediction`` and the checkpoint-list loops at
entrypoints/classification/predict.py:194-266, test.py:233-242).

The reference iterates ``--checkpoints`` x ``--prediction_ids`` groups,
emitting one ``{iteration, prediction_ids, checkpoint, predictions}`` record
per pair, optionally followed by a mean/median ensemble record. Here the
same surface exists, with one TPU-minded difference: prediction functions
take the checkpoint variables as a traced ARGUMENT so every checkpoint
shares one compiled program (the reference rebuilds the torch module per
checkpoint).
"""

import os
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def get_ensemble_prediction(
    output: List[Dict[str, Any]], ensemble_type: str
) -> Dict[str, Any]:
    """
    Aggregates per-checkpoint prediction records into one ensemble record
    (parity: utils/prediction_utils.py:6 — same output schema: iteration 0,
    checkpoint "ensemble", per-id ``n_predictions`` counts).

    ``mean`` averages predictions elementwise (scalars stay scalars,
    per-class lists stay lists); ``median`` takes the elementwise median.
    """
    if ensemble_type not in ("mean", "median"):
        raise ValueError(
            f"Unknown ensemble type {ensemble_type!r} (mean|median)"
        )
    ens: Dict[str, Any] = {
        "iteration": 0,
        "prediction_ids": [],
        "checkpoint": "ensemble",
        "predictions": {},
        "n_predictions": {},
    }
    stacks: Dict[str, List[np.ndarray]] = {}
    for record in output:
        for k, v in record["predictions"].items():
            stacks.setdefault(k, []).append(np.asarray(v, dtype=np.float64))
    ens["prediction_ids"] = sorted(stacks)
    for k, vals in stacks.items():
        arr = np.stack(vals, axis=0)
        agg = arr.mean(0) if ensemble_type == "mean" else np.median(arr, 0)
        ens["predictions"][k] = (
            float(agg) if agg.ndim == 0 else agg.tolist()
        )
        ens["n_predictions"][k] = len(vals)
    return ens


def sample_cache_is_reused(
    groups: Sequence[Sequence[str]],
    n_checkpoints: int,
    one_to_one: bool,
) -> bool:
    """
    True when a per-pid preprocessed-sample cache would actually be hit
    more than once per pid: several checkpoints applied to each id group,
    or the same pid appearing in more than one group. In the common
    one-checkpoint single-group run the cache provides zero reuse and
    would just pin every preprocessed volume in RAM for the whole run.
    """
    if not one_to_one and n_checkpoints > 1:
        return True
    all_pids = [pid for g in groups for pid in g]
    return len(set(all_pids)) < len(all_pids)


def manager_for_checkpoint_path(path: str):
    """
    Builds a :class:`CheckpointManager` for an explicit ``--checkpoint``
    entry. Accepts either a run directory ``{root}/{name}_fold{k}`` or the
    root+name split the managers write (trailing slashes tolerated).
    """
    from adell_mri_tpu.train.checkpoints import CheckpointManager

    path = os.path.abspath(path.rstrip("/"))
    base = os.path.basename(path)
    m = re.match(r"^(?P<name>.+)_fold(?P<fold>\d+)$", base)
    if m is None:
        raise ValueError(
            f"--checkpoint entry {path!r} must point at a run directory "
            "named <name>_fold<k>"
        )
    return CheckpointManager(
        os.path.dirname(path), name=m.group("name"), fold=int(m.group("fold"))
    )


def resolve_checkpoint_variables(
    checkpoint_paths: Optional[Sequence[str]],
    default_manager,
    params0,
    restore_variables: Optional[Callable[[Any, int], Dict[str, Any]]] = None,
) -> List[Tuple[str, Dict[str, Any]]]:
    """
    Returns ``[(label, variables), ...]`` — one entry per ``--checkpoint``
    path, or the default manager's best step when none are given. Labels
    are the run-directory paths (reference records the checkpoint filename,
    predict.py:233).
    """

    def _default_restore(mngr, step):
        grafted = mngr.restore(step, target={"params": params0})
        raw = mngr.restore(step)
        var = {"params": grafted["params"]}
        # BatchNorm running stats: top-level in imported reference
        # checkpoints, under "variables" in our training checkpoints
        # (TrainState.variables)
        if isinstance(raw, dict):
            bs = raw.get("batch_stats") or (
                raw.get("variables") or {}
            ).get("batch_stats")
            if bs:
                var["batch_stats"] = bs
        return var

    restore = restore_variables or _default_restore
    out: List[Tuple[str, Dict[str, Any]]] = []
    if checkpoint_paths:
        for path in checkpoint_paths:
            mngr = manager_for_checkpoint_path(path)
            out.append((path, restore(mngr, mngr.best_step())))
    else:
        out.append(
            (default_manager.dir, restore(default_manager, default_manager.best_step()))
        )
    return out


def prediction_id_groups(
    prediction_ids: Optional[Sequence[str]], data
) -> List[List[str]]:
    """
    ``--prediction_ids`` as the reference's iteration groups: each entry is
    a comma-separated set / csv / folds / json spec (utils/parser.py:167
    ``parse_ids``); None means one group with every dataset id.
    """
    from adell_mri_tpu.data import parse_ids

    if prediction_ids:
        groups = parse_ids(list(prediction_ids), "nested_list")
    else:
        groups = [list(data.keys())]
    return [[pid for pid in g if pid in data.dataset] for g in groups]


def run_prediction_matrix(
    groups: List[List[str]],
    checkpoints: List[Tuple[str, Dict[str, Any]]],
    predict_one: Callable[[Dict[str, Any], str], Any],
    one_to_one: bool = False,
    ensemble: Optional[str] = None,
) -> List[Dict[str, Any]]:
    """
    The reference's iteration x checkpoint loop (predict.py:194-266):
    ``predict_one(variables, pid, checkpoint_label)`` produces the per-case
    value. With ``one_to_one`` (and no ensemble) checkpoint ``i`` only
    serves group ``i``; with ``ensemble`` a mean/median record is appended.
    """
    if one_to_one and ensemble is None and len(checkpoints) < len(groups):
        raise ValueError(
            f"--one_to_one needs one checkpoint per prediction-id group "
            f"({len(groups)}), got {len(checkpoints)}"
        )
    global_output: List[Dict[str, Any]] = []
    for iteration, group in enumerate(groups):
        if one_to_one and ensemble is None:
            ckpt_list = [checkpoints[iteration]]
        else:
            ckpt_list = checkpoints
        for label, variables in ckpt_list:
            record = {
                "iteration": iteration,
                "prediction_ids": list(group),
                "checkpoint": label,
                "predictions": {},
            }
            for pid in group:
                record["predictions"][pid] = predict_one(
                    variables, pid, label
                )
            global_output.append(record)
    if ensemble is not None:
        global_output.append(get_ensemble_prediction(global_output, ensemble))
    return global_output
