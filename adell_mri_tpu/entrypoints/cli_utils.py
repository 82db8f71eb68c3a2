"""
Entrypoint dispatch helpers (parity: adell_mri/entrypoints/cli_utils.py:4).
"""

import importlib
from typing import Dict, List


def run_main(package: str, supported_modes: Dict[str, str], arguments: List[str]):
    """Dispatches ``arguments[0]`` to ``{package}.{module}.main(rest)``."""
    if len(arguments) == 0 or arguments[0] in ("help", "--help", "-h"):
        print(f"\n\tSupported modes: {sorted(supported_modes)}")
        return
    mode = arguments[0]
    if mode not in supported_modes:
        raise NotImplementedError(
            f"\n\tMode {mode} not supported\n\t"
            f"Supported modes: {sorted(supported_modes)}"
        )
    module = importlib.import_module(supported_modes[mode], package)
    module.main(arguments[1:])


def stratification_labels(data, pids, label_key, n_folds, explicit_folds):
    """Class labels for StratifiedKFold when usable, else None (parity:
    every classification-family reference entrypoint stratifies its folds,
    e.g. classification/train.py:247). Unusable when folds are explicit,
    n_folds <= 1, a pid lacks the label, or any class has fewer members
    than n_folds (sklearn raises there)."""
    if n_folds <= 1 or explicit_folds:
        return None
    try:
        labels = [str(data[p][label_key]) for p in pids]
    except (KeyError, TypeError):
        return None
    from collections import Counter

    if not labels or min(Counter(labels).values()) < n_folds:
        return None
    return labels


def filter_training_pids(
    train_pids, excluded=None, subsample_fraction=None, seed=42, fold_idx=0
):
    """Training-split-only exclusions + fractional subsampling (parity:
    ref --excluded_ids_from_training_data / --subsample_training_data,
    classification/train.py:287-297 — learning curves)."""
    import numpy as np

    if excluded:
        excl = set(excluded)
        train_pids = [p for p in train_pids if p not in excl]
    if subsample_fraction is not None:
        rng = np.random.default_rng(seed + fold_idx)
        n_keep = max(1, int(len(train_pids) * subsample_fraction))
        train_pids = [
            train_pids[i]
            for i in sorted(
                rng.choice(len(train_pids), size=n_keep, replace=False)
            )
        ]
    return train_pids
