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
        # deliberate configurations, not degradations — no warning
        return None
    import logging

    logger = logging.getLogger("adell_mri_tpu")
    try:
        labels = [str(data[p][label_key]) for p in pids]
    except (KeyError, TypeError):
        logger.warning(
            "cannot stratify folds: some ids lack the label key %r; "
            "falling back to unstratified KFold",
            label_key,
        )
        return None
    from collections import Counter

    if not labels:
        return None
    smallest = min(Counter(labels).values())
    if smallest < n_folds:
        logger.warning(
            "cannot stratify folds: the rarest class has %d member(s) "
            "< n_folds=%d (sklearn would raise); falling back to "
            "unstratified KFold — rare classes may concentrate in one fold",
            smallest,
            n_folds,
        )
        return None
    return labels


def parse_label_groups(label_groups):
    """``--label_groups "0,1" "2,3"`` -> [["0","1"],["2","3"]] (parity:
    classification/train.py:166-168 comma-splits each group)."""
    if not label_groups:
        return None
    return [
        g.split(",") if isinstance(g, str) else list(g)
        for g in label_groups
    ]


def derive_n_classes(args):
    """Class count from the label flags, with the reference's precedence
    (classification/train.py:162-174): ``--label_groups`` -> one class per
    group; ``--positive_labels`` -> binary; ``--possible_labels`` -> one
    class per value; else ``--n_classes``. Using the bare ``--n_classes``
    default while passing ``--possible_labels a b c`` used to silently
    train a BINARY model. An explicit ``--n_classes`` that contradicts
    the derived count raises instead of guessing."""
    lg = getattr(args, "label_groups", None)
    pos = getattr(args, "positive_labels", None)
    pl = getattr(args, "possible_labels", None)
    if lg:
        derived = len(lg)
    elif pos:
        derived = 2
    elif pl:
        derived = len(pl)
    else:
        return getattr(args, "n_classes", 2) or 2
    explicit = getattr(args, "n_classes", None)
    if explicit not in (None, 2, derived):
        raise ValueError(
            f"--n_classes {explicit} contradicts the label flags "
            f"({derived} classes derived from "
            "label_groups/positive_labels/possible_labels)"
        )
    return derived


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
