"""
Epoch index samplers.

Parity target: adell_mri/utils/samplers.py:7 (PartiallyRandomSampler) and the
class-weighted sampling set up in the entrypoints (utils/torch_utils.py:64).
There is no torch DataLoader here; samplers are plain iterables of dataset
indices consumed by the host-side batch feeder (adell_mri_tpu.data.loader).
"""

from typing import Iterator, List, Sequence

import numpy as np


class PartiallyRandomSampler:
    """
    Always yields every index whose class is in ``keep_classes``; from the
    rest, yields a random ``non_keep_ratio`` fraction, reshuffled each epoch.
    """

    def __init__(
        self,
        classes: Sequence,
        keep_classes: Sequence = (1,),
        non_keep_ratio: float = 1.0,
        seed: int = 42,
        shuffle: bool = True,
    ):
        keep_set = {str(k) for k in keep_classes}
        self.keep_list = [
            i for i, c in enumerate(classes) if str(c) in keep_set
        ]
        self.non_keep_list = [
            i for i, c in enumerate(classes) if str(c) not in keep_set
        ]
        self.non_keep_ratio = non_keep_ratio
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.n_samples = None  # optional fixed epoch length override

    def set_n_samples(self, n: int):
        """Pins the epoch length (parity: samplers.py:81)."""
        self.n_samples = n

    def _epoch_indices(self) -> np.ndarray:
        n_non_keep = int(len(self.non_keep_list) * self.non_keep_ratio)
        sampled = self.rng.choice(
            self.non_keep_list, size=n_non_keep, replace=False
        ) if n_non_keep > 0 else np.array([], dtype=np.int64)
        idx = np.concatenate(
            [np.asarray(self.keep_list, dtype=np.int64), sampled.astype(np.int64)]
        )
        if self.shuffle:
            self.rng.shuffle(idx)
        if self.n_samples is not None:
            reps = int(np.ceil(self.n_samples / max(1, len(idx))))
            idx = np.tile(idx, reps)[: self.n_samples]
        return idx

    def __iter__(self) -> Iterator[int]:
        yield from self._epoch_indices().tolist()

    def __len__(self) -> int:
        if self.n_samples is not None:
            return self.n_samples
        return len(self.keep_list) + int(
            len(self.non_keep_list) * self.non_keep_ratio
        )


class WeightedSampler:
    """
    Samples ``n_samples`` indices per epoch with replacement, proportionally
    to per-index weights (parity: torch WeightedRandomSampler usage at
    entrypoints/classification/train.py via utils/torch_utils.py:64).
    """

    def __init__(self, weights: Sequence[float], n_samples: int = None, seed: int = 42):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.weights = self.weights / self.weights.sum()
        self.n_samples = n_samples or len(self.weights)
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        yield from self.rng.choice(
            len(self.weights), size=self.n_samples, p=self.weights
        ).tolist()

    def __len__(self) -> int:
        return self.n_samples


class RandomSampler:
    """Plain shuffled pass over ``n`` indices. ``n_samples`` pins the epoch
    length (with replacement when n_samples > n — parity with torch
    RandomSampler(num_samples=...) under --samples_per_epoch /
    --dataset_iterations_per_epoch)."""

    def __init__(
        self,
        n: int,
        seed: int = 42,
        shuffle: bool = True,
        n_samples: int = None,
    ):
        self.n = n
        self.shuffle = shuffle
        self.n_samples = n_samples
        self.rng = np.random.default_rng(seed)

    def set_n_samples(self, n: int):
        self.n_samples = n

    def __iter__(self) -> Iterator[int]:
        if self.n_samples is not None and self.n_samples != self.n:
            yield from self.rng.choice(
                self.n, size=self.n_samples, replace=self.n_samples > self.n
            ).tolist()
            return
        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        yield from idx.tolist()

    def __len__(self) -> int:
        return self.n_samples if self.n_samples is not None else self.n


def class_weights_from_labels(labels: List) -> np.ndarray:
    """Inverse-frequency per-sample weights for WeightedSampler."""
    labels = [str(x) for x in labels]
    uniq, counts = np.unique(labels, return_counts=True)
    freq = dict(zip(uniq.tolist(), counts.tolist()))
    n = len(labels)
    return np.asarray([n / (len(uniq) * freq[x]) for x in labels])
