"""Host loader throughput on a synthetic NIfTI cohort (parity:
reference benchmarks/benchmark-dataloaders.py)."""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_cases", type=int, default=16)
    p.add_argument("--shape", nargs="+", type=int, default=[64, 64, 24])
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, RandomSampler
    from adell_mri_tpu.data.nifti import write_nifti
    from adell_mri_tpu.transforms.host import make_load_fn

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        entries = []
        for i in range(args.n_cases):
            path = os.path.join(tmp, f"{i}.nii.gz")
            write_nifti(
                path, rng.normal(size=tuple(args.shape)).astype(np.float32),
                np.eye(4),
            )
            entries.append({"image": path, "identifier": str(i)})
        load = make_load_fn(["image"], target_size=args.shape)
        ds = CachedVolumeDataset(entries, load, cache_rate=1.0)
        loader = DataLoader(
            ds, sampler=RandomSampler(len(ds), seed=0),
            batch_size=args.batch_size, drop_last=True, prefetch=2,
        )
        # first epoch fills the cache
        t0 = time.perf_counter()
        n_cold = sum(b["image"].shape[0] for b in loader)
        cold = n_cold / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for b in loader:
                n += b["image"].shape[0]
        warm = n / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "cold_volumes_per_sec": round(cold, 2),
                "cached_volumes_per_sec": round(warm, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
