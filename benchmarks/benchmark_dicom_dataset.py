"""DICOM dataset + slice sampler throughput (parity:
reference benchmarks/benchmark_dicom_dataset.py,
benchmark_dicom_dataloader_with_sampler.py)."""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_studies", type=int, default=4)
    p.add_argument("--n_slices", type=int, default=16)
    p.add_argument("--n_iterations", type=int, default=4)
    args = p.parse_args()

    from adell_mri_tpu.data.dicom import DICOMDataset, SliceSampler, write_dicom

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        ds = []
        for s in range(args.n_studies):
            entries = []
            for i in range(args.n_slices):
                path = os.path.join(tmp, f"{s}_{i}.dcm")
                write_dicom(
                    path, rng.normal(size=(256, 256)).astype(np.float32)
                )
                entries.append({"image": path})
            ds.append({"series": entries})
        data = DICOMDataset(ds)
        sampler = SliceSampler(ds, n_iterations=args.n_iterations)
        t0 = time.perf_counter()
        n = 0
        for idx in sampler:
            _ = data[idx]
            n += 1
        dt = time.perf_counter() - t0
    print(json.dumps({"slices_per_sec": round(n / dt, 1), "n": n}))


if __name__ == "__main__":
    main()
