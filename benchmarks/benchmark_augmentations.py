"""On-device augmentation engine latency (parity:
reference benchmarks/benchmark_augmentations.py — times the SSL
AugmentationWorkhorse; here the full jit-compiled policy engine)."""

import argparse
import json

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--shape", nargs="+", type=int, default=[128, 128, 32])
    p.add_argument("--n_transforms", type=int, default=3)
    p.add_argument("--n_iters", type=int, default=10)
    args = p.parse_args()

    import jax.numpy as jnp

    from adell_mri_tpu.transforms import augment_pipeline_for_bench
    from adell_mri_tpu.transforms.augment import AugmentationWorkhorse
    from benchmarks.common import timed_chain

    shape = tuple(args.shape)
    x = jnp.ones((args.batch_size,) + shape + (1,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    aug = jax.jit(augment_pipeline_for_bench(shape))
    dt = timed_chain(lambda o: aug(key, o).astype(o.dtype), x, args.n_iters)
    out = {"policy_engine_ms_per_batch": round(dt * 1e3, 2)}

    wh = AugmentationWorkhorse(ndim=len(shape), n_transforms=args.n_transforms)
    whb = jax.jit(
        lambda o: jax.vmap(lambda k, v: wh(k, v))(
            jax.random.split(key, args.batch_size), o
        ).astype(o.dtype)
    )
    dt = timed_chain(whb, x, args.n_iters)
    out["trivial_augment_ms_per_batch"] = round(dt * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
