"""Gather vs separable warp latency (parity:
reference benchmarks/benchmark-random-affine.py)."""

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--shape", nargs="+", type=int, default=[128, 128, 32])
    p.add_argument("--n_iters", type=int, default=10)
    args = p.parse_args()

    from adell_mri_tpu.transforms import spatial as S
    from benchmarks.common import timed_chain

    shape = tuple(args.shape)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((args.batch_size,) + shape + (1,), jnp.float32)
    mats = jnp.stack(
        [
            S.random_affine_matrix(
                jax.random.fold_in(key, i), shape, rotate_range=0.26,
                scale_range=0.1,
            )
            for i in range(args.batch_size)
        ]
    )
    ms = S.separable_max_shift(shape, 0.26, 0.0)
    sep = jax.jit(
        lambda o: jax.vmap(
            lambda v, m: S.warp_affine_separable(v, m, max_shift=ms)
        )(o, mats)
    )
    gat = jax.jit(
        lambda o: jax.vmap(lambda v, m: S.warp_affine(v, m))(o, mats)
    )
    out = {
        "separable_ms_per_batch": round(
            timed_chain(sep, x, args.n_iters) * 1e3, 2
        ),
        "gather_ms_per_batch": round(
            timed_chain(gat, x, args.n_iters) * 1e3, 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
