"""VICReg loss latency across feature widths (parity:
reference benchmarks/benchmark-vicreg-losses.py:24-31, F=16..1024)."""

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_iters", type=int, default=20)
    args = p.parse_args()

    from adell_mri_tpu.models.ssl.losses import vicreg_loss
    from benchmarks.common import timed_chain

    out = {}
    for f in (16, 64, 256, 1024):
        z = jnp.ones((args.batch_size, f), jnp.float32)

        fn = jax.jit(lambda o: o + vicreg_loss(o, o * 0.9)[0])
        dt = timed_chain(fn, z, args.n_iters)
        out[f"F{f}_ms"] = round(dt * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
