"""
Flash-attention on-chip probe: the Pallas kernels (VMEM variant and, with
ADELL_PALLAS_TILED=1, the tiled forward + Pallas backward) against XLA's
materialized attention at ViT-on-volume token counts.

RISK NOTE: the tiled kernel's first real-chip compile wedged the remote
compile service in round 3 session B (BASELINE.md); run this probe LAST
in any on-chip queue, after everything else has been measured.

Timing protocol: dynamic-trip-count fori_loop inside one jit; rate from
the wall slope between two loop lengths (bench.py protocol — per-call
timing through the tunnel is dispatch-dominated).
"""

import numpy as np

from benchmarks.benchmark_unet_ablation import slope as slope_time


def main():
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.ops.pallas.attention import (
        attention_reference,
        flash_attention,
    )

    # whole-volume ViT token counts: 4k = 16x16x16 patches of a 128^3
    # volume at patch 8; 16k = the same at patch 5 / bigger volumes
    b, h, d = 1, 8, 64
    dtype = jnp.bfloat16
    for n in (4096, 16384):
        q = jnp.ones((b, h, n, d), dtype) * 0.02
        k = jnp.ones((b, h, n, d), dtype) * 0.03
        v = jnp.ones((b, h, n, d), dtype) * 0.05
        # 2 matmuls of [n, d] x [d, n] and [n, n] x [n, d]
        fwd_flops = 2 * b * h * (2 * n * n * d)
        for name, fn in (
            ("xla", attention_reference),
            ("flash", flash_attention),
        ):

            @jax.jit
            def fwd_chain(q, k, v, t, fn=fn):
                def body(i, c):
                    return c + fn(c, k, v) * 1e-6

                return jax.lax.fori_loop(0, t, body, q)

            @jax.jit
            def bwd_chain(q, k, v, t, fn=fn):
                def body(i, c):
                    def loss(qq):
                        return jnp.mean(fn(qq, k, v) ** 2)

                    return c + jax.grad(loss)(c).astype(c.dtype) * 1e-6

                return jax.lax.fori_loop(0, t, body, q)

            try:
                dt_f, ok_f = slope_time(lambda t: fwd_chain(q, k, v, t))
                print(
                    f"fwd     {name:6s} n={n:6d}: {dt_f * 1e3:8.2f} ms  "
                    f"{fwd_flops / dt_f / 1e12:6.2f} TFLOP/s"
                    f"{'' if ok_f else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"fwd     {name:6s} n={n:6d}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )
                continue
            try:
                dt_b, ok_b = slope_time(lambda t: bwd_chain(q, k, v, t))
                print(
                    f"fwd+bwd {name:6s} n={n:6d}: {dt_b * 1e3:8.2f} ms  "
                    f"{3 * fwd_flops / dt_b / 1e12:6.2f} TFLOP/s"
                    f"{'' if ok_b else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"fwd+bwd {name:6s} n={n:6d}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )

    # calibration bracket
    m = 4096

    @jax.jit
    def mm_chain(a, t):
        def body(i, c):
            return (c @ c) * 1e-3

        return jax.lax.fori_loop(0, t, body, a)

    a = jnp.ones((m, m), jnp.bfloat16)
    dt, ok = slope_time(lambda t: mm_chain(a, t), n_small=25)
    print(
        f"matmul  {m}^3 bf16: {dt * 1e3:8.2f} ms  "
        f"{2 * m**3 / dt / 1e12:6.2f} TFLOP/s"
        f"{'' if ok else '  (UNRESOLVED)'}"
    )


if __name__ == "__main__":
    main()
