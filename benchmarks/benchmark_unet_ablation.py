"""
Flagship-forward ablation: which op class holds the remaining ms/batch?

Runs the bench.py U-Net (BASELINE.md flagship geometry) with one knob
changed per row — norms off, links identity, upscale nearest, act relu —
so the cost of each op class is the delta against the full model. This is
the probe that attributed the 80 ms round-3 forward to instance norms
(~25 ms) and residual link blocks (~26 ms), which drove the TpuConv
routing pass (BASELINE.md round-3 session C).

Protocol: dynamic-trip-count fori_loop slope timing with matmul
calibrations bracketing every row (one process — the shared tunnel
degrades op classes unevenly; see BASELINE.md measurement-contention
findings). Run on the real chip.
"""

import time

import numpy as np


def slope(chain, n_small=4, min_delta=2.0, max_chain_s=90.0):
    import jax.numpy as jnp

    def t_of(n):
        t0 = time.perf_counter()
        np.asarray(chain(jnp.int32(n))).ravel()[:1]
        return time.perf_counter() - t0

    np.asarray(chain(jnp.int32(1))).ravel()[:1]
    t_small = min(t_of(n_small) for _ in range(2))
    n_big = max(4 * n_small, 16)
    while True:
        t_big = min(t_of(n_big) for _ in range(2))
        dt = t_big - t_small
        if dt >= min_delta:
            return dt / (n_big - n_small), True
        if t_big > max_chain_s or n_big >= 65536:
            return max(dt, 1e-9) / (n_big - n_small), False
        n_big *= 4


def main():
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.segmentation.unet import UNet

    m = 4096
    a_mm = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def mm(a, n):
        return jax.lax.fori_loop(0, n, lambda i, c: (c @ c) * 1e-3, a)

    def calib():
        dt, _ = slope(lambda n: mm(a_mm, n), n_small=25)
        print(f"calib: {2 * m**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    depth = (32, 32, 64, 128, 256)

    def variant(tag, **kw):
        cfg = dict(
            spatial_dimensions=3, conv_type="regular", link_type="residual",
            upscale_type="transpose", norm_type="instance",
            activation_fn="swish", dropout_param=0.0, n_classes=2,
            depth=depth, kernel_sizes=(3,) * 5, strides=(2,) * 5,
        )
        cfg.update(kw)
        model = UNet(**cfg)
        x = jnp.ones((4, 128, 128, 32, 1), jnp.bfloat16)
        params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

        @jax.jit
        def chain(p, x, n):
            def body(i, c):
                pred, _ = model.apply({"params": p}, c)
                return c + (pred[..., :1] * 1e-6).astype(c.dtype)

            return jax.lax.fori_loop(0, n, body, x)

        try:
            t0 = time.perf_counter()
            dt, ok = slope(lambda n: chain(params, x, n))
            print(
                f"{tag:22s}: {dt * 1e3:8.2f} ms/batch4 {4 / dt:7.1f} vol/s"
                f"{'' if ok else ' (UNRESOLVED)'}"
                f" [wall {time.perf_counter() - t0:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(
                f"{tag:22s}: FAILED {str(e).splitlines()[0][:90]}",
                flush=True,
            )
        calib()

    calib()
    variant("full")
    variant("norm=none", norm_type="none")
    variant("link=identity", link_type="identity")
    variant("upscale=upsample", upscale_type="upsample")
    variant("act=relu", activation_fn="relu")


if __name__ == "__main__":
    main()
