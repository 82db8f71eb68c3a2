"""
3D-conv wall investigation (BASELINE.md: XLA 3D conv at 4.2 TFLOP/s vs 50
TFLOP/s bf16 matmul on this chip). Times the flagship U-Net forward and its
constituent ops to find where the time goes, then tries alternative
lowerings for the worst offenders.

Run on the real chip: ``python benchmarks/benchmark_conv3d.py``.
Timing protocol: chained iterations + one final host transfer (see
BASELINE.md timing caveat — block_until_ready can return early through the
remote-execution tunnel).
"""

import time

import numpy as np

BATCH = 4
SHAPE = (128, 128, 32)
N_ITERS = 10


def timed(fn, x, n_iters=N_ITERS, name=""):
    """Chained timing: out feeds back in (shape/dtype must match)."""
    import jax

    out = fn(x)
    np.asarray(jax.tree.leaves(out)[0][..., :1])  # force compile + finish
    t0 = time.perf_counter()
    cur = x
    for _ in range(n_iters):
        cur = fn(cur)
    np.asarray(jax.tree.leaves(cur)[0][..., :1])
    dt = (time.perf_counter() - t0) / n_iters
    return dt


def flops_conv(spatial, cin, cout, k=3, stride=1):
    import math

    vox_out = math.prod(s // stride for s in spatial)
    return 2 * vox_out * (k ** 3) * cin * cout


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    print(f"devices: {jax.devices()}")
    # -------- health probe --------
    import threading

    ok = [False]

    def probe():
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        ok[0] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(90)
    if not ok[0]:
        raise SystemExit("tunnel unresponsive")
    print("probe ok")

    key = jax.random.PRNGKey(0)
    results = {}

    # -------- matmul calibration --------
    m = jax.random.normal(key, (8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm(x):
        return (x @ m).astype(jnp.bfloat16)

    dt = timed(mm, m)
    results["matmul_8192_tflops"] = 2 * 8192 ** 3 / dt / 1e12
    print(f"matmul_8192_tflops: {results['matmul_8192_tflops']:.2f}", flush=True)

    # -------- single conv layers (NDHWC, bf16) --------
    def conv_bench(cin, cout, spatial, stride=1, transpose=False, name=""):
        conv = (
            nn.ConvTranspose(cout, (3, 3, 3), strides=(stride,) * 3)
            if transpose
            else nn.Conv(
                cout, (3, 3, 3), strides=(stride,) * 3, padding="SAME"
            )
        )
        x = jax.random.normal(key, (BATCH,) + spatial + (cin,), jnp.bfloat16)
        params = conv.init(key, x)["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

        @jax.jit
        def f(x):
            y = conv.apply({"params": params}, x)
            # fold back to input shape/channels so timing can chain
            return y

        y = f(x)

        @jax.jit
        def chain(x):
            y = conv.apply({"params": params}, x)
            # reduce to scalar-ish then broadcast back: keeps the chain
            # dependency without shape games
            s = jnp.mean(y).astype(jnp.bfloat16)
            return x + s

        dt = timed(chain, x)
        fl = flops_conv(
            spatial, cin, cout, stride=1 if transpose else stride
        ) * (stride ** 3 if transpose else 1) * BATCH
        results[f"conv{name}_ms"] = dt * 1e3
        results[f"conv{name}_tflops"] = fl / dt / 1e12
        print(f"conv{name}: {dt*1e3:.2f} ms, {fl/dt/1e12:.2f} TFLOP/s", flush=True)

    conv_bench(1, 32, SHAPE, name="_stem_1to32_128")
    conv_bench(32, 32, SHAPE, name="_32to32_128")
    conv_bench(32, 32, SHAPE, stride=2, name="_32to32_s2_128")
    conv_bench(32, 64, (64, 64, 16), name="_32to64_64")
    conv_bench(64, 128, (32, 32, 8), name="_64to128_32")
    conv_bench(128, 256, (16, 16, 4), name="_128to256_16")
    conv_bench(64, 32, (64, 64, 16), stride=2, transpose=True, name="T_64to32_64")

    # -------- norm + activation at level-0 shape (bandwidth check) -----
    x0 = jax.random.normal(key, (BATCH,) + SHAPE + (32,), jnp.bfloat16)
    ln = nn.GroupNorm(num_groups=32)  # instance-norm-like per-channel
    p_ln = ln.init(key, x0)["params"]

    @jax.jit
    def norm_act(x):
        y = ln.apply({"params": p_ln}, x)
        return x + jnp.mean(nn.swish(y)).astype(jnp.bfloat16)

    results["instnorm_swish_128x32ch_ms"] = timed(norm_act, x0) * 1e3
    print(f"instnorm_swish: {results['instnorm_swish_128x32ch_ms']:.2f} ms", flush=True)

    # -------- im2col stem alternative --------
    @jax.jit
    def stem_im2col(x):
        # 3^3 shifted copies stacked on channels -> 1x1 conv (pure matmul)
        shifts = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    shifts.append(
                        jnp.roll(x, (dz, dy, dx), axis=(1, 2, 3))
                    )
        stacked = jnp.concatenate(shifts, axis=-1)  # [B, *S, 27*C]
        w = jnp.ones((27 * x.shape[-1], 32), jnp.bfloat16) * 0.01
        y = stacked @ w
        return x + jnp.mean(y).astype(jnp.bfloat16)

    x1 = jax.random.normal(key, (BATCH,) + SHAPE + (1,), jnp.bfloat16)
    dt = timed(stem_im2col, x1)
    results["stem_im2col_ms"] = dt * 1e3
    results["stem_im2col_tflops"] = (
        flops_conv(SHAPE, 1, 32) * BATCH / dt / 1e12
    )
    print(f"stem_im2col: {dt*1e3:.2f} ms", flush=True)

    # -------- full U-Net forward --------
    from adell_mri_tpu.models.segmentation.unet import UNet

    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        n_classes=2,
        depth=(32, 32, 64, 128, 256),
        kernel_sizes=(3,) * 5,
        strides=(2,) * 5,
    )
    xin = jnp.ones((BATCH,) + SHAPE + (1,), jnp.bfloat16)
    params = model.init({"params": key}, xin)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def unet_fwd(x):
        pred, _ = model.apply({"params": params}, x)
        return x + jnp.mean(pred).astype(jnp.bfloat16)

    dt = timed(unet_fwd, xin, n_iters=5)
    results["unet_fwd_ms"] = dt * 1e3
    results["unet_fwd_vols_per_sec"] = BATCH / dt

    for k, v in results.items():
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    main()
