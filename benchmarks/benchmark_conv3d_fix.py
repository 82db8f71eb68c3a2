"""
Candidate fixes for the level-0 3D-conv wall found by benchmark_conv3d.py:
- conv 32->32 @ (128,128,32): 67 ms, 1.7 TFLOP/s
- instance-norm+swish @ same shape: 46 ms (pure bandwidth op, should be ~1 ms)
- stem conv 1->32: 31 ms, 0.12 TFLOP/s

Tries: hand-rolled instance norm, bf16-stats norm, space-to-depth conv
lowering (3^3 stride-1 conv == 2^3 conv over 8x channels in half-res space),
NCDHW layout, and wider-channel variants. Verifies numerics where relevant.
"""

import time

import numpy as np

BATCH = 4
SHAPE = (128, 128, 32)
C = 32
N_ITERS = 10


def timed(fn, x, n_iters=N_ITERS):
    import jax

    out = fn(x)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    cur = x
    for _ in range(n_iters):
        cur = fn(cur)
    np.asarray(jax.tree.leaves(cur)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n_iters


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH,) + SHAPE + (C,), jnp.bfloat16)

    # ---- 1. hand-rolled instance norm + swish (channels-last) ----
    scale = jnp.ones((C,), jnp.bfloat16)
    bias = jnp.zeros((C,), jnp.bfloat16)

    @jax.jit
    def inorm_hand(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.astype(jnp.bfloat16) * scale + bias
        y = y * jax.nn.sigmoid(y)
        return x + jnp.mean(y).astype(jnp.bfloat16)

    print(f"inorm_hand_f32stats: {timed(inorm_hand, x)*1e3:.2f} ms", flush=True)

    @jax.jit
    def inorm_bf16(x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2, 3), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * scale + bias
        y = y * jax.nn.sigmoid(y)
        return x + jnp.mean(y).astype(jnp.bfloat16)

    print(f"inorm_hand_bf16stats: {timed(inorm_bf16, x)*1e3:.2f} ms", flush=True)

    # flax GroupNorm(groups=C) reference number for comparison
    gn = nn.GroupNorm(num_groups=C)
    p_gn = gn.init(key, x)["params"]

    @jax.jit
    def inorm_flax(x):
        y = gn.apply({"params": p_gn}, x)
        y = y * jax.nn.sigmoid(y)
        return x + jnp.mean(y).astype(jnp.bfloat16)

    print(f"inorm_flax_groupnorm: {timed(inorm_flax, x)*1e3:.2f} ms", flush=True)

    # ---- 2. space-to-depth conv lowering ----
    # 3^3 stride-1 conv at (S, C->C) == 2^3 conv at (S/2, 8C->8C) with a
    # rearranged (mostly-zero) kernel, then depth-to-space back.
    w3 = jax.random.normal(key, (3, 3, 3, C, C), jnp.bfloat16) * 0.05

    def s2d(x):
        b, d, h, w, c = x.shape
        y = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        return y.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, d // 2, h // 2, w // 2, 8 * c
        )

    def d2s(y):
        b, d, h, w, c8 = y.shape
        c = c8 // 8
        z = y.reshape(b, d, h, w, 2, 2, 2, c)
        return z.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, d * 2, h * 2, w * 2, c
        )

    # equivalent low-res kernel: output phase (pz,py,px) of low-res cell g
    # needs high-res taps at offsets (k-1+p); tap (o) lives in low-res cell
    # o//2 (in {-1,0,1} -> 3^3 kernel) at input phase o%2
    w_eq = np.zeros((3, 3, 3, 8 * C, 8 * C), np.float32)
    w3_np = np.asarray(w3, np.float32)
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                out_phase = pz * 4 + py * 2 + px
                for kz in range(3):
                    for ky in range(3):
                        for kx in range(3):
                            oz, oy, ox = kz - 1 + pz, ky - 1 + py, kx - 1 + px
                            cz, ipz = oz // 2, oz % 2
                            cy, ipy = oy // 2, oy % 2
                            cx, ipx = ox // 2, ox % 2
                            in_phase = ipz * 4 + ipy * 2 + ipx
                            w_eq[
                                cz + 1, cy + 1, cx + 1,
                                in_phase * C : (in_phase + 1) * C,
                                out_phase * C : (out_phase + 1) * C,
                            ] += w3_np[kz, ky, kx]
    w_eq = jnp.asarray(w_eq, jnp.bfloat16)

    @jax.jit
    def conv_direct(x):
        y = jax.lax.conv_general_dilated(
            x, w3, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return x + jnp.mean(y).astype(jnp.bfloat16)

    print(f"conv3_direct: {timed(conv_direct, x)*1e3:.2f} ms", flush=True)

    @jax.jit
    def conv_s2d(x):
        lo = s2d(x)
        y = jax.lax.conv_general_dilated(
            lo, w_eq, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = d2s(y)
        return x + jnp.mean(out).astype(jnp.bfloat16)

    dt = timed(conv_s2d, x)
    fl = 2 * np.prod(SHAPE) * 27 * C * C * BATCH
    print(f"conv3_s2d: {dt*1e3:.2f} ms ({fl/dt/1e12:.2f} eff TFLOP/s)", flush=True)

    # numerics check (interior voxels; borders differ by padding phase)
    xa = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8, C), jnp.bfloat16)
    ya = jax.lax.conv_general_dilated(
        xa, w3, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    yb = d2s(
        jax.lax.conv_general_dilated(
            s2d(xa), w_eq, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )
    err = float(
        jnp.abs(
            ya[0, 2:-2, 2:-2, 2:-2].astype(jnp.float32)
            - yb[0, 2:-2, 2:-2, 2:-2].astype(jnp.float32)
        ).max()
    )
    ref = float(jnp.abs(ya).max())
    print(f"conv3_s2d interior maxerr: {err:.4f} (ref magnitude {ref:.2f})", flush=True)

    # ---- 3. stem via s2d: 1ch -> 32ch at full res ----
    w_stem = jax.random.normal(key, (3, 3, 3, 1, C), jnp.bfloat16) * 0.1
    w_stem_eq = np.zeros((3, 3, 3, 8, 8 * C), np.float32)
    ws_np = np.asarray(w_stem, np.float32)
    for pz in range(2):
        for py in range(2):
            for px in range(2):
                out_phase = pz * 4 + py * 2 + px
                for kz in range(3):
                    for ky in range(3):
                        for kx in range(3):
                            oz, oy, ox = kz - 1 + pz, ky - 1 + py, kx - 1 + px
                            cz, ipz = oz // 2, oz % 2
                            cy, ipy = oy // 2, oy % 2
                            cx, ipx = ox // 2, ox % 2
                            in_phase = ipz * 4 + ipy * 2 + ipx
                            w_stem_eq[
                                cz + 1, cy + 1, cx + 1,
                                in_phase,
                                out_phase * C : (out_phase + 1) * C,
                            ] += ws_np[kz, ky, kx, 0]
    w_stem_eq = jnp.asarray(w_stem_eq, jnp.bfloat16)
    x1 = jax.random.normal(key, (BATCH,) + SHAPE + (1,), jnp.bfloat16)

    @jax.jit
    def stem_s2d(x):
        lo = s2d(x)  # [B, 64, 64, 16, 8]
        y = jax.lax.conv_general_dilated(
            lo, w_stem_eq, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        out = d2s(y)
        return x + jnp.mean(out).astype(jnp.bfloat16)

    print(f"stem_s2d: {timed(stem_s2d, x1)*1e3:.2f} ms", flush=True)

    # ---- 4. NCDHW layout for the direct conv ----
    xn = jnp.moveaxis(x, -1, 1)
    w_n = jnp.transpose(w3, (4, 3, 0, 1, 2))  # OIDHW

    @jax.jit
    def conv_ncdhw(x):
        y = jax.lax.conv_general_dilated(
            x, w_n, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return x + jnp.mean(y).astype(jnp.bfloat16)

    print(f"conv3_ncdhw: {timed(conv_ncdhw, xn)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
