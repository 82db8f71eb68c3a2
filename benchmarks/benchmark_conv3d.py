"""
3D conv lowering sweep: XLA conv vs im2col matmul at the UNet's hot layer
shapes, forward AND backward (the backward now routes through the
hand-derived slices+matmuls vjp, ops/conv.py conv3d_im2col_trainable),
with the dense-matmul calibration alongside (the speed-of-light
reference). Run on the real chip; prints one line per configuration.

The interesting question (VERDICT r1 item 2b): is the 4.2 TFLOP/s 3D-conv
wall an XLA conv-tiling limitation (im2col wins) or an HBM/compute bound
(both match)?

Timing protocol: dynamic-trip-count fori_loop inside one jit; rate from
the wall-clock slope between two loop lengths (the remote tunnel's
multi-second dispatch jitter cancels; see bench.py).
"""

import time

import numpy as np


def slope_time(chain, n_small=4, min_delta=2.0, max_chain_s=90.0):
    """seconds per iteration from the wall slope of a dynamic-length
    chained loop; returns (dt_per_iter, resolved)."""
    import jax.numpy as jnp

    def t_of(n):
        t0 = time.perf_counter()
        np.asarray(chain(jnp.int32(n))).ravel()[:1]
        return time.perf_counter() - t0

    np.asarray(chain(jnp.int32(1))).ravel()[:1]  # compile + settle
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

    from adell_mri_tpu.ops.conv import (
        _IM2COL_MAX_BYTES,
        _im2col_patch_bytes,
        conv3d_b2,
        conv3d_im2col_trainable,
        conv3d_pallas_trainable,
        conv3d_xla,
        conv3d_z2d,
        conv3d_zfold,
    )
    from adell_mri_tpu.ops.pallas.conv import conv3d_pallas_supported

    import os as _os

    # ADELL_BENCH_SECTIONS: comma list of {unet,patchify,dw,deconv} — a
    # wedge-prone row (the pathological XLA stem fwd+bwd compile hung a
    # 2026-08-18 healthy-window sweep for 25 min) shouldn't cost the
    # decision rows after it; default runs everything
    _sections = set(
        _os.environ.get(
            "ADELL_BENCH_SECTIONS", "unet,patchify,dw,deconv"
        ).split(",")
    )

    B = 4
    shapes = [
        # (input shape, cout): the flagship UNet's per-level hot convs
        ((B, 128, 128, 32, 32), 32),
        ((B, 64, 64, 16, 32), 64),
        ((B, 32, 32, 8, 64), 128),
        ((B, 16, 16, 4, 128), 256),
    ]
    dtype = jnp.bfloat16
    for xs, cout in (shapes if "unet" in _sections else []):
        cin = xs[-1]
        w0 = jnp.full((3, 3, 3, cin, cout), 0.01, dtype)
        fwd_flops = 2 * int(np.prod(xs[:4])) * 27 * cin * cout
        lowerings = [
            ("xla", lambda x, w: conv3d_xla(x, w)),
            ("z2d", lambda x, w: conv3d_z2d(x, w)),
        ]
        if cout <= 64:
            # b2 (2^3 space-to-depth blocking) only pays where the MXU's
            # output lanes are underfilled: N=8*cout vs cout against its
            # 2.37x structural-zero overhead — a loss by construction at
            # cout >= 64 unless the conv path misbehaves (ops/conv.py
            # conv3d_b2 docstring)
            lowerings.append(("b2", lambda x, w: conv3d_b2(x, w)))
        # non-default lowerings are opt-in (ADELL_BENCH_RISKY=1): a zfold
        # row crashed the remote TPU worker mid-sweep (2026-08-18), losing
        # every row after it — the default sweep covers only the lowerings
        # production auto-routing can actually pick
        if _os.environ.get("ADELL_BENCH_RISKY", "0") == "1":
            lowerings.append(("zfold", lambda x, w: conv3d_zfold(x, w)))
            # match production routing: the stem's 3.4 GB patch tensor
            # (plus XLA's 4x lane-padded shifted slices) OOMs HBM when
            # forced, so only sweep im2col where the guard would pick it
            if _im2col_patch_bytes(
                xs, (3, 3, 3), (1, 1, 1), dtype
            ) <= _IM2COL_MAX_BYTES:
                lowerings.append(
                    ("im2col", lambda x, w: conv3d_im2col_trainable(
                        x, w, (1, 1, 1), "SAME"))
                )
            if conv3d_pallas_supported(
                xs, (3, 3, 3, cin, cout), (1, 1, 1), "SAME"
            ):
                lowerings.append(
                    ("pallas", lambda x, w: conv3d_pallas_trainable(
                        x, w, (1, 1, 1), "SAME"))
                )
        for name, fn in lowerings:
            x0 = jnp.ones(xs, dtype)

            @jax.jit
            def fwd_chain(x, w, n, fn=fn, cin=cin, cout=cout):
                def body(i, c):
                    y = fn(c, w)
                    # fold output back into the carry (mean keeps the
                    # chain alive regardless of cin != cout)
                    return c + jnp.mean(y) * 1e-6

                return jax.lax.fori_loop(0, n, body, x)

            @jax.jit
            def bwd_chain(x, w, n, fn=fn):
                def body(i, carry):
                    xx, ww = carry
                    def loss(xi, wi):
                        return jnp.mean(fn(xi, wi) ** 2)

                    dx, dw = jax.grad(loss, argnums=(0, 1))(xx, ww)
                    # grads may come back f32 (f32 loss accumulation);
                    # cast so the next iteration's conv sees one dtype
                    return (
                        xx + dx.astype(xx.dtype) * 1e-6,
                        ww + dw.astype(ww.dtype) * 1e-6,
                    )

                out = jax.lax.fori_loop(0, n, body, (x, w))
                return out[0]

            try:
                dt_f, ok_f = slope_time(lambda n: fwd_chain(x0, w0, n))
                print(
                    f"fwd     {name:7s} {str(xs):26s} -> {cout:4d}: "
                    f"{dt_f * 1e3:8.2f} ms  {fwd_flops / dt_f / 1e12:6.2f}"
                    f" TFLOP/s{'' if ok_f else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"fwd     {name:7s} {str(xs):26s}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )
                continue
            try:
                dt_b, ok_b = slope_time(lambda n: bwd_chain(x0, w0, n))
                # fwd (inside grad) + dx + dw = 3x the conv FLOPs
                print(
                    f"fwd+bwd {name:7s} {str(xs):26s} -> {cout:4d}: "
                    f"{dt_b * 1e3:8.2f} ms  "
                    f"{3 * fwd_flops / dt_b / 1e12:6.2f}"
                    f" TFLOP/s{'' if ok_b else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"fwd+bwd {name:7s} {str(xs):26s}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )

    # patchify (kernel == strides) rows: s2d (space-to-depth + GEMM, the
    # TPU auto pick) vs XLA's 3D conv — ConvNeXt stem / ViT patch embed
    from adell_mri_tpu.ops.conv import conv3d_s2d

    for xs, k, cout in (
        [
            ((B, 128, 128, 32, 1), (4, 4, 2), 96),
            ((B, 128, 128, 32, 4), (4, 4, 4), 768),
        ]
        if "patchify" in _sections
        else []
    ):
        cin = xs[-1]
        wp = jnp.full(k + (cin, cout), 0.01, dtype)
        flops = (
            2 * int(np.prod(xs[:4])) * cin * cout
        )  # every input voxel contracted once
        for name, fn in [
            ("xla", lambda x, w: conv3d_xla(x, w, strides=k, padding="VALID")),
            ("s2d", lambda x, w: conv3d_s2d(x, w, strides=k, padding="VALID")),
        ]:
            x0 = jnp.ones(xs, dtype)

            @jax.jit
            def pf_chain(x, w, n, fn=fn):
                def body(i, c):
                    return c + jnp.mean(fn(c, w)) * 1e-6

                return jax.lax.fori_loop(0, n, body, x)

            try:
                dt_f, ok_f = slope_time(lambda n: pf_chain(x0, wp, n))
                print(
                    f"patchify {name:6s} {str(xs):26s} k={k} -> {cout:4d}: "
                    f"{dt_f * 1e3:8.2f} ms  {flops / dt_f / 1e12:6.2f}"
                    f" TFLOP/s{'' if ok_f else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"patchify {name:6s} {str(xs):26s}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )

    # depthwise rows (ConvNeXt 7^3): XLA grouped conv vs the z-decomposed
    # depthwise lowering (ADELL_DW_LOWERING candidate)
    from adell_mri_tpu.ops.conv import conv3d_dw_z2d

    for xs in (
        [(B, 32, 32, 16, 96), (B, 16, 16, 8, 192)]
        if "dw" in _sections
        else []
    ):
        c = xs[-1]
        wd = jnp.full((7, 7, 7, 1, c), 0.01, dtype)
        flops = 2 * int(np.prod(xs[:4])) * 343 * c

        def dw_xla(x, w):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")
            )
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1, 1), padding="SAME",
                dimension_numbers=dn, feature_group_count=c,
            )

        for name, fn in [
            ("xla", dw_xla),
            ("dw_z2d", lambda x, w: conv3d_dw_z2d(x, w)),
        ]:
            x0 = jnp.ones(xs, dtype)

            @jax.jit
            def dw_chain(x, w, n, fn=fn):
                def body(i, c_):
                    return c_ + fn(c_, w) * 1e-6

                return jax.lax.fori_loop(0, n, body, x)

            try:
                dt_f, ok_f = slope_time(lambda n: dw_chain(x0, wd, n))
                print(
                    f"dw7     {name:7s} {str(xs):26s}: "
                    f"{dt_f * 1e3:8.2f} ms  {flops / dt_f / 1e12:6.2f}"
                    f" TFLOP/s{'' if ok_f else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"dw7     {name:7s} {str(xs):26s}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )

    # decoder upscale rows: XLA's transpose conv vs the block-matmul
    # lowering (conv_transpose_block — what TpuConvTranspose serves) at
    # the flagship UNet's kernel==strides==2 decoder shapes
    from adell_mri_tpu.ops.conv import conv_transpose_block

    for xs, cout in (
        [
            ((B, 16, 16, 4, 256), 128),
            ((B, 32, 32, 8, 128), 64),
            ((B, 64, 64, 16, 64), 32),
        ]
        if "deconv" in _sections
        else []
    ):
        cin = xs[-1]
        kt = (2, 2, 2)
        wt = jnp.full(kt + (cin, cout), 0.01, dtype)
        # each input voxel contracted into prod(k) output voxels
        flops = 2 * int(np.prod(xs[:4])) * 8 * cin * cout

        def t_xla(x, w):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")
            )
            return jax.lax.conv_transpose(
                x, w, strides=kt, padding="VALID",
                dimension_numbers=dn, transpose_kernel=False,
            )

        for name, fn in [
            ("xla", t_xla),
            ("block", lambda x, w: conv_transpose_block(x, w)),
        ]:
            x0 = jnp.ones(xs, dtype)

            @jax.jit
            def tr_chain(x, w, n, fn=fn):
                def body(i, c):
                    return c + jnp.mean(fn(c, w)) * 1e-6

                return jax.lax.fori_loop(0, n, body, x)

            try:
                dt_f, ok_f = slope_time(lambda n: tr_chain(x0, wt, n))
                print(
                    f"deconv2 {name:7s} {str(xs):26s} -> {cout:4d}: "
                    f"{dt_f * 1e3:8.2f} ms  {flops / dt_f / 1e12:6.2f}"
                    f" TFLOP/s{'' if ok_f else '  (UNRESOLVED)'}"
                )
            except Exception as exc:
                print(
                    f"deconv2 {name:7s} {str(xs):26s}: FAILED "
                    f"{str(exc).splitlines()[0][:120]}"
                )

    # pallas_fz section — NOT in the default list: the implicit-GEMM
    # kernel's first real-chip compile coincided with a compile-service
    # wedge (BASELINE.md 2026-08-17), so run it ALONE and LAST:
    #   ADELL_BENCH_SECTIONS=pallas_fz python -m benchmarks.benchmark_conv3d
    # A/B at the only flagship shapes the kernel takes (128-multiple axis):
    # z2d (production default) vs pallas_fz (Pallas fwd + z2d-derived bwd).
    if "pallas_fz" in _sections:
        from adell_mri_tpu.ops.conv import conv3d_pallas_fz

        for xs, cout in [((B, 128, 128, 32, 32), 32)]:
            cin = xs[-1]
            w0 = jnp.full((3, 3, 3, cin, cout), 0.01, dtype)
            x0 = jnp.ones(xs, dtype)
            fwd_flops = 2 * int(np.prod(xs[:4])) * 27 * cin * cout
            for name, fn in [
                ("z2d", lambda x, w: conv3d_z2d(x, w, (1, 1, 1), "SAME")),
                ("pls_fz", conv3d_pallas_fz),
            ]:

                @jax.jit
                def fwd_chain(x, w, n, fn=fn):
                    def body(i, c):
                        return c + jnp.mean(fn(c, w)) * 1e-6

                    return jax.lax.fori_loop(0, n, body, x)

                @jax.jit
                def bwd_chain(x, w, n, fn=fn):
                    def body(i, carry):
                        xx, ww = carry

                        def loss(xi, wi):
                            return jnp.mean(fn(xi, wi) ** 2)

                        dx, dw = jax.grad(loss, argnums=(0, 1))(xx, ww)
                        return (
                            xx + dx.astype(xx.dtype) * 1e-6,
                            ww + dw.astype(ww.dtype) * 1e-6,
                        )

                    return jax.lax.fori_loop(0, n, body, (x, w))[0]

                for tag, chain, fl in (
                    ("fwd    ", fwd_chain, fwd_flops),
                    ("fwd+bwd", bwd_chain, 3 * fwd_flops),
                ):
                    try:
                        dt, ok = slope_time(
                            lambda n, c=chain: c(x0, w0, n)
                        )
                        print(
                            f"{tag} {name:7s} {str(xs):26s} -> {cout:4d}: "
                            f"{dt * 1e3:8.2f} ms  {fl / dt / 1e12:6.2f}"
                            f" TFLOP/s{'' if ok else '  (UNRESOLVED)'}"
                        )
                    except Exception as exc:
                        print(
                            f"{tag} {name:7s} {str(xs):26s}: FAILED "
                            f"{str(exc).splitlines()[0][:120]}"
                        )

    # calibration: the MXU speed-of-light on this run
    m = 4096

    @jax.jit
    def mm_chain(a, n):
        def body(i, c):
            return (c @ c) * 1e-3

        return jax.lax.fori_loop(0, n, body, a)

    a = jnp.ones((m, m), jnp.bfloat16)
    dt, ok = slope_time(lambda n: mm_chain(a, n), n_small=25)
    print(
        f"matmul  {m}^3 bf16: {dt * 1e3:8.2f} ms  "
        f"{2 * m**3 / dt / 1e12:6.2f} TFLOP/s"
        f"{'' if ok else '  (UNRESOLVED)'}"
    )


if __name__ == "__main__":
    main()
