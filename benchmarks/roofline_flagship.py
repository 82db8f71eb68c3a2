"""
Composite roofline for the flagship UNet forward (VERDICT r3 weak-1:
"either train-step MFU >10-15% or a measured roofline argument").

Method: lower the EXACT bench program (aug + forward, bench.py geometry)
for the host CPU backend, parse every stablehlo.convolution /
dot_general out of the lowering (so the conv inventory can never drift
from the real model), compute each site's FLOPs from its shapes, and
assign each site the MEASURED on-chip throughput of its shape class
from the round-3 conv A/B sessions (BASELINE.md sessions E/F/G/H, all
rows taken inside healthy windows with bracketing matmul calibrations
137-229 TFLOP/s):

| class | measured fwd TFLOP/s | row |
|---|---|---|
| conv cout<=32  | 42.0 | z2d stem 32->32 (session H pallas_fz table; 21% of cal vs the 25% lane-fill bound) |
| conv cout=64   | 57.7 | z2d level2 32->64 (session G b2 rows) |
| conv cout=128  | 108  | level3 adjacent rows (session E sweep) |
| conv cout>=256 | 124  | level4 rows, low end (session E) |
| k==s transpose GEMM | 41 | deconv2 block-lowering row, session F (8.6 GF / 0.21 ms) |
| everything else (warp gather, norms, adds, concats) | HBM-bound, ~0 FLOPs |

The structural ceiling behind the cout<=64 rows: only cout of the MXU's
128 output lanes can carry signal, so cout/128 of peak is the
no-structural-zeros bound; z2d measures at 80-60%% of that bound and
every alternative lowering (im2col, b2, tap-wise, pallas implicit GEMM)
lost its on-chip A/B (session G/H decision rows).

Output: the FLOP-weighted harmonic composite — the best TFLOP/s this
conv mix can reach with the measured kernels — next to bench.py's
achieved aug_fwd TFLOP/s. The gap between composite and achieved is
non-conv time (augmentation warp, norms, residual adds: HBM traffic).

Run: python benchmarks/roofline_flagship.py   (host-only, ~2 min trace)
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measured_rate(cout: int) -> float:
    if cout <= 32:
        return 42.0
    if cout <= 64:
        return 57.7
    if cout <= 128:
        return 108.0
    return 124.0


DOT_RATE = 41.0  # k==s transpose GEMM (session F deconv2 block row)


def _dims(t):
    m = re.search(r"tensor<([0-9x]+)x[a-z0-9]+>", t)
    return [int(v) for v in m.group(1).split("x")] if m else None


def site_inventory():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench

    from adell_mri_tpu.models.segmentation.unet import UNet
    from adell_mri_tpu.transforms import augment_pipeline_for_bench

    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        n_classes=2,
        depth=bench.DEPTH,
        kernel_sizes=(3,) * len(bench.DEPTH),
        strides=(2,) * len(bench.DEPTH),
    )
    x = jnp.ones((bench.BATCH,) + bench.SHAPE + (1,), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    aug = augment_pipeline_for_bench(bench.SHAPE)
    k0 = jax.random.PRNGKey(0)
    txt = (
        jax.jit(lambda p, xi: model.apply({"params": p}, aug(k0, xi))[0])
        .lower(params, x)
        .as_text()
    )

    sites = []
    for ln in txt.splitlines():
        ln = ln.strip()
        if ln.startswith("%") and "stablehlo.convolution" in ln:
            types = re.findall(r"tensor<[0-9x]+x[a-z0-9]+>", ln)
            if len(types) < 3:
                continue
            rhs, out = _dims(types[-2]), _dims(types[-1])
            fg = re.search(r"feature_group_count = (\d+)", ln)
            fg = int(fg.group(1)) if fg else 1
            # dim_numbers [b, spatial..., f] x [spatial..., i, o]
            cin, cout = rhs[-2], rhs[-1] * 1  # i is per-group cin
            k_spatial = rhs[:-2]
            n_out = 1
            for v in out:
                n_out *= v
            kprod = 1
            for v in k_spatial:
                kprod *= v
            flops = 2 * n_out * cin * kprod
            sites.append(("conv", out, cout * fg, flops))
        elif ln.startswith("%") and "stablehlo.dot_general" in ln:
            types = re.findall(r"tensor<[0-9x]+x[a-z0-9]+>", ln)
            if len(types) < 3:
                continue
            lhs, out = _dims(types[-3]), _dims(types[-1])
            n_out = 1
            for v in out:
                n_out *= v
            # contraction size = lhs elements / out's lhs-side elements;
            # approximate K as lhs[-1] (the standard [.., K] x [K, N])
            flops = 2 * n_out * lhs[-1]
            sites.append(("dot", out, out[-1], flops))
    return sites


def main():
    import bench

    sites = site_inventory()
    total_flops = 0.0
    total_time = 0.0
    by_class = {}
    for kind, out, cout, flops in sites:
        rate = DOT_RATE if kind == "dot" else measured_rate(cout)
        total_flops += flops
        total_time += flops / (rate * 1e12)
        key = f"{kind}_cout{cout if kind == 'conv' else 'x'}"
        agg = by_class.setdefault(key, [0.0, rate, 0])
        agg[0] += flops
        agg[2] += 1
    composite = total_flops / total_time / 1e12
    per_vol = total_flops / bench.BATCH
    print(json.dumps({
        "matmul_sites": len(sites),
        "conv_dot_gflop_per_volume": round(per_vol / 1e9, 1),
        "composite_ceiling_tflops": round(composite, 1),
        "composite_ceiling_pct_of_cal_200": round(100 * composite / 200, 1),
    }, indent=1))
    print("\nclass breakdown (GFLOP/vol, share, rate used):")
    for key, (f, rate, n) in sorted(
        by_class.items(), key=lambda kv: -kv[1][0]
    ):
        print(
            f"  {key:14s} {f / bench.BATCH / 1e9:8.2f} GF "
            f"({100 * f / total_flops:5.1f}%) @ {rate:5.1f} TF/s  x{n}"
        )


if __name__ == "__main__":
    main()
