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

Round-5 extension — the HBM-bytes closure the round-4 verdict asked
for ("either fuse one residue class for a measured win, or extend the
roofline with an HBM-bytes model showing the elementwise residue
already runs at bandwidth speed-of-light"): every matmul site also
carries a BYTES estimate (lhs + rhs + out at 2 B/elt), the per-site
cost becomes max(flops/rate, bytes/BW) — the classic roofline — and
the non-matmul residue (aug warp gather, instance norms, residual
adds, concats) is priced as pure HBM traffic under two fusion
brackets: OPTIMISTIC (XLA fuses every elementwise chain into a
neighboring conv's read or write — residue costs only the warp's
gather pass) and PESSIMISTIC (each norm/add/concat pays one extra
read+write of its tensor). The achieved step time landing inside the
bracket is the closure argument. ``--train`` lowers the full
loss+grad step instead of aug+forward. ``--measure-bw`` times a
chained bf16 triad on the live chip (bracket with the matmul
calibration like every other on-chip number); default BW is the v5e
datasheet 819 GB/s.

Run: python benchmarks/roofline_flagship.py [--train] [--measure-bw]
(host-only unless --measure-bw; ~2 min trace)
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


BYTES_PER_ELT = 2  # bf16 activations/params on the hot path


def _numel(dims):
    n = 1
    for v in dims or []:
        n *= v
    return n


def site_inventory(train: bool = False):
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
    if train:
        # the full bench train objective: aug + forward + dice loss +
        # grads (optimizer update is negligible traffic next to the
        # bwd convs; bench.py applies sgd)
        from adell_mri_tpu.models.segmentation.losses import (
            binary_generalized_dice_loss,
        )

        y = jnp.zeros((bench.BATCH,) + bench.SHAPE, jnp.bfloat16)

        def objective(p, xi):
            pred, _ = model.apply({"params": p}, aug(k0, xi))
            return jnp.mean(
                binary_generalized_dice_loss(pred[..., 0], y)
            ).astype(jnp.float32)

        fun = jax.grad(objective)
    else:
        fun = lambda p, xi: model.apply(  # noqa: E731
            {"params": p}, aug(k0, xi)
        )[0]
    txt = jax.jit(fun).lower(params, x).as_text()

    sites = []
    residue = []
    for ln in txt.splitlines():
        ln = ln.strip()
        if not ln.startswith("%"):
            continue
        types = re.findall(r"tensor<[0-9x]+x[a-z0-9]+>", ln)
        if "stablehlo.convolution" in ln:
            if len(types) < 3:
                continue
            lhs, rhs, out = (
                _dims(types[-3]), _dims(types[-2]), _dims(types[-1])
            )
            fg = re.search(r"feature_group_count = (\d+)", ln)
            fg = int(fg.group(1)) if fg else 1
            # dim_numbers [b, spatial..., f] x [spatial..., i, o]
            cin, cout = rhs[-2], rhs[-1] * 1  # i is per-group cin
            k_spatial = rhs[:-2]
            flops = 2 * _numel(out) * cin * _numel(k_spatial)
            bts = BYTES_PER_ELT * (
                _numel(lhs) + _numel(rhs) + _numel(out)
            )
            sites.append(("conv", out, cout * fg, flops, bts))
        elif "stablehlo.dot_general" in ln:
            if len(types) < 3:
                continue
            lhs, rhs, out = (
                _dims(types[-3]), _dims(types[-2]), _dims(types[-1])
            )
            # contraction size = lhs elements / out's lhs-side elements;
            # approximate K as lhs[-1] (the standard [.., K] x [K, N])
            flops = 2 * _numel(out) * lhs[-1]
            bts = BYTES_PER_ELT * (
                _numel(lhs) + _numel(rhs) + _numel(out)
            )
            sites.append(("dot", out, out[-1], flops, bts))
        elif "stablehlo.gather" in ln and types:
            # the aug warp's resample: reads >= out-size worth of the
            # source volume, writes out
            out = _dims(types[-1])
            residue.append(("gather", 2 * BYTES_PER_ELT * _numel(out)))
        elif (
            "stablehlo.reduce " in ln or "stablehlo.reduce(" in ln
        ) and types:
            # norm statistics / loss sums: one read of the operand
            op = _dims(types[0])
            residue.append(("reduce", BYTES_PER_ELT * _numel(op)))
        elif "stablehlo.concatenate" in ln and types:
            out = _dims(types[-1])
            residue.append(("concat", 2 * BYTES_PER_ELT * _numel(out)))
    return sites, residue


HBM_BW_DEFAULT = 819e9  # TPU v5e datasheet HBM bandwidth, B/s


def measure_bw():
    """Chained bf16 triad on the live device: per iteration reads two
    256 MB operands and writes one (3 passes), chained so the tunnel's
    completion-signal quirks cannot fake the timing (same protocol as
    bench.timed_chain)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 128 * 1024 * 1024  # elements; 256 MB per bf16 operand
    a = jnp.ones((n,), jnp.bfloat16)
    b = jnp.full((n,), 0.5, jnp.bfloat16)

    @jax.jit
    def chain(a, b, k):
        def body(i, ab):
            a, b = ab
            return (a + b, b)

        return jax.lax.fori_loop(0, k, body, (a, b))[0]

    np.asarray(chain(a, b, 2))  # compile + warm
    rates = []
    for k in (8, 24):
        t0 = time.perf_counter()
        np.asarray(chain(a, b, k))
        rates.append((k, time.perf_counter() - t0))
    (k1, t1), (k2, t2) = rates
    dt = (t2 - t1) / (k2 - k1)
    bw = 3 * n * BYTES_PER_ELT / dt  # 2 reads + 1 write per iter
    return bw


def main():
    import argparse

    import bench

    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="lower the full loss+grad step instead of "
                    "aug+forward")
    ap.add_argument("--measure-bw", action="store_true",
                    help="time a chained bf16 triad on the live device "
                    "for the HBM bandwidth (default: v5e datasheet "
                    "819 GB/s)")
    ap.add_argument("--achieved-vps", type=float, default=None,
                    help="measured volumes/s to place against the "
                    "predicted window (e.g. BENCH_r04 train 29.1)")
    args = ap.parse_args()

    bw = HBM_BW_DEFAULT
    if args.measure_bw:
        bw = measure_bw()

    sites, residue = site_inventory(train=args.train)
    total_flops = 0.0
    t_flat = 0.0        # FLOPs-only composite (the round-3 ceiling)
    t_roof = 0.0        # per-site max(compute, bytes/BW)
    hbm_bound_sites = 0
    matmul_bytes = 0.0
    by_class = {}
    for kind, out, cout, flops, bts in sites:
        rate = DOT_RATE if kind == "dot" else measured_rate(cout)
        t_c = flops / (rate * 1e12)
        t_m = bts / bw
        total_flops += flops
        matmul_bytes += bts
        t_flat += t_c
        t_roof += max(t_c, t_m)
        if t_m > t_c:
            hbm_bound_sites += 1
        key = f"{kind}_cout{cout if kind == 'conv' else 'x'}"
        agg = by_class.setdefault(key, [0.0, rate, 0, 0.0])
        agg[0] += flops
        agg[2] += 1
        agg[3] += bts
    res_bytes = {}
    for kind, bts in residue:
        res_bytes[kind] = res_bytes.get(kind, 0.0) + bts
    gather_b = res_bytes.get("gather", 0.0)
    other_b = sum(v for k, v in res_bytes.items() if k != "gather")
    # fusion brackets for the non-matmul residue (module docstring)
    t_opt = t_roof + gather_b / bw
    t_pes = t_roof + (gather_b + 2 * other_b) / bw
    composite = total_flops / t_flat / 1e12
    per_vol = total_flops / bench.BATCH
    label = "train_step" if args.train else "aug_forward"
    out = {
        "program": label,
        "matmul_sites": len(sites),
        "conv_dot_gflop_per_volume": round(per_vol / 1e9, 1),
        "composite_ceiling_tflops": round(composite, 1),
        "composite_ceiling_pct_of_cal_200": round(100 * composite / 200, 1),
        "hbm_bw_gbs": round(bw / 1e9, 1),
        "hbm_bw_source": "measured" if args.measure_bw else "datasheet",
        "matmul_bytes_gb_per_volume": round(
            matmul_bytes / bench.BATCH / 1e9, 3
        ),
        "residue_bytes_gb_per_volume": {
            k: round(v / bench.BATCH / 1e9, 3)
            for k, v in sorted(res_bytes.items())
        },
        "hbm_bound_matmul_sites": hbm_bound_sites,
        # the closure window: achieved vol/s landing INSIDE
        # [pessimistic, optimistic] means the non-conv residue already
        # runs at bandwidth speed-of-light (nothing left to fuse)
        "predicted_vps_flops_only": round(bench.BATCH / t_flat, 1),
        "predicted_vps_optimistic_fusion": round(bench.BATCH / t_opt, 1),
        "predicted_vps_pessimistic_fusion": round(bench.BATCH / t_pes, 1),
    }
    if args.achieved_vps:
        out["achieved_vps"] = args.achieved_vps
        out["achieved_inside_bracket"] = bool(
            bench.BATCH / t_pes <= args.achieved_vps
        )
        # when achieved lands BELOW the pessimistic bracket, quantify
        # the unmodeled residue: ms/vol and its equivalent in full
        # activation-footprint HBM passes at the assumed BW — the
        # empirical size of the layout-transition + unfused-elementwise
        # tax this model does not carry
        t_ach = 1.0 / args.achieved_vps
        t_model = t_pes / bench.BATCH
        act_bytes_vol = matmul_bytes / bench.BATCH
        out["unmodeled_residue_ms_per_volume"] = round(
            1e3 * max(0.0, t_ach - t_model), 2
        )
        out["unmodeled_residue_activation_passes"] = round(
            max(0.0, t_ach - t_model) * bw / max(act_bytes_vol, 1), 2
        )
    print(json.dumps(out, indent=1))
    print("\nclass breakdown (GFLOP/vol, share, rate used, GB/vol):")
    for key, (f, rate, n, bts) in sorted(
        by_class.items(), key=lambda kv: -kv[1][0]
    ):
        print(
            f"  {key:14s} {f / bench.BATCH / 1e9:8.2f} GF "
            f"({100 * f / total_flops:5.1f}%) @ {rate:5.1f} TF/s  x{n}"
            f"  {bts / bench.BATCH / 1e9:6.3f} GB"
        )


if __name__ == "__main__":
    main()
