"""
Headline benchmark — the driver's north star (/root/repo/BASELINE.json):
end-to-end MRI volumes/sec/chip (augmentation + forward) on the flagship
3D U-Net vs the reference's architecture, an 8-worker CPU MONAI pipeline
doing the SAME work (aug + U-Net forward per volume).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Numerator: jit-compiled on-device augmentation (affine warp with folded
flips + Rician/Gibbs noise + gamma/scale/shift) chained into the bf16
U-Net forward, batch 4, auto conv lowering (ops/conv.py im2col heuristic).

Denominator: a faithful CPU re-creation of the reference hot path
(MONAI is not installed here): scipy affine resample + numpy intensity ops
(what RandAffined/RandRicianNoised/RandAdjustContrastd do per sample,
adell_mri/transform_factory/*) followed by a torch CPU forward of the same
U-Net geometry (the reference runs torch; torch 2.x CPU is installed).
Single-core time x 8 perfectly-parallel workers — generous to the baseline
since real workers contend. Measured once and cached in
.bench_baseline.json (versioned; delete to re-measure).

Sidecars: aug-only volumes/sec (the round-1/2 headline), train-step
volumes/sec (fwd+bwd+update), and a dense bf16 matmul calibration so a
reader can separate shared-tunnel contention from code regressions
(BASELINE.md round-2 caveat: the chip intermittently degrades 30-100x).
"""

import json
import os
import time

import numpy as np

BATCH = 4
SHAPE = (128, 128, 32)
N_ITERS = 20
DEPTH = (32, 32, 64, 128, 256)
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
BASELINE_VERSION = 2  # v2: aug + torch CPU forward (was: aug only)


def _cpu_aug_seconds_per_volume() -> float:
    """Per-volume random affine (scipy map_coordinates, trilinear — what
    MONAI RandAffined does on CPU) + Rician noise + gamma contrast + the
    occasional Gibbs pass, single core."""
    from scipy import ndimage

    rng = np.random.default_rng(0)
    vol = rng.normal(size=SHAPE).astype(np.float32)
    mat = np.eye(3) + rng.normal(scale=0.05, size=(3, 3))
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        warped = ndimage.affine_transform(vol, mat, order=1)
        # Rician noise (RandRicianNoised) + gamma contrast
        n1 = rng.normal(scale=0.05, size=SHAPE).astype(np.float32)
        n2 = rng.normal(scale=0.05, size=SHAPE).astype(np.float32)
        warped = np.sqrt((warped + n1) ** 2 + n2**2)
        lo, hi = warped.min(), warped.max()
        unit = (warped - lo) / max(hi - lo, 1e-6)
        warped = unit**1.2 * (hi - lo) + lo
        if i % 4 == 0:  # RandGibbsNoised fires at p=0.25 in the reference
            k = np.fft.fftn(warped)
            k[SHAPE[0] // 4 :, :, :] = 0
            warped = np.real(np.fft.ifftn(k)).astype(np.float32)
    return (time.perf_counter() - t0) / n


def _cpu_torch_fwd_seconds_per_volume() -> float:
    """torch CPU forward of the same U-Net geometry as the TPU numerator
    (depth/strides/instance-norm match; the reference's UNet hot path,
    adell_mri/modules/segmentation/unet.py:751)."""
    import torch

    torch.set_num_threads(1)  # single worker core; x8 amortization below

    class Block(torch.nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv3d(cin, cout, 3, padding=1)
            self.conv2 = torch.nn.Conv3d(cout, cout, 3, padding=1, stride=stride)
            self.norm = torch.nn.InstanceNorm3d(cout)
            self.act = torch.nn.SiLU()

        def forward(self, x):
            return self.act(self.norm(self.conv2(self.act(self.conv1(x)))))

    class MiniUNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            downs, ups = [], []
            cin = 1
            for d in DEPTH:
                downs.append(Block(cin, d, 2))
                cin = d
            rev = list(DEPTH[::-1][1:]) + [DEPTH[0]]
            for d in rev:
                ups.append(
                    torch.nn.Sequential(
                        torch.nn.Upsample(scale_factor=2),
                        Block(cin, d, 1),
                    )
                )
                cin = d
            self.downs = torch.nn.ModuleList(downs)
            self.ups = torch.nn.ModuleList(ups)
            self.head = torch.nn.Conv3d(cin, 1, 1)

        def forward(self, x):
            skips = []
            for blk in self.downs:
                x = blk(x)
                skips.append(x)
            for blk, skip in zip(self.ups, skips[::-1][1:] + [None]):
                x = blk(x)
                if skip is not None:
                    x = x + skip
            return torch.sigmoid(self.head(x))

    net = MiniUNet().eval()
    x = torch.randn(1, 1, *SHAPE)
    with torch.no_grad():
        net(x)  # warm
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            net(x)
        return (time.perf_counter() - t0) / n


def _cpu_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("version") == BASELINE_VERSION:
            return cached
    aug_s = _cpu_aug_seconds_per_volume()
    fwd_s = _cpu_torch_fwd_seconds_per_volume()
    cached = {
        "version": BASELINE_VERSION,
        "cpu_aug_seconds_per_volume": aug_s,
        "cpu_torch_fwd_seconds_per_volume": fwd_s,
        # 8 workers, perfectly parallel (upper bound for the baseline)
        "cpu_aug_fwd_vps": 8.0 / (aug_s + fwd_s),
        "cpu_aug_only_vps": 8.0 / aug_s,
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cached, f)
    return cached


def _device_health_check(timeout_s: float = None) -> bool:
    """
    The remote TPU compile service occasionally wedges (hangs all compiles
    for ~30-60 min; see memory note axon-pallas-quirks). Probe with a tiny
    matmul under a watchdog so a wedged tunnel fails fast and loudly
    instead of hanging the benchmark runner.
    """
    import threading

    if timeout_s is None:
        # 2026-08-17: the compile service has been seen taking 77-525 s
        # even for tiny programs while still producing correct results —
        # a 120 s probe would abort a bench that could finish (slowly)
        timeout_s = float(os.environ.get("ADELL_BENCH_PROBE_TIMEOUT", 420))
    ok = [False]

    def probe():
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        ok[0] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok[0]


def main():
    import sys

    if not _device_health_check():
        print(
            "bench: device unresponsive after the probe timeout "
            "(wedged compile tunnel; raise ADELL_BENCH_PROBE_TIMEOUT?)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    import jax
    import jax.numpy as jnp
    import optax

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
        depth=DEPTH,
        kernel_sizes=(3,) * len(DEPTH),
        strides=(2,) * len(DEPTH),
    )
    x = jnp.ones((BATCH,) + SHAPE + (1,), jnp.bfloat16)
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    aug = augment_pipeline_for_bench(SHAPE)

    @jax.jit
    def aug_step(x, key):
        # keep the chain dependency type-stable so iterations sequence
        return aug(key, x).astype(x.dtype)

    @jax.jit
    def fwd_step(params, x, key):
        x = aug(key, x)
        pred, _ = model.apply({"params": params}, x)
        return pred

    def timed(fn):
        """Enqueue N_ITERS chained steps; a final host transfer forces true
        completion (through the remote-execution tunnel,
        block_until_ready can return before device compute finishes)."""
        key = jax.random.PRNGKey(0)
        np.asarray(fn(jax.random.fold_in(key, N_ITERS + 1)))
        t0 = time.perf_counter()
        out = None
        for i in range(N_ITERS):
            out = fn(jax.random.fold_in(key, i))
        np.asarray(out)
        return BATCH * N_ITERS / (time.perf_counter() - t0)

    # HEADLINE: aug + forward, the work the reference splits across
    # 8 CPU workers (aug) + accelerator (fwd); here both live in one jit.
    # Best-of-3 passes: the shared tunnel's contention is bursty, and
    # max-of-N is the standard way to estimate the machine's capability
    # rather than the contention du jour.
    e2e_vps = max(timed(lambda k: fwd_step(params, x, k)) for _ in range(3))
    aug_vps = max(timed(lambda k: aug_step(x, k)) for _ in range(3))

    # train step (fwd + bwd + update): the other number that matters for
    # production training; f32 master params + bf16 compute.
    f32_params = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(f32_params)
    y = (jnp.mean(x, axis=-1) > 0).astype(jnp.float32)

    def loss_fn(p, x, key):
        xa = aug(key, x)
        pred, _ = model.apply(
            {"params": jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)}, xa
        )
        pr = pred[..., 0].astype(jnp.float32)
        return jnp.mean((pr - y) ** 2)

    @jax.jit
    def train_step(p, o, x, key):
        _, grads = jax.value_and_grad(loss_fn)(p, x, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    def train_timed():
        nonlocal f32_params, opt_state
        key = jax.random.PRNGKey(1)
        f32_params, opt_state = train_step(
            f32_params, opt_state, x, jax.random.fold_in(key, 99)
        )
        np.asarray(jax.tree.leaves(f32_params)[0]).ravel()[0]
        t0 = time.perf_counter()
        for i in range(max(N_ITERS // 2, 5)):
            f32_params, opt_state = train_step(
                f32_params, opt_state, x, jax.random.fold_in(key, i)
            )
        np.asarray(jax.tree.leaves(f32_params)[0]).ravel()[0]
        return BATCH * max(N_ITERS // 2, 5) / (time.perf_counter() - t0)

    try:
        train_vps = max(train_timed() for _ in range(2))
    except Exception as exc:  # train-step compile/run must not kill bench
        print(f"bench: train-step sidecar failed: {exc}", file=sys.stderr)
        train_vps = None

    # device-health calibration: a dense bf16 matmul. Round-1 measured
    # ~50 TFLOP/s on a healthy chip; the shared tunnel intermittently
    # degrades 30-100x (see BASELINE.md round-2 caveat), so this field
    # lets a reader separate service contention from code regressions.
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda a: (a @ a).astype(jnp.bfloat16))
    cal = a
    np.asarray(mm(cal)).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(10):
        cal = mm(cal)
    np.asarray(cal).ravel()[0]
    cal_tflops = 2 * m**3 * 10 / (time.perf_counter() - t0) / 1e12

    baseline = _cpu_baseline()

    print(
        json.dumps(
            {
                "metric": "mri_volumes_per_sec_chip_aug_plus_forward",
                "value": round(e2e_vps, 3),
                "unit": "volumes/s",
                "vs_baseline": round(e2e_vps / baseline["cpu_aug_fwd_vps"], 3),
                "aug_only_volumes_per_sec": round(aug_vps, 3),
                "aug_only_vs_cpu_aug_only": round(
                    aug_vps / baseline["cpu_aug_only_vps"], 3
                ),
                "train_step_volumes_per_sec": (
                    round(train_vps, 3) if train_vps else None
                ),
                "cpu_baseline_aug_fwd_vps": round(
                    baseline["cpu_aug_fwd_vps"], 3
                ),
                "matmul_tflops_calibration": round(cal_tflops, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
