"""
``adell generative_gan train_2d``.

Parity target: adell_mri/entrypoints/generative_gan/train_2d.py + GANPL
(gan/pl/gan.py:118): two-optimizer alternating loop with n_critic, WGAN-GP /
feature-matching options.
"""

import json

import jax
import numpy as np

from adell_mri_tpu.config.parsing import load_yaml
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.gan import Discriminator, Generator
from adell_mri_tpu.parallel.mesh import get_devices, mesh_for_batch
from adell_mri_tpu.train import TrainState, get_optimizer
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.gan_steps import make_gan_steps
from adell_mri_tpu.train.logging_utils import MetricLogger
from adell_mri_tpu.transforms import GenerationTransforms
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

ARG_KEYS = [
    "dataset_json",
    "image_keys",
    "cache_rate",
    "cache_dir",
    "subsample_size",
    "target_spacing",
    "pad_size",
    "config_file",
    "dev",
    "seed",
    "max_epochs",
    "batch_size",
    "learning_rate",
    "checkpoint_dir",
    "checkpoint_name",
    "metric_path",
]


def main(arguments):
    parser = Parser(prog="adell generative_gan train")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--n_critic", type=int, default=1)
    parser.add_argument("--loss_type", default="adversarial")
    parser.add_argument("--gp_weight", type=float, default=0.0)
    args = parser.parse_args(arguments)

    data = Dataset(args.dataset_json, seed=args.seed)
    data.apply_filters(presence_keys=list(args.image_keys))
    if args.subsample_size:
        data.subsample_dataset(subsample_size=args.subsample_size)
    cfg = load_yaml(args.config_file) if args.config_file else {}
    batch_size = args.batch_size or cfg.get("batch_size", 8)
    lr = args.learning_rate or cfg.get("learning_rate", 2e-4)
    base_size = tuple(args.pad_size)
    sd = len(base_size)
    latent_dim = cfg.get("latent_dim", 64)
    depth = tuple(cfg.get("depth", (64, 32)))
    n_up = len(depth)
    latent_grid = tuple(s // (2**n_up) for s in base_size)

    transforms = GenerationTransforms(
        image_keys=args.image_keys,
        target_spacing=args.target_spacing,
        # 2D GAN training on 3D volumes: load full volumes and take the
        # central slice (slice datasets come through the DICOM layer)
        target_size=base_size if sd == 3 else None,
    )
    base_load = transforms.load_fn()

    def _fit_2d(img):
        img = img[:, :, img.shape[2] // 2, :] if img.ndim == 4 else img
        pads = []
        for s, t in zip(img.shape[:2], base_size):
            total = max(t - s, 0)
            pads.append((total // 2, total - total // 2))
        img = np.pad(img, pads + [(0, 0)])
        sl = tuple(
            slice((s - t) // 2, (s - t) // 2 + t)
            for s, t in zip(img.shape[:2], base_size)
        )
        return img[sl + (Ellipsis,)]

    def load_fn(entry):
        s = base_load(entry)
        img = s["image"]
        if sd == 2:
            img = _fit_2d(img)
        s["image"] = (img * 2.0 - 1.0).astype(np.float32)  # [-1, 1]
        return s

    ds = CachedVolumeDataset(
        data.to_datalist(), load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
    )
    loader = DataLoader(
        ds, sampler=RandomSampler(len(ds), seed=args.seed),
        batch_size=batch_size, drop_last=True,
    )

    gen = Generator(
        spatial_dimensions=sd, depth=depth, latent_dim=latent_dim,
        latent_grid=latent_grid, out_channels=len(args.image_keys),
    )
    disc = Discriminator(
        spatial_dimensions=sd, depth=tuple(reversed(depth)),
    )
    z0 = np.zeros((1, latent_dim), np.float32)
    x0 = np.zeros((1,) + base_size + (len(args.image_keys),), np.float32)
    g_params = gen.init({"params": jax.random.PRNGKey(args.seed)}, z0)["params"]
    d_params = disc.init({"params": jax.random.PRNGKey(args.seed + 1)}, x0)["params"]
    g_state = TrainState.create(
        gen.apply, g_params, get_optimizer("adam", learning_rate=lr, b1=0.5)
    )
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=lr, b1=0.5)
    )
    d_step, g_step = make_gan_steps(
        gen, disc, latent_dim=latent_dim, loss_type=args.loss_type,
        gp_weight=args.gp_weight,
    )
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "gan", fold=0,
        metadata={
            "latent_dim": latent_dim,
            "depth": list(depth),
            "latent_grid": list(latent_grid),
            "target_size": list(base_size),
        },
    )
    mlog = MetricLogger(csv_path=args.metric_path)
    rng = jax.random.PRNGKey(args.seed)
    for epoch in range(args.max_epochs):
        sums, n = {}, 0
        for batch in loader:
            batch = {"image": batch["image"]}
            rng, k1, k2 = jax.random.split(rng, 3)
            for _ in range(args.n_critic):
                d_state, d_m = d_step(d_state, g_state.params, batch, k1)
            g_state, g_m = g_step(g_state, d_state.params, batch, k2)
            n += 1
            for k, v in {**{f"d_{k}": v for k, v in d_m.items()},
                         **{f"g_{k}": v for k, v in g_m.items()}}.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        metrics = {k: v / max(n, 1) for k, v in sums.items()}
        mlog.log_metrics(metrics, step=epoch)
        ckpt.save(epoch + 1, g_state, metrics=metrics)
    logger.info("done: %s", json.dumps(metrics, default=float))
