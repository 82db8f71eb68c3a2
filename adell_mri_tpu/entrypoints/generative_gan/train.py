"""
``adell generative_gan train``.

Parity target: adell_mri/entrypoints/generative_gan/train_2d.py + GANPL
(gan/pl/gan.py:118): two-optimizer alternating loop with n_critic, WGAN-GP /
feature-matching options, conditional (class/regression/ACGAN) generation,
image-to-image translation with identity loss, cycle-consistency training
(gan/pl/gan.py:680) and progressive-growing ProGAN (gan/gan/pl.py:48).

Modes (selected by flags):
  default             latent-vector or conditional-UNet GAN
  --cycle_consistency CycleGAN over (--input_image_key, image_keys[0])
  --progressive       ProGAN: one jitted program per resolution stage,
                      params carried between stages by level name
  --gan_type stylegan StyleGAN: progressive + mapping network, per-block
                      noise injection, style-mixing regularization and
                      StyleGANLoss (ref gan/gan/style.py:358,
                      loss_functions.py:12)
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.config.parsing import load_yaml
from adell_mri_tpu.data import CachedVolumeDataset, DataLoader, Dataset, RandomSampler
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.models.gan import (
    ConditionalGenerator,
    Discriminator,
    Generator,
    ProGANDiscriminator,
    ProGANGenerator,
    grow_params,
)
from adell_mri_tpu.train import TrainState, get_optimizer
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.gan_steps import (
    make_conditional_gan_steps,
    make_cycle_gan_steps,
    make_gan_steps,
    make_progan_steps,
    make_stylegan_steps,
    progan_level_schedule,
)
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


def _fit_2d_fn(base_size, selection: str = "central", seed: int = 42):
    from adell_mri_tpu.transforms.host import center_crop_pad

    # "random" draws a slice per volume at load/cache time — the reference
    # semantics (SampleChannelDimd(keys, 1, 3) sits in the CACHED
    # pre-transforms, transforms.py:573, so its draw is frozen too);
    # "central" (default) is the deterministic variant, PARITY.md §2.2
    rng = np.random.default_rng(seed)

    def _fit_2d(img):
        if img.ndim == 4:
            z = (
                int(rng.integers(img.shape[2]))
                if selection == "random"
                else img.shape[2] // 2
            )
            img = img[:, :, z, :]
        return center_crop_pad(img, base_size)

    return _fit_2d


def main(arguments):
    parser = Parser(prog="adell generative_gan train")
    parser.add_argument_by_key(ARG_KEYS)
    parser.add_argument("--n_critic", type=int, default=1)
    parser.add_argument("--loss_type", default="adversarial")
    parser.add_argument("--gp_weight", type=float, default=None,
                    help="WGAN-GP / R1 weight (stylegan defaults to 10, others to 0)")
    parser.add_argument("--smoothing", type=float, default=0.0)
    parser.add_argument("--slice_selection", default="central",
                    choices=["central", "random"],
                    help="2D-from-3D slice pick at load/cache time (the "
                    "reference samples randomly; central is deterministic)")
    parser.add_argument("--feature_matching", type=float, default=0.0)
    # conditional generation (parity: GANPL classification_target_key /
    # regression_target_key + Generator class embeds / cross-attention)
    parser.add_argument("--generator_type", default="latent",
                        choices=["latent", "conditional"])
    parser.add_argument("--input_image_key", default=None,
                        help="source image key for image-to-image translation")
    parser.add_argument("--class_target_key", default=None)
    parser.add_argument("--reg_target_key", default=None)
    parser.add_argument("--lambda_identity", type=float, default=0.0)
    # cycle consistency (parity: GANPL cycle_consistency)
    parser.add_argument("--cycle_consistency", action="store_true")
    parser.add_argument("--lambda_cycle", type=float, default=10.0)
    parser.add_argument("--cycle_symmetry", action="store_true")
    # progressive growing (parity: ProGANPL); --gan_type stylegan trains
    # style-based (noise injection + style mixing + StyleGANLoss,
    # ref gan/gan/style.py:358 + loss_functions.py:12)
    parser.add_argument("--progressive", action="store_true")
    parser.add_argument("--gan_type", default="progan",
                        choices=["progan", "stylegan"])
    parser.add_argument("--epochs_per_level", type=int, default=5)
    parser.add_argument("--transition_epochs", type=int, default=1)
    parser.add_argument("--r1_weight", type=float, default=0.0)
    parser.add_argument("--diversity_weight", type=float, default=0.0)
    parser.add_argument("--drift_weight", type=float, default=0.001)
    args = parser.parse_args(arguments)

    from adell_mri_tpu.parallel.mesh import use_device

    use_device(args.dev)

    data = Dataset(args.dataset_json, seed=args.seed)
    presence = list(args.image_keys)
    if args.input_image_key:
        presence.append(args.input_image_key)
    if args.class_target_key:
        presence.append(args.class_target_key)
    if args.reg_target_key:
        presence.append(args.reg_target_key)
    data.apply_filters(presence_keys=presence)
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
    datalist = data.to_datalist()

    # class target -> integer mapping collected over the cohort
    class_to_int = None
    if args.class_target_key:
        values = sorted(
            {str(e[args.class_target_key]) for e in datalist}
        )
        class_to_int = {v: i for i, v in enumerate(values)}
        logger.info("class targets: %s", class_to_int)

    image_keys = [args.input_image_key] if args.input_image_key else []
    image_keys += list(args.image_keys)
    transforms = GenerationTransforms(
        image_keys=image_keys,
        target_spacing=args.target_spacing,
        # 2D GAN training on 3D volumes: load full volumes and take the
        # central slice (slice datasets come through the DICOM layer)
        target_size=base_size if sd == 3 else None,
    )
    base_load = transforms.load_fn()
    fit_2d = _fit_2d_fn(base_size, selection=args.slice_selection)

    def load_fn(entry):
        s = base_load(entry)
        img = s["image"]
        if sd == 2:
            img = fit_2d(img)
        out = {"image": (img * 2.0 - 1.0).astype(np.float32)}
        if args.input_image_key:
            # first channel(s) of the stacked load are the input domain
            n_in = 1
            out["input_image"] = out["image"][..., :n_in]
            out["image"] = out["image"][..., n_in:]
        if class_to_int is not None:
            out["class_target"] = np.int32(
                class_to_int[str(entry[args.class_target_key])]
            )
        if args.reg_target_key:
            out["reg_target"] = np.asarray(
                entry[args.reg_target_key], np.float32
            ).reshape(-1)
        return out

    ds = CachedVolumeDataset(
        datalist, load_fn, cache_rate=args.cache_rate,
        cache_dir=args.cache_dir,
        cache_fingerprint=repr(transforms),
    )
    loader = DataLoader(
        ds, sampler=RandomSampler(len(ds), seed=args.seed),
        batch_size=batch_size, drop_last=True,
    )
    mlog = MetricLogger(csv_path=args.metric_path)
    out_channels = len(args.image_keys)
    common = dict(
        args=args, cfg=cfg, loader=loader, mlog=mlog, sd=sd,
        base_size=base_size, out_channels=out_channels, lr=lr,
        latent_dim=latent_dim, depth=depth, latent_grid=latent_grid,
        n_classes=len(class_to_int) if class_to_int else None,
    )
    if args.progressive or args.gan_type == "stylegan":
        # the progressive steps consume only batch["image"] — refusing
        # beats silently training an unconditional model under flags the
        # user believes are active
        bad = [
            f
            for f, v in (
                ("--cycle_consistency", args.cycle_consistency),
                ("--class_target_key", args.class_target_key),
                ("--reg_target_key", args.reg_target_key),
                ("--input_image_key", args.input_image_key),
            )
            if v
        ]
        if bad:
            raise ValueError(
                f"{' / '.join(bad)} is not supported with "
                "--progressive/--gan_type stylegan (parity: the reference "
                "ProGANPL trains unconditionally, gan/gan/pl.py:48)"
            )
        for f, v, default in (
            ("--loss_type", args.loss_type, "adversarial"),
            ("--smoothing", args.smoothing, 0.0),
            ("--feature_matching", args.feature_matching, 0.0),
            ("--lambda_identity", args.lambda_identity, 0.0),
        ):
            if v != default:
                logger.warning(
                    "%s is ignored by the progressive/stylegan losses", f
                )
        metrics = _train_progressive(**common)
    elif args.cycle_consistency:
        if args.class_target_key or args.reg_target_key:
            raise ValueError(
                "--class_target_key/--reg_target_key are not supported "
                "with --cycle_consistency (the cycle steps are "
                "unconditional image-to-image)"
            )
        metrics = _train_cycle(**common)
    else:
        metrics = _train_regular(**common)
    logger.info("done: %s", json.dumps(metrics, default=float))


def _mk_state(apply_fn, params, lr):
    return TrainState.create(
        apply_fn, params, get_optimizer("adam", learning_rate=lr, b1=0.5)
    )


def _epoch_metrics(sums, n):
    return {k: v / max(n, 1) for k, v in sums.items()}


def _accumulate(sums, metrics, prefix):
    for k, v in metrics.items():
        sums[f"{prefix}{k}"] = sums.get(f"{prefix}{k}", 0.0) + float(v)


def _build_conditional(args, cfg, sd, out_channels, n_classes):
    n_reg = None
    if args.reg_target_key:
        n_reg = int(cfg.get("n_reg", 1))
    gen = ConditionalGenerator(
        spatial_dimensions=sd,
        in_channels=(1 if args.input_image_key else cfg.get("in_channels", 1)),
        out_channels=out_channels,
        num_channels=tuple(cfg.get("num_channels", (32, 64, 64))),
        num_res_blocks=cfg.get("num_res_blocks", 1),
        attention_levels=tuple(
            cfg.get("attention_levels", (False,) * (len(cfg.get("num_channels", (32, 64, 64))) - 1) + (True,))
        ),
        # per-level block-type matrix from the YAML, e.g.
        # block_types: [res, attn, cross_attn] (ref generator.py:77-2413)
        block_types=(
            tuple(cfg["block_types"]) if cfg.get("block_types") else None
        ),
        cross_attention_dim=cfg.get("cross_attention_dim"),
        num_class_embeds=n_classes,
        n_reg_embeds=n_reg,
        num_head_channels=cfg.get("num_head_channels", 8),
        transformer_num_layers=cfg.get("transformer_num_layers", 1),
        no_skip_connection=cfg.get("no_skip_connection", False),
    )
    disc = Discriminator(
        spatial_dimensions=sd,
        depth=tuple(cfg.get("disc_depth", (32, 64, 128))),
        n_classes=n_classes,
        n_reg=n_reg,
    )
    return gen, disc


def _train_regular(
    args, cfg, loader, mlog, sd, base_size, out_channels, lr,
    latent_dim, depth, latent_grid, n_classes,
):
    rng = jax.random.PRNGKey(args.seed)
    conditional = (
        args.generator_type == "conditional"
        or args.input_image_key is not None
        or n_classes is not None
        or args.reg_target_key is not None
    )
    if conditional:
        gen, disc = _build_conditional(args, cfg, sd, out_channels, n_classes)
        x0 = np.zeros(
            (1,) + base_size + (gen.in_channels,), np.float32
        )
        cls0 = np.zeros((1,), np.int32) if n_classes else None
        reg0 = (
            np.zeros((1, disc.n_reg), np.float32) if disc.n_reg else None
        )
        g_params = gen.init(
            {"params": jax.random.PRNGKey(args.seed)}, x0, None, cls0, reg0
        )["params"]
        d0 = np.zeros((1,) + base_size + (out_channels,), np.float32)
        d_params = disc.init({"params": jax.random.PRNGKey(args.seed + 1)}, d0)[
            "params"
        ]
        d_step, g_step = make_conditional_gan_steps(
            gen, disc,
            loss_type=args.loss_type,
            smoothing=args.smoothing,
            gp_weight=args.gp_weight or 0.0,
            r1_weight=args.r1_weight,
            feature_matching_weight=args.feature_matching,
            lambda_identity=args.lambda_identity,
            image_to_image=args.input_image_key is not None,
        )
        meta = {
            "generator_type": "conditional",
            "num_channels": list(gen.num_channels),
            "target_size": list(base_size),
        }
    else:
        gen = Generator(
            spatial_dimensions=sd, depth=depth, latent_dim=latent_dim,
            latent_grid=latent_grid, out_channels=out_channels,
        )
        disc = Discriminator(
            spatial_dimensions=sd, depth=tuple(reversed(depth)),
        )
        # the generator emits latent_grid * 2^n_up — a pad_size that is
        # not divisible by 2^n_up would silently train the discriminator
        # on systematically different real/fake geometry (both shapes
        # pass through the fully-convolutional mean-pooled critic)
        bad_dims = [s for s in base_size if s % (2 ** len(depth))]
        if bad_dims:
            raise ValueError(
                f"--pad_size {list(base_size)} must be divisible by "
                f"2^len(depth) = {2 ** len(depth)} for the latent "
                "generator's upsampling ladder to reproduce it"
            )
        z0 = np.zeros((1, latent_dim), np.float32)
        x0 = np.zeros((1,) + base_size + (out_channels,), np.float32)
        g_params = gen.init({"params": jax.random.PRNGKey(args.seed)}, z0)[
            "params"
        ]
        d_params = disc.init({"params": jax.random.PRNGKey(args.seed + 1)}, x0)[
            "params"
        ]
        d_step, g_step = make_gan_steps(
            gen, disc, latent_dim=latent_dim, loss_type=args.loss_type,
            smoothing=args.smoothing,
            gp_weight=args.gp_weight or 0.0,
            feature_matching_weight=args.feature_matching,
        )
        meta = {
            "latent_dim": latent_dim,
            "depth": list(depth),
            "latent_grid": list(latent_grid),
            "target_size": list(base_size),
        }
    g_state = _mk_state(gen.apply, g_params, lr)
    d_state = _mk_state(disc.apply, d_params, lr)
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "gan", fold=0,
        metadata=meta,
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    metrics = {}
    for epoch in range(args.max_epochs):
        sums, n = {}, 0
        for batch in loader:
            rng, k1, k2 = jax.random.split(rng, 3)
            for ci in range(args.n_critic):
                # fresh latents per critic iteration — reusing one key
                # gives the critic N identical (batch, z) draws
                d_state, d_m = d_step(
                    d_state, g_state.params, batch,
                    jax.random.fold_in(k1, ci),
                )
            g_state, g_m = g_step(g_state, d_state.params, batch, k2)
            n += 1
            _accumulate(sums, d_m, "d_")
            _accumulate(sums, g_m, "g_")
        metrics = _epoch_metrics(sums, n)
        mlog.log_metrics(metrics, step=epoch)
        ckpt.save(epoch + 1, g_state, metrics=metrics)
    ckpt.wait()  # commit the last async save before the caller exits
    return metrics


def _train_cycle(
    args, cfg, loader, mlog, sd, base_size, out_channels, lr,
    latent_dim, depth, latent_grid, n_classes,
):
    """CycleGAN: domain A = --input_image_key, domain B = image_keys[0]."""
    if not args.input_image_key:
        raise ValueError("--cycle_consistency requires --input_image_key")
    if len(args.image_keys) > 1:
        logger.warning(
            "cycle training is single-channel: domain B uses only "
            "image_keys[0] (%s); %s are ignored",
            args.image_keys[0],
            args.image_keys[1:],
        )
    rng = jax.random.PRNGKey(args.seed)
    num_channels = tuple(cfg.get("num_channels", (32, 64)))
    mk_gen = lambda: ConditionalGenerator(  # noqa: E731
        spatial_dimensions=sd, in_channels=1, out_channels=1,
        num_channels=num_channels,
        num_res_blocks=cfg.get("num_res_blocks", 1),
        attention_levels=tuple(cfg.get("attention_levels", (False,) * len(num_channels))),
    )
    mk_disc = lambda: Discriminator(  # noqa: E731
        spatial_dimensions=sd, depth=tuple(cfg.get("disc_depth", (32, 64))),
    )
    gen_ab, gen_ba = mk_gen(), mk_gen()
    disc_a, disc_b = mk_disc(), mk_disc()
    x0 = np.zeros((1,) + base_size + (1,), np.float32)
    seed = args.seed
    g_states = {
        "ab": _mk_state(
            gen_ab.apply,
            gen_ab.init({"params": jax.random.PRNGKey(seed)}, x0)["params"],
            lr,
        ),
        "ba": _mk_state(
            gen_ba.apply,
            gen_ba.init({"params": jax.random.PRNGKey(seed + 1)}, x0)["params"],
            lr,
        ),
    }
    d_states = {
        "a": _mk_state(
            disc_a.apply,
            disc_a.init({"params": jax.random.PRNGKey(seed + 2)}, x0)["params"],
            lr,
        ),
        "b": _mk_state(
            disc_b.apply,
            disc_b.init({"params": jax.random.PRNGKey(seed + 3)}, x0)["params"],
            lr,
        ),
    }
    d_step, g_step = make_cycle_gan_steps(
        gen_ab, gen_ba, disc_b, disc_a,
        loss_type=args.loss_type,
        smoothing=args.smoothing,
        lambda_cycle=args.lambda_cycle,
        lambda_identity=args.lambda_identity,
        cycle_symmetry=args.cycle_symmetry,
    )
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "cyclegan", fold=0,
        metadata={
            "num_channels": list(num_channels),
            "target_size": list(base_size),
            "cycle": True,
        },
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    metrics = {}
    for epoch in range(args.max_epochs):
        sums, n = {}, 0
        for batch in loader:
            cyc_batch = {
                "image_a": batch["input_image"],
                # domain B = image_keys[0] (docstring contract): the
                # loader stacks ALL image_keys into "image", but the
                # generators/discriminators here are single-channel
                "image_b": batch["image"][..., :1],
            }
            rng, k1, k2 = jax.random.split(rng, 3)
            for ci in range(args.n_critic):
                d_states, d_m = d_step(
                    d_states,
                    {"ab": g_states["ab"].params, "ba": g_states["ba"].params},
                    cyc_batch, jax.random.fold_in(k1, ci),
                )
            g_states, g_m = g_step(
                g_states,
                {"a": d_states["a"].params, "b": d_states["b"].params},
                cyc_batch, k2,
            )
            n += 1
            _accumulate(sums, d_m, "")
            _accumulate(sums, g_m, "")
        metrics = _epoch_metrics(sums, n)
        mlog.log_metrics(metrics, step=epoch)
        ckpt.save(epoch + 1, g_states["ab"], metrics=metrics)
    ckpt.wait()  # commit the last async save before the caller exits
    return metrics


def _train_progressive(
    args, cfg, loader, mlog, sd, base_size, out_channels, lr,
    latent_dim, depth, latent_grid, n_classes,
):
    """Progressive growing: base grid doubles each stage up to base_size.

    Each stage is a freshly jitted program; trained levels transfer via
    grow_params (parity: ProGANPL level schedule, gan/gan/pl.py:99-120)."""
    rng = jax.random.PRNGKey(args.seed)
    depths = tuple(cfg.get("depths", (128, 64, 32)))
    base_resolution = int(cfg.get("base_resolution", 4))
    n_stages = int(np.log2(base_size[0] // base_resolution))
    # the int(log2) floor would otherwise silently train the final stage
    # BELOW the requested size (metadata target_size then lies to every
    # downstream consumer)
    if base_resolution * 2**n_stages != base_size[0] or any(
        s % (2**n_stages) for s in base_size
    ):
        raise ValueError(
            f"--pad_size {list(base_size)}: the leading dim must be "
            f"base_resolution ({base_resolution}) times a power of two "
            "and every dim divisible by that power for the progressive "
            "schedule to finish at the requested size"
        )
    base_grid = tuple(s // (2**n_stages) for s in base_size)
    schedule = progan_level_schedule(
        args.max_epochs, n_stages, args.epochs_per_level,
        args.transition_epochs,
    )
    steps_per_epoch = max(1, len(loader))
    transition_steps = max(1, args.transition_epochs * steps_per_epoch)

    g_state = d_state = None
    built_stage = -1
    gen = disc = d_step = g_step = None
    resize = None
    ckpt = CheckpointManager(
        args.checkpoint_dir, name=args.checkpoint_name or "progan", fold=0,
        metadata={
            "gan_type": args.gan_type,
            "depths": list(depths),
            "base_grid": list(base_grid),
            "n_stages": n_stages,
            "latent_dim": latent_dim,
            "target_size": list(base_size),
        },
    )
    # fresh runs drop any stale best.json from a prior run
    ckpt.begin_run(resume=False)
    if len(loader) == 0:
        raise ValueError(
            "progressive training got an empty loader (batch_size larger "
            "than the cohort with drop_last) — lower --batch_size"
        )
    metrics = {}
    alpha = 1.0
    step_in_transition = 0
    for epoch, (stage, in_stage, fading) in enumerate(schedule):
        if stage != built_stage:
            style_based = args.gan_type == "stylegan"
            gen = ProGANGenerator(
                spatial_dimensions=sd, base_grid=base_grid, depths=depths,
                stage=stage, out_channels=out_channels, w_dim=latent_dim,
                noise_injection=style_based,
            )
            disc = ProGANDiscriminator(
                spatial_dimensions=sd, depths=depths, stage=stage,
            )
            res = tuple(g * 2**stage for g in base_grid)
            z0 = np.zeros((1, latent_dim), np.float32)
            x0 = np.zeros((1,) + res + (out_channels,), np.float32)
            g_params = gen.init(
                {
                    "params": jax.random.PRNGKey(args.seed),
                    "noise": jax.random.PRNGKey(args.seed + 2),
                },
                z0,
            )["params"]
            d_params = disc.init(
                {"params": jax.random.PRNGKey(args.seed + 1)}, x0
            )["params"]
            if g_state is not None:
                g_params = grow_params(g_state.params, g_params)
                d_params = grow_params(d_state.params, d_params)
            g_state = _mk_state(gen.apply, g_params, lr)
            d_state = _mk_state(disc.apply, d_params, lr)
            if style_based:
                d_step, g_step = make_stylegan_steps(
                    gen, disc, latent_dim=latent_dim,
                    n_levels=stage + 1,
                    gp_weight=(10.0 if args.gp_weight is None else args.gp_weight),
                )
            else:
                d_step, g_step = make_progan_steps(
                    gen, disc, latent_dim=latent_dim,
                    r1_weight=args.r1_weight,
                    drift_weight=args.drift_weight,
                    diversity_weight=args.diversity_weight,
                )
            resize = jax.jit(
                lambda x, res=res: jax.image.resize(
                    x, (x.shape[0],) + res + (x.shape[-1],), "linear"
                )
            )
            built_stage = stage
            step_in_transition = 0
            logger.info(
                "progressive stage %d/%d: resolution %s", stage, n_stages, res
            )
        sums, n = {}, 0
        for batch in loader:
            if fading:
                step_in_transition += 1
                alpha = min(1.0, step_in_transition / transition_steps)
            else:
                alpha = 1.0
            real = resize(jnp.asarray(batch["image"]))
            rng, k1, k2 = jax.random.split(rng, 3)
            for ci in range(args.n_critic):
                d_state, d_m = d_step(
                    d_state, g_state.params, {"image": real},
                    jax.random.fold_in(k1, ci), alpha,
                )
            g_state, g_m = g_step(
                g_state, d_state.params, {"image": real}, k2, alpha
            )
            n += 1
            _accumulate(sums, d_m, "d_")
            _accumulate(sums, g_m, "g_")
        metrics = _epoch_metrics(sums, n)
        metrics.update({"stage": stage, "alpha": alpha})
        mlog.log_metrics(metrics, step=epoch)
        ckpt.save(epoch + 1, g_state, metrics=metrics)
    ckpt.wait()  # commit the last async save before the caller exits
    return metrics
