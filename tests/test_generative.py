"""Diffusion + GAN stack tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.diffusion import (
    DiffusionProcess,
    DiffusionUNet,
    Embedder,
    make_beta_schedule,
)
from adell_mri_tpu.models.gan import (
    AutoEncoder,
    Discriminator,
    Generator,
    MappingNetwork,
    ProGANDiscriminator,
    ProGANGenerator,
    VariationalAutoEncoder,
)
from adell_mri_tpu.models.gan import losses as GL
from adell_mri_tpu.train import TrainState, get_optimizer
from adell_mri_tpu.train.gan_steps import make_diffusion_step, make_gan_steps

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "schedule", ["linear", "scaled_linear", "cosine", "sigmoid", "sqrt"]
)
def test_beta_schedules(schedule):
    betas = make_beta_schedule(schedule, 100)
    assert betas.shape == (100,)
    assert float(betas.min()) > 0 and float(betas.max()) < 1


def test_q_sample_snr_monotone():
    p = DiffusionProcess(n_timesteps=100)
    x0 = jnp.ones((2, 8, 8, 1))
    xt_early, _ = p.q_sample(KEY, x0, jnp.asarray([5, 5]))
    xt_late, _ = p.q_sample(KEY, x0, jnp.asarray([95, 95]))
    # later timesteps retain less signal
    assert abs(float(xt_late.mean())) < abs(float(xt_early.mean()))


def test_diffusion_unet_and_step():
    model = DiffusionUNet(
        spatial_dimensions=2,
        depth=(8, 16),
        attention_levels=(False, True),
        temb_dim=16,
    )
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.asarray([3, 7])
    params = model.init({"params": KEY}, x, t)["params"]
    eps = model.apply({"params": params}, x, t)
    assert eps.shape == x.shape
    process = DiffusionProcess(n_timesteps=10)
    lm = make_diffusion_step(model, process)
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(model.apply, params, tx)
    from adell_mri_tpu.train.steps import make_train_step

    step = make_train_step(lm)
    losses = []
    for i in range(3):
        state, metrics = step(state, {"image": x}, KEY)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))


def test_diffusion_sampling_shapes():
    model = DiffusionUNet(
        spatial_dimensions=2, depth=(4, 8), attention_levels=(False, False),
        temb_dim=8,
    )
    x = jax.random.normal(KEY, (1, 8, 8, 1))
    params = model.init({"params": KEY}, x, jnp.asarray([0]))["params"]
    process = DiffusionProcess(n_timesteps=5)

    def model_fn(xt, t):
        return model.apply(
            {"params": params}, xt, jnp.full((xt.shape[0],), t)
        )

    out = process.sample(KEY, model_fn, (1, 8, 8, 1))
    assert out.shape == (1, 8, 8, 1)
    out = process.ddim_sample(KEY, model_fn, (1, 8, 8, 1), n_steps=3)
    assert out.shape == (1, 8, 8, 1)
    # partial denoise (skip steps)
    out = process.sample(
        KEY, model_fn, (1, 8, 8, 1), skip_steps=3, x_start=x
    )
    assert out.shape == (1, 8, 8, 1)


def test_embedder_uncondition_dropout():
    emb = Embedder(cat_feat=(3,), n_num_feat=2, embedding_size=8,
                   uncondition_proba=1.0)
    cat = [jnp.asarray([0, 1, 2, 1])]
    num = jnp.ones((4, 2))
    v = emb.init({"params": KEY, "uncondition": KEY}, cat, num)
    out_train = emb.apply(
        v, cat, num, train=True, rngs={"uncondition": KEY}
    )
    # with proba 1, all rows equal the null embedding
    assert np.allclose(np.asarray(out_train[0]), np.asarray(out_train[1]))
    out_eval = emb.apply(v, cat, num)
    assert not np.allclose(np.asarray(out_eval[0]), np.asarray(out_eval[1]))


def test_gan_two_player_steps():
    gen = Generator(
        spatial_dimensions=2, depth=(16, 8), latent_dim=8, latent_grid=(4, 4)
    )
    disc = Discriminator(spatial_dimensions=2, depth=(8, 16))
    real = jnp.tanh(jax.random.normal(KEY, (4, 16, 16, 1)))
    z = jnp.zeros((4, 8))
    g_params = gen.init({"params": KEY}, z)["params"]
    d_params = disc.init({"params": KEY}, real)["params"]
    g_state = TrainState.create(
        gen.apply, g_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_step, g_step = make_gan_steps(
        gen, disc, latent_dim=8, loss_type="adversarial",
        feature_matching_weight=1.0,
    )
    for i in range(2):  # n_critic = 2
        d_state, d_metrics = d_step(d_state, g_state.params, {"image": real}, KEY)
    g_state, g_metrics = g_step(g_state, d_state.params, {"image": real}, KEY)
    assert np.isfinite(float(d_metrics["loss"]))
    assert np.isfinite(float(g_metrics["loss"]))
    assert "feature_matching" in g_metrics


def test_wgan_gp():
    gen = Generator(spatial_dimensions=2, depth=(8,), latent_dim=4, latent_grid=(8, 8))
    disc = Discriminator(spatial_dimensions=2, depth=(8,))
    real = jnp.tanh(jax.random.normal(KEY, (2, 16, 16, 1)))
    z = jnp.zeros((2, 4))
    g_params = gen.init({"params": KEY}, z)["params"]
    d_params = disc.init({"params": KEY}, real)["params"]
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_step, _ = make_gan_steps(
        gen, disc, latent_dim=4, loss_type="wgan", gp_weight=10.0
    )
    d_state, metrics = d_step(d_state, g_params, {"image": real}, KEY)
    assert "gp" in metrics and np.isfinite(float(metrics["gp"]))


def test_autoencoders():
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    ae = AutoEncoder(spatial_dimensions=2, depth=(8, 16), latent_dim=8)
    v = ae.init({"params": KEY}, x)
    assert ae.apply(v, x).shape == x.shape
    assert ae.apply(v, x, return_latent=True).shape == (2, 8)
    vae = VariationalAutoEncoder(spatial_dimensions=2, depth=(8, 16), latent_dim=8)
    v = vae.init({"params": KEY, "latent": KEY}, x)
    recon, mu, logvar = vae.apply(v, x, rngs={"latent": KEY})
    assert recon.shape == x.shape
    kl = GL.vae_kl_loss(mu, logvar)
    assert np.isfinite(float(kl))


def test_progan_stages_and_fade():
    z = jax.random.normal(KEY, (2, 16))
    gen = ProGANGenerator(
        base_grid=(4, 4), depths=(16, 8, 8), stage=2, w_dim=16
    )
    v = gen.init({"params": KEY}, z)
    out_full = gen.apply(v, z, alpha=1.0)
    assert out_full.shape == (2, 16, 16, 1)
    out_fade = gen.apply(v, z, alpha=0.3)
    assert out_fade.shape == out_full.shape
    disc = ProGANDiscriminator(depths=(8, 8, 16), stage=2)
    dv = disc.init({"params": KEY}, out_full)
    logits = disc.apply(dv, out_full)
    assert logits.shape == (2, 1)


def test_mapping_network_normalized_input():
    m = MappingNetwork(w_dim=8, n_layers=2)
    z = jax.random.normal(KEY, (4, 8)) * 100  # large scale: pixel_norm handles
    v = m.init({"params": KEY}, z)
    w = m.apply(v, z)
    assert np.all(np.isfinite(np.asarray(w)))


def test_conditional_generator_class_and_context():
    from adell_mri_tpu.models.gan import ConditionalGenerator

    g = ConditionalGenerator(
        spatial_dimensions=2, num_channels=(8, 16), num_res_blocks=1,
        attention_levels=(False, True), cross_attention_dim=12,
        num_class_embeds=3, num_head_channels=4,
    )
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    ctx = jax.random.normal(KEY, (2, 1, 12))
    cls = jnp.asarray([0, 2])
    v = g.init({"params": KEY}, x, ctx, cls)
    out = g.apply(v, x, ctx, cls)
    assert out.shape == (2, 16, 16, 1)
    # class conditioning must change the output
    out_other = g.apply(v, x, ctx, jnp.asarray([1, 1]))
    assert not np.allclose(np.asarray(out), np.asarray(out_other))
    # context conditioning must change the output
    out_ctx = g.apply(v, x, ctx * 5.0, cls)
    assert not np.allclose(np.asarray(out), np.asarray(out_ctx))
    out2, feats = g.apply(v, x, ctx, cls, return_features=True)
    assert feats.shape[1:3] == (8, 8)


def test_acgan_conditional_steps():
    from adell_mri_tpu.models.gan import ConditionalGenerator
    from adell_mri_tpu.train.gan_steps import make_conditional_gan_steps

    gen = ConditionalGenerator(
        spatial_dimensions=2, num_channels=(8, 16), num_res_blocks=1,
        attention_levels=(False, False), num_class_embeds=3,
    )
    disc = Discriminator(spatial_dimensions=2, depth=(8, 16), n_classes=3)
    real = jnp.tanh(jax.random.normal(KEY, (2, 16, 16, 1)))
    cls = jnp.asarray([0, 2])
    g_params = gen.init({"params": KEY}, jnp.zeros_like(real), None, cls)[
        "params"
    ]
    d_params = disc.init({"params": KEY}, real)["params"]
    g_state = TrainState.create(
        gen.apply, g_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_step, g_step = make_conditional_gan_steps(
        gen, disc, smoothing=0.1, feature_matching_weight=1.0
    )
    batch = {"image": real, "class_target": cls}
    d_state, d_m = d_step(d_state, g_state.params, batch, KEY)
    g_state, g_m = g_step(g_state, d_state.params, batch, KEY)
    # semi-SL heads supervised on real and fake (ref SemiSLAdversarialLoss)
    assert {"real_class", "fake_class"} <= set(d_m)
    assert "class" in g_m
    assert all(np.isfinite(float(v)) for v in {**d_m, **g_m}.values())


def test_image_to_image_identity_loss():
    from adell_mri_tpu.models.gan import ConditionalGenerator
    from adell_mri_tpu.train.gan_steps import make_conditional_gan_steps

    gen = ConditionalGenerator(
        spatial_dimensions=2, num_channels=(4, 8), attention_levels=(False, False)
    )
    disc = Discriminator(spatial_dimensions=2, depth=(4, 8))
    a = jnp.tanh(jax.random.normal(KEY, (2, 16, 16, 1)))
    b = -a
    g_params = gen.init({"params": KEY}, a)["params"]
    d_params = disc.init({"params": KEY}, b)["params"]
    g_state = TrainState.create(
        gen.apply, g_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_step, g_step = make_conditional_gan_steps(
        gen, disc, lambda_identity=5.0, image_to_image=True
    )
    batch = {"image": b, "input_image": a}
    d_state, _ = d_step(d_state, g_state.params, batch, KEY)
    g_state, g_m = g_step(g_state, d_state.params, batch, KEY)
    assert "identity" in g_m and np.isfinite(float(g_m["identity"]))


def test_cycle_gan_steps_train():
    from adell_mri_tpu.models.gan import ConditionalGenerator
    from adell_mri_tpu.train.gan_steps import make_cycle_gan_steps

    mk_gen = lambda: ConditionalGenerator(  # noqa: E731
        spatial_dimensions=2, num_channels=(4, 8),
        attention_levels=(False, False),
    )
    mk_disc = lambda: Discriminator(spatial_dimensions=2, depth=(4, 8))
    gab, gba = mk_gen(), mk_gen()
    da, db = mk_disc(), mk_disc()
    a = jnp.tanh(jax.random.normal(KEY, (2, 16, 16, 1)))
    b = -a
    mk = lambda m, x, s: TrainState.create(  # noqa: E731
        m.apply,
        m.init({"params": jax.random.PRNGKey(s)}, x)["params"],
        get_optimizer("adam", learning_rate=1e-3),
    )
    g_states = {"ab": mk(gab, a, 0), "ba": mk(gba, b, 1)}
    d_states = {"a": mk(da, a, 2), "b": mk(db, b, 3)}
    d_step, g_step = make_cycle_gan_steps(
        gab, gba, db, da, lambda_cycle=10.0, lambda_identity=1.0,
        cycle_symmetry=True,
    )
    batch = {"image_a": a, "image_b": b}
    cycles = []
    for i in range(3):
        d_states, d_m = d_step(
            d_states,
            {"ab": g_states["ab"].params, "ba": g_states["ba"].params},
            batch, jax.random.PRNGKey(i),
        )
        g_states, g_m = g_step(
            g_states,
            {"a": d_states["a"].params, "b": d_states["b"].params},
            batch, jax.random.PRNGKey(i),
        )
        cycles.append(float(g_m["cycle"]))
    assert all(np.isfinite(cycles))
    # the cycle reconstruction objective must improve under optimization
    assert cycles[-1] < cycles[0]


def test_progan_growth_carries_params():
    from adell_mri_tpu.models.gan import grow_params

    z = jnp.zeros((1, 8))
    g0 = ProGANGenerator(base_grid=(4, 4), depths=(16, 8, 8), stage=0, w_dim=8)
    p0 = g0.init({"params": KEY}, z)["params"]
    # pretend training happened
    p0 = jax.tree.map(lambda x: x + 1.0, p0)
    g1 = ProGANGenerator(base_grid=(4, 4), depths=(16, 8, 8), stage=1, w_dim=8)
    p1_fresh = g1.init({"params": KEY}, z)["params"]
    p1 = grow_params(p0, p1_fresh)
    # level-0 block and mapping carried over
    np.testing.assert_array_equal(
        np.asarray(p1["block_0"]["EqualizedConv_0"]["kernel"]),
        np.asarray(p0["block_0"]["EqualizedConv_0"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p1["const"]), np.asarray(p0["const"])
    )
    # stage-0's output rgb conv becomes stage-1's fade-in rgb conv
    np.testing.assert_array_equal(
        np.asarray(p1["torgb_0"]["kernel"]), np.asarray(p0["torgb_0"]["kernel"])
    )
    # new block is fresh
    assert "block_1" in p1
    out = g1.apply({"params": p1}, z, alpha=0.5)
    assert out.shape == (1, 8, 8, 1)


def test_progan_schedule():
    from adell_mri_tpu.train.gan_steps import progan_level_schedule

    sched = progan_level_schedule(
        12, n_stages=2, epochs_per_level=4, transition_epochs=2
    )
    stages = [s for s, _, _ in sched]
    assert stages == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]
    fading = [f for _, _, f in sched]
    assert fading == [
        False, False, False, False, True, True, False, False,
        True, True, False, False,
    ]


def test_progan_steps_with_penalties():
    from adell_mri_tpu.train.gan_steps import make_progan_steps

    gen = ProGANGenerator(base_grid=(4, 4), depths=(8, 8), stage=1, w_dim=8)
    disc = ProGANDiscriminator(depths=(8, 8), stage=1)
    z = jnp.zeros((2, 8))
    real = jnp.tanh(jax.random.normal(KEY, (2, 8, 8, 1)))
    g_state = TrainState.create(
        gen.apply,
        gen.init({"params": KEY}, z)["params"],
        get_optimizer("adam", learning_rate=1e-4),
    )
    d_state = TrainState.create(
        disc.apply,
        disc.init({"params": KEY}, real)["params"],
        get_optimizer("adam", learning_rate=1e-4),
    )
    d_step, g_step = make_progan_steps(
        gen, disc, latent_dim=8, r1_weight=1.0, diversity_weight=0.1
    )
    d_state, d_m = d_step(d_state, g_state.params, {"image": real}, KEY, 0.5)
    g_state, g_m = g_step(g_state, d_state.params, {"image": real}, KEY, 0.5)
    assert {"r1", "drift"} <= set(d_m)
    assert "diversity" in g_m
    assert np.isfinite(float(d_m["loss"])) and np.isfinite(float(g_m["loss"]))


def test_relativistic_loss_wiring():
    gen = Generator(
        spatial_dimensions=2, depth=(8,), latent_dim=4, latent_grid=(8, 8)
    )
    disc = Discriminator(spatial_dimensions=2, depth=(8,))
    real = jnp.tanh(jax.random.normal(KEY, (2, 16, 16, 1)))
    z = jnp.zeros((2, 4))
    g_params = gen.init({"params": KEY}, z)["params"]
    d_params = disc.init({"params": KEY}, real)["params"]
    g_state = TrainState.create(
        gen.apply, g_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_state = TrainState.create(
        disc.apply, d_params, get_optimizer("adam", learning_rate=1e-4)
    )
    d_step, g_step = make_gan_steps(
        gen, disc, latent_dim=4, loss_type="relativistic"
    )
    d_state, d_m = d_step(d_state, g_state.params, {"image": real}, KEY)
    g_state, g_m = g_step(g_state, d_state.params, {"image": real}, KEY)
    assert np.isfinite(float(d_m["loss"])) and np.isfinite(float(g_m["loss"]))


def test_conditional_diffusion_step_and_cfg():
    """Conditional DDPM training step (Embedder with [B, n_cat] collated
    conditions) + classifier-free-guidance sampling arithmetic."""
    model = DiffusionUNet(
        spatial_dimensions=2, depth=(4, 8), attention_levels=(False, False),
        temb_dim=8,
    )
    emb = Embedder(cat_feat=(3,), n_num_feat=1, embedding_size=8,
                   uncondition_proba=0.5)
    x = jax.random.normal(KEY, (2, 8, 8, 1))
    cond0 = jnp.zeros((2, 8))
    unet_params = model.init(
        {"params": KEY}, x, jnp.asarray([0, 1]), cond_embedding=cond0
    )["params"]
    emb_params = emb.init(
        {"params": KEY, "uncondition": KEY},
        [jnp.zeros((2,), jnp.int32)], jnp.zeros((2, 1)),
    )["params"]
    params = {"unet": unet_params, "embedder": emb_params}
    process = DiffusionProcess(n_timesteps=10)
    lm = make_diffusion_step(model, process, embedder=emb)
    batch = {
        "image": x,
        "cond_cat": jnp.asarray([[0], [2]], jnp.int32),  # collated [B, n_cat]
        "cond_num": jnp.ones((2, 1)),
    }
    loss, metrics = lm(params, batch, KEY)
    assert np.isfinite(float(loss))
    # CFG: null embedding differs from conditional embedding
    cond_emb = emb.apply({"params": emb_params},
                         [jnp.asarray([1, 1])], jnp.ones((2, 1)))
    null_emb = emb.apply({"params": emb_params}, None, None, batch_size=2)
    assert not np.allclose(np.asarray(cond_emb), np.asarray(null_emb))


def test_conditional_generator_block_types():
    """Per-level block-type matrix (res/attn/cross_attn) supersedes
    attention_levels; 'attn' self-attends without context, 'cross_attn'
    consumes it (VERDICT r2 item 6; ref gan/generator.py:77-2413)."""
    import jax
    import numpy as np

    from adell_mri_tpu.models.gan.conditional import ConditionalGenerator

    gen = ConditionalGenerator(
        spatial_dimensions=2,
        num_channels=(4, 8),
        num_res_blocks=1,
        block_types=("res", "cross_attn"),
        cross_attention_dim=6,
        num_head_channels=4,
    )
    x = np.zeros((2, 8, 8, 1), np.float32)
    ctx = np.zeros((2, 3, 6), np.float32)
    params = gen.init({"params": jax.random.PRNGKey(0)}, x, context=ctx)[
        "params"
    ]
    out = gen.apply({"params": params}, x, context=ctx)
    assert out.shape == (2, 8, 8, 1)
    # level 0 is pure res: no attention params exist there
    assert not any("down_0_attn" in k for k in params)
    assert any("down_1_attn" in k for k in params)

    # "attn" runs self-attention: context must not be consumed
    gen2 = ConditionalGenerator(
        spatial_dimensions=2,
        num_channels=(4, 8),
        block_types=("res", "attn"),
        num_head_channels=4,
    )
    params2 = gen2.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out2 = gen2.apply({"params": params2}, x)
    assert out2.shape == (2, 8, 8, 1)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ConditionalGenerator(
            spatial_dimensions=2, num_channels=(4, 8),
            block_types=("res",),
        ).init({"params": jax.random.PRNGKey(0)}, x)


def test_stylegan_steps_train():
    """make_stylegan_steps runs a d/g update with style mixing + noise
    injection and finite losses (VERDICT r2 item 6)."""
    import jax
    import numpy as np

    from adell_mri_tpu.models.gan.style import (
        ProGANDiscriminator,
        ProGANGenerator,
    )
    from adell_mri_tpu.train import TrainState, get_optimizer
    from adell_mri_tpu.train.gan_steps import make_stylegan_steps

    gen = ProGANGenerator(
        spatial_dimensions=2, base_grid=(4, 4), depths=(8, 8),
        stage=1, w_dim=8, noise_injection=True,
    )
    disc = ProGANDiscriminator(spatial_dimensions=2, depths=(8, 8), stage=1)
    z0 = np.zeros((1, 8), np.float32)
    x0 = np.zeros((1, 8, 8, 1), np.float32)
    g_params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(2)}, z0
    )["params"]
    d_params = disc.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    # noise-injection scales exist in the tree
    flat = jax.tree_util.tree_leaves_with_path(g_params)
    assert any("noise_scale" in jax.tree_util.keystr(p) for p, _ in flat)
    tx = get_optimizer("adam", learning_rate=1e-3)
    g_state = TrainState.create(gen.apply, g_params, tx)
    d_state = TrainState.create(disc.apply, d_params, tx)
    d_step, g_step = make_stylegan_steps(
        gen, disc, latent_dim=8, n_levels=2, gp_weight=1.0
    )
    batch = {"image": np.random.default_rng(0).normal(size=(2, 8, 8, 1)).astype(np.float32)}
    rng = jax.random.PRNGKey(3)
    d_state, d_m = d_step(d_state, g_state.params, batch, rng, 1.0)
    g_state, g_m = g_step(g_state, d_state.params, batch, rng, 1.0)
    assert np.isfinite(float(d_m["loss"])) and np.isfinite(float(g_m["loss"]))
    assert "r1" in d_m


def test_sample_skip_steps_requires_x_start():
    """Regression: skip_steps without x_start was silently ignored (the
    epoch panel ran all n_timesteps forwards)."""
    import pytest

    from adell_mri_tpu.models.diffusion.process import DiffusionProcess

    proc = DiffusionProcess(n_timesteps=10)
    with pytest.raises(ValueError, match="skip_steps"):
        proc.sample(
            jax.random.PRNGKey(0), lambda x, t: x, (1, 8, 8, 1),
            skip_steps=5,
        )


def test_gan_2d_slice_selection():
    """--slice_selection: central is deterministic, random draws across the
    volume at load/cache time (reference SampleChannelDimd(keys, 1, 3)
    semantics, transform_factory/transforms.py:573)."""
    import numpy as np

    from adell_mri_tpu.entrypoints.generative_gan.train import _fit_2d_fn

    img = np.stack(
        [np.full((8, 8, 1), float(z)) for z in range(6)], axis=2
    )
    central = _fit_2d_fn((8, 8))
    assert float(central(img)[0, 0, 0]) == 3.0
    rand = _fit_2d_fn((8, 8), selection="random", seed=0)
    picks = {float(rand(img)[0, 0, 0]) for _ in range(12)}
    assert len(picks) > 1 and picks <= set(map(float, range(6)))
    # 2D inputs pass through untouched (slice datasets via the DICOM layer)
    flat = np.zeros((8, 8, 1))
    assert central(flat).shape == (8, 8, 1)
