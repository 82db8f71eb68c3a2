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
