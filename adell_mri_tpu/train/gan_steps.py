"""
GAN training steps: the manual two-optimizer loop.

Parity target: adell_mri/modules/gan/pl/gan.py:118-1256 — GANPL with manual
optimization, n_critic discriminator steps per generator step, optional
WGAN-GP, feature matching and cycle consistency. In JAX the "manual loop" is
simply two train states and two jitted steps (SURVEY.md §7: easier than
Lightning's manual optimization).
"""

import jax
import jax.numpy as jnp

from adell_mri_tpu.models.gan import losses as L


def make_gan_steps(
    generator,
    discriminator,
    latent_dim: int,
    loss_type: str = "adversarial",
    smoothing: float = 0.0,
    gp_weight: float = 0.0,
    r1_weight: float = 0.0,
    feature_matching_weight: float = 0.0,
):
    """
    Returns (d_step, g_step):
      d_step(d_state, g_params, batch, rng) -> (d_state, metrics)
      g_step(g_state, d_params, batch, rng) -> (g_state, metrics)
    Batch key: "image" (real samples, in [-1, 1]).
    """
    g_loss_fn = L.GENERATOR_LOSSES[loss_type]
    d_loss_fn = L.DISCRIMINATOR_LOSSES[loss_type]

    def sample_fake(g_params, rng, batch_size):
        z = jax.random.normal(rng, (batch_size, latent_dim))
        return generator.apply({"params": g_params}, z)

    def d_step(d_state, g_params, batch, rng):
        real = batch["image"]
        rng_z, rng_gp = jax.random.split(jax.random.fold_in(rng, d_state.step))
        fake = jax.lax.stop_gradient(
            sample_fake(g_params, rng_z, real.shape[0])
        )

        def loss(params):
            real_logits = discriminator.apply({"params": params}, real)
            fake_logits = discriminator.apply({"params": params}, fake)
            if loss_type == "adversarial":
                d_loss = d_loss_fn(real_logits, fake_logits, smoothing=smoothing)
            else:
                d_loss = d_loss_fn(real_logits, fake_logits)
            total = d_loss
            aux = {"d_loss": d_loss}
            if gp_weight > 0:
                gp = L.gradient_penalty(
                    lambda p, x: discriminator.apply({"params": p}, x),
                    params,
                    rng_gp,
                    real,
                    fake,
                )
                total = total + gp_weight * gp
                aux["gp"] = gp
            if r1_weight > 0:
                r1 = L.r1_penalty(
                    lambda p, x: discriminator.apply({"params": p}, x),
                    params,
                    real,
                )
                total = total + r1_weight * r1
                aux["r1"] = r1
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            d_state.params
        )
        return d_state.apply_gradients(grads), metrics

    def g_step(g_state, d_params, batch, rng):
        real = batch["image"]
        rng_z = jax.random.fold_in(rng, g_state.step)

        def loss(params):
            fake = sample_fake(params, rng_z, real.shape[0])
            fake_logits = discriminator.apply({"params": d_params}, fake)
            if loss_type == "relativistic":
                real_logits = discriminator.apply({"params": d_params}, real)
                g_loss = g_loss_fn(real_logits, fake_logits)
            else:
                g_loss = g_loss_fn(fake_logits)
            total = g_loss
            aux = {"g_loss": g_loss}
            if loss_type == "adversarial" and feature_matching_weight > 0:
                rf = discriminator.apply(
                    {"params": d_params}, real, return_features=True
                )
                ff = discriminator.apply(
                    {"params": d_params}, fake, return_features=True
                )
                fm = L.feature_matching_loss(rf, ff)
                total = total + feature_matching_weight * fm
                aux["feature_matching"] = fm
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            g_state.params
        )
        return g_state.apply_gradients(grads), metrics

    return jax.jit(d_step), jax.jit(g_step)


def _disc_out(out):
    """Normalize discriminator output to (adv, class_logits, reg_pred)."""
    if isinstance(out, tuple):
        return out
    return out, None, None


def make_conditional_gan_steps(
    generator,
    discriminator,
    loss_type: str = "adversarial",
    smoothing: float = 0.0,
    gp_weight: float = 0.0,
    r1_weight: float = 0.0,
    feature_matching_weight: float = 0.0,
    lambda_identity: float = 0.0,
    class_weight: float = 1.0,
    reg_weight: float = 1.0,
    image_to_image: bool = False,
):
    """
    Steps for the UNet-shaped :class:`ConditionalGenerator` (parity:
    GANPL regular_optimization, gan/pl/gan.py:631-678 + step_generator /
    step_discriminator with SemiSLAdversarialLoss, gan/losses.py:383).

    Batch keys: ``image`` (real, domain target); ``input_image`` when
    ``image_to_image`` (otherwise the generator input is a noise image of the
    real sample's shape, ref generate_noise at gan/pl/gan.py:846);
    ``class_target`` / ``reg_target`` optionally condition the generator
    (class embedding / reg embedding) and supervise the discriminator's
    ACGAN heads.
    """
    g_loss_fn = L.GENERATOR_LOSSES[loss_type]
    d_loss_fn = L.DISCRIMINATOR_LOSSES[loss_type]

    def gen_input(batch, rng):
        if image_to_image:
            return batch["input_image"]
        real = batch["image"]
        sh = real.shape[:-1] + (generator.in_channels,)
        return jax.random.normal(rng, sh, real.dtype)

    def gen_cond(batch):
        return {
            "class_labels": batch.get("class_target"),
            "reg_values": batch.get("reg_target"),
        }

    def aux_losses(class_logits, reg_pred, batch, aux, prefix):
        total = 0.0
        if class_logits is not None and "class_target" in batch:
            cl = L.semi_sl_class_loss(class_logits, batch["class_target"])
            total = total + class_weight * cl
            aux[f"{prefix}class"] = cl
        if reg_pred is not None and "reg_target" in batch:
            rl = L.semi_sl_reg_loss(reg_pred, batch["reg_target"])
            total = total + reg_weight * rl
            aux[f"{prefix}reg"] = rl
        return total

    def d_step(d_state, g_params, batch, rng):
        real = batch["image"]
        rng = jax.random.fold_in(rng, d_state.step)
        rng_z, rng_gp = jax.random.split(rng)
        fake = jax.lax.stop_gradient(
            generator.apply(
                {"params": g_params}, gen_input(batch, rng_z), **gen_cond(batch)
            )
        )

        def loss(params):
            r_adv, r_cls, r_reg = _disc_out(
                discriminator.apply({"params": params}, real)
            )
            f_adv, f_cls, f_reg = _disc_out(
                discriminator.apply({"params": params}, fake)
            )
            if loss_type == "adversarial":
                d_loss = d_loss_fn(r_adv, f_adv, smoothing=smoothing)
            else:
                d_loss = d_loss_fn(r_adv, f_adv)
            aux = {"d_loss": d_loss}
            total = d_loss
            # the reference supervises class/reg heads on BOTH real and
            # generated samples (SemiSLAdversarialLoss.discriminator_loss)
            total = total + aux_losses(r_cls, r_reg, batch, aux, "real_")
            total = total + aux_losses(f_cls, f_reg, batch, aux, "fake_")
            if gp_weight > 0:
                gp = L.gradient_penalty(
                    lambda p, x: _disc_out(
                        discriminator.apply({"params": p}, x)
                    )[0],
                    params,
                    rng_gp,
                    real,
                    fake,
                )
                total = total + gp_weight * gp
                aux["gp"] = gp
            if r1_weight > 0:
                r1 = L.r1_penalty(
                    lambda p, x: _disc_out(
                        discriminator.apply({"params": p}, x)
                    )[0],
                    params,
                    real,
                )
                total = total + r1_weight * r1
                aux["r1"] = r1
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            d_state.params
        )
        return d_state.apply_gradients(grads), metrics

    def g_step(g_state, d_params, batch, rng):
        real = batch["image"]
        rng_z = jax.random.fold_in(rng, g_state.step)

        def loss(params):
            fake = generator.apply(
                {"params": params}, gen_input(batch, rng_z), **gen_cond(batch)
            )
            f_adv, f_cls, f_reg = _disc_out(
                discriminator.apply({"params": d_params}, fake)
            )
            if loss_type == "relativistic":
                r_adv, _, _ = _disc_out(
                    discriminator.apply({"params": d_params}, real)
                )
                g_loss = g_loss_fn(r_adv, f_adv)
            else:
                g_loss = g_loss_fn(f_adv)
            aux = {"g_loss": g_loss}
            total = g_loss
            total = total + aux_losses(f_cls, f_reg, batch, aux, "")
            if lambda_identity > 0 and image_to_image:
                ident = L.cycle_consistency_loss(fake, real)
                total = total + lambda_identity * ident
                aux["identity"] = ident
            if feature_matching_weight > 0:
                rf = discriminator.apply(
                    {"params": d_params}, real, return_features=True
                )
                ff = discriminator.apply(
                    {"params": d_params}, fake, return_features=True
                )
                fm = L.feature_matching_loss(rf, ff)
                total = total + feature_matching_weight * fm
                aux["feature_matching"] = fm
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            g_state.params
        )
        return g_state.apply_gradients(grads), metrics

    return jax.jit(d_step), jax.jit(g_step)


def make_cycle_gan_steps(
    gen_ab,
    gen_ba,
    disc_b,
    disc_a,
    loss_type: str = "adversarial",
    smoothing: float = 0.0,
    lambda_cycle: float = 10.0,
    lambda_identity: float = 0.0,
    cycle_symmetry: bool = False,
):
    """
    CycleGAN steps (parity: GANPL cycle_consistency_optimization,
    gan/pl/gan.py:680-780 + step_cycle at :585-629). Two generators
    (A->B, B->A) and two discriminators (domain B, domain A) train jointly:
    the discriminator step updates both critics; the generator step updates
    both generators with adversarial + cycle-reconstruction terms (and an
    optional identity term, ref lambda_identity).

    Batch keys: ``image_a`` (domain A), ``image_b`` (domain B).
    States are dicts: ``{"ab": TrainState, "ba": TrainState}`` for the
    generators and ``{"a": TrainState, "b": TrainState}`` for the critics.
    """
    g_loss_fn = L.GENERATOR_LOSSES[loss_type]
    d_loss_fn = L.DISCRIMINATOR_LOSSES[loss_type]

    def adv_d(real_logits, fake_logits):
        if loss_type == "adversarial":
            return d_loss_fn(real_logits, fake_logits, smoothing=smoothing)
        return d_loss_fn(real_logits, fake_logits)

    def d_step(d_states, g_params, batch, rng):
        a, b = batch["image_a"], batch["image_b"]
        fake_b = jax.lax.stop_gradient(
            gen_ab.apply({"params": g_params["ab"]}, a)
        )
        fake_a = jax.lax.stop_gradient(
            gen_ba.apply({"params": g_params["ba"]}, b)
        )

        def loss_b(params):
            adv = adv_d(
                _disc_out(disc_b.apply({"params": params}, b))[0],
                _disc_out(disc_b.apply({"params": params}, fake_b))[0],
            )
            return adv, {"d_b_loss": adv}

        def loss_a(params):
            adv = adv_d(
                _disc_out(disc_a.apply({"params": params}, a))[0],
                _disc_out(disc_a.apply({"params": params}, fake_a))[0],
            )
            return adv, {"d_a_loss": adv}

        (_, m_b), g_b = jax.value_and_grad(loss_b, has_aux=True)(
            d_states["b"].params
        )
        (_, m_a), g_a = jax.value_and_grad(loss_a, has_aux=True)(
            d_states["a"].params
        )
        new = {
            "b": d_states["b"].apply_gradients(g_b),
            "a": d_states["a"].apply_gradients(g_a),
        }
        return new, {**m_b, **m_a}

    def g_step(g_states, d_params, batch, rng):
        a, b = batch["image_a"], batch["image_b"]

        def loss(params):
            fake_b = gen_ab.apply({"params": params["ab"]}, a)
            fake_a = gen_ba.apply({"params": params["ba"]}, b)
            adv_b = g_loss_fn(
                _disc_out(disc_b.apply({"params": d_params["b"]}, fake_b))[0]
            )
            adv_a = g_loss_fn(
                _disc_out(disc_a.apply({"params": d_params["a"]}, fake_a))[0]
            )
            recon_a = gen_ba.apply({"params": params["ba"]}, fake_b)
            recon_b = gen_ab.apply({"params": params["ab"]}, fake_a)
            cyc = L.cycle_consistency_loss(a, recon_a) + (
                L.cycle_consistency_loss(b, recon_b)
            )
            if cycle_symmetry:
                # symmetric variant also matches the re-generated fakes
                # (ref cycle_symmetry flag): G_ab(recon_a) ~ fake_b
                cyc = cyc + 0.5 * (
                    L.cycle_consistency_loss(
                        fake_b, gen_ab.apply({"params": params["ab"]}, recon_a)
                    )
                    + L.cycle_consistency_loss(
                        fake_a, gen_ba.apply({"params": params["ba"]}, recon_b)
                    )
                )
            total = adv_a + adv_b + lambda_cycle * cyc
            aux = {
                "g_ab_loss": adv_b,
                "g_ba_loss": adv_a,
                "cycle": cyc,
            }
            if lambda_identity > 0:
                ident = L.cycle_consistency_loss(
                    b, gen_ab.apply({"params": params["ab"]}, b)
                ) + L.cycle_consistency_loss(
                    a, gen_ba.apply({"params": params["ba"]}, a)
                )
                total = total + lambda_identity * ident
                aux["identity"] = ident
            aux["loss"] = total
            return total, aux

        params = {"ab": g_states["ab"].params, "ba": g_states["ba"].params}
        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(params)
        new = {
            "ab": g_states["ab"].apply_gradients(grads["ab"]),
            "ba": g_states["ba"].apply_gradients(grads["ba"]),
        }
        return new, metrics

    return jax.jit(d_step), jax.jit(g_step)


def progan_level_schedule(
    max_epochs: int,
    n_stages: int,
    epochs_per_level: int,
    transition_epochs: int = 1,
):
    """
    Per-epoch (stage, fading) plan for progressive growing (parity:
    ProGANPL.calculate_level_schedule, gan/gan/pl.py:99-120 — theirs counts
    levels down, ours counts stages up; same resolution ladder). Each stage
    runs ``epochs_per_level`` epochs; the first ``transition_epochs`` epochs
    of every stage > start fade alpha 0 -> 1.
    """
    schedule = []
    stage = 0
    in_stage = 0
    for _ in range(max_epochs):
        fading = stage > 0 and in_stage < transition_epochs
        schedule.append((stage, in_stage, fading))
        in_stage += 1
        if in_stage >= epochs_per_level and stage < n_stages:
            stage += 1
            in_stage = 0
    return schedule


def make_progan_steps(
    generator,
    discriminator,
    latent_dim: int,
    r1_weight: float = 0.0,
    drift_weight: float = 0.001,
    diversity_weight: float = 0.0,
):
    """
    One (d_step, g_step) pair for a fixed progressive stage (parity:
    ProGANPL generator_step/discriminator_step, gan/gan/pl.py:165-238:
    softplus non-saturating losses, optional R1 penalty, drift term on real
    scores, minibatch-diversity bonus for the generator). ``alpha`` is a
    traced argument so fade-in does not recompile.
    """

    def d_step(d_state, g_params, batch, rng, alpha):
        real = batch["image"]
        rng_z = jax.random.fold_in(rng, d_state.step)
        z = jax.random.normal(rng_z, (real.shape[0], latent_dim))
        fake = jax.lax.stop_gradient(
            generator.apply({"params": g_params}, z, alpha=alpha)
        )

        def loss(params):
            f = discriminator.apply({"params": params}, fake, alpha=alpha)
            r = discriminator.apply({"params": params}, real, alpha=alpha)
            d_loss = jnp.mean(jax.nn.softplus(f)) + jnp.mean(
                jax.nn.softplus(-r)
            )
            aux = {"d_loss": d_loss}
            total = d_loss
            if r1_weight > 0:
                r1 = L.r1_penalty(
                    lambda p, x: discriminator.apply(
                        {"params": p}, x, alpha=alpha
                    ),
                    params,
                    real,
                )
                total = total + r1_weight * r1
                aux["r1"] = r1
            if drift_weight > 0:
                drift = L.drift_penalty(r)
                total = total + drift_weight * drift
                aux["drift"] = drift
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            d_state.params
        )
        return d_state.apply_gradients(grads), metrics

    def g_step(g_state, d_params, batch, rng, alpha):
        real = batch["image"]
        rng_z = jax.random.fold_in(rng, g_state.step)
        z = jax.random.normal(rng_z, (real.shape[0], latent_dim))

        def loss(params):
            fake = generator.apply({"params": params}, z, alpha=alpha)
            f = discriminator.apply({"params": d_params}, fake, alpha=alpha)
            g_loss = jnp.mean(jax.nn.softplus(-f))
            aux = {"g_loss": g_loss}
            total = g_loss
            if diversity_weight > 0:
                div = L.minibatch_diversity(fake)
                total = total - diversity_weight * div
                aux["diversity"] = div
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            g_state.params
        )
        return g_state.apply_gradients(grads), metrics

    return jax.jit(d_step), jax.jit(g_step)


def make_stylegan_steps(
    generator,
    discriminator,
    latent_dim: int,
    n_levels: int,
    gp_weight: float = 10.0,
    mixing_prob: float = 0.9,
):
    """
    StyleGAN (d_step, g_step) for a fixed progressive stage (parity:
    gan/gan/loss_functions.py:12 StyleGANLoss + gan/gan/style.py:358
    StyleGAN): D loss = mean(sigmoid(fake)) - mean(sigmoid(real)) +
    gp_weight * R1; G loss = mean(softplus(-fake)). The generator runs
    style-mixing regularization — with probability ``mixing_prob`` a second
    latent takes over at a random level — and per-block noise injection
    (rngs={'noise': ...}).
    """

    def _gen_apply(params, z, rng, alpha):
        r_mix, r_cut, r_z2, r_noise = jax.random.split(rng, 4)
        z2 = jax.random.normal(r_z2, z.shape)
        # cutoff in [1, n_levels]; cutoff > n_levels disables mixing
        cutoff = jnp.where(
            jax.random.uniform(r_mix) < mixing_prob,
            jax.random.randint(r_cut, (), 1, n_levels + 1),
            n_levels + 1,
        )
        return generator.apply(
            {"params": params}, z, alpha=alpha, z2=z2, mixing_cutoff=cutoff,
            rngs={"noise": r_noise},
        )

    def d_step(d_state, g_params, batch, rng, alpha):
        real = batch["image"]
        rng = jax.random.fold_in(rng, d_state.step)
        rng_z, rng_g = jax.random.split(rng)
        z = jax.random.normal(rng_z, (real.shape[0], latent_dim))
        fake = jax.lax.stop_gradient(_gen_apply(g_params, z, rng_g, alpha))

        def loss(params):
            f = discriminator.apply({"params": params}, fake, alpha=alpha)
            r = discriminator.apply({"params": params}, real, alpha=alpha)
            d_loss = jnp.mean(jax.nn.sigmoid(f)) - jnp.mean(
                jax.nn.sigmoid(r)
            )
            aux = {"d_loss": d_loss}
            total = d_loss
            if gp_weight > 0:
                r1 = L.r1_penalty(
                    lambda p, x: discriminator.apply(
                        {"params": p}, x, alpha=alpha
                    ),
                    params,
                    real,
                )
                total = total + gp_weight * r1
                aux["r1"] = r1
            aux["loss"] = total
            return total, aux

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            d_state.params
        )
        return d_state.apply_gradients(grads), metrics

    def g_step(g_state, d_params, batch, rng, alpha):
        real = batch["image"]
        rng = jax.random.fold_in(rng, g_state.step)
        rng_z, rng_g = jax.random.split(rng)
        z = jax.random.normal(rng_z, (real.shape[0], latent_dim))

        def loss(params):
            fake = _gen_apply(params, z, rng_g, alpha)
            f = discriminator.apply({"params": d_params}, fake, alpha=alpha)
            g_loss = jnp.mean(jax.nn.softplus(-f))
            return g_loss, {"g_loss": g_loss, "loss": g_loss}

        (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(
            g_state.params
        )
        return g_state.apply_gradients(grads), metrics

    return jax.jit(d_step), jax.jit(g_step)


def make_diffusion_step(model, process, embedder=None, precision=None):
    """
    DDPM ε-prediction step (parity: DiffusionUNetPL, diffusion/pl.py:21-233):
    random timestep per sample, MSE(ε̂, ε), optional conditioning with
    classifier-free dropout inside the Embedder. ``precision`` ("bf16"/...)
    runs the UNet forward in the compute dtype; q_sample and the MSE stay
    f32 (ε̂ upcast before the loss).
    """
    from adell_mri_tpu.train.precision import cast_floats, compute_dtype

    dtype = compute_dtype(precision)

    def loss_and_metrics(params, batch, rng):
        x0 = batch["image"]
        r_t, r_n, r_c = jax.random.split(rng, 3)
        t = jax.random.randint(
            r_t, (x0.shape[0],), 0, process.n_timesteps
        )
        xt, eps = process.q_sample(r_n, x0, t)
        variables = {"params": params}
        model_kwargs = {}
        has_cond = "cond_cat" in batch or "cond_num" in batch
        if embedder is not None:
            # a conditional model's params are {embedder, unet} — ALWAYS
            # rebase onto the unet subtree; a batch without cond keys
            # (mixed loaders) conditions on the learned null embedding
            cond_cat = batch.get("cond_cat")
            if cond_cat is not None:
                # collated as [B, n_cat]; the Embedder wants one [B] array
                # per categorical condition
                cond_cat = [
                    cond_cat[:, i] for i in range(cond_cat.shape[1])
                ]
            cond = embedder.apply(
                {"params": params["embedder"]},
                cond_cat,
                batch.get("cond_num"),
                batch_size=x0.shape[0] if not has_cond else None,
                train=True,
                rngs={"uncondition": r_c},
            )
            variables = {"params": params["unet"]}
            model_kwargs["cond_embedding"] = cond
        if dtype is not None:
            variables = {"params": cast_floats(variables["params"], dtype)}
            xt = xt.astype(dtype)
            model_kwargs = cast_floats(model_kwargs, dtype)
        eps_pred = model.apply(variables, xt, t, **model_kwargs)
        loss = jnp.mean((eps_pred.astype(jnp.float32) - eps) ** 2)
        return loss, {"loss": loss}

    return loss_and_metrics
