"""
SSL train-step builders.

Parity target: adell_mri/modules/self_supervised/pl.py — SelfSLBasePL
(AdamW, norm-no-decay, cosine+warmup :213-248) and SelfSLResNetPL.step
(:433-500: student forward through prediction head, teacher = EMA params or
stop-grad through projection head, symmetrized loss, per-step EMA update).
Functional: teacher params are state.ema_params updated inside the jit step.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from adell_mri_tpu.models.ssl import losses as L


def make_two_view_step(
    model,
    method: str = "vicreg",
    ema_teacher: bool = False,
    symmetrize: bool = True,
    loss_kwargs: Optional[dict] = None,
):
    """
    Returns ``loss_and_metrics(params, batch, rng, ema_params=None)`` for
    SimSiam/BYOL/VICReg/Barlow-Twins/SimCLR over batches with
    ``view1``/``view2`` keys (built by SSLTransforms.augment).
    """
    loss_kwargs = loss_kwargs or {}

    def forward(params, x, rng, ret, variables=None, mutable=False):
        """Returns (out, new_variables). Mutable collections (batch norm
        running stats) update only on the mutable student forward; under
        jit with batch-axis sharding the batch statistics are GLOBAL batch
        statistics — XLA inserts the cross-replica reduction the reference
        needs sync_batchnorm for (entrypoints/ssl/train_3d.py:337)."""
        tree = {"params": params, **(variables or {})}
        if variables:
            # train-mode batch norm always writes its collection, so every
            # forward runs mutable; only the designated student forward's
            # updates are kept by the caller
            out, new_vars = model.apply(
                tree,
                x,
                train=True,
                ret=ret,
                rngs={"dropout": rng},
                mutable=list(variables.keys()),
            )
            return out, (new_vars if mutable else None)
        return (
            model.apply(tree, x, train=True, ret=ret, rngs={"dropout": rng}),
            None,
        )

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        v1, v2 = batch["view1"], batch["view2"]
        r1, r2 = jax.random.split(rng)
        teacher_params = (
            ema_params if (ema_teacher and ema_params is not None) else params
        )

        if method in ("simsiam", "byol"):
            p1, new_vars = forward(
                params, v1, r1, "prediction", variables, mutable=True
            )
            p2, _ = forward(params, v2, r2, "prediction", variables)
            z1, _ = forward(teacher_params, v1, r1, "projection", variables)
            z2, _ = forward(teacher_params, v2, r2, "projection", variables)
            fn = L.simsiam_loss if method == "simsiam" else L.byol_loss
            loss = fn(p1, z2)
            if symmetrize:
                loss = 0.5 * (loss + fn(p2, z1))
            metrics = {"loss": loss}
        else:
            z1, new_vars = forward(
                params, v1, r1, "projection", variables, mutable=True
            )
            z2, _ = forward(params, v2, r2, "projection", variables)
            if method == "vicreg":
                loss, comp = L.vicreg_loss(z1, z2, **loss_kwargs)
                metrics = {"loss": loss, **comp}
            elif method == "barlow_twins":
                loss = L.barlow_twins_loss(z1, z2, **loss_kwargs)
                metrics = {"loss": loss}
            elif method in ("simclr", "ntxent"):
                loss = L.ntxent_loss(z1, z2, **loss_kwargs)
                metrics = {"loss": loss}
            else:
                raise NotImplementedError(f"ssl method {method!r}")
        if new_vars is not None:
            metrics["_variables"] = jax.lax.stop_gradient(new_vars)
        return loss, metrics

    return loss_and_metrics


def make_ssl_train_step(loss_and_metrics: Callable):
    """Jit train step threading the EMA teacher through the update."""

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def lf(params):
            return loss_and_metrics(
                params,
                batch,
                rng,
                ema_params=state.ema_params,
                variables=state.variables,
            )

        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        new_vars = metrics.pop("_variables", None)
        state = state.apply_gradients(grads, variables=new_vars)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_dino_step(model, head_apply=None, use_sinkhorn: bool = False,
                   student_temp: float = 0.1, teacher_temp: float = 0.04):
    """
    DINO step (parity: DINOPL, self_supervised/pl.py:1130): student sees both
    views, EMA teacher sees both views, cross-view CE with centering carried
    in the batch dict as ``center``. Returns
    ``loss_and_metrics(params, batch, rng, ema_params)`` whose metrics dict
    includes the updated center under "new_center".
    """

    def forward(params, x, rng):
        return model.apply(
            {"params": params}, x, train=True, rngs={"dropout": rng}
        )

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        v1, v2, center = batch["view1"], batch["view2"], batch["center"]
        r1, r2 = jax.random.split(rng)
        teacher_params = ema_params if ema_params is not None else params
        s1, s2 = forward(params, v1, r1), forward(params, v2, r2)
        t1 = forward(teacher_params, v1, r1)
        t2 = forward(teacher_params, v2, r2)
        l1, c1 = L.dino_loss(
            s1, t2, center, student_temp, teacher_temp,
            use_sinkhorn=use_sinkhorn,
        )
        l2, c2 = L.dino_loss(
            s2, t1, center, student_temp, teacher_temp,
            use_sinkhorn=use_sinkhorn,
        )
        loss = 0.5 * (l1 + l2)
        return loss, {"loss": loss, "new_center": 0.5 * (c1 + c2)}

    return loss_and_metrics


def make_mae_step(model):
    """MAE step (parity: ViTMaskedAutoEncoderPL, pl.py:1388)."""

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        x = batch["image"] if "image" in batch else batch["view1"]
        pred, target, mask = model.apply(
            {"params": params}, x, rng=rng, train=True,
            rngs={"dropout": rng, "masking": rng},
        )
        loss = L.mae_loss(pred, target, mask)
        return loss, {"loss": loss}

    return loss_and_metrics


def make_ijepa_step(model):
    """
    I-JEPA step (parity: IJEPAPL, pl.py:956): prediction loss on masked
    positions, target features from the EMA branch (caller substitutes
    ema_params for the target encoder subtree when available).
    """

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        x = batch["image"] if "image" in batch else batch["view1"]
        use_params = dict(params)
        if ema_params is not None and "target_encoder" in ema_params:
            use_params = {**params, "target_encoder": ema_params["target_encoder"]}
        pred_f, tgt_f, mask = model.apply(
            {"params": use_params}, x, rng=rng, train=True,
            rngs={"dropout": rng, "masking": rng},
        )
        w = mask[..., None]
        loss = jnp.sum(
            ((pred_f - jax.lax.stop_gradient(tgt_f)) ** 2) * w
        ) / jnp.maximum(jnp.sum(w) * pred_f.shape[-1], 1.0)
        return loss, {"loss": loss}

    return loss_and_metrics
