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
from adell_mri_tpu.train.precision import cast_floats, compute_dtype


def _downcast(dtype, params, x):
    """Mixed-precision entry: params + input to the compute dtype (the
    bf16 MXU path); identity when dtype is None. Losses/centers/EMA stay
    f32 because every forward upcasts its outputs with ``_f32``."""
    if dtype is None:
        return params, x
    return cast_floats(params, dtype), cast_floats(x, dtype)


def _f32(dtype, out):
    return out if dtype is None else cast_floats(out, jnp.float32)


def make_two_view_step(
    model,
    method: str = "vicreg",
    ema_teacher: bool = False,
    symmetrize: bool = True,
    loss_kwargs: Optional[dict] = None,
    stop_gradient: bool = False,
    precision: Optional[str] = None,
):
    """
    Returns ``loss_and_metrics(params, batch, rng, ema_params=None)`` for
    SimSiam/BYOL/VICReg/Barlow-Twins/SimCLR over batches with
    ``view1``/``view2`` keys (built by SSLTransforms.augment).
    ``precision`` ("bf16"/...) runs the encoder forward in the compute
    dtype; projections return to f32 before the loss.
    """
    loss_kwargs = loss_kwargs or {}
    dtype = compute_dtype(precision)

    def forward(params, x, rng, ret, variables=None, mutable=False):
        """Returns (out, new_variables). Mutable collections (batch norm
        running stats) update only on the mutable student forward; under
        jit with batch-axis sharding the batch statistics are GLOBAL batch
        statistics — XLA inserts the cross-replica reduction the reference
        needs sync_batchnorm for (entrypoints/ssl/train_3d.py:337)."""
        params, x = _downcast(dtype, params, x)
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
            return _f32(dtype, out), (new_vars if mutable else None)
        return (
            _f32(
                dtype,
                model.apply(
                    tree, x, train=True, ret=ret, rngs={"dropout": rng}
                ),
            ),
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
            if stop_gradient:
                # ref --stop_gradient: gradients flow through one branch
                z2 = jax.lax.stop_gradient(z2)
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


def make_dino_step(model, use_sinkhorn: bool = False,
                   student_temp: float = 0.1, teacher_temp: float = 0.04,
                   center_momentum: float = 0.9,
                   precision: Optional[str] = None):
    """
    DINO multi-crop step (parity: DINOPL, self_supervised/pl.py:1130 +
    DinoLoss dino.py:121). Teacher (EMA params) sees the two GLOBAL views;
    the student sees both global views and every local crop in
    ``batch["local_crops"]`` ([B, n_local, *small_S, C], built by
    SSLTransforms with n_local_crops > 0). Loss = mean CE over all
    (teacher view i, student view j != i) pairs. The prototype center is
    carried in the train state's ``variables`` under "dino_center" and
    updated here (the reference's async all_reduce centering becomes a
    global batch mean under pjit).
    """

    dtype = compute_dtype(precision)

    def forward(params, x, rng):
        params, x = _downcast(dtype, params, x)
        return _f32(
            dtype,
            model.apply(
                {"params": params}, x, train=True, rngs={"dropout": rng}
            ),
        )

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        v_global = [batch["view1"], batch["view2"]]
        variables = dict(variables or {})
        center = variables.get("dino_center")
        if center is None:
            raise ValueError(
                "DINO needs variables={'dino_center': zeros(out_dim)} in the"
                " train state"
            )
        teacher_params = (
            ema_params if ema_params is not None else params
        )
        keys = jax.random.split(rng, 8)
        t_out = [
            jax.lax.stop_gradient(forward(teacher_params, v, keys[i]))
            for i, v in enumerate(v_global)
        ]
        s_out = [forward(params, v, keys[2 + i]) for i, v in enumerate(v_global)]
        locals_ = batch.get("local_crops")
        s_local = []
        if locals_ is not None:
            for i in range(locals_.shape[1]):
                s_local.append(
                    forward(params, locals_[:, i], jax.random.fold_in(keys[4], i))
                )
        total = 0.0
        n_pairs = 0
        new_center = jnp.zeros_like(center)
        for ti, t in enumerate(t_out):
            for si, s in enumerate(s_out):
                if si == ti:
                    continue
                l, c = L.dino_loss(
                    s, t, center, student_temp, teacher_temp,
                    center_momentum=center_momentum,
                    use_sinkhorn=use_sinkhorn,
                )
                total, n_pairs, new_center = total + l, n_pairs + 1, new_center + c
            for s in s_local:
                l, c = L.dino_loss(
                    s, t, center, student_temp, teacher_temp,
                    center_momentum=center_momentum,
                    use_sinkhorn=use_sinkhorn,
                )
                total, n_pairs, new_center = total + l, n_pairs + 1, new_center + c
        loss = total / max(n_pairs, 1)
        variables["dino_center"] = new_center / max(n_pairs, 1)
        return loss, {"loss": loss, "_variables": variables}

    return loss_and_metrics


def make_ibot_step(model, student_temp: float = 0.1,
                   teacher_temp: float = 0.04, center_momentum: float = 0.9,
                   precision: Optional[str] = None):
    """
    iBOT step (parity: iBOTPL, self_supervised/pl.py:1243): students see
    MASKED views, the EMA teacher sees the same views unmasked; a global
    DINO loss on the reduced logits (cross-view) plus a token-level DINO
    loss at the masked positions (same view). Two separate centers ride in
    the state's variables ("ibot_center_global"/"ibot_center_mask"),
    matching the reference's two DinoLoss instances (loss_global/loss_mask).
    """

    dtype = compute_dtype(precision)

    def forward(params, x, rng, mask):
        params, x = _downcast(dtype, params, x)
        return _f32(
            dtype,
            model.apply(
                {"params": params},
                x,
                mask=mask,
                train=True,
                rngs={"dropout": rng, "masking": jax.random.fold_in(rng, 7)},
            ),
        )

    def token_ce(s_tok, t_tok, m, center):
        t_probs = jax.nn.softmax((t_tok - center) / teacher_temp, axis=-1)
        s_logp = jax.nn.log_softmax(s_tok / student_temp, axis=-1)
        ce = -jnp.sum(t_probs * s_logp, axis=-1)  # [B, N]
        return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        v1, v2 = batch["view1"], batch["view2"]
        variables = dict(variables or {})
        cg = variables.get("ibot_center_global")
        cm = variables.get("ibot_center_mask")
        if cg is None or cm is None:
            raise ValueError(
                "iBOT needs variables with ibot_center_global and "
                "ibot_center_mask zeros(out_dim)"
            )
        teacher_params = ema_params if ema_params is not None else params
        r1, r2 = jax.random.split(rng)
        s_red1, s_tok1, m1 = forward(params, v1, r1, True)
        s_red2, s_tok2, m2 = forward(params, v2, r2, True)
        t_red1, t_tok1, _ = forward(teacher_params, v1, r1, False)
        t_red2, t_tok2, _ = forward(teacher_params, v2, r2, False)
        t_red1, t_tok1, t_red2, t_tok2 = jax.tree.map(
            jax.lax.stop_gradient, (t_red1, t_tok1, t_red2, t_tok2)
        )
        # global: cross-view DINO CE on reduced logits
        lg1, c1 = L.dino_loss(
            s_red1, t_red2, cg, student_temp, teacher_temp,
            center_momentum=center_momentum,
        )
        lg2, c2 = L.dino_loss(
            s_red2, t_red1, cg, student_temp, teacher_temp,
            center_momentum=center_momentum,
        )
        loss_global = 0.5 * (lg1 + lg2)
        # mask: token-level CE at masked positions, same view
        loss_mask = 0.5 * (
            token_ce(s_tok1, t_tok1, m1, cm) + token_ce(s_tok2, t_tok2, m2, cm)
        )
        tok_mean = 0.5 * (
            jnp.mean(t_tok1, axis=(0, 1)) + jnp.mean(t_tok2, axis=(0, 1))
        )
        variables["ibot_center_global"] = 0.5 * (c1 + c2)
        variables["ibot_center_mask"] = (
            cm * center_momentum + tok_mean * (1 - center_momentum)
        )
        loss = loss_global + loss_mask
        return loss, {
            "loss": loss,
            "loss_global": loss_global,
            "loss_mask": loss_mask,
            "_variables": variables,
        }

    return loss_and_metrics


def make_vicregl_step(model, alpha: float = 0.75, top_k: int = 4,
                      loss_kwargs: Optional[dict] = None,
                      precision: Optional[str] = None):
    """
    VICRegL step (parity: VICRegLocalLoss, self_supervised/losses/vicreg.py:168
    + the ExposeTransformKeyMetad crop-box plumbing,
    transform_factory/augmentations.py:401-526). Requires batches built by
    SSLTransforms(expose_boxes=True): each view carries its crop warp matrix
    ("view{i}_mat", [B, ndim+1, ndim+1], output-voxel -> input-volume), from
    which the absolute input-volume coordinate of every local feature is
    computed; local features are matched by nearest coordinates both ways.
    """
    loss_kwargs = loss_kwargs or {}
    dtype = compute_dtype(precision)

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        v1, v2 = batch["view1"], batch["view2"]
        m1, m2 = batch["view1_mat"], batch["view2_mat"]
        r1, r2 = jax.random.split(rng)
        p1, v1c = _downcast(dtype, params, v1)
        _, v2c = _downcast(dtype, params, v2)
        z1, l1 = _f32(
            dtype,
            model.apply(
                {"params": p1}, v1c, train=True, ret="local",
                rngs={"dropout": r1},
            ),
        )
        z2, l2 = _f32(
            dtype,
            model.apply(
                {"params": p1}, v2c, train=True, ret="local",
                rngs={"dropout": r2},
            ),
        )

        def coords(local, view_shape, mat):
            # local: [B, *g, F] -> centers of each feature cell mapped
            # through the view's warp matrix into input-volume coords
            g = local.shape[1:-1]
            ndim = len(g)
            stride = jnp.asarray(
                [s / gi for s, gi in zip(view_shape, g)], jnp.float32
            )
            mesh = jnp.stack(
                jnp.meshgrid(
                    *[jnp.arange(gi, dtype=jnp.float32) for gi in g],
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(-1, ndim)  # [N, ndim]
            centers = mesh * stride + stride / 2.0
            homo = jnp.concatenate(
                [centers, jnp.ones((centers.shape[0], 1))], axis=-1
            )
            # mat is per-sample [B, ndim+1, ndim+1]
            return jnp.einsum("bij,nj->bni", mat, homo)[..., :ndim]

        ndim = v1.ndim - 2
        c1 = coords(l1, v1.shape[1:-1], m1)
        c2 = coords(l2, v2.shape[1:-1], m2)
        flat1 = l1.reshape(l1.shape[0], -1, l1.shape[-1])
        flat2 = l2.reshape(l2.shape[0], -1, l2.shape[-1])
        loss, comp = L.vicregl_loss(
            z1, z2, flat1, flat2, c1, c2, alpha=alpha, top_k=top_k,
            **loss_kwargs,
        )
        return loss, {"loss": loss, **comp}

    return loss_and_metrics


def make_mae_step(model, precision: Optional[str] = None):
    """MAE step (parity: ViTMaskedAutoEncoderPL, pl.py:1388)."""
    dtype = compute_dtype(precision)

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        x = batch["image"] if "image" in batch else batch["view1"]
        params, x = _downcast(dtype, params, x)
        pred, target, mask = _f32(
            dtype,
            model.apply(
                {"params": params}, x, rng=rng, train=True,
                rngs={"dropout": rng, "masking": rng},
            ),
        )
        loss = L.mae_loss(pred, target, mask)
        return loss, {"loss": loss}

    return loss_and_metrics


def make_ijepa_step(model, precision: Optional[str] = None):
    """
    I-JEPA step (parity: IJEPAPL, pl.py:956): prediction loss on masked
    positions, target features from the EMA branch (caller substitutes
    ema_params for the target encoder subtree when available).
    """
    dtype = compute_dtype(precision)

    def loss_and_metrics(params, batch, rng, ema_params=None, variables=None):
        x = batch["image"] if "image" in batch else batch["view1"]
        use_params = dict(params)
        if ema_params is not None and "context_encoder" in ema_params:
            # the I-JEPA target is the EMA of the CONTEXT encoder
            # (IJEPAPL pl.py:956) — substituting ema['target_encoder']
            # would track a subtree that receives zero gradient, leaving
            # the teacher frozen at random init forever
            use_params = {
                **params, "target_encoder": ema_params["context_encoder"]
            }
        use_params, x = _downcast(dtype, use_params, x)
        pred_f, tgt_f, mask = _f32(
            dtype,
            model.apply(
                {"params": use_params}, x, rng=rng, train=True,
                rngs={"dropout": rng, "masking": rng},
            ),
        )
        loss = L.ijepa_loss(pred_f, tgt_f, mask=mask)
        return loss, {"loss": loss}

    return loss_and_metrics
