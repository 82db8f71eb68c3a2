"""
Functional train/eval steps — the replacement for Lightning adapters.

Parity targets: adell_mri/modules/segmentation/pl.py — UNetBasePL.step
(:282-315: rounded labels, CompoundLoss, deep-supervision interpolated
losses scaled by 1/2^(t-i)/(t+1), bottleneck classification loss) and
ClassPLABC (classification/pl.py:265-290 with on-device BatchPreprocessing
mixup). Instead of one diamond-inherited class per model, a step is a closure
``(state, batch, rng) -> (state, metrics)`` compiled once with jit; under a
Mesh, batches are sharded on the data axis and XLA inserts gradient
all-reduces (the NCCL DDP equivalent, SURVEY.md §2.5).
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from adell_mri_tpu.models.segmentation.losses import (
    CompoundLoss,
    binary_cross_entropy,
    cat_cross_entropy,
)
from adell_mri_tpu.train.precision import wrap_apply


def _resize_to(y, spatial_shape):
    """Resizes a label tensor [B, *S(,1)] to a new spatial shape.

    Nearest-neighbour: labels hold CLASS IDS — linear interpolation then
    thresholding would binarize multiclass targets (every class -> 1) and
    dilate binary ones (any interpolation-touched voxel -> foreground)."""
    squeeze = False
    if y.ndim == len(spatial_shape) + 1:
        y = y[..., None]
        squeeze = True
    out = jax.image.resize(
        y.astype(jnp.float32),
        (y.shape[0],) + tuple(spatial_shape) + (y.shape[-1],),
        method="nearest",
    )
    return out[..., 0] if squeeze else out


def make_segmentation_step(
    model,
    loss_fn: CompoundLoss,
    deep_supervision: bool = False,
    bottleneck_classification: bool = False,
    n_classes: int = 2,
    train: bool = True,
    remat: bool = False,
    precision: Optional[str] = None,
    remat_policy: Optional[str] = None,
):
    """
    Returns ``loss_and_metrics(params, batch, rng)``. Batch keys: ``image``
    [B,*S,C], ``label`` [B,*S] (or [B,*S,1]); optional ``skip_layer``,
    ``features``. ``remat`` rematerializes the forward during backward
    (jax.checkpoint) — 3D U-Nets at full volume easily exceed HBM with
    stored activations; remat trades ~1/3 more FLOPs for O(layer) memory.
    ``remat_policy`` names a ``jax.checkpoint_policies`` entry (e.g.
    ``dots_with_no_batch_dims_saveable``) to SAVE the MXU dot outputs —
    with the matmul-lowered convs that skips most of the recompute at a
    higher memory cost; None = full remat (the safe default).
    ``precision`` ("bf16"/"16"/...) applies the mixed-precision policy to
    the forward (train/precision.py): bf16 convs on the MXU, f32 loss.
    """
    class_loss_fn = (
        cat_cross_entropy if n_classes > 2 else binary_cross_entropy
    )
    # resolve the policy NOW so a typo fails at step construction, not
    # minutes later inside the first jit trace
    ckpt_policy = (
        getattr(jax.checkpoint_policies, remat_policy)
        if remat_policy
        else None
    )

    def loss_and_metrics(params, batch, rng, variables=None):
        x = batch["image"]
        y = jnp.round(batch["label"].astype(jnp.float32))
        x_cond = batch.get("skip_layer")
        x_fc = batch.get("features")
        rngs = {"dropout": rng} if train else None
        # conditioning args are keyword-only-when-present: only the UNet
        # family accepts them, and positional Nones would mis-bind on
        # UNETR/SWINUNet/MIMUNet whose second arg is `train`
        cond_kwargs = {}
        if x_cond is not None:
            cond_kwargs["x_skip_layer"] = x_cond
        if x_fc is not None:
            cond_kwargs["x_feature_conditioning"] = x_fc
        if batch.get("image_weights") is not None:
            # per-branch availability under missing_to_empty (BrUNet)
            cond_kwargs["x_weights"] = batch["image_weights"]

        # conditioning rides as POSITIONAL args through wrap_apply so
        # --precision bf16 downcasts it too (a closed-over f32 skip volume
        # would promote the decoder concat back to f32)
        cond_keys = tuple(cond_kwargs)
        cond_vals = tuple(cond_kwargs[k] for k in cond_keys)

        # norm_type="batch" models carry running statistics in a
        # batch_stats collection (parity: torch BatchNorm inference mode,
        # adn_fn.py:205 norm_fn_dict): train updates them (mutable) and
        # eval normalizes by them (ADN passes use_running_average=not
        # train). The collection stays f32 and OUTSIDE wrap_apply's
        # downcast (running stats are state, like master params).
        has_bs = bool(variables) and "batch_stats" in variables

        def apply_fn(params, x, *cond):
            tree = {"params": params, **(variables or {})}
            if has_bs and train:
                return model.apply(
                    tree,
                    x,
                    train=train,
                    rngs=rngs,
                    mutable=["batch_stats"],
                    **dict(zip(cond_keys, cond)),
                )
            return (
                model.apply(
                    tree,
                    x,
                    train=train,
                    rngs=rngs,
                    **dict(zip(cond_keys, cond)),
                ),
                None,
            )

        apply_fn = wrap_apply(apply_fn, precision)
        if remat and train:
            if ckpt_policy is not None:
                apply_fn = jax.checkpoint(apply_fn, policy=ckpt_policy)
            else:
                apply_fn = jax.checkpoint(apply_fn)
        out, new_vars = apply_fn(params, x, *cond_vals)
        if deep_supervision:
            prediction, pred_class, deep_outputs = out
        else:
            prediction, pred_class = out
            deep_outputs = []
        loss, individual = loss_fn(prediction, y)
        if deep_supervision:
            t = len(deep_outputs)
            for i, o in enumerate(deep_outputs):
                y_small = _resize_to(y, o.shape[1:-1])
                ds_loss, _ = loss_fn(o, y_small)
                loss = loss + ds_loss / (2 ** (t - i)) / (t + 1)
        if bottleneck_classification and pred_class is not None:
            y_class = jnp.max(y.reshape(y.shape[0], -1), axis=1)
            if n_classes > 2:
                class_loss = class_loss_fn(
                    jax.nn.softmax(pred_class, -1), y_class
                )
            else:
                class_loss = class_loss_fn(
                    jax.nn.sigmoid(pred_class), y_class
                )
            loss = loss + class_loss
            individual = {**individual, "class_loss": class_loss}
        # soft dice metric for logging
        p = prediction[..., 0] if prediction.shape[-1] == 1 else prediction
        # squeeze a trailing singleton label channel in BOTH layouts: for
        # multiclass p keeps its class axis so [B,*S,1] labels satisfy
        # y.ndim == p.ndim, and the unsqueezed channel used to break the
        # one_hot broadcast at trace time
        yb = y
        if yb.ndim == p.ndim + 1 and yb.shape[-1] == 1:
            yb = yb[..., 0]
        elif (
            n_classes > 2
            and yb.ndim == p.ndim
            and yb.shape[-1] == 1
            and p.shape[-1] != 1
        ):
            yb = yb[..., 0]
        per_class_dice = None
        if n_classes <= 2:
            inter = jnp.sum(p * yb)
            denom = jnp.sum(p) + jnp.sum(yb)
            dice = (2 * inter + 1e-5) / (denom + 1e-5)
        else:
            oh = jax.nn.one_hot(yb.astype(jnp.int32), n_classes)
            inter = jnp.sum(p * oh, axis=tuple(range(p.ndim - 1)))
            denom = jnp.sum(p, axis=tuple(range(p.ndim - 1))) + jnp.sum(
                oh, axis=tuple(range(p.ndim - 1))
            )
            per_class_dice = (2 * inter + 1e-5) / (denom + 1e-5)
            dice = jnp.mean(per_class_dice)
        metrics = {
            "loss": loss,
            "dice": dice,
            **{f"loss_{k}": v for k, v in individual.items()},
        }
        if per_class_dice is not None:
            # per-class training dice (parity: the per-phase torchmetrics
            # dicts, segmentation/pl.py:145-192)
            for k in range(n_classes):
                metrics[f"dice_c{k}"] = per_class_dice[k]
        if new_vars is not None:
            # updated running stats ride out of the grad closure through
            # the aux dict (the ssl_steps pattern); stop_gradient so the
            # EMA update math never differentiates through them
            metrics["_variables"] = jax.lax.stop_gradient(
                {**(variables or {}), **new_vars}
            )
        return loss, metrics

    return loss_and_metrics


def make_classification_step(
    model,
    loss_fn: Callable,
    n_classes: int = 2,
    train: bool = True,
    batch_preprocessing=None,
    label_smoothing: Optional[float] = None,
    precision: Optional[str] = None,
    moe_aux_weight: float = 0.01,
):
    """
    Classification loss step (parity: ClassPLABC, classification/pl.py:265).
    ``loss_fn(logits, labels) -> scalar``. Optional on-device mixup/label
    smoothing via ``batch_preprocessing`` (utils/batch_preprocessing.py:116).
    MoE members contribute moe_aux_weight x their sown load-balance loss.
    """
    def loss_and_metrics(params, batch, rng, variables=None):
        x = batch["image"]
        y = batch["label"]
        if batch_preprocessing is not None and train:
            rng, prep_rng = jax.random.split(rng)
            x, y = batch_preprocessing(prep_rng, x, y)
        rngs = {"dropout": rng, "ensemble": jax.random.fold_in(rng, 1)} if train else None
        # mutable moe_aux collects the MoE load-balance losses sown by
        # TransformerBlock (layers/vit.py); empty for dense models.
        # norm_type="batch" running stats (the reference CatNet default,
        # network_factories.py:193) update when training and normalize
        # eval batches when restored (torch BatchNorm inference parity).
        has_bs = bool(variables) and "batch_stats" in variables
        mutable = ["moe_aux"] + (
            ["batch_stats"] if has_bs and train else []
        )
        apply_fn = wrap_apply(
            lambda params, x, **kw: model.apply(
                {"params": params, **(variables or {})},
                x,
                mutable=mutable,
                **kw,
            ),
            precision,
        )
        logits, aux_vars = apply_fn(params, x, train=train, rngs=rngs)
        loss = loss_fn(logits, y)
        aux_leaves = jax.tree.leaves(aux_vars.get("moe_aux", {}))
        moe_aux = None
        if aux_leaves:
            # Switch/GShard load-balancing term: without it top-1 routing
            # collapses onto one expert
            moe_aux = sum(jnp.mean(a) for a in aux_leaves) / len(aux_leaves)
            loss = loss + moe_aux_weight * moe_aux
        if n_classes > 2:
            # y may be soft [B, C] after multiclass mixup/smoothing
            y_idx = (
                jnp.argmax(y, -1) if y.ndim == logits.ndim
                else y.astype(jnp.int32)
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == y_idx).astype(jnp.float32)
            )
        else:
            prob = jax.nn.sigmoid(logits[..., 0] if logits.ndim > 1 else logits)
            acc = jnp.mean(((prob > 0.5) == (y > 0.5)).astype(jnp.float32))
        metrics = {"loss": loss, "acc": acc}
        if moe_aux is not None:
            metrics["moe_aux"] = moe_aux
        if has_bs and train and "batch_stats" in aux_vars:
            metrics["_variables"] = jax.lax.stop_gradient(
                {**variables, "batch_stats": aux_vars["batch_stats"]}
            )
        return loss, metrics

    return loss_and_metrics


def _accepts_variables(fn: Callable) -> bool:
    import inspect

    try:
        return "variables" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def make_train_step(loss_and_metrics: Callable, donate: bool = True):
    """
    Wraps a loss closure into a jitted SGD update on a TrainState.
    Under a sharded batch, jnp means are global means and XLA inserts the
    cross-device grad reduction automatically. Closures that accept a
    ``variables`` kwarg (batch-norm running stats) receive
    ``state.variables`` and may return updated collections through
    ``metrics["_variables"]`` (carried into the next state).
    """
    takes_vars = _accepts_variables(loss_and_metrics)

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
        if takes_vars:
            (_, metrics), grads = grad_fn(
                state.params, batch, rng, variables=state.variables
            )
            new_vars = metrics.pop("_variables", None)
            state = state.apply_gradients(grads, variables=new_vars)
        else:
            (_, metrics), grads = grad_fn(state.params, batch, rng)
            state = state.apply_gradients(grads)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_and_metrics: Callable):
    takes_vars = _accepts_variables(loss_and_metrics)

    def eval_step(params, batch, rng, variables=None):
        if takes_vars:
            _, metrics = loss_and_metrics(
                params, batch, rng, variables=variables
            )
        else:
            _, metrics = loss_and_metrics(params, batch, rng)
        metrics.pop("_variables", None)
        return metrics

    return jax.jit(eval_step)


def unet_from_config(network_config: Dict, n_classes: int = 2, **overrides):
    """Builds a UNet from a parse_config_unet network dict. Thin wrapper
    over config.factories._unet_kwargs — a previous hand-rolled copy here
    had silently diverged (dropping encoder_structure/res_type/
    semi_supervised/dropout_type)."""
    from adell_mri_tpu.config.factories import _unet_kwargs
    from adell_mri_tpu.models.segmentation.unet import UNet

    cfg = dict(network_config)
    cfg.update(overrides)
    return UNet(
        in_channels=cfg.get("n_channels", 1), **_unet_kwargs(cfg, n_classes)
    )
