"""
Semi-supervised segmentation step.

Parity target: adell_mri/modules/semi_supervised_segmentation/pl.py —
UNetContrastiveSemiSL (:15): supervised CompoundLoss on the labeled stream
+ ssl_weight x local-contrastive loss between the student's decoder
features on view 1 and the EMA teacher's linearly-transformed features on
view 2 (step_semi_sl_loco :227-265; ssl_weight=0.01 :135), teacher =
state.ema_params with stop-grad.

TPU-native: the two unlabeled views are generated INSIDE the jit step
(random per-axis flips + intensity jitter from the step rng) rather than
by CPU transform workers — the unlabeled loader ships one volume, the
device makes both views.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from adell_mri_tpu.models.semi_supervised import local_contrastive_loss


def _random_view(key, x, geom_key=None):
    """Cheap on-device view: per-axis flips + intensity scale + noise.

    ``geom_key`` drives the GEOMETRIC part (flips). local_contrastive_loss
    pairs features by flattened position, so the two views of a volume
    must share one geom_key — independent flips would pair features of
    mirrored anatomical locations as positives (and present the true
    correspondences as negatives), silently inverting the objective on
    ~half the steps. Intensity/noise stay per-view via ``key``."""
    ndim = x.ndim - 2
    keys = jax.random.split(key, 2)
    gkeys = jax.random.split(
        geom_key if geom_key is not None else key, ndim
    )
    for d in range(ndim):
        flip = jax.random.bernoulli(gkeys[d])
        x = jnp.where(flip, jnp.flip(x, axis=d + 1), x)
    scale = jax.random.uniform(keys[0], (), minval=0.9, maxval=1.1)
    noise = jax.random.normal(keys[1], x.shape, x.dtype) * 0.02
    return x * scale + noise


def make_semi_supervised_step(
    model,
    supervised_loss_and_metrics: Callable,
    ssl_weight: float = 0.01,
    temperature: float = 0.1,
    n_samples: int = 256,
    stop_gradient: bool = True,
):
    """
    Wraps a supervised ``loss_and_metrics(params, batch, rng)`` with the
    unlabeled contrastive term. Batch may carry ``semi_sl_image`` (one
    unlabeled volume per row); absent that key the step reduces to the
    supervised one.
    """

    def loss_and_metrics(params, batch, rng, ema_params=None):
        r_sup, r_v1, r_v2, r_samp, r_geom = jax.random.split(rng, 5)
        loss, metrics = supervised_loss_and_metrics(params, batch, r_sup)
        if "semi_sl_image" in batch:
            x_u = batch["semi_sl_image"]
            # one SHARED geometric key: positional feature pairing
            v1 = _random_view(r_v1, x_u, geom_key=r_geom)
            v2 = _random_view(r_v2, x_u, geom_key=r_geom)
            _, f1, _ = model.apply(
                {"params": params},
                v1,
                train=True,
                return_features=True,
                rngs={"dropout": r_v1},
            )
            teacher_params = ema_params if ema_params is not None else params
            _, f2, _ = model.apply(
                {"params": teacher_params},
                v2,
                train=True,
                return_features=True,
                apply_linear_transformation=True,
                rngs={"dropout": r_v2},
            )
            if stop_gradient:
                f2 = jax.lax.stop_gradient(f2)
            ssl_loss = local_contrastive_loss(
                f1, f2, temperature=temperature, n_samples=n_samples,
                key=r_samp,
            )
            loss = loss + ssl_weight * ssl_loss
            metrics = {**metrics, "loss_semi_sl": ssl_loss, "loss": loss}
        return loss, metrics

    return loss_and_metrics


def make_semi_sl_train_step(loss_and_metrics: Callable):
    """Jit step threading the EMA teacher (updated by apply_gradients)."""

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def lf(params):
            return loss_and_metrics(
                params, batch, rng, ema_params=state.ema_params
            )

        (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


class CombinedLoader:
    """
    Zips a labeled loader with an unlabeled one (parity: Lightning
    CombinedLoader wiring at entrypoints/segmentation/train.py:603-621).
    The unlabeled stream cycles if shorter; its image key is renamed to
    ``semi_sl_image``.
    """

    def __init__(self, supervised, unsupervised, image_key: str = "image"):
        self.supervised = supervised
        self.unsupervised = unsupervised
        self.image_key = image_key

    def __len__(self):
        return len(self.supervised)

    def __iter__(self):
        un_iter = iter(self.unsupervised)
        for batch in self.supervised:
            try:
                un_batch = next(un_iter)
            except StopIteration:
                un_iter = iter(self.unsupervised)
                try:
                    un_batch = next(un_iter)
                except StopIteration:
                    un_batch = None
            merged = dict(batch)
            if un_batch is not None:
                merged["semi_sl_image"] = un_batch[self.image_key]
            yield merged
