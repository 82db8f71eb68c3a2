"""
Act/Dropout/Norm ordered block and its closure factory.

Parity targets: adell_mri/modules/layers/adn_fn.py — ActDropNorm (:56),
get_adn_fn (:205). The factory signature (spatial_dim, norm_fn, act_fn,
dropout_param) is threaded through every model config in the reference, so it
is preserved verbatim. Layout is channels-last; "instance" norm is GroupNorm
with one group per channel over the spatial axes, "batch" uses a mutable
batch_stats collection.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.activations import get_activation


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial axes."""

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        # single-pass stats for REDUCED-precision activations (the TPU
        # bf16 hot path): E[x²]-E[x]² lets XLA fuse both reductions into
        # ONE read of x, where jnp.var's E[(x-mean)²] forces a second
        # full pass (norms were ~25 ms of the 80 ms flagship forward,
        # BASELINE.md round-3 ablation). The f32 accumulator carries 16+
        # extra mantissa bits over bf16 data, so the cancellation is
        # safe there — but for f32/f64 inputs the accumulator has NO
        # headroom and E[x²]-mean² catastrophically cancels when
        # mean >> std, so those keep the two-pass estimator.
        if x.dtype in (jnp.bfloat16, jnp.float16):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes, keepdims=True)
            var = jnp.mean(xf * xf, axis=axes, keepdims=True) - mean * mean
            var = jnp.maximum(var, 0.0)
        else:
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        y = (x - mean.astype(x.dtype)) * inv
        features = x.shape[-1]
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (features,))
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (features,))
            y = y + bias
        return y


class GlobalBatchNorm(nn.Module):
    """
    Batch normalization with TPU-native semantics: training normalizes by
    CURRENT-batch statistics, which under a pjit-sharded batch axis are
    GLOBAL batch statistics (XLA inserts the cross-replica reduction the
    reference needs Lightning sync_batchnorm for,
    entrypoints/ssl/train_3d.py:337), while maintaining running averages
    in the ``batch_stats`` collection. The segmentation / classification
    train steps carry the collection in ``TrainState.variables``
    (train/steps.py), checkpoints persist it, and test/predict restore it
    so eval normalizes by the RUNNING statistics — torch BatchNorm
    inference parity (adn_fn.py:205 norm_fn_dict): a volume's prediction
    is identical whether it is evaluated alone or inside any batch
    (regression: tests/test_train.py batch-stats tests). A stateless
    apply (params only, no collection) still works — eval then falls back
    to current-batch statistics rather than crashing on the missing
    collection (the pre-round-4 behavior, kept for ad-hoc forwards).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        axes = tuple(range(x.ndim - 1))
        has_ra = self.has_variable("batch_stats", "mean")
        mutable_ra = self.is_mutable_collection("batch_stats")
        ra_mean = ra_var = None
        if has_ra or mutable_ra or self.is_initializing():
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
            )
        n_reduce = 1
        for a in axes:
            n_reduce *= x.shape[a]
        if use_running_average and has_ra:
            mean, var = ra_mean.value, ra_var.value
        elif use_running_average and n_reduce == 1:
            # stateless eval on a SINGLE element per feature (e.g. a 1-d
            # head/gate ADN at batch size 1, the test/predict path):
            # current-"batch" stats would zero the input and return the
            # bias for EVERY sample. Fall back to (0, 1) — torch's
            # fresh-model running stats — so eval stays input-dependent.
            mean = jnp.zeros((feat,), x.dtype)
            var = jnp.ones((feat,), x.dtype)
        else:
            # single-pass stats only where the f32 accumulator outranks
            # the data precision (see InstanceNorm above)
            if x.dtype in (jnp.bfloat16, jnp.float16):
                xf = x.astype(jnp.float32)
                mean32 = jnp.mean(xf, axis=axes)
                var = jnp.maximum(
                    jnp.mean(xf * xf, axis=axes) - mean32 * mean32, 0.0
                ).astype(x.dtype)
                mean = mean32.astype(x.dtype)
            else:
                mean = jnp.mean(x, axis=axes)
                var = jnp.var(x, axis=axes)
            if (
                ra_mean is not None
                and mutable_ra
                and not self.is_initializing()
            ):
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean.astype(
                    jnp.float32
                )
                ra_var.value = m * ra_var.value + (1 - m) * var.astype(
                    jnp.float32
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class GroupNorm(nn.Module):
    """Group normalization with a call-time group count. Width divisible
    by 8 keeps the original ``group_size=8`` semantics (C=128 -> 16
    groups); other widths — which used to crash flax init — take the
    largest divisor of C that is <= 8 as the group COUNT. The class name
    and param layout match flax's ``nn.GroupNorm``
    (``GroupNorm_0/{scale,bias}``) so checkpoints from the fixed
    ``group_size=8`` era stay loadable. Adjacent channels share a group,
    like flax and torch."""

    epsilon: float = 1e-6  # flax nn.GroupNorm default (the prior impl)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if c % 8 == 0:
            groups = c // 8
        else:
            groups = next(g for g in (4, 2, 1) if c % g == 0)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(x.shape[0], -1, groups, c // groups)
        # single-pass f32 stats for reduced-precision activations
        # (same rationale as InstanceNorm above)
        if x.dtype in (jnp.bfloat16, jnp.float16):
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean,
                0.0,
            )
        else:
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.var(xg, axis=(1, 3), keepdims=True)
        inv = jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
        y = (xg - mean.astype(x.dtype)) * inv
        return y.reshape(x.shape) * scale + bias


# former name of the call-time-group-count module (kept for imports)
AdaptiveGroupNorm = GroupNorm


def make_norm(norm_fn: str, spatial_dim: int = 3) -> Callable[[], nn.Module]:
    """Norm constructor by name: batch / instance / layer / group / identity."""
    norm_fn = (norm_fn or "identity").lower()
    if norm_fn == "batch":
        return lambda: GlobalBatchNorm(momentum=0.9)
    if norm_fn == "instance":
        # torch InstanceNorm{1,2,3}d defaults to affine=False
        # (adn_fn.py norm_fn_dict); the affine variant is a separate key
        return lambda: InstanceNorm(use_scale=False, use_bias=False)
    if norm_fn == "instance_affine":
        return lambda: InstanceNorm()
    if norm_fn == "layer":
        # torch eps parity: spatial "layer" ADNs are
        # LayerNormChannelsFirst(eps=1e-6) (regularization.py:95-100);
        # only the 1D case is torch.nn.LayerNorm (eps 1e-5)
        eps = 1e-5 if spatial_dim == 1 else 1e-6
        # fast-variance (E[x^2]-E[x]^2) loses ~3 digits on low-channel
        # tensors (measured 1.6e-2 vs torch on a 2-channel LayerNorm);
        # both reference norms are two-pass
        return lambda: nn.LayerNorm(epsilon=eps, use_fast_variance=False)
    if norm_fn == "group":
        # group_size=8 when the width allows (the original semantics),
        # else the group count adapts so non-multiple-of-8 widths no
        # longer crash at init (the docstring above explicitly
        # recommends 'group' for deployed models)
        return lambda: GroupNorm()
    if norm_fn in ("identity", "none"):
        return lambda: None
    raise NotImplementedError(f"norm {norm_fn!r}")


class ActDropNorm(nn.Module):
    """
    Applies normalization, dropout and activation in a configurable order
    (parity: adn_fn.py:56 — the reference's default ordering is "NDA",
    norm -> dropout -> act, and every reference call site uses it).
    """

    norm_fn: str = "batch"
    act_fn: str = "swish"
    dropout_param: float = 0.0
    ordering: str = "NDA"
    spatial_dim: int = 3
    dropout_type: str = "dropout"  # "dropout" | "uout" (regularization.py:11)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adell_mri_tpu.models.layers.regularization import UOut

        if self.act_fn == "prelu":
            # torch PReLU: ONE learnable slope shared across channels,
            # init 0.25 (the fixed leaky_relu(0.25) in activations.py only
            # matches at init; trained reference checkpoints carry a
            # learned slope, so the ADN variant must be a parameter)
            slope = self.param(
                "prelu", nn.initializers.constant(0.25), (1,)
            )
            act = lambda x: jnp.where(x >= 0, x, slope * x)  # noqa: E731
        else:
            act = get_activation(self.act_fn)
        norm_ctor = make_norm(self.norm_fn, self.spatial_dim)
        for op in self.ordering.upper():
            if op == "A":
                x = act(x)
            elif op == "D" and self.dropout_param > 0:
                if self.dropout_type == "uout":
                    x = UOut(beta=self.dropout_param)(x, train=train)
                else:
                    x = nn.Dropout(rate=self.dropout_param)(
                        x, deterministic=not train
                    )
            elif op == "N":
                norm = norm_ctor()
                if norm is not None:
                    if isinstance(norm, (nn.BatchNorm, GlobalBatchNorm)):
                        x = norm(x, use_running_average=not train)
                    else:
                        x = norm(x)
        return x


def get_adn_fn(
    spatial_dim: int = 3,
    norm_fn: str = "batch",
    act_fn: str = "swish",
    dropout_param: float = 0.0,
    dropout_type: str = "dropout",
) -> Callable[[], ActDropNorm]:
    """
    Returns an ActDropNorm constructor with baked arguments
    (parity: adn_fn.py:205 — used by every model factory).
    """

    def ctor(
        _features: Optional[int] = None, name: Optional[str] = None
    ) -> ActDropNorm:
        # _features accepted for call-site parity (torch norm layers need it;
        # flax infers feature count at call time); name pins the module path
        # in the param tree (checkpoint/interop stability)
        return ActDropNorm(
            norm_fn=norm_fn,
            act_fn=act_fn,
            dropout_param=dropout_param,
            spatial_dim=spatial_dim,
            dropout_type=dropout_type,
            name=name,
        )

    return ctor
