"""
Transformer segmentation: UNETR and SWIN-UNet.

Parity targets: adell_mri/modules/segmentation/unetr.py — UNETR (:21,
ViT encoder whose intermediate token maps are reshaped into U-Net skips at
``return_at`` blocks) and SWINUNet (:635, hierarchical SWIN encoder +
conv decoder). The Monai-wrapped variants (:435,:1036) collapse into these
(same config surface; one implementation).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.ops.conv import TpuConv, TpuConvTranspose
from adell_mri_tpu.models.layers.blocks import _tuple, apply_adn
from adell_mri_tpu.models.layers.multi_resolution import resize_like
from adell_mri_tpu.models.layers.vit import (
    LinearEmbedding,
    SWINTransformerBlockStack,
    TransformerBlockStack,
)


def tokens_to_volume(tokens, grid, skip_tokens: int = 0):
    """[B, N(+extra), E] -> [B, *grid, E]."""
    b = tokens.shape[0]
    t = tokens[:, skip_tokens:]
    return t.reshape((b,) + tuple(grid) + (tokens.shape[-1],))


class _DecoderStage(nn.Module):
    out_channels: int
    adn_fn: any = None
    upsample: bool = True  # False: merge a same-scale skip (no deconv)

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        ndim = x.ndim - 2
        target = skip.shape[1:-1]
        if self.upsample:
            # name pins the pre-swap auto-assigned param path
            x = TpuConvTranspose(
                self.out_channels, _tuple(2, ndim), name="ConvTranspose_0"
            )(x)
        if x.shape[1:-1] != target:
            x = resize_like(x, target)
        x = jnp.concatenate([x, skip], axis=-1)
        # TpuConv (z2d lowering) for the narrow-channel/large-spatial 3x3s
        # where XLA's 3D conv craters (BASELINE.md round-3 stem cliff);
        # names pin the previous nn.Conv auto paths
        x = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_0"
        )(x)
        x = apply_adn(self.adn_fn(self.out_channels), x, train)
        x = TpuConv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="Conv_1"
        )(x)
        x = apply_adn(self.adn_fn(self.out_channels), x, train)
        return x


class _SkipCondition(nn.Module):
    """The reference UNet's skip conditioning applied to a transformer
    decoder skip (UNETR/SWINUNet inherit both from UNet — aux-volume
    concat, forward :796-799, and the two-layer feature gate MLP,
    :716-740)."""

    dropout_param: float = 0.0

    @nn.compact
    def __call__(
        self, skip, x_skip_layer, x_feature_conditioning, train: bool = False
    ):
        ndim = skip.ndim - 2
        if x_skip_layer is not None:
            cond = resize_like(
                x_skip_layer, skip.shape[1:-1], method="nearest"
            )
            skip = jnp.concatenate([skip, cond], axis=-1)
        if x_feature_conditioning is not None:
            d = skip.shape[-1]
            gate = nn.Dense(d, name="feat_cond")(x_feature_conditioning)
            gate = apply_adn(
                get_adn_fn(1, "batch", "swish", self.dropout_param)(d),
                gate,
                train,
            )
            gate = nn.Dense(d, name="feat_cond_out")(gate)
            gate = apply_adn(
                get_adn_fn(1, "batch", "sigmoid", self.dropout_param)(d),
                gate,
                train,
            )
            gate = gate.reshape((gate.shape[0],) + (1,) * ndim + (d,))
            skip = skip * gate
        return skip


class UNETR(nn.Module):
    """
    ViT encoder + progressive-deconv skips + conv decoder (parity:
    unetr.py:21; unetr.yaml surface: patch_size, embed dims, depths).
    """

    spatial_dimensions: int = 3
    n_classes: int = 2
    patch_size: Sequence[int] = (8, 8, 8)
    embed_dim: int = 192
    n_blocks: int = 8
    n_heads: int = 6
    feature_size: int = 16
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    return_at: Optional[Sequence[int]] = None
    # full UNet conditioning surface (inherited by the reference's UNETR,
    # unetr.py:60-64)
    skip_conditioning: Optional[int] = None
    feature_conditioning: Optional[int] = None
    feature_conditioning_params: Optional[dict] = None
    bottleneck_classification: bool = False
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        x_skip_layer=None,
        x_feature_conditioning=None,
        train: bool = False,
        return_logits: bool = False,
    ):
        ndim = x.ndim - 2
        if x_skip_layer is not None and x_skip_layer.ndim < x.ndim:
            x_skip_layer = x_skip_layer[..., None]
        if (
            x_feature_conditioning is not None
            and self.feature_conditioning_params
        ):
            # mean/std standardization as in the UNet path (unet.py
            # forward :774-777)
            f_mean = jnp.asarray(self.feature_conditioning_params["mean"])
            f_std = jnp.asarray(self.feature_conditioning_params["std"])
            x_feature_conditioning = (
                x_feature_conditioning - f_mean
            ) / f_std
        spatial = x.shape[1:-1]
        p = tuple(self.patch_size[:ndim])
        grid = [s // pi for s, pi in zip(spatial, p)]
        adn = get_adn_fn(
            ndim, self.norm_type, self.activation_fn, self.dropout_param
        )
        return_at = list(
            self.return_at
            if self.return_at is not None
            else [
                self.n_blocks // 4 - 1,
                self.n_blocks // 2 - 1,
                3 * self.n_blocks // 4 - 1,
            ]
        )
        tokens = LinearEmbedding(
            patch_size=p,
            embed_dim=self.embed_dim,
            embed_method="convolutional",
            dropout=self.dropout_param,
        )(x, train=train)
        tokens, inter = TransformerBlockStack(
            self.n_blocks, self.n_heads, dropout=self.dropout_param
        )(tokens, train=train, return_at=return_at)

        # skips: z0 from the raw input; z_i from intermediate tokens,
        # progressively deconvolved to their scale (unetr.py decoder design)
        f = self.feature_size
        z0 = TpuConv(f, _tuple(3, ndim), padding="SAME", name="Conv_0")(x)
        z0 = apply_adn(adn(f), z0, train)

        skips = [z0]
        n_inter = len(inter)
        # total 2x upsamplings implied by the patch size: skip i lives at
        # spatial / 2^(i+1), so one deconv per decoder stage lands EXACTLY
        # on the next skip (the previous ladder deconvolved n_inter - i
        # times, overshooting the scale and resize-ing back down — two
        # wasted transposed convs per forward at patch 8)
        import math as _math

        n_up = max(1, int(round(_math.log2(max(p)))))
        for i, t in enumerate(inter):
            vol = tokens_to_volume(t, grid)
            ch = f * (2 ** (i + 1))
            target = tuple(
                max(1, s // (2 ** (i + 1))) for s in spatial
            )
            ups = 0
            scale = list(grid)
            while ups < n_up and any(
                s < t_ for s, t_ in zip(scale, target)
            ):
                scale = [min(s * 2, t_) for s, t_ in zip(scale, target)]
                ups += 1
            for u in range(ups):
                vol = TpuConvTranspose(
                    ch, _tuple(2, ndim), name=f"proj_{i}_{u}",
                )(vol)
                vol = apply_adn(adn(ch), vol, train)
            if vol.shape[1:-1] != target:
                vol = resize_like(vol, target)
            skips.append(vol)

        bottleneck = tokens_to_volume(tokens, grid)
        curr = nn.Conv(
            f * (2 ** (n_inter + 1)), _tuple(1, ndim), name="bn_proj"
        )(bottleneck)
        curr = apply_adn(adn(curr.shape[-1]), curr, train)
        deep_outputs = []
        for i in range(len(skips) - 1, -1, -1):
            skip = _SkipCondition(
                self.dropout_param, name=f"cond_{i}"
            )(skips[i], x_skip_layer, x_feature_conditioning, train=train)
            curr = _DecoderStage(
                out_channels=max(f * (2**i), f), adn_fn=adn,
                name=f"dec_{i}",
                # the deepest skip sits at the bottleneck's own scale
                upsample=(
                    skips[i].shape[1:-1] != curr.shape[1:-1]
                ),
            )(curr, skip, train=train)
            deep_outputs.append(curr)
        if curr.shape[1:-1] != spatial:
            curr = resize_like(curr, spatial)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        logits = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(curr)
        pred = logits if return_logits else (
            jax.nn.softmax(logits, -1)
            if self.n_classes > 2
            else jax.nn.sigmoid(logits)
        )
        bn_out = None
        if self.bottleneck_classification:
            pooled = jnp.max(
                bottleneck.reshape(
                    bottleneck.shape[0], -1, bottleneck.shape[-1]
                ),
                axis=1,
            )
            bn_out = nn.Dense(out_ch, name="bottleneck_classifier")(pooled)
        if self.deep_supervision:
            ds = []
            for i, o in enumerate(deep_outputs):
                d = o.shape[-1]
                y = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"ds_conv_{i}"
                )(o)
                y = apply_adn(adn(d, name=f"ds_adn_{i}"), y, train)
                y = nn.Conv(out_ch, _tuple(1, ndim), name=f"ds_out_{i}")(y)
                y = (
                    jax.nn.softmax(y, -1)
                    if self.n_classes > 2
                    else jax.nn.sigmoid(y)
                )
                ds.append(y)
            return pred, bn_out, ds
        return pred, bn_out


class SWINUNet(nn.Module):
    """
    SWIN encoder + conv decoder (parity: unetr.py:635; unet-swin.yaml).
    """

    spatial_dimensions: int = 3
    n_classes: int = 2
    embed_dim: int = 24
    depths: Sequence[int] = (2, 2, 2)
    n_heads: Sequence[int] = (3, 6, 12)
    window_size: Sequence[int] = (4, 4, 4)
    patch_size: Sequence[int] = (2, 2, 2)
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    skip_conditioning: Optional[int] = None
    feature_conditioning: Optional[int] = None
    feature_conditioning_params: Optional[dict] = None
    bottleneck_classification: bool = False
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        x_skip_layer=None,
        x_feature_conditioning=None,
        train: bool = False,
        return_logits: bool = False,
    ):
        ndim = x.ndim - 2
        if x_skip_layer is not None and x_skip_layer.ndim < x.ndim:
            x_skip_layer = x_skip_layer[..., None]
        if (
            x_feature_conditioning is not None
            and self.feature_conditioning_params
        ):
            f_mean = jnp.asarray(self.feature_conditioning_params["mean"])
            f_std = jnp.asarray(self.feature_conditioning_params["std"])
            x_feature_conditioning = (
                x_feature_conditioning - f_mean
            ) / f_std
        spatial = x.shape[1:-1]
        adn = get_adn_fn(
            ndim, self.norm_type, self.activation_fn, self.dropout_param
        )
        bottleneck, feats = SWINTransformerBlockStack(
            embed_dim=self.embed_dim,
            depths=self.depths,
            n_heads=self.n_heads,
            window_size=self.window_size,
            patch_size=self.patch_size,
            dropout=self.dropout_param,
        )(x, train=train)

        f = self.embed_dim
        z0 = TpuConv(f, _tuple(3, ndim), padding="SAME", name="Conv_0")(x)
        z0 = apply_adn(adn(f), z0, train)
        skips = [z0] + feats[:-1]

        curr = bottleneck
        deep_outputs = []
        for i in range(len(skips) - 1, -1, -1):
            skip = _SkipCondition(
                self.dropout_param, name=f"cond_{i}"
            )(skips[i], x_skip_layer, x_feature_conditioning, train=train)
            curr = _DecoderStage(
                out_channels=max(skips[i].shape[-1], f), adn_fn=adn,
                name=f"dec_{i}",
            )(curr, skip, train=train)
            deep_outputs.append(curr)
        if curr.shape[1:-1] != spatial:
            curr = resize_like(curr, spatial)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        logits = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(curr)
        pred = logits if return_logits else (
            jax.nn.softmax(logits, -1)
            if self.n_classes > 2
            else jax.nn.sigmoid(logits)
        )
        bn_out = None
        if self.bottleneck_classification:
            pooled = jnp.max(
                bottleneck.reshape(
                    bottleneck.shape[0], -1, bottleneck.shape[-1]
                ),
                axis=1,
            )
            bn_out = nn.Dense(out_ch, name="bottleneck_classifier")(pooled)
        if self.deep_supervision:
            ds = []
            for i, o in enumerate(deep_outputs):
                d = o.shape[-1]
                y = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"ds_conv_{i}"
                )(o)
                y = apply_adn(adn(d, name=f"ds_adn_{i}"), y, train)
                y = nn.Conv(out_ch, _tuple(1, ndim), name=f"ds_out_{i}")(y)
                y = (
                    jax.nn.softmax(y, -1)
                    if self.n_classes > 2
                    else jax.nn.sigmoid(y)
                )
                ds.append(y)
            return pred, bn_out, ds
        return pred, bn_out
