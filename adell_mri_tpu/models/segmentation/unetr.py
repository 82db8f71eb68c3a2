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


def tokens_to_rescaled_volume(tokens, grid, patch, scale):
    """The reference's ``rearrange_rescale`` (vit.py:812-842) in clean
    JAX: tokens [B, N, prod(patch)*C] whose feature axis is the
    row-major flattening of (*patch, C) become a volume at
    spatial = grid_i * patch_i / scale_i with channels
    (C, scale_0, scale_1, scale_2) flattened c-major — the exact channel
    ORDER the reference's reconstruction convs consume."""
    b, n, d = tokens.shape
    nd = len(grid)
    scale = [scale] * nd if isinstance(scale, int) else list(scale)
    a = [p // s for p, s in zip(patch, scale)]
    c = d
    for p in patch:
        c //= p
    shape = [b] + list(grid)
    for ai, si in zip(a, scale):
        shape += [ai, si]
    shape += [c]
    x = tokens.reshape(shape)
    # [B, g..., (a0,s0,a1,s1,a2,s2), C] ->
    # [B, g0, a0, g1, a1, g2, a2, C, s0, s1, s2]
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + 2 * i]
    perm += [1 + 3 * nd]
    perm += [2 + nd + 2 * i for i in range(nd)]
    x = x.transpose(perm)
    out_spatial = [g * ai for g, ai in zip(grid, a)]
    ch = c
    for s in scale:
        ch *= s
    return x.reshape([b] + out_spatial + [ch])


class UNETRRef(nn.Module):
    """
    Reference-compat UNETR: the EXACT module geometry of
    adell_mri/modules/segmentation/unetr.py:21 (linear patch embedding
    with no projection when embedding_size is None, transformer stack
    with attention_dim, rearrange_rescale token-to-volume stacking,
    ``first_encoder`` raw-input skip, per-skip transpose-conv
    reconstruction ladders, 1x1 bottleneck reconstruction, and the
    inherited UNet decoder: transpose upscales + identity/conv/residual
    links + regular conv units + conv3-adn-conv1 final layer). Exists so
    reference UNETR checkpoints import with voxel-exact forwards
    (interop/torch_unetr.py); the default ``UNETR`` above remains the
    TPU-first redesign.
    """

    image_size: Sequence[int]
    patch_size: Sequence[int]
    n_blocks: int = 8
    return_at: Sequence[int] = (2, 4, 5)
    n_heads: int = 8
    attention_dim: Optional[int] = None
    # projecting embedding (reference embedding_size, vit.py:521-537):
    # tokens project prod(patch)*C -> E through map_to_out (LayerNorm +
    # Linear) and come BACK through per-consumer map_to_in Linears — the
    # ViT embedding's own for the bottleneck, one per ``rescalers`` entry
    # for the skips (unetr.py:253-272). None = parameter-free embedding.
    embedding_size: Optional[int] = None
    mlp_structure: Sequence[int] = (256, 256)
    depth: Sequence[int] = (16, 32, 64)
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    link_type: str = "identity"
    n_classes: int = 2
    in_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        from adell_mri_tpu.models.layers.res_blocks import ResidualBlock

        ndim = x.ndim - 2
        p = tuple(self.patch_size[:ndim])
        spatial = tuple(self.image_size[:ndim])
        grid = [s // pi for s, pi in zip(spatial, p)]
        adn = get_adn_fn(
            ndim, self.norm_type, self.activation_fn, self.dropout_param
        )
        token_dim = self.in_channels
        for pi in p:
            token_dim *= pi
        scale = int(2 ** len(self.return_at))
        in_rec = self.in_channels * scale**ndim
        depth = list(self.depth)
        n_skips = len(depth) - 1

        def conv_block(z, cin, cout, k, prefix):
            # reference conv_block_3d: conv(in,in,k) -> adn -> conv(in,out,k)
            z = TpuConv(
                cin, _tuple(k, ndim), padding="SAME",
                name=f"{prefix}_Conv_0",
            )(z)
            z = apply_adn(adn(cin, name=f"{prefix}_adn_in"), z, train)
            return TpuConv(
                cout, _tuple(k, ndim), padding="SAME",
                name=f"{prefix}_Conv_1",
            )(z)

        # ViT (names match the torch_vit importer surface)
        projecting = bool(
            self.embedding_size and self.embedding_size != token_dim
        )
        tokens = LinearEmbedding(
            patch_size=p,
            embed_dim=self.embedding_size if projecting else token_dim,
            embed_method="linear",
            embed_norm=projecting,
            dropout=self.dropout_param,
            name="LinearEmbedding_0",
        )(x, train=train)
        tokens, inter = TransformerBlockStack(
            self.n_blocks,
            self.n_heads,
            dropout=self.dropout_param,
            mlp_structure=tuple(self.mlp_structure),
            attention_dim=self.attention_dim,
            name="TransformerBlockStack_0",
        )(tokens, train=train, return_at=list(self.return_at))

        # first encoder (init_first_encoder :276-285)
        z0 = apply_adn(
            adn(self.in_channels, name="first_adn_0"), x, train
        )
        z0 = conv_block(z0, self.in_channels, depth[0], 3, "first")
        z0 = apply_adn(adn(depth[0], name="first_adn_out"), z0, train)

        # reconstruction ladders (init_reconstruction_ops :316-330)
        skips = [z0]
        for i, d in enumerate(depth[1:-1]):
            tok_i = inter[i]
            if projecting:
                # rescalers[i].map_to_in (rearrange_rescale applies it
                # before the downsample reshape, vit.py:812-830)
                tok_i = nn.Dense(
                    token_dim, name=f"rescaler_map_in_{i}"
                )(tok_i)
            vol = tokens_to_rescaled_volume(tok_i, grid, p, scale)
            n_ops = n_skips - (i + 1)
            for j in range(n_ops):
                vol = TpuConvTranspose(
                    d, _tuple(2, ndim), name=f"rec{i}_op{j}_up",
                )(vol)
                vol = apply_adn(
                    adn(d, name=f"rec{i}_op{j}_adn_0"), vol, train
                )
                vol = conv_block(vol, d, d, 3, f"rec{i}_op{j}")
                vol = apply_adn(
                    adn(d, name=f"rec{i}_op{j}_adn_1"), vol, train
                )
            skips.append(vol)

        # bottleneck reconstruction: conv_block at k=1 (init :327-330)
        if projecting:
            # the ViT embedding's own map_to_in
            tokens = nn.Dense(token_dim, name="bn_map_in")(tokens)
        curr = tokens_to_rescaled_volume(tokens, grid, p, scale)
        curr = conv_block(curr, in_rec, depth[-1], 1, "bn")
        skips.append(curr)

        # inherited UNet decoder (forward :388-411)
        rev_depth = depth[-2::-1]
        for i, d in enumerate(rev_depth):
            skip = skips[-i - 2]
            if self.link_type == "identity":
                encoded = skip
            elif self.link_type == "conv":
                encoded = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"link_{i}"
                )(skip)
                encoded = apply_adn(
                    adn(d, name=f"link_adn_{i}"), encoded, train
                )
            elif self.link_type == "residual":
                encoded = ResidualBlock(
                    kernel_size=3,
                    inter_channels=None,
                    out_channels=d,
                    adn_fn=adn,
                    name=f"link_{i}",
                )(skip, train=train)
            else:
                raise NotImplementedError(self.link_type)
            curr = TpuConvTranspose(
                d, _tuple(2, ndim), name=f"up_{i}"
            )(curr)
            curr = jnp.concatenate([curr, encoded], axis=-1)
            curr = conv_block(curr, 2 * d, d, 3, f"dec_{i}")
            curr = apply_adn(adn(d, name=f"dec_adn_{i}"), curr, train)

        # final layer (get_final_layer :626-655)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        curr = TpuConv(
            depth[0], _tuple(3, ndim), padding="SAME", name="Conv_0"
        )(curr)
        curr = apply_adn(adn(depth[0], name="final_adn"), curr, train)
        logits = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(curr)
        if return_logits:
            return logits, None
        pred = (
            jax.nn.softmax(logits, -1)
            if self.n_classes > 2
            else jax.nn.sigmoid(logits)
        )
        return pred, None
