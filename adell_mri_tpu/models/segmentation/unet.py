"""
Config-driven U-Net family.

Parity target: adell_mri/modules/segmentation/unet.py — UNet (:31, forward
:751-843) and BrUNet (:846). Same config surface:

- ``conv_type``: regular | depthwise | resnet | sae | asp | convnext
- ``link_type``: identity | conv | residual | attention
- ``upscale_type``: upsample | transpose
- encoder: per level i, conv(prev->depth[i], k_i, stride 1)+ADN then
  downsample conv(depth[i]->depth[i], k_i, stride s_i)+ADN; last level has no
  downsample (unet.py:543-585)
- decoder: upscale 1x1(d1->d2)+resize (or transposed conv), link op on the
  skip, concat, conv(2d->d)+ADN (unet.py:605-624)
- optional skip-image conditioning (aux mask concat to skips, :796-799),
  tabular feature FiLM (sigmoid gate multiply, :716-740,803-809), bottleneck
  classification head (:691,830-834), deep supervision heads (:605-624),
  sigmoid/softmax folded into final_layer (:626-655).

TPU-first: channels-last; 2D/3D collapse into one module (rank inferred from
the input); all branch flags are static Python booleans so jit traces one
graph per configuration (no retraces, SURVEY.md §7 hard parts).
"""

from typing import Any, Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.ops.conv import TpuConv, TpuConvTranspose
from adell_mri_tpu.models.layers.blocks import (
    _tuple,
    apply_adn,
)
from adell_mri_tpu.models.layers.multi_resolution import (
    AtrousSpatialPyramidPooling,
    AtrousSpatialPyramidPoolingRef,
    resize_like,
)
from adell_mri_tpu.models.layers.res_blocks import ResidualBlock, ConvNeXtBlock
from adell_mri_tpu.models.layers.self_attention import (
    ConcurrentSqueezeAndExcite,
    ConcurrentSqueezeAndExciteRef,
    SelfAttentionBlock,
)


def _numel(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _crop_center(x, target_spatial):
    """crop_to_size parity (ref layers/utils.py:30-53): center crop of
    the spatial axes, low side takes floor(diff/2)."""
    slices = [slice(None)]
    for cur, tgt in zip(x.shape[1:-1], target_spatial):
        lo = (cur - tgt) // 2
        slices.append(slice(lo, lo + tgt))
    slices.append(slice(None))
    return x[tuple(slices)]


class _ConvUnit(nn.Module):
    """One conv_type-selected encoder/decoder unit + outer ADN, matching
    the REFERENCE's per-unit composition (capacity parity at the same
    YAML — ref unet.py:246-340):

    - regular/sae: Conv(in->in, k, stride) -> adn(in) -> Conv(in->out, k, 1)
      (ref conv_block_3d:260); sae adds concurrent squeeze-excite;
    - depthwise: grouped Conv(in->in, k, stride) -> adn(in) -> 1x1
      Conv(in->out) (ref depthwise_conv_block_3d:292);
    - resnet: bottleneck ResidualBlock (inter = in when in > 32, ref
      res_block_conv_3d); strided units pool AFTER the block with SAME
      padding (exactly n/s — the reference's MaxPool padding arithmetic
      yields n/s + 1, an artifact its own decoder then re-interpolates
      away; static TPU shapes want the exact halving).
    """

    out_channels: int
    kernel_size: Union[int, Sequence[int]]
    stride: Union[int, Sequence[int]] = 1
    conv_type: str = "regular"
    adn_fn: Any = None
    # asp_ref only: the reference hard-codes an instance-norm ADN inside
    # its ASPP regardless of the model norm_type (ref unet.py:407-413)
    asp_adn_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        k = _tuple(self.kernel_size, ndim)
        s = _tuple(self.stride, ndim)
        ct = self.conv_type
        in_ch = x.shape[-1]
        # torch pads strided convs SYMMETRICALLY (p = k//2 per side, ref
        # init_encoder :554,566) where TF/XLA "SAME" puts the odd pad on
        # the high side — a one-voxel tap shift at every downsample; use
        # explicit symmetric pads at stride > 1 for exact alignment
        # (output sizes are identical: ceil(n/s) either way for odd k)
        pad = (
            tuple((ki // 2, ki // 2) for ki in k)
            if any(si != 1 for si in s)
            else "SAME"
        )
        if ct in ("regular", "sae"):
            from adell_mri_tpu.ops.conv import TpuConv

            # nn.Conv-compatible param trees (Conv_0/Conv_1) with the
            # im2col lowering for the 3D-conv wall (ops/conv.py)
            x = TpuConv(
                in_ch, k, strides=s, padding=pad, name="Conv_0",
            )(x)
            x = apply_adn(self.adn_fn(in_ch), x, train)
            x = TpuConv(
                self.out_channels, k, strides=_tuple(1, ndim),
                padding="SAME", name="Conv_1",
            )(x)
            if ct == "sae":
                x = ConcurrentSqueezeAndExcite()(x)
        elif ct == "sae_ref":
            # reference-compat sae (checkpoint import): conv block + the
            # reference's sum-combined scSE (self_attention.py:127-149)
            from adell_mri_tpu.ops.conv import TpuConv

            x = TpuConv(
                in_ch, k, strides=s, padding=pad, name="Conv_0",
            )(x)
            x = apply_adn(self.adn_fn(in_ch), x, train)
            x = TpuConv(
                self.out_channels, k, strides=_tuple(1, ndim),
                padding="SAME", name="Conv_1",
            )(x)
            x = ConcurrentSqueezeAndExciteRef(name="scse")(x)
        elif ct in ("depthwise", "depthwise_ref"):
            from adell_mri_tpu.ops.conv import TpuDwConv

            x = TpuDwConv(
                in_ch, k, strides=s, padding=pad, name="Conv_dw",
            )(x)
            x = apply_adn(self.adn_fn(in_ch), x, train)
            # depthwise_ref (checkpoint import): the reference's
            # depthwise_conv_block passes the BLOCK padding to the
            # POINTWISE conv too (ref unet.py:292-307) — at strided
            # downsamples (p = k//2, init_encoder :566) the 1x1 conv
            # therefore zero-pads the volume back OUT by 2*(k//2) per
            # axis; its decoder center-crops the drift away. The
            # TPU-first 'depthwise' keeps exact halving instead.
            pw_pad = (
                tuple((ki // 2, ki // 2) for ki in k)
                if ct == "depthwise_ref" and any(si != 1 for si in s)
                else "VALID"
            )
            x = nn.Conv(
                self.out_channels, _tuple(1, ndim), padding=pw_pad,
                name="Conv_pw",
            )(x)
        elif ct == "resnet":
            x = ResidualBlock(
                kernel_size=(
                    self.kernel_size
                    if isinstance(self.kernel_size, int)
                    else self.kernel_size[0]
                ),
                # ref res_block_conv_3d: bottleneck only when in > 32
                inter_channels=in_ch if in_ch > 32 else None,
                out_channels=self.out_channels,
                adn_fn=self.adn_fn,
            )(x, train=train)
            if any(si != 1 for si in s):
                x = nn.max_pool(
                    x, window_shape=s, strides=s, padding="SAME"
                )
        elif ct in ("convnext", "convnextv2"):
            if any(si != 1 for si in s):
                x = nn.Conv(self.out_channels, k, strides=s, padding="SAME")(x)
            else:
                x = ConvNeXtBlock(
                    out_channels=self.out_channels, v2=ct.endswith("v2")
                )(x, train=train)
        elif ct == "asp":
            x = AtrousSpatialPyramidPooling(
                self.out_channels, rates=(1, 2), adn_fn=self.adn_fn
            )(x, train=train)
            if any(si != 1 for si in s):
                x = nn.Conv(self.out_channels, k, strides=s, padding="SAME")(x)
        elif ct == "asp_ref":
            # reference-compat asp (checkpoint import): the reference's
            # ASPP with rates [1, 2] and a hard-coded instance-norm ADN
            # (ref unet.py:407-413) which IGNORES kernel/stride — the
            # reference asp encoder therefore never downsamples; its
            # decoder upsamples anyway and center-crops back (forward
            # :810-816). Bug-compatible by construction.
            x = AtrousSpatialPyramidPoolingRef(
                self.out_channels,
                rates=(1, 2),
                adn_fn=self.asp_adn_fn or self.adn_fn,
                name="aspp",
            )(x, train=train)
        else:
            raise NotImplementedError(f"conv_type {ct!r}")
        return apply_adn(self.adn_fn(self.out_channels), x, train)


class UNet(nn.Module):
    spatial_dimensions: int = 2
    conv_type: str = "regular"
    link_type: str = "identity"
    upscale_type: str = "upsample"
    interpolation: str = "linear"
    norm_type: str = "batch"
    dropout_type: str = "dropout"
    dropout_param: float = 0.1
    activation_fn: str = "prelu"
    in_channels: int = 1
    n_classes: int = 2
    depth: Sequence[int] = (16, 32, 64)
    kernel_sizes: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (2, 2, 2)
    bottleneck_classification: bool = False
    skip_conditioning: Optional[int] = None
    feature_conditioning: Optional[int] = None
    feature_conditioning_params: Optional[Dict[str, Any]] = None
    deep_supervision: bool = False
    encoder_only: bool = False
    # creates the UNetSemiSL 1x1 linear_transformation head (parity:
    # semi_supervised_segmentation/unet.py:27); applied to the returned
    # features when apply_linear_transformation=True
    semi_supervised: bool = False
    # ResNet-backbone encoder (the reference's SSL-encoder grafting,
    # resnet_to_encoding_ops res_net.py:27 + segmentation/train.py:659-719):
    # list of (channels, inter, kernel, n_blocks) stage tuples. When set,
    # the encoder becomes stem + residual stages (skips pre-pool, stem as
    # the first level) and ``depth`` must equal [stem_f, *stage_channels];
    # the backbone subtree lives under ``encoder_backbone`` so weights
    # from import_reference_resnet_backbone / our SSL checkpoints drop in.
    encoder_structure: Optional[Sequence[Sequence[int]]] = None
    res_type: str = "resnet"

    def _adn(self):
        return get_adn_fn(
            self.spatial_dimensions,
            self.norm_type,
            self.activation_fn,
            self.dropout_param,
            self.dropout_type,
        )

    def _final_layer(self, x, adn_fn, train, ndim, apply_activation):
        d = x.shape[-1]
        # full-resolution narrow-channel 3x3 — the exact shape class where
        # XLA's 3D conv craters (BASELINE.md round-3 stem cliff); TpuConv
        # routes it through z2d. Names pin the previous auto-assigned
        # paths (Conv_0/Conv_1) for checkpoint stability.
        x = TpuConv(d, _tuple(3, ndim), padding="SAME", name="Conv_0")(x)
        x = apply_adn(adn_fn(d, name="final_adn"), x, train)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        x = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(x)
        if apply_activation:
            x = (
                jax.nn.softmax(x, axis=-1)
                if self.n_classes > 2
                else jax.nn.sigmoid(x)
            )
        return x

    @nn.compact
    def __call__(
        self,
        x,
        x_skip_layer=None,
        x_feature_conditioning=None,
        train: bool = False,
        return_features: bool = False,
        return_bottleneck: bool = False,
        return_logits: bool = False,
        apply_linear_transformation: bool = False,
    ):
        ndim = x.ndim - 2
        adn_fn = self._adn()
        # the reference hard-codes instance-norm ADNs inside its ASPP
        # blocks regardless of the model norm_type (ref unet.py:407-413)
        asp_adn = (
            get_adn_fn(
                self.spatial_dimensions,
                "instance",
                self.activation_fn,
                self.dropout_param,
            )
            if self.conv_type == "asp_ref"
            else None
        )
        depth, ks, st = list(self.depth), list(self.kernel_sizes), list(self.strides)

        if x_skip_layer is not None and x_skip_layer.ndim < x.ndim:
            x_skip_layer = x_skip_layer[..., None]
        if x_feature_conditioning is not None and self.feature_conditioning_params:
            f_mean = jnp.asarray(self.feature_conditioning_params["mean"])
            f_std = jnp.asarray(self.feature_conditioning_params["std"])
            x_feature_conditioning = (x_feature_conditioning - f_mean) / f_std

        # ---------------- encoder (unet.py:543-585) ----------------
        if self.encoder_structure is not None:
            # ResNet-backbone encoder (SSL grafting workflow). Skips are
            # pre-pool stage outputs with the stem as level 0; the
            # bottleneck is the LAST stage pre-pool (the reference pools
            # it once more and crops the mismatch away in the decoder,
            # forward :811-816 — static TPU shapes prefer the exact
            # geometry).
            from adell_mri_tpu.models.layers.res_net import ResNetBackbone

            structure = [tuple(s) for s in self.encoder_structure]
            want_depth = [structure[0][0]] + [s[0] for s in structure]
            if list(depth) != want_depth:
                raise ValueError(
                    "with encoder_structure, depth must be "
                    f"[stem_f, *stage_channels] = {want_depth}, got "
                    f"{list(depth)}"
                )
            _, encoding_out = ResNetBackbone(
                structure=structure,
                maxpool_structure=[
                    _tuple(s, ndim) for s in st[1:]
                ],
                adn_fn=adn_fn,
                res_type=self.res_type,
                name="encoder_backbone",
            )(x, train=train, return_intermediate=True, return_stem=True)
            curr = encoding_out[-1]
        else:
            encoding_out = []
            curr = x
            for i, d in enumerate(depth):
                curr = _ConvUnit(
                    d, ks[i], 1, self.conv_type, adn_fn,
                    asp_adn_fn=asp_adn, name=f"enc_{i}"
                )(curr, train=train)
                encoding_out.append(curr)
                if i < len(depth) - 1:
                    curr = _ConvUnit(
                        d, ks[i], st[i], self.conv_type, adn_fn,
                        asp_adn_fn=asp_adn, name=f"enc_ds_{i}",
                    )(curr, train=train)
        bottleneck = curr
        if return_bottleneck:
            return None, None, bottleneck
        if self.encoder_only:
            return bottleneck

        # ---------------- decoder (unet.py:605-624, forward :791-821) ------
        dec_depths = depth[-2::-1]
        dec_ks = ks[-2::-1]
        up_strides = st[-2::-1]
        deep_outputs = []
        for i, d in enumerate(dec_depths):
            skip = encoding_out[-i - 2]
            if x_skip_layer is not None:
                cond = resize_like(
                    x_skip_layer, skip.shape[1:-1], method="nearest"
                )
                link_in = jnp.concatenate([skip, cond], axis=-1)
            else:
                link_in = skip
            # link op
            if self.link_type == "identity":
                encoded = link_in
            elif self.link_type == "conv":
                # ref init_link_ops:482-502 — ONE conv + adn (not a full
                # conv unit)
                encoded = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"link_{i}"
                )(link_in)
                encoded = apply_adn(
                    adn_fn(d, name=f"link_adn_{i}"), encoded, train
                )
            elif self.link_type == "residual":
                # reference init_link_ops:503-527 passes NO
                # inter_channels -> the PLAIN two-kxk-conv residual, not
                # the bottleneck (a bottleneck here halved the link
                # capacity vs the reference at identical configs)
                encoded = ResidualBlock(
                    kernel_size=3,
                    inter_channels=None,
                    out_channels=d,
                    adn_fn=adn_fn,
                    name=f"link_{i}",
                )(link_in, train=train)
            elif self.link_type == "attention":
                encoded = SelfAttentionBlock(
                    inter_channels=16, name=f"link_{i}"
                )(resize_like(curr, link_in.shape[1:-1]), link_in)
            else:
                raise NotImplementedError(f"link_type {self.link_type!r}")
            if encoded.shape[-1] != d:
                encoded = nn.Conv(d, _tuple(1, ndim), name=f"link_proj_{i}")(
                    encoded
                )
            # feature FiLM gate (unet.py:716-740, forward :803-809):
            # Linear(F->d) -> ADN(batch, swish) -> Linear(d->d) ->
            # ADN(batch, sigmoid), then channel-wise multiply
            if x_feature_conditioning is not None:
                gate = nn.Dense(d, name=f"feat_cond_{i}")(
                    x_feature_conditioning
                )
                gate = apply_adn(
                    get_adn_fn(1, "batch", "swish", self.dropout_param)(
                        d, name=f"feat_cond_adn_{i}"
                    ),
                    gate,
                    train,
                )
                gate = nn.Dense(d, name=f"feat_cond_out_{i}")(gate)
                gate = apply_adn(
                    get_adn_fn(1, "batch", "sigmoid", self.dropout_param)(
                        d, name=f"feat_cond_out_adn_{i}"
                    ),
                    gate,
                    train,
                )
                gate = gate.reshape((gate.shape[0],) + (1,) * ndim + (d,))
                encoded = encoded * gate
            # upscale (unet.py:415-459)
            s = _tuple(up_strides[i], ndim)
            if self.upscale_type == "transpose":
                # kernel == strides: block-matmul lowering (param tree
                # identical to nn.ConvTranspose; BASELINE.md round-3)
                curr = TpuConvTranspose(
                    d, s, name=f"up_{i}"
                )(curr)
            else:
                curr = nn.Conv(d, _tuple(1, ndim), name=f"up_{i}")(curr)
                curr = resize_like(
                    curr,
                    tuple(
                        a * b for a, b in zip(curr.shape[1:-1], s)
                    ),
                    method=self.interpolation
                    if self.interpolation != "bilinear"
                    else "linear",
                )
            # align spatial shapes (forward :812-816). asp_ref keeps the
            # reference's CENTER-CROP of whichever side is larger
            # (crop_to_size, layers/utils.py:30-53 — its asp encoder
            # never downsamples, so every decoder upsample overshoots);
            # everything else resizes (static-shape friendly)
            if curr.shape[1:-1] != encoded.shape[1:-1]:
                if self.conv_type in ("asp_ref", "depthwise_ref"):
                    if _numel(curr.shape[1:-1]) < _numel(
                        encoded.shape[1:-1]
                    ):
                        encoded = _crop_center(encoded, curr.shape[1:-1])
                    else:
                        curr = _crop_center(curr, encoded.shape[1:-1])
                else:
                    curr = resize_like(curr, encoded.shape[1:-1])
            curr = jnp.concatenate([curr, encoded], axis=-1)
            # ref decoder conv map (unet.py:213-246): resnet encoders
            # decode with REGULAR blocks, asp decodes with sae
            dec_ct = {
                "resnet": "regular",
                "asp": "sae",
                "asp_ref": "sae_ref",
            }.get(self.conv_type, self.conv_type)
            curr = _ConvUnit(
                d, dec_ks[i], 1, dec_ct, adn_fn, name=f"dec_{i}"
            )(curr, train=train)
            deep_outputs.append(curr)

        final_features = curr
        prediction = self._final_layer(
            curr, adn_fn, train, ndim, apply_activation=not return_logits
        )
        if self.semi_supervised:
            # created unconditionally (flax params must not depend on call
            # flags) but only returned when requested
            transformed = nn.Conv(
                depth[0], _tuple(1, ndim), name="linear_transformation"
            )(final_features)
            if apply_linear_transformation:
                final_features = transformed
        if return_features:
            return prediction, final_features, bottleneck

        # bottleneck classification (unet.py:691-714, forward :830-834)
        bn_out = None
        if self.bottleneck_classification:
            pooled = jnp.max(
                bottleneck.reshape(
                    bottleneck.shape[0], -1, bottleneck.shape[-1]
                ),
                axis=1,
            )
            bn_out = nn.Dense(
                self.n_classes if self.n_classes > 2 else 1,
                name="bottleneck_classifier",
            )(pooled)

        if self.deep_supervision:
            ds = []
            for i, o in enumerate(deep_outputs):
                d = o.shape[-1]
                y = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"ds_conv_{i}"
                )(o)
                y = apply_adn(adn_fn(d, name=f"ds_adn_{i}"), y, train)
                y = nn.Conv(
                    self.n_classes if self.n_classes > 2 else 1,
                    _tuple(1, ndim),
                    name=f"ds_out_{i}",
                )(y)
                y = (
                    jax.nn.softmax(y, axis=-1)
                    if self.n_classes > 2
                    else jax.nn.sigmoid(y)
                )
                ds.append(y)
            return prediction, bn_out, ds

        return prediction, bn_out


class BrUNet(nn.Module):
    """
    Multi-encoder U-Net: one encoder per input modality; encoder features are
    merged by availability-weighted averaging before the shared decoder
    (parity: unet.py:846 — per-modality branches with missing-input weights).

    Call with ``x`` a list of per-modality tensors and ``x_weights`` a
    [B, n_input_branches] availability mask.
    """

    spatial_dimensions: int = 3
    n_input_branches: int = 2
    conv_type: str = "regular"
    link_type: str = "identity"
    upscale_type: str = "upsample"
    interpolation: str = "linear"
    norm_type: str = "batch"
    dropout_type: str = "dropout"
    dropout_param: float = 0.1
    activation_fn: str = "prelu"
    n_classes: int = 2
    depth: Sequence[int] = (16, 32, 64)
    kernel_sizes: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (2, 2, 2)
    bottleneck_classification: bool = False
    skip_conditioning: Optional[int] = None
    feature_conditioning: Optional[int] = None
    feature_conditioning_params: Optional[Dict[str, Any]] = None
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self,
        x: Sequence[jax.Array],
        x_weights=None,
        x_skip_layer=None,
        x_feature_conditioning=None,
        train: bool = False,
        return_logits: bool = False,
    ):
        ndim = x[0].ndim - 2
        adn_fn = get_adn_fn(
            self.spatial_dimensions,
            self.norm_type,
            self.activation_fn,
            self.dropout_param,
            self.dropout_type,
        )
        depth, ks, st = list(self.depth), list(self.kernel_sizes), list(self.strides)
        if x_skip_layer is not None and x_skip_layer.ndim < x[0].ndim:
            x_skip_layer = x_skip_layer[..., None]
        if x_feature_conditioning is not None and self.feature_conditioning_params:
            f_mean = jnp.asarray(self.feature_conditioning_params["mean"])
            f_std = jnp.asarray(self.feature_conditioning_params["std"])
            x_feature_conditioning = (x_feature_conditioning - f_mean) / f_std
        if x_weights is None:
            x_weights = jnp.ones((x[0].shape[0], self.n_input_branches))
        w = x_weights / jnp.maximum(
            jnp.sum(x_weights, axis=1, keepdims=True), 1e-6
        )

        # per-branch encoders; merged per level by availability weights
        merged_levels = []
        currs = list(x)
        for i, d in enumerate(depth):
            feats = []
            for b in range(self.n_input_branches):
                currs[b] = _ConvUnit(
                    d, ks[i], 1, self.conv_type, adn_fn, name=f"enc_b{b}_{i}"
                )(currs[b], train=train)
                feats.append(currs[b])
            stacked = jnp.stack(feats, axis=1)  # [B, nb, ...]
            wb = w.reshape(w.shape + (1,) * (stacked.ndim - 2))
            merged_levels.append(jnp.sum(stacked * wb, axis=1))
            if i < len(depth) - 1:
                for b in range(self.n_input_branches):
                    currs[b] = _ConvUnit(
                        d, ks[i], st[i], self.conv_type, adn_fn,
                        name=f"enc_ds_b{b}_{i}",
                    )(currs[b], train=train)

        curr = merged_levels[-1]
        bottleneck = curr
        dec_depths = depth[-2::-1]
        dec_ks = ks[-2::-1]
        up_strides = st[-2::-1]
        deep_outputs = []
        for i, d in enumerate(dec_depths):
            skip = merged_levels[-i - 2]
            if x_skip_layer is not None:
                cond = resize_like(
                    x_skip_layer, skip.shape[1:-1], method="nearest"
                )
                skip = jnp.concatenate([skip, cond], axis=-1)
                skip = nn.Conv(d, _tuple(1, ndim), name=f"skipproj_{i}")(skip)
            # link op on the merged skip, same zoo as UNet (parity: ref
            # BrUNet runs init_link_ops like UNet, unet.py:846+:144 —
            # link_type used to be silently ignored here)
            if self.link_type == "identity":
                pass
            elif self.link_type == "conv":
                skip = TpuConv(
                    d, _tuple(3, ndim), padding="SAME", name=f"link_{i}"
                )(skip)
                skip = apply_adn(
                    adn_fn(d, name=f"link_adn_{i}"), skip, train
                )
            elif self.link_type == "residual":
                # plain residual, not bottleneck (init_link_ops:503)
                skip = ResidualBlock(
                    kernel_size=3,
                    inter_channels=None,
                    out_channels=d,
                    adn_fn=adn_fn,
                    name=f"link_{i}",
                )(skip, train=train)
            elif self.link_type == "attention":
                skip = SelfAttentionBlock(
                    inter_channels=16, name=f"link_{i}"
                )(resize_like(curr, skip.shape[1:-1]), skip)
            else:
                raise NotImplementedError(f"link_type {self.link_type!r}")
            if skip.shape[-1] != d:
                skip = nn.Conv(d, _tuple(1, ndim), name=f"link_proj_{i}")(
                    skip
                )
            # feature FiLM gate on the skip, same structure as UNet
            # (parity: ref BrUNet applies the conditioned gate per decoder
            # stage, unet.py:1214-1222)
            if x_feature_conditioning is not None:
                gate = nn.Dense(d, name=f"feat_cond_{i}")(
                    x_feature_conditioning
                )
                gate = apply_adn(
                    get_adn_fn(1, "batch", "swish", self.dropout_param)(
                        d, name=f"feat_cond_adn_{i}"
                    ),
                    gate,
                    train,
                )
                gate = nn.Dense(d, name=f"feat_cond_out_{i}")(gate)
                gate = apply_adn(
                    get_adn_fn(1, "batch", "sigmoid", self.dropout_param)(
                        d, name=f"feat_cond_out_adn_{i}"
                    ),
                    gate,
                    train,
                )
                gate = gate.reshape((gate.shape[0],) + (1,) * ndim + (d,))
                skip = skip * gate
            s = _tuple(up_strides[i], ndim)
            if self.upscale_type == "transpose":
                curr = TpuConvTranspose(d, s, name=f"up_{i}")(curr)
            else:
                curr = nn.Conv(d, _tuple(1, ndim), name=f"up_{i}")(curr)
                curr = resize_like(
                    curr,
                    tuple(a * b for a, b in zip(curr.shape[1:-1], s)),
                    method=self.interpolation
                    if self.interpolation != "bilinear"
                    else "linear",
                )
            if curr.shape[1:-1] != skip.shape[1:-1]:
                curr = resize_like(curr, skip.shape[1:-1])
            curr = jnp.concatenate([curr, skip], axis=-1)
            curr = _ConvUnit(
                d, dec_ks[i], 1, self.conv_type, adn_fn, name=f"dec_{i}"
            )(curr, train=train)
            deep_outputs.append(curr)

        d0 = curr.shape[-1]
        # full-res narrow-channel 3x3 (stem cliff) -> TpuConv; names pin
        # the previous auto paths
        curr = TpuConv(d0, _tuple(3, ndim), padding="SAME", name="Conv_0")(
            curr
        )
        curr = apply_adn(adn_fn(d0), curr, train)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        curr = nn.Conv(out_ch, _tuple(1, ndim), name="Conv_1")(curr)
        if not return_logits:
            curr = (
                jax.nn.softmax(curr, axis=-1)
                if self.n_classes > 2
                else jax.nn.sigmoid(curr)
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
            # same head structure as UNet (ref BrUNet returns
            # (pred, bn_out, deep_outputs), unet.py:886,1203+)
            ds = []
            for i, o in enumerate(deep_outputs):
                di = o.shape[-1]
                y = TpuConv(
                    di, _tuple(3, ndim), padding="SAME", name=f"ds_conv_{i}"
                )(o)
                y = apply_adn(adn_fn(di, name=f"ds_adn_{i}"), y, train)
                y = nn.Conv(out_ch, _tuple(1, ndim), name=f"ds_out_{i}")(y)
                y = (
                    jax.nn.softmax(y, axis=-1)
                    if self.n_classes > 2
                    else jax.nn.sigmoid(y)
                )
                ds.append(y)
            return curr, bn_out, ds
        return curr, bn_out


class BrUNetStacked(nn.Module):
    """Adapter making BrUNet a drop-in for the single-array pipeline:
    the stacked channels-last image [B, *S, n_branches] is split into the
    per-modality list BrUNet consumes (one channel per branch), and the
    loader's availability weights (``image_weights`` under
    ``missing_to_empty``) ride through as ``x_weights``."""

    brunet: Any

    @nn.compact
    def __call__(self, x, x_weights=None, **kwargs):
        nb = self.brunet.n_input_branches
        if x.shape[-1] != nb:
            raise ValueError(
                f"brunet expects {nb} input channels (one per branch), "
                f"got {x.shape[-1]} — pass one --image_keys entry per "
                "modality branch"
            )
        branches = [x[..., i : i + 1] for i in range(nb)]
        return self.brunet(branches, x_weights=x_weights, **kwargs)
