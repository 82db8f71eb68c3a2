"""
AHNet and MIMUNet.

Parity targets: adell_mri/modules/segmentation/ahnet.py:21 (anisotropic
hybrid network after arxiv 1711.08580 — 2D-pretrained convs extended to 3D
with (k, k, 1)/(k, k, 3) kernels, GCN+Refine decoders in 2D, AHNet decoder
units + pyramid pooling in 3D; layers/ah_blocks.py:10-445) and mimunet.py:51
(modifiable-input-module U-Net: a 2D hierarchical encoder applied slice-wise,
per-level features restacked into volumes and decoded in 3D).

The reference's ``convert_to_3d`` module surgery becomes a pure pytree
transform here (``transfer_2d_to_3d``): blocks share names across the 2D and
3D instantiations of :class:`AHNet`, so 2D-trained kernels land at the same
tree paths and only genuinely-3D leaves (decoders, PSP) stay fresh.
"""

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.ops.conv import TpuConv
from adell_mri_tpu.models.layers.blocks import _tuple, apply_adn
from adell_mri_tpu.models.layers.multi_resolution import (
    GCN,
    PyramidSpatialPooling,
    resize_like,
)


def _adn(spatial_dim, norm_type, activation_fn, dropout_param):
    return get_adn_fn(spatial_dim, norm_type, activation_fn, dropout_param)


class Refine(nn.Module):
    """Two 3x3 convs with a residual add (parity: Refine2d,
    ah_blocks.py:10-73). Rank-generic; in 3D the kernels are (3, 3, 1)."""

    channels: int
    adn: Callable
    anisotropic: bool = False  # True in 3D: (3, 3, 1) kernels

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        k = (3, 3, 1) if (self.anisotropic and ndim == 3) else _tuple(3, ndim)
        # TpuConv = z2d in 3D (anisotropic (3,3,1) folds to ONE 2D conv
        # instead of XLA's cliff-prone 3D path; BASELINE.md round 3)
        h = TpuConv(self.channels, k, padding="SAME", name="conv1")(x)
        h = apply_adn(self.adn(self.channels), h, train)
        h = TpuConv(self.channels, k, padding="SAME", name="conv2")(h)
        h = apply_adn(self.adn(self.channels), h, train)
        return x + h


class AHInput(nn.Module):
    """Input stem (parity: AnysotropicHybridInput, ah_blocks.py:348): 2D
    k x k stride-2 conv; in 3D the kernel grows a z-extent of 3 (the 2D
    kernel is stacked 3x along z by ``transfer_2d_to_3d``) with stride
    (2, 2, 1)."""

    out_channels: int
    adn: Callable
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        k = self.kernel_size
        if ndim == 2:
            kernel, strides = (k, k), (2, 2)
        else:
            kernel, strides = (k, k, 3), (2, 2, 1)
        h = nn.Conv(
            self.out_channels, kernel, strides=strides, padding="SAME",
            name="conv",
        )(x)
        return apply_adn(self.adn(self.out_channels), h, train)


class AHResidual(nn.Module):
    """Bottleneck residual (1x1 -> kxk -> 1x1, each + ADN) followed by a
    stride-2 downsample (parity: AnysotropicHybridResidual,
    ah_blocks.py:185-345). In 3D the k x k conv becomes (k, k, 1), the
    downsample conv strides (2, 2, 1) and a (1, 1, 2) max-pool halves z —
    the reference's get_op_3d/get_downsample_op_3d."""

    channels: int
    adn: Callable
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        c = self.channels
        k = (
            (self.kernel_size, self.kernel_size, 1)
            if ndim == 3
            else _tuple(self.kernel_size, ndim)
        )
        h = nn.Conv(c, _tuple(1, ndim), name="conv_in")(x)
        h = apply_adn(self.adn(c), h, train)
        h = TpuConv(c, k, padding="SAME", name="conv_mid")(h)
        h = apply_adn(self.adn(c), h, train)
        h = nn.Conv(c, _tuple(1, ndim), name="conv_out")(h)
        h = apply_adn(self.adn(c), h, train)
        h = x + h
        if ndim == 2:
            h = nn.Conv(c, (2, 2), strides=(2, 2), name="down")(h)
        else:
            h = nn.Conv(c, (2, 2, 1), strides=(2, 2, 1), name="down")(h)
            h = nn.max_pool(h, (1, 1, 2), strides=(1, 1, 2), padding="SAME")
        return h


class AHDecoderUnit3d(nn.Module):
    """In-plane then through-plane branch convs, residual-combined and
    concatenated with the input (parity: AHNetDecoderUnit3d,
    ah_blocks.py:75-131)."""

    channels: int
    adn: Callable

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels

        def block(h, kernels, name):
            for i, k in enumerate(kernels):
                conv = nn.Conv if max(k) == 1 else TpuConv
                h = conv(c, k, padding="SAME", name=f"{name}_{i}")(h)
                h = apply_adn(self.adn(c), h, train)
            return h

        x1 = block(x, [(1, 1, 1), (3, 3, 1), (1, 1, 1)], "op1")
        x2 = block(x1, [(1, 1, 1), (1, 1, 3), (1, 1, 1)], "op2")
        return jnp.concatenate([x, x1 + x2], axis=-1)


class AHDecoder3d(nn.Module):
    """Three AHDecoderUnit3d, each squeezed back to ``channels`` with a 1x1x1
    (parity: AHNetDecoder3d, ah_blocks.py:133-182)."""

    channels: int
    adn: Callable

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = AHDecoderUnit3d(self.channels, self.adn, name=f"unit_{i}")(
                x, train
            )
            x = nn.Conv(self.channels, (1, 1, 1), name=f"squeeze_{i}")(x)
        return x


class AHNet(nn.Module):
    """
    Anisotropic hybrid network (parity: segmentation/ahnet.py:21 after
    arxiv 1711.08580). Train as 2D first (``spatial_dim=2``: AH stem +
    residual chain + GCN/Refine multi-scale decoder), then instantiate with
    ``spatial_dim=3`` and move the trained trunk across with
    ``transfer_2d_to_3d`` (stem/residual kernels extend anisotropically;
    the 3D decoder units + pyramid pooling initialize fresh — exactly the
    reference's convert_to_3d surface).
    """

    spatial_dim: int = 2
    in_channels: int = 1
    out_channels: int = 16
    n_classes: int = 2
    n_layers: int = 3
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    gcn_k_size: Sequence[int] = (63, 31, 15, 9, 7, 5)
    psp_levels: Sequence[int] = (2, 4, 8)

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        adn = _adn(
            self.spatial_dim, self.norm_type, self.activation_fn,
            self.dropout_param,
        )
        ndim = self.spatial_dim
        c = self.out_channels
        in_spatial = x.shape[1:-1]

        # ---- shared trunk (2D-trained, 3D-transferable) ----
        feats = []
        h = AHInput(c, adn, kernel_size=7, name="stem")(x, train)
        feats.append(h)
        if ndim == 2:
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        else:
            # parity: max_pool_1_3d — z-halving pool then in-plane pool
            h = nn.max_pool(h, (1, 1, 2), strides=(1, 1, 2), padding="SAME")
            h = nn.max_pool(h, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        feats.append(h)
        for i in range(self.n_layers - 1):
            h = AHResidual(c, adn, name=f"res_{i}")(h, train)
            feats.append(h)

        # ---- decoders ----
        if ndim == 2:
            refined = []
            for i, f in enumerate(feats):
                g = GCN(
                    c,
                    kernel_size=self.gcn_k_size[
                        min(i, len(self.gcn_k_size) - 1)
                    ],
                    norm_type=self.norm_type,
                    activation_fn=self.activation_fn,
                    name=f"gcn_{i}",
                )(f, train)
                refined.append(
                    Refine(c, adn, name=f"refine_{i}")(g, train)
                )
            out = refined[-1]
            for i in range(len(refined) - 2, -1, -1):
                out = resize_like(out, refined[i].shape[1:-1])
                out = out + refined[i]
                out = Refine(c, adn, name=f"up_refine_{i}")(out, train)
            out = resize_like(out, in_spatial)
        else:
            out = feats[-1]
            for i in range(len(feats) - 2, -1, -1):
                out = resize_like(out, feats[i].shape[1:-1])
                out = out + feats[i]
                out = AHDecoder3d(c, adn, name=f"dec_{i}")(out, train)
            out = resize_like(out, in_spatial)
            out = PyramidSpatialPooling(
                c, levels=tuple(self.psp_levels), name="psp"
            )(out, train)

        out_ch = self.n_classes if self.n_classes > 2 else 1
        logits = nn.Conv(out_ch, _tuple(1, ndim), name="final")(out)
        if return_logits:
            return logits, None
        pred = (
            jax.nn.softmax(logits, -1)
            if self.n_classes > 2
            else jax.nn.sigmoid(logits)
        )
        return pred, None


def transfer_2d_to_3d(params_2d: Any, params_3d: Any) -> Any:
    """
    Copies 2D conv kernels [kh, kw, i, o] into matching 3D anisotropic
    kernels [kh, kw, kz, i, o] (parity: the convert_to_3d weight surgery in
    ah_blocks.py:295-321,417-444): kz == 1 unsqueezes (AHResidual path),
    kz > 1 stacks kz copies along z (AHInput stem path — the reference
    stacks the 2D kernel 3x). Same-shaped leaves copy straight across;
    everything else (3D decoders, PSP) keeps its fresh init.
    """

    def visit(p2, p3):
        p2 = np.asarray(p2)
        p3 = np.asarray(p3)
        if p2.ndim == 4 and p3.ndim == 5:
            if p2.shape == (
                p3.shape[0], p3.shape[1], p3.shape[3], p3.shape[4],
            ):
                return np.stack([p2] * p3.shape[2], axis=2)
        if p2.shape == p3.shape:
            return p2
        return p3

    import flax

    flat2 = flax.traverse_util.flatten_dict(params_2d)
    flat3 = flax.traverse_util.flatten_dict(params_3d)
    out = {}
    for path, leaf3 in flat3.items():
        if path in flat2:
            out[path] = visit(flat2[path], leaf3)
        else:
            out[path] = leaf3
    return flax.traverse_util.unflatten_dict(out)


class MIMUNet(nn.Module):
    """
    Modifiable-input-module U-Net (parity: mimunet.py:51-412): a 2D module
    emitting a hierarchical feature pyramid runs on every slice; each level
    is restacked into a volume [b, h_l, w_l, d, c_l], passed through a link
    op, and decoded with in-plane upsampling ((2, 2, 1) — slices stay
    aligned) + conv. Supports ``link_type`` identity/conv/residual and deep
    supervision, like the reference.

    ``module_2d`` contract: called with [b*d, H, W, C]; returns either a
    single feature map / prediction (legacy slice-wise mode — output is
    restacked and returned directly) or a LIST of per-level feature maps
    ordered shallow -> deep (pyramid mode — full 3D decoding applies).
    """

    module_2d: Any
    n_classes: int = 2
    depth: Optional[Sequence[int]] = None  # channels per pyramid level
    link_type: str = "conv"
    deep_supervision: bool = False
    norm_type: str = "instance"
    activation_fn: str = "relu"
    dropout_param: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, d, c = x.shape
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * d, hh, ww, c)
        out = self.module_2d(slices, train=train)
        if isinstance(out, tuple):
            out = out[0]
        if not isinstance(out, (list,)):
            # legacy: single slice-wise output restacked into the volume
            out = out.reshape(b, d, hh, ww, -1).transpose(0, 2, 3, 1, 4)
            return out, None

        # pyramid mode: restack every level into a volume
        def restack(f):
            _, fh, fw, fc = f.shape
            return f.reshape(b, d, fh, fw, fc).transpose(0, 2, 3, 1, 4)

        feats = [restack(f) for f in out]
        depths = (
            tuple(self.depth)
            if self.depth is not None
            else tuple(f.shape[-1] for f in feats)
        )
        adn = _adn(3, self.norm_type, self.activation_fn, self.dropout_param)

        def link(f, ch, name):
            if self.link_type == "identity":
                return f
            h = nn.Conv(ch, (3, 3, 1), padding="SAME", name=f"{name}_conv")(f)
            h = apply_adn(adn(ch), h, train)
            if self.link_type == "residual":
                h2 = nn.Conv(
                    ch, (3, 3, 1), padding="SAME", name=f"{name}_conv2"
                )(h)
                h2 = apply_adn(adn(ch), h2, train)
                h = h + h2
            return h

        h = feats[-1]
        ds_outputs = []
        for i in range(len(feats) - 2, -1, -1):
            ch = depths[i]
            # in-plane upsample to the skip's grid; z stays aligned
            h = nn.Conv(ch, (1, 1, 1), name=f"up_proj_{i}")(h)
            h = resize_like(h, feats[i].shape[1:-1])
            skip = link(feats[i], ch, f"link_{i}")
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Conv(ch, (3, 3, 1), padding="SAME", name=f"dec_{i}")(h)
            h = apply_adn(adn(ch), h, train)
            if self.deep_supervision:
                ds_outputs.append(
                    nn.Conv(
                        self.n_classes if self.n_classes > 2 else 1,
                        (1, 1, 1),
                        name=f"ds_{i}",
                    )(h)
                )
        out_ch = self.n_classes if self.n_classes > 2 else 1
        logits = nn.Conv(out_ch, (1, 1, 1), name="final")(h)

        # probability-domain output contract shared by every segmentation
        # model (CompoundLoss members take log(p + eps) on probabilities;
        # make_segmentation_step unpacks (pred, pred_class[, deep]))
        def act(z):
            return (
                jax.nn.softmax(z, axis=-1)
                if self.n_classes > 2
                else jax.nn.sigmoid(z)
            )

        if self.deep_supervision:
            return act(logits), None, [act(d) for d in ds_outputs]
        return act(logits), None
