"""
Standalone ConvNeXt backbones.

Parity target: adell_mri/modules/layers/conv_next.py:86-388 —
ConvNeXtBackbone (patchify stem: 4x4 stride-4 conv + LayerNorm, stages of
ConvNeXt blocks with pooling between), ConvNeXtV2Backbone (GRN blocks), and
the classification head wrapper ``ConvNeXt`` (conv_next.py:388). The stage
blocks themselves live in res_blocks.ConvNeXtBlock (v1 LayerScale /
v2 GRN); this module adds the canonical patchify/downsample skeleton the
VERDICT r1 review flagged as reachable only through CatNet(res_type=
"convnext").

TPU notes: channels-last, depthwise 7^d convs + dense expansions map
straight onto the VPU/MXU; downsampling is LayerNorm + stride-2 conv (the
ConvNeXt design) rather than maxpool.
"""

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn

from adell_mri_tpu.ops.conv import TpuConv
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple
from adell_mri_tpu.models.layers.res_blocks import ConvNeXtBlock


class ConvNeXtBackbone(nn.Module):
    """
    Patchify stem + ConvNeXt stages (parity: conv_next.py:86-237).

    ``structure``: one (channels, inter, kernel_size, n_blocks) tuple per
    stage, matching the reference's 4-int stage spec. ``v2`` switches the
    blocks to ConvNeXt V2 (GRN instead of LayerScale; parity:
    ConvNeXtV2Backbone, conv_next.py:253).
    """

    structure: Sequence[Tuple[int, int, int, int]]
    first_layer_stride: Union[int, Sequence[int]] = 4
    maxpool_structure: Optional[Sequence] = None
    v2: bool = False
    #: "conv" = ConvNeXt-paper downsampling (LayerNorm + strided conv —
    #: the TPU-friendly default; downsampling carries parameters);
    #: "maxpool" = the REFERENCE's stage transition (max-pool between
    #: stages, channel change inside each stage's first block,
    #: conv_next.py:171-190) — required for reference-checkpoint import
    downsample: str = "conv"

    @property
    def output_features(self) -> int:
        return self.structure[-1][0]

    @nn.compact
    def __call__(
        self, x, train: bool = False, return_intermediate: bool = False
    ):
        ndim = x.ndim - 2
        f0 = self.structure[0][0]
        stride = self.first_layer_stride
        stride = _tuple(stride, ndim) if isinstance(stride, int) else tuple(
            stride
        )
        if self.downsample == "maxpool":
            # reference-compat stem: ALWAYS kernel 4, torch default
            # VALID padding (init_input_layer, conv_next.py:151-158)
            kernel = _tuple(4, ndim)
            x = TpuConv(
                f0, kernel, strides=stride, padding="VALID",
                name="stem_conv",
            )(x)
        else:
            # patchify stem: non-overlapping conv (kernel == stride) +
            # LayerNorm; TpuConv routes patchify by the measured auto
            # policy (ops/conv.py _pick_lowering)
            kernel = tuple(max(s, 2) for s in stride)
            x = TpuConv(f0, kernel, strides=stride, name="stem_conv")(x)
        x = nn.LayerNorm(name="stem_norm", epsilon=1e-6)(x)

        pools = self.maxpool_structure or [2] * len(self.structure)
        if len(pools) != len(self.structure):
            # zip would silently drop trailing stages (see res_net.py)
            raise ValueError(
                f"maxpool_structure has {len(pools)} entries for "
                f"{len(self.structure)} backbone stages"
            )
        intermediates = []
        prev_ch = f0
        for stage_idx, (stage, pool) in enumerate(zip(self.structure, pools)):
            ch, inter, k, n_blocks = stage
            p = _tuple(pool, ndim) if isinstance(pool, int) else tuple(pool)
            if self.downsample == "conv":
                if stage_idx > 0:
                    # ConvNeXt downsample: LayerNorm + strided conv
                    x = nn.LayerNorm(name=f"down_norm_{stage_idx}")(x)
                    x = TpuConv(
                        ch, p, strides=p, name=f"down_conv_{stage_idx}"
                    )(x)
                elif prev_ch != ch:
                    x = nn.Conv(ch, _tuple(1, ndim), name="stem_proj")(x)
            for b in range(n_blocks):
                x = ConvNeXtBlock(
                    kernel_size=k,
                    inter_channels=inter,
                    out_channels=ch,
                    v2=self.v2,
                    name=f"stage{stage_idx}_block{b}",
                )(x, train=train)
            if self.downsample == "maxpool":
                # reference stage transition: intermediates BEFORE the
                # pool (forward_with_intermediate after_pool=False)
                intermediates.append(x)
                x = nn.max_pool(x, window_shape=p, strides=p)
            else:
                intermediates.append(x)
            prev_ch = ch
        if return_intermediate:
            return x, intermediates
        return x


class ConvNeXt(nn.Module):
    """Backbone + global-pool classification head (parity:
    conv_next.py:388-470)."""

    structure: Sequence[Tuple[int, int, int, int]]
    n_classes: int = 2
    first_layer_stride: Union[int, Sequence[int]] = 4
    maxpool_structure: Optional[Sequence] = None
    v2: bool = False
    downsample: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        h = ConvNeXtBackbone(
            structure=self.structure,
            first_layer_stride=self.first_layer_stride,
            maxpool_structure=self.maxpool_structure,
            v2=self.v2,
            downsample=self.downsample,
            name="backbone",
        )(x, train=train)
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))
        h = nn.LayerNorm(name="head_norm")(h)
        if return_features:
            # pooled backbone features (GenericEnsemble / deconfounder
            # member contract: net(x, train=..., return_features=True))
            return h
        out = self.n_classes if self.n_classes > 2 else 1
        return nn.Dense(out, name="head")(h)
