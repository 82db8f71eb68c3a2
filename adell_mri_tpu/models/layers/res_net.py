"""
Config-driven ResNet backbone and classifier head.

Parity targets: adell_mri/modules/layers/res_net.py — ResNetBackbone (:51):
``structure`` is a list of (channels, inter_channels, kernel_size, n_blocks)
stage tuples; ``maxpool_structure`` gives per-stage pool size/stride; stem is
conv7 -> ADN -> conv3 -> ADN -> pool2. ``forward_with_intermediate`` (:211)
returns per-stage features for U-Net skips. ProjectionHead (:278),
ResNet (:327) with ret=representation/projection/prediction forwards.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn

from adell_mri_tpu.models.layers.batch_ensemble import BatchEnsembleConv
from adell_mri_tpu.models.layers.blocks import (
    AdnFactory,
    GlobalPooling,
    _tuple,
    apply_adn,
    identity_adn,
    max_pool,
)
from adell_mri_tpu.models.layers.res_blocks import RES_BLOCK_REGISTRY
from adell_mri_tpu.ops.conv import TpuConv


class ResNetBackbone(nn.Module):
    structure: Sequence[Tuple[int, int, int, int]]
    maxpool_structure: Optional[Sequence] = None
    adn_fn: AdnFactory = identity_adn
    res_type: str = "resnet"
    batch_ensemble: int = 0
    skip_last_activation: bool = False

    @property
    def output_features(self) -> int:
        return self.structure[-1][0]

    def _block(self, kernel_size, inter, out):
        ctor = RES_BLOCK_REGISTRY[self.res_type]
        return ctor(
            kernel_size=kernel_size,
            inter_channels=inter,
            out_channels=out,
            adn_fn=self.adn_fn,
        )

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_intermediate: bool = False,
        return_stem: bool = False,
    ):
        ndim = x.ndim - 2
        f = self.structure[0][0]
        # stem (parity: res_net.py:178-184)
        # full-resolution narrow-channel stem convs — TpuConv (z2d) for
        # the XLA 3D-conv stem cliff (BASELINE.md round 3); names pin the
        # previous nn.Conv auto paths for checkpoint/interop stability
        x = TpuConv(f, _tuple(7, ndim), padding="SAME", name="Conv_0")(x)
        x = apply_adn(self.adn_fn(f), x, train)
        x = TpuConv(f, _tuple(3, ndim), padding="SAME", name="Conv_1")(x)
        x = apply_adn(self.adn_fn(f), x, train)
        stem = x
        x = max_pool(x, 2)

        mp = self.maxpool_structure or [2] * len(self.structure)
        if len(mp) != len(self.structure):
            # zip would silently DROP trailing stages, training a smaller
            # network than configured with no error
            raise ValueError(
                f"maxpool_structure has {len(mp)} entries for "
                f"{len(self.structure)} backbone stages"
            )
        # UNet-encoder use (resnet_to_encoding_ops, res_net.py:27): the
        # stem output doubles as the first skip level
        intermediates = [stem] if return_stem else []
        for stage_idx, (stage, pool) in enumerate(zip(self.structure, mp)):
            inp, inter, k, n_blocks = stage
            # the reference builds 1 + max(N-2, 0) + 1 = max(N, 2) blocks
            # per stage (res_net.py init_layers: first block, N-2 middles,
            # one final) — N=1 configs get TWO blocks; match the capacity
            for block_idx in range(max(n_blocks, 2)):
                out_ch = inp
                x = self._block(k, inter, out_ch)(x, train=train)
            if self.batch_ensemble > 0:
                x = BatchEnsembleConv(
                    n_ensemble=self.batch_ensemble,
                    out_channels=inp,
                    kernel_size=1,
                    adn_fn=self.adn_fn,
                )(x, train=train)
            intermediates.append(x)
            x = max_pool(x, pool)
        if return_intermediate:
            return x, intermediates
        return x


class ProjectionHead(nn.Module):
    """MLP head (parity: res_net.py:278-324 — Linear + adn_fn per hidden
    layer, bare final Linear; spatial inputs flatten + MAX-pool). The
    reference ResNet appends the final norm OUTSIDE this head
    (init_projection_head :357-368), mirrored in our ResNet below."""

    structure: Sequence[int]
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim > 2:
            x = GlobalPooling()(x)
        for h in self.structure[:-1]:
            x = nn.Dense(h)(x)
            x = apply_adn(self.adn_fn(h), x, train)
        return nn.Dense(self.structure[-1])(x)


class ResNet(nn.Module):
    """
    Backbone + projection/prediction heads with selectable return level
    (parity: res_net.py:327; ret in {representation, projection, prediction}).
    """

    backbone_structure: Sequence[Tuple[int, int, int, int]]
    maxpool_structure: Optional[Sequence] = None
    adn_fn: AdnFactory = identity_adn
    # heads take their own (1-d) ADN in the reference's factories — a
    # spatial-dim norm cannot run on pooled [B, F] features
    head_adn_fn: Optional[AdnFactory] = None
    res_type: str = "resnet"
    projection_head_structure: Optional[Sequence[int]] = None
    prediction_head_structure: Optional[Sequence[int]] = None
    batch_ensemble: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, ret: str = "projection"):
        backbone = ResNetBackbone(
            structure=self.backbone_structure,
            maxpool_structure=self.maxpool_structure,
            adn_fn=self.adn_fn,
            res_type=self.res_type,
            batch_ensemble=self.batch_ensemble,
        )
        x = backbone(x, train=train)
        rep = GlobalPooling()(x)  # max, the reference default
        # all heads are materialized unconditionally so params exist whatever
        # `ret` was used at init (flax compact modules trace one call path).
        # Projection head carries a trailing LayerNorm (ref
        # init_projection_head :357-368); the prediction head is bare.
        head_adn = self.head_adn_fn or identity_adn
        proj = rep
        if self.projection_head_structure is not None:
            proj = ProjectionHead(
                self.projection_head_structure, adn_fn=head_adn
            )(rep, train=train)
            proj = nn.LayerNorm()(proj)
        pred = (
            ProjectionHead(
                self.prediction_head_structure, adn_fn=head_adn
            )(proj, train=train)
            if self.prediction_head_structure is not None
            else proj
        )
        if ret == "representation":
            return rep
        if ret == "projection":
            return proj
        return pred
