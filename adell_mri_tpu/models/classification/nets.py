"""
Classification model family.

Parity targets: adell_mri/modules/classification/classification/
classification.py — VGG (:146, VGGBackbone :67), CatNet (:263, ResNet-based
with batch-ensemble option), OrdNet (:421, ordinal sigmoidal with shared
bias), SegCatNet (:502, classify from U-Net features), UNetEncoder (:614),
ViTClassifier (:709), FactorizedViTClassifier (:794), TabularClassifier
(:941, normalizing linear), HybridClassifier (:1008, conv+tabular fusion);
ensemble.py (:15,144,190). Channels-last flax; binary tasks emit 1 logit,
multiclass emit n_classes logits (activations live in the losses).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.layers.blocks import (
    GlobalPooling,
    MLP,
    VGGConvolution,
    apply_adn,
)
from adell_mri_tpu.models.layers.res_net import ResNetBackbone
from adell_mri_tpu.models.layers.vit import (
    FactorizedViT,
    SeqPool,
    ViT,
)


def _out_features(n_classes: int) -> int:
    return 1 if n_classes == 2 else n_classes


class VGG(nn.Module):
    """VGG-ish classifier (parity: classification.py:146; vggnet-net.yaml)."""

    spatial_dimensions: int = 3
    n_classes: int = 2
    first_depth: int = 16
    n_blocks: int = 4
    norm_type: str = "batch"
    # ref head: GlobalPooling(max) + MLP([512]*3, batch/gelu/0.1 ADN)
    # (classification.py:209-216)
    classification_structure: Sequence[int] = (512, 512, 512)

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        d = self.first_depth
        for i in range(self.n_blocks):
            x = VGGConvolution(
                first_depth=d * (2**i), norm_fn=self.norm_type
            )(x, train=train)
        feats = GlobalPooling()(x)
        if return_features:
            return feats
        return MLP(
            hidden_dims=tuple(self.classification_structure),
            out_dim=_out_features(self.n_classes),
            adn_fn=get_adn_fn(1, "batch", "gelu", 0.1),
        )(feats, train=train)


class CatNet(nn.Module):
    """
    ResNet-backbone classifier (parity: classification.py:263) —
    the classification-cat-*.yaml surface: resnet_structure,
    maxpool_structure, res_type, batch_ensemble.
    """

    spatial_dimensions: int = 3
    n_classes: int = 2
    resnet_structure: Sequence[Tuple[int, int, int, int]] = (
        (64, 128, 5, 2),
        (128, 256, 3, 5),
    )
    maxpool_structure: Optional[Sequence] = None
    res_type: str = "resnet"
    batch_ensemble: int = 0
    norm_type: str = "batch"
    act_fn: str = "swish"  # ref factory default (network_factories.py:186)
    dropout_param: float = 0.0
    # classifier MLP hidden structure; None -> [last_size] * 3 with a
    # (batch, gelu, 0.1) 1-d ADN, the reference's head
    # (init_classification_layer, classification.py:370-384)
    classification_structure: Optional[Sequence[int]] = None
    feature_extraction: bool = False
    # SNGP-style GP output head (parity: layers/gaussian_process.py:13 +
    # post-fit covariance, classification/pl.py:381-392)
    gp_head: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_features: bool = False,
        return_feature_map: bool = False,
    ):
        adn = get_adn_fn(
            self.spatial_dimensions,
            self.norm_type,
            self.act_fn,
            self.dropout_param,
        )
        backbone = ResNetBackbone(
            structure=self.resnet_structure,
            maxpool_structure=self.maxpool_structure,
            adn_fn=adn,
            res_type=self.res_type,
            batch_ensemble=self.batch_ensemble,
        )
        fmap = backbone(x, train=train)
        if return_feature_map:
            # spatial feature map [B, *g, F] (VICRegL local features)
            return fmap
        feats = GlobalPooling()(fmap)
        if return_features or self.feature_extraction:
            return feats
        d = feats.shape[-1]
        hidden = (
            list(self.classification_structure)
            if self.classification_structure is not None
            else [d] * 3
        )
        head_adn = get_adn_fn(1, "batch", "gelu", 0.1)
        y = feats
        for h in hidden:
            y = nn.Dense(h)(y)
            y = apply_adn(head_adn(h), y, train)
        if self.gp_head:
            from adell_mri_tpu.models.layers.gaussian_process import (
                GaussianProcessLayer,
            )

            return GaussianProcessLayer(
                _out_features(self.n_classes), name="gp"
            )(y)
        return nn.Dense(_out_features(self.n_classes))(y)


class OrdNet(nn.Module):
    """
    Ordinal net (parity: classification.py:421): one shared scalar score
    plus per-threshold biases -> [B, n_classes-1] cumulative logits
    (consumed by ordinal_sigmoidal_loss).
    """

    spatial_dimensions: int = 3
    n_classes: int = 3
    resnet_structure: Sequence[Tuple[int, int, int, int]] = (
        (64, 128, 5, 2),
        (128, 256, 3, 5),
    )
    maxpool_structure: Optional[Sequence] = None
    norm_type: str = "batch"
    act_fn: str = "relu"
    dropout_param: float = 0.0

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_only_pre_bias: bool = False,
    ):
        adn = get_adn_fn(
            self.spatial_dimensions,
            self.norm_type,
            self.act_fn,
            self.dropout_param,
        )
        backbone = ResNetBackbone(
            structure=self.resnet_structure,
            maxpool_structure=self.maxpool_structure,
            adn_fn=adn,
        )
        feats = GlobalPooling()(backbone(x, train=train))
        h = nn.Dense(feats.shape[-1])(feats)
        h = nn.relu(h)
        score = nn.Dense(1, use_bias=False)(h)  # shared scalar
        if return_only_pre_bias:
            # parity: classification.py:497-498 (--type pre_bias)
            return score
        # CORAL init (parity: classification.py:445-452): descending
        # thresholds n-1..1 with a learnable 1/(n-1) scale — zero init
        # makes every cumulative logit identical at step 0
        bias = self.param(
            "threshold_bias",
            lambda key, shape: jnp.arange(
                self.n_classes - 1, 0, -1, dtype=jnp.float32
            ),
            (self.n_classes - 1,),
        )
        scale = self.param(
            "threshold_bias_scale",
            lambda key, shape: jnp.asarray(
                1.0 / (self.n_classes - 1), jnp.float32
            ),
            (),
        )
        return score + (bias * scale)[None, :]


class UNetEncoderClassifier(nn.Module):
    """U-Net encoder + classification head (parity: classification.py:614):
    max-pooled bottleneck features through an MLP with the head's own 1-d
    ADN (the reference factory builds head_structure=[depth[-1]]*3 with
    (norm, gelu) ADN, network_factories.py:207-220)."""

    unet: Any  # a UNet module (encoder_only is forced on the call)
    n_classes: int = 2
    head_structure: Sequence[int] = (256,)
    head_adn_fn: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bottleneck = self.unet(x, train=train, return_bottleneck=True)[2]
        feats = GlobalPooling()(bottleneck)
        adn = self.head_adn_fn or get_adn_fn(1, "batch", "gelu", 0.0)
        return MLP(
            hidden_dims=tuple(self.head_structure),
            out_dim=_out_features(self.n_classes),
            adn_fn=adn,
        )(feats, train=train)


class SegCatNet(nn.Module):
    """
    Classifies from a FROZEN U-Net's features (parity:
    classification.py:502-607): a ResNet tower over the final-layer
    features (structure [(d,2d,3,2),(2d,2d,3,2),(4d,4d,3,2)], maxpool 2
    per stage, batch+swish+0.1 ADN, prediction head [4d]*3,
    init_final_layer_classification :547-573) and a ProjectionHead over
    the bottleneck ([d,2d,4d,2d,d], :575-587), each followed by a
    bias-free Linear to n_classes, combined by a bias-free
    weighted-average Linear (:589-592). The U-Net features pass through
    stop_gradient (the reference runs the U-Net under torch.no_grad,
    :600-602).
    """

    unet: Any
    n_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adell_mri_tpu.models.layers.res_net import ProjectionHead, ResNet

        _, final_features, bottleneck = self.unet(
            x, train=train, return_features=True
        )
        final_features = jax.lax.stop_gradient(final_features)
        bottleneck = jax.lax.stop_gradient(bottleneck)
        nc = _out_features(self.n_classes)
        sd = x.ndim - 2
        d = final_features.shape[-1]
        adn = get_adn_fn(sd, "batch", "swish", 0.1)
        head_adn = get_adn_fn(1, "batch", "swish", 0.1)
        class_fl = ResNet(
            backbone_structure=(
                (d, 2 * d, 3, 2),
                (2 * d, 2 * d, 3, 2),
                (4 * d, 4 * d, 3, 2),
            ),
            maxpool_structure=(2, 2, 2),
            adn_fn=adn,
            head_adn_fn=head_adn,
            res_type="resnet",
            prediction_head_structure=(4 * d, 4 * d, 4 * d),
            name="final_layer_classifier",
        )(final_features, train=train, ret="prediction")
        class_fl = nn.Dense(nc, use_bias=False, name="final_layer_linear")(
            class_fl
        )
        db = bottleneck.shape[-1]
        class_bn = ProjectionHead(
            (db, 2 * db, 4 * db, 2 * db, db),
            adn_fn=head_adn,
            name="bottleneck_classifier",
        )(bottleneck, train=train)
        class_bn = nn.Dense(nc, use_bias=False, name="bottleneck_linear")(
            class_bn
        )
        feats = jnp.concatenate([class_fl, class_bn], axis=-1)
        return nn.Dense(nc, use_bias=False, name="weighted_average")(feats)


class ViTClassifier(nn.Module):
    """ViT + class-token/SeqPool head (parity: classification.py:709)."""

    patch_size: Sequence[int] = (4, 4, 4)
    n_classes: int = 2
    embed_dim: int = 256
    n_blocks: int = 4
    n_heads: int = 4
    dropout_param: float = 0.0
    use_class_token: bool = True
    use_seq_pool: bool = False
    moe_experts: int = 0
    embed_method: str = "linear"
    mlp_ratio: float = 4.0
    embed_norm: bool = False
    # exact transformer MLP hidden widths (the reference's mlp_structure);
    # overrides mlp_ratio when set
    mlp_structure: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        tokens = ViT(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            n_blocks=self.n_blocks,
            n_heads=self.n_heads,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout_param,
            embed_method=self.embed_method,
            use_class_token=self.use_class_token,
            moe_experts=self.moe_experts,
            embed_norm=self.embed_norm,
            mlp_structure=self.mlp_structure,
        )(x, train=train)
        # ref pooling order: seq-pool > class token > token mean
        # (classification.py:782-787)
        if self.use_seq_pool:
            feats = SeqPool()(tokens)
        elif self.use_class_token:
            feats = tokens[:, 0]
        else:
            feats = jnp.mean(tokens, axis=1)
        # ref head: one-hidden-layer MLP with (layer, gelu) ADN
        # (classification.py:741-748)
        return MLP(
            hidden_dims=(self.embed_dim,),
            out_dim=_out_features(self.n_classes),
            adn_fn=get_adn_fn(1, "layer", "gelu", 0.0),
        )(feats, train=train)


class FactorizedViTClassifier(nn.Module):
    """Within/between-slice ViT classifier (parity: classification.py:794)."""

    patch_size: Sequence[int] = (4, 4)
    n_classes: int = 2
    embed_dim: int = 256
    n_blocks: int = 4
    n_heads: int = 4
    dropout_param: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        tokens = FactorizedViT(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            n_blocks=self.n_blocks,
            n_heads=self.n_heads,
            dropout=self.dropout_param,
        )(x, train=train)
        return MLP(
            hidden_dims=(self.embed_dim,),
            out_dim=_out_features(self.n_classes),
            adn_fn=get_adn_fn(1, "layer", "gelu", 0.0),
        )(tokens[:, 0], train=train)


class TabularClassifier(nn.Module):
    """
    Normalizing linear model over tabular features
    (parity: classification.py:941): input standardized by stored
    mean/std, then linear.
    """

    n_classes: int = 2
    mean: Optional[Sequence[float]] = None
    std: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mean is not None:
            x = (x - jnp.asarray(self.mean)) / jnp.maximum(
                jnp.asarray(self.std), 1e-6
            )
        return nn.Dense(_out_features(self.n_classes))(x)


class HybridClassifier(nn.Module):
    """
    Conv + tabular fusion (parity: classification.py:1008): image branch
    features concat standardized tabular features -> head.
    """

    convolutional_module: Any
    n_classes: int = 2
    tab_mean: Optional[Sequence[float]] = None
    tab_std: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, x, x_tab, train: bool = False):
        img_feats = self.convolutional_module(
            x, train=train, return_features=True
        )
        if self.tab_mean is not None:
            x_tab = (x_tab - jnp.asarray(self.tab_mean)) / jnp.maximum(
                jnp.asarray(self.tab_std), 1e-6
            )
        feats = jnp.concatenate([img_feats, x_tab], axis=-1)
        h = nn.Dense(feats.shape[-1])(feats)
        h = nn.relu(h)
        return nn.Dense(_out_features(self.n_classes))(h)


class GenericEnsemble(nn.Module):
    """
    Ensemble over member networks with feature fusion (parity:
    ensemble.py:15): members return features, fused by concat/mean, one
    shared head.
    """

    networks: Sequence[Any]
    n_classes: int = 2
    fusion: str = "concat"  # "concat" | "mean"
    head_structure: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [net(x, train=train, return_features=True) for net in self.networks]
        if self.fusion == "mean":
            f = sum(feats) / len(feats)
        else:
            f = jnp.concatenate(feats, axis=-1)
        for h in self.head_structure:
            f = nn.Dense(h)(f)
            f = nn.relu(f)
        return nn.Dense(_out_features(self.n_classes))(f)


class AveragingEnsemble(nn.Module):
    """Mean of member logits (parity: ensemble.py:190)."""

    networks: Sequence[Any]

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [net(x, train=train) for net in self.networks]
        return sum(outs) / len(outs)
