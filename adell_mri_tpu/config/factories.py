"""
Network factories: config dict + net-type string -> flax module.

Parity target: adell_mri/utils/network_factories.py —
get_classification_network (:129), get_segmentation_network (:479),
get_ssl_network (:689), get_detection_network, get_generative_network.
"""

from typing import Any, Dict, Optional, Sequence

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.classification import (
    CatNet,
    FactorizedViTClassifier,
    HybridClassifier,
    OrdNet,
    UNetEncoderClassifier,
    VGG,
    ViTClassifier,
)
from adell_mri_tpu.models.segmentation import (
    BrUNet,
    SWINUNet,
    UNETR,
    UNet,
    UNetPlusPlus,
)
from adell_mri_tpu.models.ssl import (
    DINO,
    IBOT,
    IJEPA,
    NonContrastiveWrapper,
    ViTMaskedAutoEncoder,
)


def _unet_kwargs(cfg: Dict[str, Any], n_classes: int) -> Dict[str, Any]:
    return dict(
        spatial_dimensions=cfg.get("spatial_dimensions", 3),
        conv_type=cfg.get("conv_type", "regular"),
        link_type=cfg.get("link_type", "identity"),
        upscale_type=cfg.get("upscale_type", "upsample"),
        interpolation=cfg.get("interpolation", "linear"),
        norm_type=cfg.get("norm_type", "instance"),
        dropout_param=cfg.get("dropout_param", 0.0),
        activation_fn=cfg.get("activation_fn", "swish"),
        n_classes=n_classes,
        depth=tuple(cfg.get("depth", (16, 32, 64))),
        kernel_sizes=tuple(cfg.get("kernel_sizes", (3, 3, 3))),
        strides=tuple(
            tuple(s) if isinstance(s, (list, tuple)) else s
            for s in cfg.get("strides", (2, 2, 2))
        ),
        bottleneck_classification=cfg.get("bottleneck_classification", False),
        skip_conditioning=cfg.get("skip_conditioning"),
        feature_conditioning=cfg.get("feature_conditioning"),
        feature_conditioning_params=cfg.get("feature_conditioning_params"),
        deep_supervision=cfg.get("deep_supervision", False),
        encoder_structure=(
            tuple(tuple(s) for s in cfg["encoder_structure"])
            if cfg.get("encoder_structure")
            else None
        ),
        res_type=cfg.get("res_type", "resnet"),
        dropout_type=cfg.get("dropout_type", "dropout"),
        # --semi_supervised creates the UNetSemiSL linear_transformation
        # head; dropping this key silently trained semi-SL runs without it
        semi_supervised=cfg.get("semi_supervised", False),
    )


def get_segmentation_network(
    net_type: str,
    network_config: Dict[str, Any],
    n_classes: int = 2,
    n_input_branches: int = 2,
):
    """Parity: network_factories.py:479."""
    cfg = dict(network_config)
    if net_type == "unet":
        return UNet(**_unet_kwargs(cfg, n_classes))
    if net_type == "brunet":
        from adell_mri_tpu.models.segmentation.unet import BrUNetStacked

        kw = _unet_kwargs(cfg, n_classes)
        kw.pop("in_channels", None)
        # wrapped so the standard single-array pipeline feeds it: the
        # stacked channels split one-per-branch inside the adapter
        return BrUNetStacked(
            brunet=BrUNet(n_input_branches=n_input_branches, **{
                k: v for k, v in kw.items()
                if k not in (
                    "encoder_only",
                    "encoder_structure",
                    "res_type",
                    "semi_supervised",
                )
            })
        )
    if net_type == "unetpp":
        return UNetPlusPlus(
            spatial_dimensions=cfg.get("spatial_dimensions", 3),
            n_classes=n_classes,
            depth=tuple(cfg.get("depth", (16, 32, 64))),
            kernel_sizes=tuple(cfg.get("kernel_sizes", (3, 3, 3))),
            strides=tuple(cfg.get("strides", (2, 2, 2))),
            conv_type=cfg.get("conv_type", "regular"),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
            dropout_param=cfg.get("dropout_param", 0.0),
            deep_supervision=cfg.get("deep_supervision", False),
        )
    if net_type in ("unetr", "monai_unetr"):
        return UNETR(
            spatial_dimensions=cfg.get("spatial_dimensions", 3),
            n_classes=n_classes,
            patch_size=tuple(cfg.get("patch_size", (8, 8, 8))),
            embed_dim=cfg.get(
                "embed_dim",
                cfg.get("hidden_dim", cfg.get("embedding_size", 192)),
            ),
            n_blocks=cfg.get("n_blocks", cfg.get("number_of_blocks", 8)),
            n_heads=cfg.get("n_heads", cfg.get("number_of_attention_heads", 6)),
            feature_size=cfg.get("feature_size", 16),
            norm_type=cfg.get("norm_type", "instance"),
            dropout_param=cfg.get(
                "dropout_param", cfg.get("dropout_rate", 0.0)
            ),
            skip_conditioning=cfg.get("skip_conditioning"),
            feature_conditioning=cfg.get("feature_conditioning"),
            feature_conditioning_params=cfg.get(
                "feature_conditioning_params"
            ),
            bottleneck_classification=cfg.get(
                "bottleneck_classification", False
            ),
            deep_supervision=cfg.get("deep_supervision", False),
        )
    if net_type == "unetr_ref":
        # reference-compat UNETR geometry (imported reference
        # checkpoints record this net_type; interop/torch_unetr.py)
        from adell_mri_tpu.models.segmentation.unetr import UNETRRef

        return UNETRRef(
            image_size=tuple(cfg["image_size"]),
            patch_size=tuple(cfg.get("patch_size", (8, 8, 8))),
            n_blocks=cfg.get("n_blocks", cfg.get("number_of_blocks", 8)),
            return_at=tuple(cfg.get("return_at", (2, 4, 5))),
            n_heads=cfg.get("n_heads", 8),
            attention_dim=cfg.get("attention_dim"),
            embedding_size=cfg.get("embedding_size"),
            mlp_structure=tuple(cfg.get("mlp_structure", (256, 256))),
            depth=tuple(cfg.get("depth", (16, 32, 64))),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
            dropout_param=cfg.get(
                "dropout_param", cfg.get("dropout_rate", 0.0)
            ),
            link_type=cfg.get("link_type", "identity"),
            n_classes=n_classes,
            in_channels=cfg.get("n_channels", cfg.get("in_channels", 1)),
        )
    if net_type == "swin_ref":
        # reference-compat SWINUNet geometry (imported reference
        # checkpoints record this net_type; interop/torch_swin.py)
        from adell_mri_tpu.models.segmentation.swin_ref import SWINUNetRef

        return SWINUNetRef(
            image_size=tuple(cfg["image_size"]),
            patch_size=tuple(cfg.get("patch_size", (2, 2, 2))),
            window_size=tuple(cfg.get("window_size", (8, 8, 8))),
            shift_sizes=cfg.get("shift_sizes", [0, 1]),
            depth=tuple(cfg.get("depth", (16, 32, 64))),
            strides=cfg.get("strides"),
            embedding_size=cfg.get("embedding_size"),
            n_heads=cfg.get("n_heads", 4),
            mlp_structure=cfg.get("mlp_structure", (256, 256)),
            embed_method=cfg.get("embed_method", "linear"),
            norm_type=cfg.get("norm_type", "instance"),
            activation_fn=cfg.get("activation_fn", "swish"),
            dropout_param=cfg.get("dropout_param", 0.0),
            dropout_rate=cfg.get("dropout_rate", 0.0),
            link_type=cfg.get("link_type", "identity"),
            upscale_type=cfg.get("upscale_type", "transpose"),
            kernel_sizes=tuple(cfg.get("kernel_sizes", (3, 3, 3))),
            n_classes=n_classes,
            in_channels=cfg.get("n_channels", cfg.get("in_channels", 1)),
        )
    if net_type in ("swin", "monai_swin"):
        # reference configs may give embedding_size as a per-stage list and
        # n_heads as a scalar (sample_configs/unet-swin.yaml)
        embed = cfg.get("embed_dim", cfg.get("embedding_size", 24))
        if isinstance(embed, (list, tuple)):
            n_stages = len(embed)
            embed = embed[0]
        else:
            n_stages = len(cfg.get("depths", (2, 2, 2)))
        depths = tuple(cfg.get("depths", (2,) * n_stages))
        heads = cfg.get("n_heads", cfg.get("num_heads"))
        if heads is None:
            # default doubles per stage, matched to len(depths) (a fixed
            # (3, 6, 12) under-indexes 4-stage embedding_size lists)
            heads = tuple(3 * (2 ** i) for i in range(len(depths)))
        if isinstance(heads, int):
            heads = (heads,) * len(depths)
        if len(heads) != len(depths):
            raise ValueError(
                f"n_heads ({list(heads)}) must have one entry per stage "
                f"({len(depths)})"
            )
        return SWINUNet(
            spatial_dimensions=cfg.get("spatial_dimensions", 3),
            n_classes=n_classes,
            embed_dim=embed,
            depths=depths,
            n_heads=tuple(heads),
            window_size=tuple(cfg.get("window_size", (4, 4, 4))),
            patch_size=tuple(cfg.get("patch_size", (2, 2, 2))),
            norm_type=cfg.get("norm_type", "instance"),
            dropout_param=cfg.get(
                "dropout_param", cfg.get("dropout_rate", 0.0)
            ),
            skip_conditioning=cfg.get("skip_conditioning"),
            feature_conditioning=cfg.get("feature_conditioning"),
            feature_conditioning_params=cfg.get(
                "feature_conditioning_params"
            ),
            bottleneck_classification=cfg.get(
                "bottleneck_classification", False
            ),
            deep_supervision=cfg.get("deep_supervision", False),
        )
    raise NotImplementedError(f"segmentation net_type {net_type!r}")


def get_classification_network(
    net_type: str,
    network_config: Dict[str, Any],
    n_classes: int = 2,
    clinical_feature_means: Optional[Sequence[float]] = None,
    clinical_feature_stds: Optional[Sequence[float]] = None,
):
    """
    Parity: network_factories.py:129 (+ HybridClassifier wrapping when
    clinical features are present, :267-293).
    """
    cfg = dict(network_config)
    sd = cfg.get("spatial_dimensions", 3)
    if net_type == "vgg":
        net = VGG(
            spatial_dimensions=sd,
            n_classes=n_classes,
            first_depth=cfg.get("first_depth", 16),
            n_blocks=cfg.get("n_blocks", 4),
            norm_type=cfg.get("norm_type", "batch"),
        )
    elif net_type in ("convnext_backbone", "convnext_v2"):
        # standalone patchify-stem ConvNeXt (parity: layers/conv_next.py:388
        # ConvNeXt classifier over ConvNeXtBackbone/ConvNeXtV2Backbone)
        from adell_mri_tpu.models.layers.conv_next import ConvNeXt

        net = ConvNeXt(
            structure=[
                tuple(s) for s in cfg.get(
                    "resnet_structure", ((64, 64, 7, 2), (128, 128, 7, 2))
                )
            ],
            n_classes=n_classes,
            first_layer_stride=cfg.get("first_layer_stride", 4),
            maxpool_structure=cfg.get("maxpool_structure"),
            v2=net_type == "convnext_v2",
            # "maxpool" = reference-compat stage transitions (imported
            # reference checkpoints record it in their stored config)
            downsample=cfg.get("downsample", "conv"),
        )
    elif net_type in ("cat", "resnet", "convnext"):
        res_type = cfg.get(
            "res_type", "convnext" if net_type == "convnext" else "resnet"
        )
        net = CatNet(
            spatial_dimensions=sd,
            n_classes=n_classes,
            resnet_structure=[
                tuple(s) for s in cfg.get(
                    "resnet_structure", ((64, 128, 5, 2), (128, 256, 3, 5))
                )
            ],
            maxpool_structure=[
                tuple(s) if isinstance(s, (list, tuple)) else s
                for s in cfg["maxpool_structure"]
            ]
            if cfg.get("maxpool_structure")
            else None,
            res_type=res_type,
            batch_ensemble=cfg.get("batch_ensemble", 0),
            norm_type=cfg.get("norm_type", "batch"),
            # ref factory default when the YAML has no act key
            # (network_factories.py:182-186)
            act_fn=cfg.get("act_fn", cfg.get("activation_fn", "swish")),
            dropout_param=cfg.get("dropout_param", 0.0),
            classification_structure=cfg.get("classification_structure"),
            gp_head=bool(cfg.get("gaussian_process", False)),
        )
    elif net_type == "ord":
        net = OrdNet(
            spatial_dimensions=sd,
            n_classes=n_classes,
            resnet_structure=[
                tuple(s) for s in cfg.get(
                    "resnet_structure", ((64, 128, 5, 2), (128, 256, 3, 5))
                )
            ],
            norm_type=cfg.get("norm_type", "batch"),
            dropout_param=cfg.get("dropout_param", 0.0),
        )
    elif net_type == "vit":
        _vit_embed = cfg.get(
            "embed_dim",
            cfg.get("attention_dim", cfg.get("embedding_size", 256)),
        )
        # the reference's mlp_structure ([1024] in classification-vit.yaml)
        # passes through EXACTLY (a ratio round-trip truncates widths:
        # int(88*(49/88)) == 48, and multi-entry structures have no ratio)
        _mlp_struct = cfg.get("mlp_structure")
        net = ViTClassifier(
            patch_size=tuple(cfg.get("patch_size", (4, 4, 4))),
            n_classes=n_classes,
            embed_dim=_vit_embed,
            mlp_structure=tuple(_mlp_struct) if _mlp_struct else None,
            mlp_ratio=cfg.get("mlp_ratio", 4.0),
            n_blocks=cfg.get("n_blocks", cfg.get("number_of_blocks", 4)),
            n_heads=cfg.get("n_heads", cfg.get("number_of_attention_heads", 4)),
            dropout_param=cfg.get(
                "dropout_param", cfg.get("dropout_rate", 0.0)
            ),
            use_class_token=cfg.get("use_class_token", True),
            use_seq_pool=cfg.get("use_seq_pool", False),
            moe_experts=cfg.get("moe_experts", 0),
            embed_method=cfg.get("embed_method", "linear"),
            embed_norm=bool(cfg.get("embed_norm", False)),
        )
    elif net_type == "factorized_vit":
        net = FactorizedViTClassifier(
            patch_size=tuple(cfg.get("patch_size", (4, 4))),
            n_classes=n_classes,
            embed_dim=cfg.get("embed_dim", cfg.get("embedding_size", 256)),
            n_blocks=cfg.get("n_blocks", 4),
            n_heads=cfg.get("n_heads", 4),
            dropout_param=cfg.get(
                "dropout_param", cfg.get("dropout_rate", 0.0)
            ),
        )
    elif net_type == "unet":
        unet = UNet(**_unet_kwargs(cfg, n_classes))
        # ref head: [depth[-1]]*3 hidden dims with (norm, gelu) 1-d ADN
        # (network_factories.py:207-220)
        depth_val = cfg.get("depth", (16, 32, 64))
        last_d = depth_val[-1] if isinstance(depth_val, (list, tuple)) else depth_val
        net = UNetEncoderClassifier(
            unet=unet,
            n_classes=n_classes,
            head_structure=(last_d,) * 3,
            head_adn_fn=get_adn_fn(
                1,
                cfg.get("norm_fn", "batch"),
                "gelu",  # the reference pins the head act to gelu
                cfg.get("dropout_param", 0.0),
            ),
        )
    else:
        raise NotImplementedError(f"classification net_type {net_type!r}")

    if clinical_feature_means is not None:
        net = HybridClassifier(
            convolutional_module=net,
            n_classes=n_classes,
            tab_mean=list(clinical_feature_means),
            tab_std=list(clinical_feature_stds),
        )
    return net


def get_ssl_network(
    ssl_method: str,
    network_config: Dict[str, Any],
):
    """Parity: network_factories.py:689."""
    cfg = dict(network_config)
    if ssl_method == "ijepa":
        return IJEPA(
            patch_size=tuple(cfg.get("patch_size", (4, 4, 4))),
            embed_dim=cfg.get("embed_dim", 192),
            n_blocks=cfg.get("n_blocks", 4),
            n_heads=cfg.get("n_heads", 4),
            predictor_dim=cfg.get("predictor_dim", 96),
            predictor_blocks=cfg.get("predictor_blocks", 2),
        )
    if ssl_method == "dino":
        return DINO(
            patch_size=tuple(cfg.get("patch_size", (4, 4, 4))),
            embed_dim=cfg.get("embed_dim", 192),
            n_blocks=cfg.get("n_blocks", 4),
            n_heads=cfg.get("n_heads", 4),
            out_dim=cfg.get("out_dim", 4096),
            hidden_dim=cfg.get("hidden_dim", 512),
            bottleneck_dim=cfg.get("bottleneck_dim", 128),
        )
    if ssl_method == "ibot":
        return IBOT(
            patch_size=tuple(cfg.get("patch_size", (4, 4, 4))),
            embed_dim=cfg.get("embed_dim", 192),
            n_blocks=cfg.get("n_blocks", 4),
            n_heads=cfg.get("n_heads", 4),
            out_dim=cfg.get("out_dim", 4096),
            hidden_dim=cfg.get("hidden_dim", 512),
            bottleneck_dim=cfg.get("bottleneck_dim", 128),
            n_mask_blocks=cfg.get("n_mask_blocks", 4),
        )
    if ssl_method == "mae":
        return ViTMaskedAutoEncoder(
            patch_size=tuple(cfg.get("patch_size", (4, 4, 4))),
            embed_dim=cfg.get("embed_dim", 192),
            n_blocks=cfg.get("n_blocks", 4),
            n_heads=cfg.get("n_heads", 4),
            decoder_dim=cfg.get("decoder_dim", 96),
            decoder_blocks=cfg.get("decoder_blocks", 2),
            mask_ratio=cfg.get("mask_ratio", 0.75),
        )
    # two-view methods over a conv backbone. The reference schema
    # (sample_configs/ssl-resnet.yaml) nests the config under
    # backbone_args / projection_head_args / prediction_head_args — honor
    # it alongside the flat spellings (flat wins when both are present)
    ba = cfg.get("backbone_args") or {}
    pja = cfg.get("projection_head_args") or {}
    pda = cfg.get("prediction_head_args") or {}
    structure = cfg.get(
        "backbone_structure",
        cfg.get(
            "resnet_structure",
            ba.get("structure", ((32, 64, 3, 2), (64, 128, 3, 2))),
        ),
    )
    maxpool = cfg.get("maxpool_structure", ba.get("maxpool_structure"))
    backbone = CatNet(
        spatial_dimensions=cfg.get(
            "spatial_dimensions", ba.get("spatial_dim", 3)
        ),
        resnet_structure=[tuple(s) for s in structure],
        maxpool_structure=[
            tuple(s) if isinstance(s, (list, tuple)) else s
            for s in maxpool
        ]
        if maxpool
        else None,
        res_type=cfg.get("res_type", ba.get("res_type", "resnet")),
        norm_type=cfg.get("norm_type", cfg.get("norm_fn", "batch")),
        dropout_param=cfg.get("dropout_param", 0.0),
        feature_extraction=True,
    )
    return NonContrastiveWrapper(
        backbone=backbone,
        projection_dims=tuple(
            cfg.get(
                "projection_head",
                cfg.get(
                    "projection_dims", pja.get("structure", (512, 128))
                ),
            )
        ),
        prediction_dims=tuple(
            cfg.get(
                "prediction_head",
                cfg.get(
                    "prediction_dims", pda.get("structure", (64, 128))
                ),
            )
        ),
    )
