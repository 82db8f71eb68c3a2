"""
YOLO-style 3D detection networks.

Parity target: adell_mri/modules/object_detection/nets.py — YOLONet3d (:20,
ResNet/ConvNeXt backbone + ASPP pyramid + anchor heads: objectness /
center-offset / size / class) and CoarseDetector3d (:323). Channels-last;
prediction maps have shape [B, *G, A*(1+2*ndim)+C_cls] split by the caller.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.layers.blocks import _tuple
from adell_mri_tpu.models.layers.multi_resolution import (
    AtrousSpatialPyramidPooling,
)
from adell_mri_tpu.models.layers.res_net import ResNetBackbone


class YOLONet3d(nn.Module):
    n_anchors: int = 3
    n_classes: int = 2
    spatial_dimensions: int = 3
    backbone_structure: Sequence[Tuple[int, int, int, int]] = (
        (16, 16, 3, 1),
        (32, 32, 3, 1),
    )
    maxpool_structure: Optional[Sequence] = None
    res_type: str = "resnet"
    norm_type: str = "instance"
    act_fn: str = "swish"
    dropout_param: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        adn = get_adn_fn(
            ndim, self.norm_type, self.act_fn, self.dropout_param
        )
        backbone = ResNetBackbone(
            structure=self.backbone_structure,
            maxpool_structure=self.maxpool_structure,
            adn_fn=adn,
            res_type=self.res_type,
        )
        feats = backbone(x, train=train)
        feats = AtrousSpatialPyramidPooling(
            out_channels=feats.shape[-1], rates=(1, 2, 4), adn_fn=adn
        )(feats, train=train)
        A = self.n_anchors
        obj = nn.Conv(A, _tuple(1, ndim), name="objectness")(feats)
        ctr = nn.Conv(A * ndim, _tuple(1, ndim), name="center_offsets")(feats)
        ctr = jax.nn.sigmoid(ctr)  # offsets within cell in [0,1]
        sz = nn.Conv(A * ndim, _tuple(1, ndim), name="sizes")(feats)
        n_cls = max(1, self.n_classes - 1) if self.n_classes == 2 else self.n_classes
        cls = nn.Conv(n_cls, _tuple(1, ndim), name="classes")(feats)
        return {
            "objectness": obj,
            "center_offsets": ctr,
            "sizes": sz,
            "classes": cls,
        }

    @staticmethod
    def recover_boxes(predictions, anchors, input_shape, threshold=0.5):
        """Host-side decode + sigmoid objectness -> (boxes, scores)."""
        import numpy as np

        from adell_mri_tpu.models.detection.anchors import (
            anchor_targets_to_boxes,
        )

        obj = np.moveaxis(np.asarray(jax.nn.sigmoid(predictions["objectness"])), -1, 0)
        ctr = np.moveaxis(np.asarray(predictions["center_offsets"]), -1, 0)
        sz = np.moveaxis(np.asarray(predictions["sizes"]), -1, 0)
        return anchor_targets_to_boxes(
            obj, ctr, sz, anchors, input_shape, threshold
        )


class CoarseDetector3d(nn.Module):
    """Objectness-only coarse detector (parity: nets.py:323)."""

    spatial_dimensions: int = 3
    backbone_structure: Sequence[Tuple[int, int, int, int]] = (
        (16, 16, 3, 1),
        (32, 32, 3, 1),
    )
    maxpool_structure: Optional[Sequence] = None
    norm_type: str = "instance"
    act_fn: str = "swish"
    dropout_param: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        adn = get_adn_fn(
            ndim, self.norm_type, self.act_fn, self.dropout_param
        )
        feats = ResNetBackbone(
            structure=self.backbone_structure,
            maxpool_structure=self.maxpool_structure,
            adn_fn=adn,
        )(x, train=train)
        return nn.Conv(1, _tuple(1, ndim))(feats)
