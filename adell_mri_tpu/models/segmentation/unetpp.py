"""
U-Net++ (nested dense skips + deep supervision).

Parity target: adell_mri/modules/segmentation/unetpp.py — UNetPlusPlus
(:17): grid of nodes X[i][j] where X[i][j] = conv(concat(X[i][0..j-1],
up(X[i+1][j-1]))); deep supervision reads the X[0][j] row.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.layers.blocks import _tuple
from adell_mri_tpu.models.layers.multi_resolution import resize_like
from adell_mri_tpu.ops.conv import TpuConvTranspose


class UNetPlusPlus(nn.Module):
    spatial_dimensions: int = 3
    n_classes: int = 2
    depth: Sequence[int] = (16, 32, 64)
    kernel_sizes: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (2, 2, 2)
    conv_type: str = "regular"
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        from adell_mri_tpu.models.segmentation.unet import _ConvUnit

        ndim = x.ndim - 2
        adn = get_adn_fn(
            ndim, self.norm_type, self.activation_fn, self.dropout_param
        )
        L = len(self.depth)

        def conv_unit(y, ch, k, name):
            # the reference UNet++ inherits the UNet's conv blocks
            # (unetpp.py:17 subclasses UNet), so nodes carry the same
            # two-conv capacity at the same YAML
            return _ConvUnit(ch, k, 1, self.conv_type, adn, name=name)(
                y, train=train
            )

        # column 0: the UNet encoder (stride-1 unit + strided conv unit,
        # parity: UNet.init_encoder inherited by the reference UNet++)
        nodes = {}
        curr = x
        for i in range(L):
            curr = conv_unit(
                curr, self.depth[i], self.kernel_sizes[i], f"enc_{i}"
            )
            nodes[(i, 0)] = curr
            if i < L - 1:
                curr = _ConvUnit(
                    self.depth[i], self.kernel_sizes[i], self.strides[i],
                    self.conv_type, adn, name=f"enc_ds_{i}",
                )(curr, train=train)

        # nested columns
        for j in range(1, L):
            for i in range(L - j):
                # kernel == strides: block-matmul lowering (TpuConvTranspose,
                # same param tree) instead of XLA's slow 3D transposed conv
                up = TpuConvTranspose(
                    self.depth[i],
                    _tuple(self.strides[i], ndim),
                    name=f"up_{i}_{j}",
                )(nodes[(i + 1, j - 1)])
                if up.shape[1:-1] != nodes[(i, 0)].shape[1:-1]:
                    up = resize_like(up, nodes[(i, 0)].shape[1:-1])
                cat = jnp.concatenate(
                    [nodes[(i, k)] for k in range(j)] + [up], axis=-1
                )
                nodes[(i, j)] = conv_unit(
                    cat, self.depth[i], self.kernel_sizes[i], f"node_{i}_{j}"
                )

        out_ch = self.n_classes if self.n_classes > 2 else 1

        def head(y, name):
            logits = nn.Conv(out_ch, _tuple(1, ndim), name=name)(y)
            if return_logits:
                return logits
            return (
                jax.nn.softmax(logits, -1)
                if self.n_classes > 2
                else jax.nn.sigmoid(logits)
            )

        pred = head(nodes[(0, L - 1)], "final")
        if self.deep_supervision:
            ds = [head(nodes[(0, j)], f"ds_{j}") for j in range(1, L - 1)]
            return pred, None, ds
        return pred, None
