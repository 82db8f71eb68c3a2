"""
AHNet and MIMUNet.

Parity targets: adell_mri/modules/segmentation/ahnet.py:21 (anisotropic
hybrid network — 2D-pretrained convs extended to 3D with (k,k,1) kernels +
an anisotropic decoder, layers/ah_blocks.py:10-348) and mimunet.py:51
(multiple-instance U-Net: a 2D module applied slice-wise, slice outputs
stacked back into a volume). The 2D->3D weight transfer becomes a pytree
transform (transfer_2d_to_3d) instead of module surgery.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.layers.blocks import _tuple, apply_adn


class AHNet(nn.Module):
    """
    Anisotropic hybrid U-Net: in-plane (k, k, 1) convs with occasional
    (1, 1, k) convs to mix the slice axis — the TPU-native expression of
    AHNet's 2D->3D design (cheap on anisotropic MRI).
    """

    n_classes: int = 2
    depth: Sequence[int] = (16, 32, 64)
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        adn = get_adn_fn(3, self.norm_type, self.activation_fn, self.dropout_param)
        skips = []
        h = x
        for i, d in enumerate(self.depth):
            h = nn.Conv(d, (3, 3, 1), padding="SAME", name=f"enc2d_{i}")(h)
            h = apply_adn(adn(d), h, train)
            h = nn.Conv(d, (1, 1, 3), padding="SAME", name=f"encz_{i}")(h)
            h = apply_adn(adn(d), h, train)
            skips.append(h)
            if i < len(self.depth) - 1:
                h = nn.Conv(
                    d, (3, 3, 1), strides=(2, 2, 1), padding="SAME",
                    name=f"down_{i}",
                )(h)
        for i in range(len(self.depth) - 2, -1, -1):
            d = self.depth[i]
            h = nn.ConvTranspose(
                d, (2, 2, 1), strides=(2, 2, 1), name=f"up_{i}"
            )(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = nn.Conv(d, (3, 3, 1), padding="SAME", name=f"dec_{i}")(h)
            h = apply_adn(adn(d), h, train)
            h = nn.Conv(d, (1, 1, 3), padding="SAME", name=f"decz_{i}")(h)
            h = apply_adn(adn(d), h, train)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        logits = nn.Conv(out_ch, (1, 1, 1))(h)
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
    kernels [kh, kw, 1, i, o] (parity: AnysotropicHybridInput 2D->3D weight
    transfer, ah_blocks.py:348). Leaves without a shape match pass through.
    """

    def visit(p2, p3):
        p2 = np.asarray(p2)
        p3 = np.asarray(p3)
        if p2.ndim == 4 and p3.ndim == 5 and p3.shape[2] == 1:
            if p2.shape == (p3.shape[0], p3.shape[1], p3.shape[3], p3.shape[4]):
                return p2[:, :, None]
        if p2.shape == p3.shape:
            return p2
        return p3

    return jax.tree.map(visit, params_2d, params_3d)


class MIMUNet(nn.Module):
    """
    Multiple-instance U-Net (parity: mimunet.py:51): a 2D segmentation
    module applied to every slice (vmapped over the slice axis), outputs
    restacked into a volume.
    """

    module_2d: Any  # flax module: [b, H, W, C] -> [b, H, W, C_out] or tuple
    n_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, d, c = x.shape
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * d, h, w, c)
        out = self.module_2d(slices, train=train)
        if isinstance(out, tuple):
            out = out[0]
        out = out.reshape(b, d, h, w, -1).transpose(0, 2, 3, 1, 4)
        return out, None
