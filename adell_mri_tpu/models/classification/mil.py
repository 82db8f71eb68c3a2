"""
Multiple-instance learning over 2D slice encoders.

Parity targets: adell_mri/modules/classification/multiple_instance_learning.py
— MILAttention (:12), MultipleInstanceClassifier (:46),
TransformableTransformer (:264). The reference runs a frozen torchscript 2D
encoder per slice; here any flax module works, vmapped over the slice axis
(one batched forward on the MXU instead of a slice loop).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.vit import TransformerBlockStack, SeqPool


class MILAttention(nn.Module):
    """
    Gated attention pooling over instances (parity: mil.py:12, Ilse et al.):
    a = softmax(w^T (tanh(Vh) * sigm(Uh))).
    """

    attention_dim: int = 128

    @nn.compact
    def __call__(self, h):
        v = jnp.tanh(nn.Dense(self.attention_dim, name="V")(h))
        u = jax.nn.sigmoid(nn.Dense(self.attention_dim, name="U")(h))
        a = nn.Dense(1, name="w")(v * u)[..., 0]  # [B, N]
        a = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("bn,bnf->bf", a, h), a


class MultipleInstanceClassifier(nn.Module):
    """
    Slice encoder + MIL attention + head (parity: mil.py:46). Input
    [B, H, W, S, C]: each slice through ``module`` -> [B, S, F] -> attention
    pool -> logits.
    """

    module: Any  # 2D feature extractor: [b, H, W, C] -> [b, F]
    n_classes: int = 2
    attention_dim: int = 128
    head_structure: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, x, train: bool = False, return_attention: bool = False):
        b, h, w, s, c = x.shape
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * s, h, w, c)
        feats = self.module(slices, train=train)
        feats = feats.reshape(b, s, -1)
        pooled, attn = MILAttention(self.attention_dim)(feats)
        y = pooled
        for hdim in self.head_structure:
            y = nn.Dense(hdim)(y)
            y = nn.relu(y)
        logits = nn.Dense(1 if self.n_classes == 2 else self.n_classes)(y)
        if return_attention:
            return logits, attn
        return logits


class TransformableTransformer(nn.Module):
    """
    Transformer over per-slice features (parity: mil.py:264 — the
    transformable-transformer.yaml surface): slice encoder -> tokens ->
    transformer stack -> SeqPool -> head.
    """

    module: Any
    n_classes: int = 2
    n_blocks: int = 2
    n_heads: int = 4
    embed_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, s, c = x.shape
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * s, h, w, c)
        feats = self.module(slices, train=train)
        feats = feats.reshape(b, s, -1)
        if self.embed_dim is not None:
            feats = nn.Dense(self.embed_dim)(feats)
        tokens = TransformerBlockStack(self.n_blocks, self.n_heads)(
            feats, train=train
        )
        pooled = SeqPool()(tokens)
        return nn.Dense(1 if self.n_classes == 2 else self.n_classes)(pooled)
