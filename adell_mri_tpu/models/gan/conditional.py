"""
Conditional GAN generator: a UNet-shaped image->image generator with class
embeddings (FiLM over res blocks) and cross-attention context conditioning.

Parity target: adell_mri/modules/gan/generator.py:77-2413 — CrossAttention,
BasicTransformerBlock, SpatialTransformer, ResnetBlock and the
(CrossAttn)Down/Mid/Up blocks behind ``Generator``. Collapsed here into
rank-generic (2D/3D) flax modules: one res-block with an optional FiLM
conditioning vector, one spatial transformer that flattens the feature map to
tokens, and a single Generator that runs noise-image -> image (unconditional),
image -> image (translation, ref pl/gan.py:846-899 ``generate_noise``), with
optional context tokens (ref ``forward(context=...)``) and class labels
(ref ``get_class_embeddings``).

TPU notes: attention runs over the flattened spatial grid at the deepest
levels only (where token counts are small); everything else is conv ->
MXU. Channels-last throughout; bf16-friendly (no dtype pinning).
"""


from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _gn, _tuple
from adell_mri_tpu.models.gan.style import _up2 as _nearest_upsample





class CrossAttention(nn.Module):
    """Multi-head attention; context==None means self-attention.

    Parity: gan/generator.py:77-219 (CrossAttention).
    """

    n_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        # x: (B, N, C); context: (B, M, D) or None
        inner = self.n_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.n_heads, self.head_dim)

        attn = nn.dot_product_attention(split(q), split(k), split(v))
        attn = attn.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(x.shape[-1], name="to_out")(attn)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU feed-forward, all pre-norm residual.

    Parity: gan/generator.py:220-292.
    """

    n_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.n_heads, self.head_dim, name="attn1")(
            nn.LayerNorm(name="norm1")(x)
        )
        x = x + CrossAttention(self.n_heads, self.head_dim, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context
        )
        h = nn.LayerNorm(name="norm3")(x)
        gate = nn.Dense(4 * x.shape[-1] * 2, name="ff_in")(h)
        a, b = jnp.split(gate, 2, axis=-1)
        h = a * nn.gelu(b)  # GEGLU
        return x + nn.Dense(x.shape[-1], name="ff_out")(h)


class SpatialTransformer(nn.Module):
    """Flatten the spatial grid to tokens, run transformer blocks, project
    back; residual around the whole thing.

    Parity: gan/generator.py:293-427 (SpatialTransformer / AttentionBlock).
    """

    n_heads: int
    head_dim: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, x, context=None):
        c = x.shape[-1]
        spatial = x.shape[1:-1]
        h = nn.GroupNorm(num_groups=_gn(c), name="norm")(x)
        h = h.reshape(x.shape[0], -1, c)
        h = nn.Dense(self.n_heads * self.head_dim, name="proj_in")(h)
        for i in range(self.n_layers):
            h = BasicTransformerBlock(
                self.n_heads, self.head_dim, name=f"block_{i}"
            )(h, context)
        h = nn.Dense(c, name="proj_out")(h)
        return x + h.reshape((x.shape[0],) + spatial + (c,))


class GenResBlock(nn.Module):
    """Residual conv block with optional FiLM (scale/shift) conditioning.

    Parity: gan/generator.py:705-842 (ResnetBlock with class_emb_channels).
    """

    out_channels: int

    @nn.compact
    def __call__(self, x, emb=None):
        ndim = x.ndim - 2
        c = self.out_channels
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(c, _tuple(3, ndim), padding="SAME", name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn(c), name="norm2")(h)
        if emb is not None:
            film = nn.Dense(2 * c, name="film")(nn.silu(emb))
            scale, shift = jnp.split(film, 2, axis=-1)
            sh = (x.shape[0],) + (1,) * ndim + (c,)
            h = h * (1.0 + scale.reshape(sh)) + shift.reshape(sh)
        h = nn.silu(h)
        h = nn.Conv(c, _tuple(3, ndim), padding="SAME", name="conv2")(h)
        if x.shape[-1] != c:
            x = nn.Conv(c, _tuple(1, ndim), name="skip")(x)
        return x + h


class ConditionalGenerator(nn.Module):
    """
    UNet-shaped generator with conditioning (parity:
    gan/generator.py:1993-2413 ``Generator``):

    - input is a full-resolution tensor: a noise image for unconditional
      generation (ref ``generate_noise``) or the source image for
      image-to-image translation;
    - ``num_class_embeds`` turns on class-conditional generation: labels are
      embedded and injected as FiLM scale/shift in every res block;
    - ``cross_attention_dim`` turns on context conditioning through
      cross-attention at the levels marked in ``attention_levels``;
    - ``no_skip_connection`` drops the encoder->decoder skips (ref flag).
    """

    spatial_dimensions: int = 2
    in_channels: int = 1
    out_channels: int = 1
    num_channels: Sequence[int] = (32, 64, 64)
    num_res_blocks: Union[int, Sequence[int]] = 1
    attention_levels: Sequence[bool] = (False, False, True)
    # per-level block-type matrix (parity: the reference generator's
    # Res/Attn/CrossAttn down/mid/up block config, gan/generator.py:77-2413):
    # each entry is "res" | "attn" | "cross_attn". When set, supersedes
    # ``attention_levels`` — "attn" runs SELF-attention (no context fed at
    # that level), "cross_attn" attends over ``context``.
    block_types: Optional[Sequence[str]] = None
    cross_attention_dim: Optional[int] = None
    num_class_embeds: Optional[int] = None
    n_reg_embeds: Optional[int] = None
    num_head_channels: int = 8
    transformer_num_layers: int = 1
    no_skip_connection: bool = False
    out_activation: str = "tanh"

    def _res_blocks(self):
        if isinstance(self.num_res_blocks, int):
            return (self.num_res_blocks,) * len(self.num_channels)
        return tuple(self.num_res_blocks)

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        class_labels=None,
        reg_values=None,
        return_features: bool = False,
    ):
        ndim = self.spatial_dimensions
        chans = tuple(self.num_channels)
        n_res = self._res_blocks()
        emb_dim = chans[0] * 4
        if self.block_types is not None:
            if len(self.block_types) != len(chans):
                raise ValueError(
                    "block_types needs one entry per level "
                    f"({len(chans)}), got {list(self.block_types)}"
                )
            bad = set(self.block_types) - {"res", "attn", "cross_attn"}
            if bad:
                raise ValueError(f"unknown block types: {sorted(bad)}")
            level_attn = [t != "res" for t in self.block_types]
            level_ctx = [
                context if t == "cross_attn" else None
                for t in self.block_types
            ]
        else:
            level_attn = list(self.attention_levels)
            level_ctx = [context] * len(chans)

        emb = None
        if self.num_class_embeds is not None and class_labels is not None:
            e = nn.Embed(self.num_class_embeds, emb_dim, name="class_embedding")(
                class_labels.astype(jnp.int32)
            )
            emb = e if emb is None else emb + e
        if self.n_reg_embeds is not None and reg_values is not None:
            e = nn.Dense(emb_dim, name="reg_embedding")(
                reg_values.reshape(x.shape[0], -1)
            )
            emb = e if emb is None else emb + e
        if emb is not None:
            emb = nn.Dense(emb_dim, name="emb_proj")(nn.silu(emb))

        def attn(c, name):
            heads = max(1, c // self.num_head_channels)
            return SpatialTransformer(
                n_heads=heads,
                head_dim=self.num_head_channels,
                n_layers=self.transformer_num_layers,
                name=name,
            )

        h = nn.Conv(chans[0], _tuple(3, ndim), padding="SAME", name="conv_in")(x)
        skips = [h]
        for lvl, c in enumerate(chans):
            for b in range(n_res[lvl]):
                h = GenResBlock(c, name=f"down_{lvl}_res_{b}")(h, emb)
                if level_attn[lvl]:
                    h = attn(c, f"down_{lvl}_attn_{b}")(h, level_ctx[lvl])
                skips.append(h)
            if lvl != len(chans) - 1:
                h = nn.Conv(
                    c, _tuple(3, ndim), strides=_tuple(2, ndim),
                    padding="SAME", name=f"down_{lvl}_pool",
                )(h)
                skips.append(h)

        h = GenResBlock(chans[-1], name="mid_res_1")(h, emb)
        if level_attn[-1]:
            h = attn(chans[-1], "mid_attn")(h, level_ctx[-1])
        h = GenResBlock(chans[-1], name="mid_res_2")(h, emb)
        bottleneck = h

        for lvl in reversed(range(len(chans))):
            c = chans[lvl]
            for b in range(n_res[lvl] + 1):
                if not self.no_skip_connection:
                    h = jnp.concatenate([h, skips.pop()], axis=-1)
                elif skips:
                    skips.pop()
                h = GenResBlock(c, name=f"up_{lvl}_res_{b}")(h, emb)
                if level_attn[lvl]:
                    h = attn(c, f"up_{lvl}_attn_{b}")(h, level_ctx[lvl])
            if lvl != 0:
                h = _nearest_upsample(h, ndim)
                h = nn.Conv(
                    c, _tuple(3, ndim), padding="SAME", name=f"up_{lvl}_conv"
                )(h)

        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, _tuple(3, ndim), padding="SAME", name="conv_out"
        )(h)
        if self.out_activation == "tanh":
            h = jnp.tanh(h)
        if return_features:
            return h, bottleneck
        return h



