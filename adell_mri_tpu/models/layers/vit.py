"""
Vision transformers.

Parity targets: adell_mri/modules/layers/vit.py — LinearEmbedding (:389,
linear/conv patch embed, class token, registers, learned or sinusoidal
pos-embed, channel-to-token), TransformerBlock/TransformerBlockStack
(:884,1258 with return-at intermediates for UNETR skips),
SWINTransformerBlock/Stack (cyclic shift :48, window partition :95,
attention masks :132,167; :1004,1437), ViT (:1618), FactorizedViT (:1804,
within-slice then between-slice attention); and
adell_mri/modules/layers/linear_blocks.py (MLP :53, attention family
:117-247, SeqPool :178).

TPU-first: attention stays as batched [B, N, H, Dh] matmuls on the MXU
(jnp.einsum with fp32 accumulation); token counts are static; windowing is
reshape-based (no gather).
"""

import math
from typing import Optional, Sequence

import flax.linen as nn

from adell_mri_tpu.ops.conv import TpuConv
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple


def sinusoidal_positions(n: int, dim: int) -> jnp.ndarray:
    pos = jnp.arange(n)[:, None].astype(jnp.float32)
    half = (dim + 1) // 2
    div = jnp.exp(
        jnp.arange(half).astype(jnp.float32) * (-math.log(10000.0) / half)
    )
    pe = jnp.zeros((n, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div)[:, : pe[:, 0::2].shape[1]])
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div)[:, : pe[:, 1::2].shape[1]])
    return pe


# token count at which the blockwise Pallas kernel takes over from the
# materialized-softmax einsum: below this the N x N matrix is small enough
# that XLA's fused path wins on latency
FLASH_MIN_TOKENS = 2048


class MultiHeadAttention(nn.Module):
    """
    Standard MHA with optional additive bias (for SWIN relative position
    bias / shifted-window masks). fp32 accumulation on the MXU. Unbiased
    attention at large token counts routes to the blockwise Pallas flash
    kernel (ops/pallas/attention.py), which never materializes N x N.
    """

    n_heads: int
    head_dim: Optional[int] = None
    dropout: float = 0.0
    use_flash: bool = True
    # per-head LayerNorm on q and k after the head split — the reference's
    # MultiHeadSelfAttention applies it UNCONDITIONALLY (linear_blocks.py:
    # 328-329, the ViT-22B qk-norm stability trick), so parity keeps it on
    qk_norm: bool = True

    @nn.compact
    def __call__(self, q_in, kv_in=None, bias=None, train: bool = False):
        kv_in = q_in if kv_in is None else kv_in
        dim = q_in.shape[-1]
        hd = self.head_dim or dim // self.n_heads
        inner = hd * self.n_heads
        q = nn.Dense(inner, name="q")(q_in)
        k = nn.Dense(inner, name="k")(kv_in)
        v = nn.Dense(inner, name="v")(kv_in)

        def split(x):
            return x.reshape(x.shape[:-1] + (self.n_heads, hd))

        q, k, v = split(q), split(k), split(v)
        if self.qk_norm:
            # one LayerNorm(head_dim) SHARED across heads, like the
            # reference's q_norm/k_norm over real_attention_dim
            q = nn.LayerNorm(epsilon=1e-5, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-5, name="k_norm")(k)
        flash_ok = (
            self.use_flash
            and bias is None
            and not (self.dropout > 0 and train)
            and q_in.ndim == 3
            and q_in.shape[1] >= FLASH_MIN_TOKENS
        )
        if flash_ok:
            from adell_mri_tpu.ops.pallas.attention import flash_attention

            out = flash_attention(
                jnp.swapaxes(q, 1, 2),  # [B, H, N, Dh]
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
            )
            out = jnp.swapaxes(out, 1, 2).astype(q_in.dtype)
            out = out.reshape(out.shape[:-2] + (inner,))
            return nn.Dense(dim, name="proj")(out)
        attn = jnp.einsum(
            "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if bias is not None:
            attn = attn + bias
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        if self.dropout > 0 and train:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        out = jnp.einsum(
            "...hqk,...khd->...qhd", attn, v,
            preferred_element_type=jnp.float32,
        ).astype(q_in.dtype)
        out = out.reshape(out.shape[:-2] + (inner,))
        return nn.Dense(dim, name="proj")(out)


class TransformerBlock(nn.Module):
    """Pre-LN MHA + MLP block (parity: vit.py:884). ``moe_experts`` > 0
    swaps the dense MLP for a routed top-1 MoE FFN (layers/moe.py; an
    extension beyond the reference), whose load-balance aux loss is
    collected in the "moe_aux" mutable collection when available."""

    n_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    moe_experts: int = 0
    # exact hidden widths (the reference's mlp_structure, vit.py:884) —
    # overrides mlp_ratio when set; a float round-trip via the ratio can
    # truncate the width by 1 (int(88*(49/88)) == 48) and a multi-entry
    # structure has no ratio representation at all
    mlp_structure: Optional[Sequence[int]] = None
    qk_norm: bool = True
    # total attention width (the reference's attention_dim, vit.py:884) —
    # None = token dim; per-head dim becomes head_dim = attention // heads
    attention_dim: Optional[int] = None

    def _mlp_widths(self, dim):
        if self.mlp_structure:
            return tuple(self.mlp_structure)
        return (int(dim * self.mlp_ratio),)

    @nn.compact
    def __call__(self, x, bias=None, train: bool = False):
        dim = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + MultiHeadAttention(
            self.n_heads,
            head_dim=(
                self.attention_dim // self.n_heads
                if self.attention_dim
                else None
            ),
            dropout=self.dropout,
            qk_norm=self.qk_norm,
        )(y, bias=bias, train=train)
        y = nn.LayerNorm(epsilon=1e-5)(x)
        if self.moe_experts > 0:
            from adell_mri_tpu.models.layers.moe import MoEFFN

            y, aux = MoEFFN(
                n_experts=self.moe_experts,
                d_ff=max(self._mlp_widths(dim)),
                name="moe",
            )(y)
            if self.is_mutable_collection("moe_aux"):
                self.sow("moe_aux", "aux_loss", aux)
            return x + y
        # single-entry structures keep the historical Dense_0/Dense_1
        # param names (flax auto-numbering), so checkpoints stay loadable
        for width in self._mlp_widths(dim):
            y = nn.Dense(width)(y)
            y = nn.gelu(y, approximate=False)  # torch-GELU (erf) parity
            if self.dropout > 0 and train:
                y = nn.Dropout(self.dropout)(y, deterministic=False)
        y = nn.Dense(dim)(y)
        return x + y


class TransformerBlockStack(nn.Module):
    """Stack with optional intermediate returns (parity: vit.py:1258)."""

    n_blocks: int
    n_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    moe_experts: int = 0
    mlp_structure: Optional[Sequence[int]] = None
    qk_norm: bool = True
    attention_dim: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_at: Optional[Sequence[int]] = None,
    ):
        outs = []
        for i in range(self.n_blocks):
            x = TransformerBlock(
                self.n_heads, self.mlp_ratio, self.dropout,
                moe_experts=self.moe_experts,
                mlp_structure=self.mlp_structure, qk_norm=self.qk_norm,
                attention_dim=self.attention_dim,
                name=f"block_{i}"
            )(x, train=train)
            if return_at is not None and i in return_at:
                outs.append(x)
        if return_at is not None:
            return x, outs
        return x


class LinearEmbedding(nn.Module):
    """
    Patchify + embed + [class token] + [registers] + positional embedding
    (parity: vit.py:389). Input [B, *S, C] -> tokens [B, N(+extra), E].
    """

    patch_size: Sequence[int]
    embed_dim: int = 256
    embed_method: str = "linear"  # "linear" | "convolutional"
    use_class_token: bool = False
    n_registers: int = 0
    learnable_embedding: bool = True
    dropout: float = 0.0
    channel_to_token: bool = False
    # LayerNorm on the raw patch features before the linear projection —
    # the reference's map_to_out does this whenever out_dim differs from
    # the raw patch size (vit.py:533-537); off by default to keep existing
    # param trees, on for reference-checkpoint interop
    embed_norm: bool = False

    @staticmethod
    def n_patches(spatial, patch_size):
        return math.prod(s // p for s, p in zip(spatial, patch_size))

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        spatial = x.shape[1:-1]
        ndim = len(spatial)
        if isinstance(self.patch_size, (list, tuple)):
            p = tuple(self.patch_size)[:ndim]
            if len(p) < ndim:
                p = p + (p[-1],) * (ndim - len(p))
        else:
            p = _tuple(self.patch_size, ndim)
        if self.channel_to_token:
            tokens = x.reshape(b, -1, x.shape[-1]).transpose(0, 2, 1)
            tokens = nn.Dense(self.embed_dim)(tokens)
        elif self.embed_method == "convolutional":
            # TpuConv routes patchify by the measured auto policy
            # (ops/conv.py _pick_lowering); name pins the param path
            y = TpuConv(
                self.embed_dim, p, strides=p, padding="VALID",
                name="Conv_0",
            )(x)
            tokens = y.reshape(b, -1, self.embed_dim)
        else:
            # reshape into patches then linear project
            grid = [s // pi for s, pi in zip(spatial, p)]
            shape = [b]
            for g, pi in zip(grid, p):
                shape += [g, pi]
            y = x.reshape(shape + [x.shape[-1]])
            # interleave: [B, g0, p0, g1, p1, (g2, p2), C] -> [B, g..., p..., C]
            order = (
                [0]
                + [1 + 2 * d for d in range(ndim)]
                + [2 + 2 * d for d in range(ndim)]
                + [1 + 2 * ndim]
            )
            y = y.transpose(order)
            n = math.prod(grid)
            y = y.reshape(b, n, -1)
            if self.embed_norm:
                y = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(y)
            tokens = nn.Dense(self.embed_dim)(y)

        n_tok = tokens.shape[1]
        if self.learnable_embedding:
            pos = self.param(
                "pos_embedding",
                nn.initializers.truncated_normal(0.02),
                (1, n_tok, self.embed_dim),
            )
        else:
            pos = sinusoidal_positions(n_tok, self.embed_dim)[None]
        tokens = tokens + pos

        extra = []
        if self.use_class_token:
            cls = self.param(
                "class_token",
                nn.initializers.truncated_normal(0.02),
                (1, 1, self.embed_dim),
            )
            extra.append(jnp.tile(cls, (b, 1, 1)))
        if self.n_registers > 0:
            reg = self.param(
                "registers",
                nn.initializers.truncated_normal(0.02),
                (1, self.n_registers, self.embed_dim),
            )
            extra.append(jnp.tile(reg, (b, 1, 1)))
        if extra:
            tokens = jnp.concatenate(extra + [tokens], axis=1)
        if self.dropout > 0 and train:
            tokens = nn.Dropout(self.dropout)(tokens, deterministic=False)
        return tokens


class SeqPool(nn.Module):
    """Attention-weighted sequence pooling (parity: linear_blocks.py:178)."""

    @nn.compact
    def __call__(self, x):
        w = nn.Dense(1)(x)  # [B, N, 1]
        w = jax.nn.softmax(w, axis=1)
        return jnp.sum(x * w, axis=1)


class ViT(nn.Module):
    """Embedding + transformer stack (parity: vit.py:1618)."""

    patch_size: Sequence[int]
    embed_dim: int = 256
    n_blocks: int = 4
    n_heads: int = 4
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    embed_method: str = "linear"
    use_class_token: bool = False
    n_registers: int = 0
    moe_experts: int = 0
    learnable_embedding: bool = True
    embed_norm: bool = False
    mlp_structure: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_at: Optional[Sequence[int]] = None,
    ):
        tokens = LinearEmbedding(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            embed_method=self.embed_method,
            use_class_token=self.use_class_token,
            n_registers=self.n_registers,
            dropout=self.dropout,
            learnable_embedding=self.learnable_embedding,
            embed_norm=self.embed_norm,
        )(x, train=train)
        return TransformerBlockStack(
            self.n_blocks, self.n_heads, self.mlp_ratio, self.dropout,
            moe_experts=self.moe_experts,
            mlp_structure=self.mlp_structure,
        )(tokens, train=train, return_at=return_at)


class FactorizedViT(nn.Module):
    """
    Within-slice attention then between-slice attention (parity:
    vit.py:1804). Input [B, H, W, D, C]: patches within each slice attend
    first; slice summaries then attend across slices.
    """

    patch_size: Sequence[int]  # 2D patch within slice
    embed_dim: int = 256
    n_blocks: int = 4
    n_heads: int = 4
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    use_class_token: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, d, c = x.shape
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * d, h, w, c)
        tokens = LinearEmbedding(
            patch_size=tuple(self.patch_size[:2]),
            embed_dim=self.embed_dim,
            use_class_token=True,
        )(slices, train=train)
        tokens = TransformerBlockStack(
            self.n_blocks // 2 or 1,
            self.n_heads,
            self.mlp_ratio,
            self.dropout,
            name="within_slice",
        )(tokens, train=train)
        slice_repr = tokens[:, 0].reshape(b, d, self.embed_dim)
        pos = sinusoidal_positions(d, self.embed_dim)[None]
        slice_repr = slice_repr + pos
        if self.use_class_token:
            cls = self.param(
                "slice_class_token",
                nn.initializers.truncated_normal(0.02),
                (1, 1, self.embed_dim),
            )
            slice_repr = jnp.concatenate(
                [jnp.tile(cls, (b, 1, 1)), slice_repr], axis=1
            )
        return TransformerBlockStack(
            self.n_blocks - self.n_blocks // 2 or 1,
            self.n_heads,
            self.mlp_ratio,
            self.dropout,
            name="between_slice",
        )(slice_repr, train=train)


# ---------------------------------------------------------------------------
# SWIN
# ---------------------------------------------------------------------------


def window_partition(x, window: Sequence[int]):
    """[B, *S, C] -> [B*nW, prod(window), C] (parity: vit.py:95)."""
    b = x.shape[0]
    spatial = x.shape[1:-1]
    c = x.shape[-1]
    ndim = len(spatial)
    grid = [s // w for s, w in zip(spatial, window)]
    shape = [b]
    for g, w in zip(grid, window):
        shape += [g, w]
    y = x.reshape(shape + [c])
    order = (
        [0]
        + [1 + 2 * d for d in range(ndim)]
        + [2 + 2 * d for d in range(ndim)]
        + [1 + 2 * ndim]
    )
    y = y.transpose(order)
    return y.reshape(b * math.prod(grid), math.prod(window), c), grid


def window_unpartition(y, grid, window, spatial):
    ndim = len(spatial)
    c = y.shape[-1]
    b = y.shape[0] // math.prod(grid)
    y = y.reshape([b] + grid + list(window) + [c])
    order = [0]
    for d in range(ndim):
        order += [1 + d, 1 + ndim + d]
    order += [1 + 2 * ndim]
    y = y.transpose(order)
    return y.reshape([b] + list(spatial) + [c])


def swin_attention_mask(spatial, window, shift):
    """
    Mask preventing attention across wrapped boundaries after cyclic shift
    (parity: vit.py:132,167). Returns [nW, N, N] additive bias.
    """
    import numpy as np

    img = np.zeros(spatial, np.int32)
    cnt = 0
    slices_per_dim = []
    for s, w, sh in zip(spatial, window, shift):
        if sh == 0:
            slices_per_dim.append([slice(0, s)])
        else:
            slices_per_dim.append(
                [slice(0, s - w), slice(s - w, s - sh), slice(s - sh, s)]
            )
    import itertools

    for combo in itertools.product(*slices_per_dim):
        img[combo] = cnt
        cnt += 1
    img = jnp.asarray(img)[None, ..., None].astype(jnp.float32)
    windows, _ = window_partition(img, window)
    ids = windows[..., 0]  # [nW, N]
    diff = ids[:, :, None] - ids[:, None, :]
    return jnp.where(diff == 0, 0.0, -1e9)


class SWINTransformerBlock(nn.Module):
    """Windowed (optionally shifted) attention block (parity: vit.py:1004)."""

    window_size: Sequence[int]
    n_heads: int
    shift: bool = False
    mlp_ratio: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        spatial = x.shape[1:-1]
        window = tuple(
            min(w, s) for w, s in zip(self.window_size, spatial)
        )
        # standard SWIN: no shift along axes the window already spans —
        # shifting there only ADDS the wrap mask, cutting attention pairs
        # the unshifted block legitimately connects
        shift = tuple(
            w // 2 if (self.shift and w < s) else 0
            for w, s in zip(window, spatial)
        )
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5)(x)
        # pad to window multiples (standard SWIN): without this any stage
        # whose spatial size is not a multiple of the clamped window fails
        # window_partition's reshape
        pad = tuple((-s) % w for s, w in zip(spatial, window))
        if any(pad):
            y = jnp.pad(y, [(0, 0)] + [(0, p) for p in pad] + [(0, 0)])
        padded = y.shape[1:-1]
        if any(shift):
            y = jnp.roll(
                y, [-s for s in shift], axis=tuple(range(1, y.ndim - 1))
            )
            mask = swin_attention_mask(padded, window, shift)
        else:
            mask = None
        windows, grid = window_partition(y, window)
        if mask is not None:
            nw = mask.shape[0]
            b = windows.shape[0] // nw
            bias = jnp.tile(mask[None, :, None], (b, 1, 1, 1, 1)).reshape(
                windows.shape[0], 1, mask.shape[1], mask.shape[2]
            )
        else:
            bias = None
        attn_out = MultiHeadAttention(self.n_heads, dropout=self.dropout)(
            windows, bias=bias, train=train
        )
        y = window_unpartition(attn_out, grid, window, padded)
        if any(shift):
            y = jnp.roll(y, shift, axis=tuple(range(1, y.ndim - 1)))
        if any(pad):
            y = y[
                (slice(None),)
                + tuple(slice(0, s) for s in spatial)
                + (slice(None),)
            ]
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-5)(x)
        dim = x.shape[-1]
        y = nn.Dense(int(dim * self.mlp_ratio))(y)
        y = nn.gelu(y, approximate=False)  # torch-GELU (erf) parity
        y = nn.Dense(dim)(y)
        return x + y


class SWINTransformerBlockStack(nn.Module):
    """
    Hierarchical SWIN: stages of [window, shifted-window] pairs with patch
    merging between stages (parity: vit.py:1437). Returns per-stage features
    for decoder skips.
    """

    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2)
    n_heads: Sequence[int] = (3, 6, 12)
    window_size: Sequence[int] = (4, 4, 4)
    patch_size: Sequence[int] = (2, 2, 2)
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        p = tuple(self.patch_size[:ndim])
        # patchify conv routed by the measured auto policy
        # (ops/conv.py _pick_lowering); name pins the nn.Conv param path
        x = TpuConv(
            self.embed_dim, p, strides=p, padding="VALID", name="Conv_0"
        )(x)
        feats = []
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.n_heads)):
            for blk in range(depth):
                x = SWINTransformerBlock(
                    window_size=tuple(self.window_size[:ndim]),
                    n_heads=heads,
                    shift=(blk % 2 == 1),
                    dropout=self.dropout,
                    name=f"stage{stage}_block{blk}",
                )(x, train=train)
            feats.append(x)
            if stage < len(self.depths) - 1:
                # patch merging: space-to-depth + linear reduce
                dim *= 2
                x = TpuConv(
                    dim,
                    _tuple(2, ndim),
                    strides=_tuple(2, ndim),
                    padding="VALID",
                    name=f"merge{stage}",
                )(x)
        return x, feats


class SliceLinearEmbedding(nn.Module):
    """
    Per-slice patch embedding for 2.5D transformers (parity:
    SliceLinearEmbedding, vit.py:221): [B, H, W, D, C] -> per-slice token
    sequences [B, D, n_patches(+1), E] with a shared within-slice
    positional embedding and an optional per-slice class token.
    """

    patch_size: Sequence[int]  # (ph, pw)
    embed_dim: Optional[int] = None
    embed_method: str = "linear"
    use_class_token: bool = False
    learnable_embedding: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, d, c = x.shape
        ph, pw = self.patch_size[:2]
        dim = self.embed_dim or ph * pw * c
        slices = x.transpose(0, 3, 1, 2, 4).reshape(b * d, h, w, c)
        if self.embed_method == "convolutional":
            tok = nn.Conv(dim, (ph, pw), strides=(ph, pw), name="embed")(
                slices
            )
            tok = tok.reshape(b * d, -1, dim)
        else:
            gh, gw = h // ph, w // pw
            tok = slices.reshape(b * d, gh, ph, gw, pw, c)
            tok = tok.transpose(0, 1, 3, 2, 4, 5).reshape(
                b * d, gh * gw, ph * pw * c
            )
            tok = nn.Dense(dim, name="embed")(tok)
        n = tok.shape[1]
        if self.learnable_embedding:
            pos = self.param(
                "pos_embedding",
                nn.initializers.normal(0.02),
                (1, n, dim),
            )
        else:
            pos = sinusoidal_positions(n, dim)[None]
        tok = tok + pos
        if self.use_class_token:
            cls = self.param(
                "class_token", nn.initializers.zeros, (1, 1, dim)
            )
            tok = jnp.concatenate(
                [jnp.tile(cls, (b * d, 1, 1)), tok], axis=1
            )
            n = n + 1
        if self.dropout > 0 and train:
            tok = nn.Dropout(self.dropout)(tok, deterministic=False)
        return tok.reshape(b, d, n, dim)
