"""
Self-supervised model heads and architectures.

Parity targets: adell_mri/modules/self_supervised/ — IJEPA (jepa.py:25:
context/target ViT with block masking + narrow predictor), ViTMaskedAutoEncoder
(autoencoders.py:279), ConvNeXtAutoEncoder (autoencoders.py:60), DINO/iBOT
heads (dino.py:16/ibot.py:16: projection MLP + L2-norm + prototypes), and the
two-view wrapper pattern of SelfSLResNetPL (pl.py:433: online
backbone+projection+prediction vs EMA/stop-grad target) — functional here:
the EMA teacher is the train state's ema_params tree (SURVEY.md §5).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adell_mri_tpu.models.layers.blocks import _tuple
from adell_mri_tpu.models.layers.regularization import L2NormalizationLayer
from adell_mri_tpu.models.layers.vit import (
    LinearEmbedding,
    TransformerBlockStack,
    sinusoidal_positions,
)


class DINOHead(nn.Module):
    """Projection MLP -> L2 norm -> prototype logits (parity: dino.py:16)."""

    out_dim: int = 4096
    hidden_dim: int = 512
    bottleneck_dim: int = 128
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n_layers - 1):
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.gelu(x)
        x = nn.Dense(self.bottleneck_dim)(x)
        x = L2NormalizationLayer()(x)
        # weight-normalized prototypes
        protos = self.param(
            "prototypes",
            nn.initializers.normal(0.02),
            (self.bottleneck_dim, self.out_dim),
        )
        protos = protos / jnp.maximum(
            jnp.linalg.norm(protos, axis=0, keepdims=True), 1e-8
        )
        return x @ protos


class NonContrastiveWrapper(nn.Module):
    """
    backbone -> projection -> prediction (parity: SelfSLResNetPL two-view
    step, self_supervised/pl.py:433-500). Call with ret="projection" for the
    teacher path and ret="prediction" for the student.
    """

    backbone: Any
    projection_dims: Sequence[int] = (512, 128)
    prediction_dims: Sequence[int] = (64, 128)

    @nn.compact
    def __call__(self, x, train: bool = False, ret: str = "prediction"):
        local = None
        if ret == "local":
            # VICRegL: spatial feature map projected position-wise with the
            # SAME projector weights (Dense applies on the last axis)
            local = self.backbone(x, train=train, return_feature_map=True)
            feats = jnp.mean(local, axis=tuple(range(1, local.ndim - 1)))
        else:
            feats = self.backbone(x, train=train, return_features=True)
        proj_layers = [
            nn.Dense(d, name=f"proj_{i}")
            for i, d in enumerate(self.projection_dims)
        ]

        def project(y):
            for i, layer in enumerate(proj_layers):
                y = layer(y)
                if i < len(proj_layers) - 1:
                    y = nn.relu(y)
            return y

        proj = nn.LayerNorm(name="proj_norm")(project(feats))
        if ret == "local":
            return proj, project(local)
        pred = proj
        for i, d in enumerate(self.prediction_dims):
            pred = nn.Dense(d, name=f"pred_{i}")(pred)
            if i < len(self.prediction_dims) - 1:
                pred = nn.relu(pred)
        if ret == "representation":
            return feats
        if ret == "projection":
            return proj
        return pred


class ViTMaskedAutoEncoder(nn.Module):
    """
    MAE (parity: autoencoders.py:279): encode visible tokens, decode full
    set with mask tokens, reconstruct voxel patches.
    """

    patch_size: Sequence[int] = (4, 4, 4)
    embed_dim: int = 192
    n_blocks: int = 4
    n_heads: int = 4
    decoder_dim: int = 96
    decoder_blocks: int = 2
    mask_ratio: float = 0.75

    @nn.compact
    def __call__(self, x, rng=None, train: bool = False):
        from adell_mri_tpu.models.ssl.masking import random_masking

        ndim = x.ndim - 2
        p = tuple(self.patch_size[:ndim])
        b = x.shape[0]
        spatial = x.shape[1:-1]
        grid = [s // pi for s, pi in zip(spatial, p)]
        import math

        n = math.prod(grid)
        patch_dim = math.prod(p) * x.shape[-1]

        # patchify (raw targets)
        shape = [b]
        for g, pi in zip(grid, p):
            shape += [g, pi]
        y = x.reshape(shape + [x.shape[-1]])
        order = (
            [0]
            + [1 + 2 * d for d in range(ndim)]
            + [2 + 2 * d for d in range(ndim)]
            + [1 + 2 * ndim]
        )
        target_patches = y.transpose(order).reshape(b, n, patch_dim)

        tokens = nn.Dense(self.embed_dim, name="patch_embed")(target_patches)
        tokens = tokens + sinusoidal_positions(n, self.embed_dim)[None]

        if rng is None:
            rng = self.make_rng("masking")
        visible, mask, restore = random_masking(rng, tokens, self.mask_ratio)
        enc = TransformerBlockStack(
            self.n_blocks, self.n_heads, name="encoder"
        )(visible, train=train)

        # decoder: re-insert mask tokens, unshuffle, add pos, decode
        dec_in = nn.Dense(self.decoder_dim, name="enc2dec")(enc)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_dim)
        )
        n_keep = dec_in.shape[1]
        mask_tokens = jnp.tile(mask_token, (b, n - n_keep, 1))
        full = jnp.concatenate([dec_in, mask_tokens], axis=1)
        full = jnp.take_along_axis(full, restore[..., None], axis=1)
        full = full + sinusoidal_positions(n, self.decoder_dim)[None]
        dec = TransformerBlockStack(
            self.decoder_blocks, self.n_heads, name="decoder"
        )(full, train=train)
        pred_patches = nn.Dense(patch_dim, name="reconstruct")(dec)
        return pred_patches, target_patches, mask


class ConvNeXtAutoEncoder(nn.Module):
    """Conv autoencoder (parity: autoencoders.py:60)."""

    depths: Sequence[int] = (16, 32, 64)
    n_classes_out: Optional[int] = None  # channels out; default = in

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        from adell_mri_tpu.models.layers.res_blocks import ConvNeXtBlock

        ndim = x.ndim - 2
        skips = []
        y = x
        for d in self.depths:
            y = nn.Conv(d, _tuple(3, ndim), strides=_tuple(2, ndim), padding="SAME")(y)
            y = ConvNeXtBlock(out_channels=d)(y, train=train)
        if return_features:
            return jnp.mean(y, axis=tuple(range(1, y.ndim - 1)))
        for d in reversed(self.depths[:-1]):
            y = nn.ConvTranspose(d, _tuple(2, ndim), strides=_tuple(2, ndim))(y)
            y = ConvNeXtBlock(out_channels=d)(y, train=train)
        y = nn.ConvTranspose(
            self.depths[0], _tuple(2, ndim), strides=_tuple(2, ndim)
        )(y)
        out_ch = self.n_classes_out or x.shape[-1]
        return nn.Conv(out_ch, _tuple(1, ndim))(y)


class IJEPA(nn.Module):
    """
    I-JEPA (parity: jepa.py:25): a context encoder sees unmasked tokens, a
    (EMA-weighted, stop-grad) target encoder sees everything; a narrow
    predictor regresses target features at masked positions. Masking uses
    multiplicative masks (static shapes) rather than gathers.

    Call: ``apply(vars, x, rng=key, train=...)`` -> (pred_f, target_f, mask).
    The caller passes the SAME module with ema params for the target branch
    via ``method=IJEPA.encode_target``.
    """

    patch_size: Sequence[int] = (4, 4, 4)
    embed_dim: int = 192
    n_blocks: int = 4
    n_heads: int = 4
    predictor_dim: int = 96
    predictor_blocks: int = 2
    n_target_blocks: int = 4

    def _embed(self, x):
        return LinearEmbedding(
            patch_size=tuple(self.patch_size[: x.ndim - 2]),
            embed_dim=self.embed_dim,
            embed_method="convolutional",
            name="embed",
        )(x)

    def _grid(self, x):
        ndim = x.ndim - 2
        p = tuple(self.patch_size[:ndim])
        return [s // pi for s, pi in zip(x.shape[1:-1], p)]

    @nn.compact
    def __call__(
        self, x, rng=None, train: bool = False, encode_only: bool = False
    ):
        from adell_mri_tpu.models.ssl.masking import block_masking

        tokens = self._embed(x)
        if encode_only:
            # target-branch embedding (serving/feature extraction with the
            # EMA params) — must live inside the compact scope: submodule
            # creation in a plain method raised AssignSubModuleError
            return TransformerBlockStack(
                self.n_blocks, self.n_heads, name="target_encoder"
            )(tokens, train=False)
        if rng is None:
            rng = self.make_rng("masking")
        grid = self._grid(x)
        mask = block_masking(
            rng, grid, n_blocks=self.n_target_blocks
        )  # [N], 1 = target region
        mask_b = jnp.tile(mask[None, :, None], (x.shape[0], 1, 1))
        # context encoder: masked-out tokens replaced by a learned token
        ctx_token = self.param(
            "ctx_mask_token",
            nn.initializers.normal(0.02),
            (1, 1, self.embed_dim),
        )
        ctx_in = tokens * (1 - mask_b) + ctx_token * mask_b
        ctx = TransformerBlockStack(
            self.n_blocks, self.n_heads, name="context_encoder"
        )(ctx_in, train=train)
        # predictor regresses features at target positions
        pred_in = nn.Dense(self.predictor_dim, name="ctx2pred")(ctx)
        pred = TransformerBlockStack(
            self.predictor_blocks, self.n_heads, name="predictor"
        )(pred_in, train=train)
        pred_f = nn.Dense(self.embed_dim, name="pred_out")(pred)
        # in-module target encoder (caller substitutes EMA params)
        tgt = TransformerBlockStack(
            self.n_blocks, self.n_heads, name="target_encoder"
        )(tokens, train=False)
        return pred_f, tgt, mask_b[..., 0]

    def encode_target(self, x):
        """Documented embedding API (``apply(vars, x,
        method=IJEPA.encode_target)``): delegates to the compact
        ``__call__`` so the submodules are created in a valid scope."""
        return self(x, encode_only=True)


class DINO(nn.Module):
    """
    DINO network (parity: self_supervised/dino.py:16): ViT encoder ->
    projection MLP -> L2 norm -> weight-normalized prototypes. Sinusoidal
    (non-learnable) positions so the SAME params serve global and local
    crops of different sizes (multi-crop training, DINOPL pl.py:1130).
    """

    patch_size: Sequence[int] = (4, 4, 4)
    embed_dim: int = 192
    n_blocks: int = 4
    n_heads: int = 4
    out_dim: int = 4096
    hidden_dim: int = 512
    bottleneck_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        tokens = LinearEmbedding(
            patch_size=tuple(self.patch_size[:ndim]),
            embed_dim=self.embed_dim,
            embed_method="convolutional",
            learnable_embedding=False,
            name="embed",
        )(x, train=train)
        enc = TransformerBlockStack(
            self.n_blocks, self.n_heads, name="encoder"
        )(tokens, train=train)
        pooled = jnp.mean(enc, axis=1)
        return DINOHead(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            bottleneck_dim=self.bottleneck_dim,
            name="head",
        )(pooled, train=train)


class IBOT(nn.Module):
    """
    iBOT (parity: self_supervised/ibot.py:16 + iBOTPL pl.py:1243): ViT
    encoder whose patch tokens are partially replaced by a learned mask
    token; a shared DINO head scores EVERY token against the prototypes.

    ``__call__(x, mask=..., train=...)`` returns
    (reduced [B, out_dim], token_logits [B, N, out_dim], mask [B, N]) —
    reduced is the mean of token logits (reference reduce_fn="mean",
    ibot.py reduce). Per-sample block masks (utils/masking.py parity) are
    drawn from the "masking" rng stream; static shapes throughout
    (multiplicative mask-token replacement, no gathers).
    """

    patch_size: Sequence[int] = (4, 4, 4)
    embed_dim: int = 192
    n_blocks: int = 4
    n_heads: int = 4
    out_dim: int = 4096
    hidden_dim: int = 512
    bottleneck_dim: int = 128
    n_mask_blocks: int = 4

    @nn.compact
    def __call__(self, x, mask: bool = False, train: bool = False, rng=None):
        from adell_mri_tpu.models.ssl.masking import block_masking

        ndim = x.ndim - 2
        p = tuple(self.patch_size[:ndim])
        grid = [s // pi for s, pi in zip(x.shape[1:-1], p)]
        b = x.shape[0]
        tokens = LinearEmbedding(
            patch_size=p,
            embed_dim=self.embed_dim,
            embed_method="convolutional",
            learnable_embedding=False,
            name="embed",
        )(x, train=train)
        n = tokens.shape[1]
        if mask:
            if rng is None:
                rng = self.make_rng("masking")
            masks = jax.vmap(
                lambda k: block_masking(k, grid, n_blocks=self.n_mask_blocks)
            )(jax.random.split(rng, b))  # [B, N]
            mask_token = self.param(
                "mask_token",
                nn.initializers.normal(0.02),
                (1, 1, self.embed_dim),
            )
            m = masks[..., None]
            tokens = tokens * (1 - m) + mask_token * m
        else:
            masks = jnp.zeros((b, n))
        enc = TransformerBlockStack(
            self.n_blocks, self.n_heads, name="encoder"
        )(tokens, train=train)
        token_logits = DINOHead(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            bottleneck_dim=self.bottleneck_dim,
            name="head",
        )(enc, train=train)
        reduced = jnp.mean(token_logits, axis=1)
        return reduced, token_logits, masks
