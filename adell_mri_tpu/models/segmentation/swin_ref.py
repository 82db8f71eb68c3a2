"""
Reference-compat SWIN-UNet: the EXACT module geometry and forward
semantics of the reference SWINUNet
(adell_mri/modules/segmentation/unetr.py:635) so reference SWIN
checkpoints import with voxel-exact forwards
(interop/torch_swin.py). The default ``SWINUNet``
(models/segmentation/unetr.py:270) remains the TPU-first redesign —
this module exists ONLY for checkpoint interop and therefore
reproduces the reference bug-for-bug:

1. **Shifted-block roll-discard** (vit.py:1216-1222): the forward
   computes the roll-back of the attention output and immediately
   overwrites it — the residual adds the STILL-SHIFTED attention
   (``X = shortcut + self.drop_op_1(shifted_X)``). We simply never
   roll back.
2. **Roll axes skip the first spatial dim** (vit.py:1171-1173:
   ``dims = [i + 1 for i in range(1, len(shifts) + 1)]`` on a
   channels-last tensor): a 3D shift rolls (y, z, channel), not
   (x, y, z).
3. **Windowed-MHA head/window transpose** (linear_blocks.py:402-404:
   ``V_tilde.transpose(1, 2).reshape(*b, t, hidden)`` with
   ``b = (batch, n_windows)`` swaps the WINDOW axis with the HEAD
   axis before flattening).
4. **Relative-position bias reshape** (linear_blocks.py:393-396:
   ``table[idx].reshape(-1, t, t)`` flattens (pair, head) pairs
   row-major into (head, q, k)).
5. **Attention-mask window partition is transposed** relative to the
   embedding's (vit.py:137-166: ``(w1 h) -> (h w) (w1 w2)`` puts the
   within-window index slowest, the embedding's rearrange puts the
   window index slowest).

Everything deterministic (masks, relative-position indices) is
precomputed in numpy at trace time; the compute path is plain XLA
(einsum attention + TpuConv convs).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adell_mri_tpu.models.layers.adn import get_adn_fn
from adell_mri_tpu.models.layers.blocks import _tuple, apply_adn
from adell_mri_tpu.models.layers.res_blocks import ResidualBlock
from adell_mri_tpu.ops.conv import TpuConv, TpuConvTranspose

__all__ = ["SWINUNetRef"]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _rel_pos_index(window: Sequence[int]) -> np.ndarray:
    """get_relative_position_indices (linear_blocks.py:16-50) in numpy:
    index [prod(w), prod(w)] into a [prod(2w-1), H] bias table."""
    coords = np.stack(
        np.meshgrid(*[np.arange(w) for w in window], indexing="ij")
    )
    flat = coords.reshape(len(window), -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = np.transpose(rel, (1, 2, 0)).astype(np.int64)
    for i in range(len(window)):
        rel[:, :, i] += window[i] - 1
        sides = [2 * w - 1 for w in window[i + 1 :]]
        if sides:
            rel[:, :, i] *= _prod(sides)
    return rel.sum(-1)


def _swin_ref_mask(
    grid: Sequence[int], win_p: Sequence[int], shift: Sequence[int]
) -> Optional[np.ndarray]:
    """generate_mask (vit.py:167-205) verbatim, including the transposed
    window partition of image_mask_to_attention_mask (:137-166) —
    ``grid``/``win_p``/``shift`` all in PATCH units."""
    if not any(s > 0 for s in shift):
        return None
    img = np.zeros(tuple(grid))
    slices = [
        (slice(0, -w), slice(-w, -s), slice(-s, None))
        for w, s in zip(win_p, shift)
    ]
    cnt = 0
    import itertools

    for combo in itertools.product(*slices):
        img[combo] = cnt
        cnt += 1
    # partition: (w1 h)(w2 w)(w3 d) -> (h w d) (w1 w2 w3), w_i SLOWEST
    nd = len(grid)
    shape = []
    for w, g in zip(win_p, grid):
        shape += [w, g // w]
    x = img.reshape(shape)
    perm = [2 * i + 1 for i in range(nd)] + [2 * i for i in range(nd)]
    x = np.transpose(x, perm).reshape(
        _prod(g // w for g, w in zip(grid, win_p)), _prod(win_p)
    )
    attn = x[:, None, :] - x[:, :, None]
    # torch: unsqueeze(1) - unsqueeze(2) = m[:, None, :] - m[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x, n_win, n_ps, patch=None):
    """Linear-embedding rearrange (vit.py:612-641, channels_last):
    ``b (w1 h x) (w2 w y) (w3 d z) c -> b (w1 w2 w3) (h w d) (x y z c)``
    (``patch=None`` drops the x/y/z factors — the conv-embedding grid
    variant). The WINDOW index is slowest within each axis."""
    nd = len(n_win)
    b, c = x.shape[0], x.shape[-1]
    per_axis = 3 if patch is not None else 2
    shape = [b]
    for i in range(nd):
        shape += [n_win[i], n_ps[i]] + ([patch[i]] if patch else [])
    shape += [c]
    x = x.reshape(shape)
    perm = [0]
    perm += [1 + per_axis * i for i in range(nd)]  # w1 w2 w3
    perm += [2 + per_axis * i for i in range(nd)]  # h w d
    if patch is not None:
        perm += [3 + per_axis * i for i in range(nd)]  # x y z
    perm += [1 + per_axis * nd]  # c
    x = x.transpose(perm)
    f = c * (_prod(patch) if patch else 1)
    return x.reshape(b, _prod(n_win), _prod(n_ps), f)


def _window_unpartition(tokens, n_win, n_ps, patch, c):
    """Inverse of the LINEAR rearrange (rearrange_inverse_basic,
    vit.py:769-787) back to a channels-last image."""
    nd = len(n_win)
    b = tokens.shape[0]
    shape = [b] + list(n_win) + list(n_ps) + list(patch) + [c]
    x = tokens.reshape(shape)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i, 1 + 2 * nd + i]
    perm += [1 + 3 * nd]
    x = x.transpose(perm)
    spatial = [w * p * q for w, p, q in zip(n_win, n_ps, patch)]
    return x.reshape([b] + spatial + [c])


def _rescale_channels_major(x, scale):
    """einops_rescale (vit.py:33-46) on a channels-last tensor:
    ``b c (h p1) (w p2) (d p3) -> b (c p1 p2 p3) h w d`` — output
    channel index is c-major over (c, p1, p2, p3)."""
    if all(s == 1 for s in scale):
        return x
    nd = x.ndim - 2
    b, c = x.shape[0], x.shape[-1]
    shape = [b]
    for i in range(nd):
        shape += [x.shape[1 + i] // scale[i], scale[i]]
    shape += [c]
    x = x.reshape(shape)
    perm = [0] + [1 + 2 * i for i in range(nd)] + [1 + 2 * nd]
    perm += [2 + 2 * i for i in range(nd)]
    x = x.transpose(perm)
    out_spatial = [x.shape[1 + i] for i in range(nd)]
    return x.reshape([b] + out_spatial + [c * _prod(scale)])


class SWINRefBlock(nn.Module):
    """One reference SWINTransformerBlock (vit.py:1004), bug-for-bug.

    Input/output: channels-last image ``[B, *image_size, in_channels]``
    (the torch module is channels-first but immediately move_axis's to
    channels-last, vit.py:1195)."""

    image_size: Tuple[int, ...]
    patch_size: Tuple[int, ...]
    window_size: Tuple[int, ...]
    in_channels: int
    shift_size: int = 0
    embed_dim: Optional[int] = None  # embedding_size/out_dim; None = raw
    attention_dim: Optional[int] = None
    hidden_dim: Optional[int] = None
    n_heads: int = 4
    mlp_widths: Tuple[int, ...] = (256, 256)
    mlp_dropout: float = 0.1  # get_adn_fn(1,"identity","gelu") default
    dropout_rate: float = 0.0
    dropout_rate_embedding: float = 0.0
    embed_method: str = "linear"
    use_pos_embed: bool = False
    scale: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = len(self.image_size)
        im, p, w = self.image_size, self.patch_size, self.window_size
        n_win = [s // ws for s, ws in zip(im, w)]
        n_ps = [s // pi // nw for s, pi, nw in zip(im, p, n_win)]
        f0 = _prod(p) * self.in_channels
        f = self.embed_dim if self.embed_dim else f0
        att = self.attention_dim or f
        hid = self.hidden_dim or f
        heads = self.n_heads
        t = _prod(n_ps)
        n_windows = _prod(n_win)
        b = x.shape[0]

        shortcut = x
        ss = [self.shift_size] * nd
        if any(s > 0 for s in ss):
            # quirk 2: dims = [i+1 for i in range(1, len+1)] on the
            # channels-last tensor -> axes (2..nd+1): skips the first
            # spatial axis and rolls the CHANNEL axis
            x = jnp.roll(
                x, shift=[-s for s in ss], axis=list(range(2, nd + 2))
            )

        # --- embedding (LinearEmbedding, channels_last) ---
        if self.embed_method == "convolutional":
            tok = TpuConv(
                f, tuple(p), strides=tuple(p), padding="VALID",
                name="embed_conv",
            )(x)
            tok = _window_partition(tok, n_win, n_ps, patch=None)
        else:
            tok = _window_partition(x, n_win, n_ps, patch=p)
            if self.embed_dim and self.embed_dim != f0:
                tok = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="embed_norm")(tok)
                tok = nn.Dense(self.embed_dim, name="embed_proj")(tok)
        if self.use_pos_embed:
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, t, f),
            )
            tok = tok + pos  # broadcasts over the window axis
        if self.dropout_rate_embedding > 0:
            tok = nn.Dropout(self.dropout_rate_embedding)(
                tok, deterministic=not train
            )

        # --- windowed MHA (linear_blocks.py:247) ---
        y = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="norm1")(tok)
        qkv_dim = att * 2 + hid
        qkv = nn.Dense(qkv_dim, use_bias=False, name="qkv")(y)
        qkv = qkv.reshape(b, n_windows, t, heads, qkv_dim // heads)
        qkv = jnp.swapaxes(qkv, 2, 3)  # [b, W, H, t, dqkv]
        da, dv = att // heads, hid // heads
        q = qkv[..., :da]
        k = qkv[..., da : 2 * da]
        v = qkv[..., 2 * da : 2 * da + dv]
        q = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="qnorm")(q)
        k = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="knorm")(k)
        s = jnp.einsum(
            "bwhtd,bwhsd->bwhts", q, k,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(att / heads)
        # relative position bias: table indexed by window in VOXELS
        # (the reference passes the voxel window to the MHA), sliced to
        # the actual token count, with the reshape quirk (4)
        table = self.param(
            "rpb",
            nn.initializers.truncated_normal(0.02),
            (_prod(2 * wi - 1 for wi in w), heads),
        )
        idx = _rel_pos_index(w)[:t, :t].reshape(-1)
        bias = table[idx].reshape(-1, t, t)
        s = s + bias[None, None]
        grid = [s_ // pi for s_, pi in zip(im, p)]
        win_p = [wi // pi for wi, pi in zip(w, p)]
        mask = _swin_ref_mask(grid, win_p, ss)
        if mask is not None:
            s = s + jnp.asarray(mask)[None, :, None]
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        if self.dropout_rate > 0:
            a = nn.Dropout(self.dropout_rate)(a, deterministic=not train)
        vt = jnp.einsum(
            "bwhts,bwhsd->bwhtd", a, v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        # quirk 3: transpose(1, 2) swaps WINDOW and HEAD axes before the
        # flatten (torch reshape is row-major, same as jnp)
        vt = jnp.swapaxes(vt, 1, 2).reshape(b, n_windows, t, hid)
        attn_tok = nn.Dense(f, name="proj")(vt)

        # --- back to image space ---
        if self.embed_dim and self.embed_dim != f0:
            attn_tok = nn.Dense(f0, name="map_in")(attn_tok)
        attn_img = _window_unpartition(
            attn_tok, n_win, n_ps, p, self.in_channels
        )
        # quirk 1: the roll-back (vit.py:1217) is computed then DISCARDED
        # by the residual add (vit.py:1222) — so it is never applied
        if self.dropout_rate > 0:
            attn_img = nn.Dropout(self.dropout_rate)(
                attn_img, deterministic=not train
            )
        x = shortcut + attn_img

        # --- MLP on image channels (vit.py:1139-1144) ---
        y = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, name="norm2")(x)
        for j, width in enumerate(self.mlp_widths):
            y = nn.Dense(width, name=f"mlp_{j}")(y)
            # adn_fn ordering NDA: identity-norm -> dropout -> gelu
            if self.mlp_dropout > 0:
                y = nn.Dropout(self.mlp_dropout)(
                    y, deterministic=not train
                )
            y = nn.gelu(y, approximate=False)
        if not self.mlp_widths:
            if self.mlp_dropout > 0:
                y = nn.Dropout(self.mlp_dropout)(
                    y, deterministic=not train
                )
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.in_channels, name=f"mlp_{len(self.mlp_widths)}")(y)
        if self.dropout_rate > 0:
            y = nn.Dropout(self.dropout_rate)(y, deterministic=not train)
        x = x + y

        if self.scale is not None:
            x = _rescale_channels_major(x, list(self.scale))
        return x


class SWINUNetRef(nn.Module):
    """Reference-compat SWINUNet (unetr.py:635): per-stage
    SWINTransformerBlockStacks with in-block strided rescales, conv
    reconstruction ops, and the inherited UNet decoder. Channels-last.

    ``shift_sizes``/``n_heads``/``embedding_size``/``strides`` follow
    arg_compliance (unetr.py:821-846): per-stage lists, strides
    per-axis. ``mlp_structure`` is a width list or a float multiplier
    of the stage's channel count (vit.py:1114-1115)."""

    image_size: Sequence[int]
    patch_size: Sequence[int]
    window_size: Sequence[int]
    shift_sizes: Any = (0, 1)
    depth: Sequence[int] = (16, 32, 64)
    strides: Any = None
    embedding_size: Any = None
    n_heads: Any = 4
    mlp_structure: Any = (256, 256)
    embed_method: str = "linear"
    norm_type: str = "instance"
    activation_fn: str = "swish"
    dropout_param: float = 0.0
    dropout_rate: float = 0.0
    link_type: str = "identity"
    upscale_type: str = "transpose"
    kernel_sizes: Sequence[int] = (3, 3, 3)
    n_classes: int = 2
    in_channels: int = 1

    def _normalized(self):
        nd = len(self.image_size)
        n = len(self.depth)
        shifts = list(self.shift_sizes)
        if shifts and isinstance(shifts[0], int):
            shifts = [shifts for _ in range(n)]
        heads = self.n_heads
        if isinstance(heads, int):
            heads = [heads] * n
        embed = self.embedding_size
        if embed is None or isinstance(embed, int):
            embed = [embed] * n
        strides = self.strides
        if strides is None:
            strides = [2] * n
        strides = [
            [s] * nd if isinstance(s, int) else list(s) for s in strides
        ]
        return shifts, list(heads), list(embed), strides

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        nd = len(self.image_size)
        shifts, heads, embed, strides = self._normalized()
        depth = list(self.depth)
        n = len(depth)
        adn = get_adn_fn(
            nd, self.norm_type, self.activation_fn, self.dropout_param
        )
        layer_adn = get_adn_fn(nd, "layer", None, 0.0)

        def conv_block(z, cin, cout, k, prefix):
            # conv_block_3d (unet.py:260): conv(in,in,k) -> adn -> conv(in,out,k)
            z = TpuConv(
                cin, _tuple(k, nd), padding="SAME",
                name=f"{prefix}_Conv_0",
            )(z)
            z = apply_adn(adn(cin, name=f"{prefix}_adn_in"), z, train)
            return TpuConv(
                cout, _tuple(k, nd), padding="SAME",
                name=f"{prefix}_Conv_1",
            )(z)

        def stage_mlp_widths(cin):
            if isinstance(self.mlp_structure, float):
                return (int(cin * self.mlp_structure),)
            return tuple(self.mlp_structure)

        # first encoder (init_first_encoder :847-858)
        z0 = apply_adn(adn(self.in_channels, name="first_adn_0"), x, train)
        z0 = conv_block(z0, self.in_channels, depth[0], 3, "first")
        z0 = apply_adn(adn(depth[0], name="first_adn_out"), z0, train)

        # swin stages (init_swin_blocks :865-917)
        def run_stack(z, s_idx, image_size, cin, scale, first_stack):
            for b_idx, shift in enumerate(shifts[s_idx]):
                first_block = first_stack and b_idx == 0
                z = SWINRefBlock(
                    image_size=tuple(image_size),
                    patch_size=tuple(self.patch_size),
                    window_size=tuple(self.window_size),
                    in_channels=cin,
                    shift_size=shift,
                    embed_dim=embed[s_idx],
                    attention_dim=embed[s_idx],
                    hidden_dim=embed[s_idx],
                    n_heads=heads[s_idx],
                    mlp_widths=stage_mlp_widths(cin),
                    dropout_rate=self.dropout_rate,
                    dropout_rate_embedding=(
                        self.dropout_rate if first_stack else 0.0
                    ),
                    embed_method=(
                        self.embed_method if first_block else "linear"
                    ),
                    use_pos_embed=first_block,
                    scale=(
                        tuple(scale)
                        if b_idx == len(shifts[s_idx]) - 1
                        else None
                    ),
                    name=f"swin{s_idx}_blk{b_idx}",
                )(z, train=train)
            return z

        curr = run_stack(
            x, 0, self.image_size, self.in_channels, (1,) * nd, True
        )
        # first_rec_op (init_reconstruction_ops :923-930)
        rec = apply_adn(
            layer_adn(self.in_channels, name="rec_first_ln"), curr, train
        )
        rec = conv_block(rec, self.in_channels, depth[0], 3, "rec_first")
        rec = apply_adn(adn(depth[0], name="rec_first_adn"), rec, train)
        encoding_out = [rec]

        image_size = list(self.image_size)
        cin = self.in_channels
        for i in range(n - 1):
            curr = run_stack(
                curr, i + 1, image_size, cin, strides[i], False
            )
            cin = cin * _prod(strides[i])
            image_size = [
                s // st for s, st in zip(image_size, strides[i])
            ]
            d = depth[1:][i]
            # reconstruction_ops[i] (:931-938): layer_norm ->
            # conv_block(in_rec, d, 1) -> conv_block(d, d, 3) -> adn
            r = apply_adn(
                layer_adn(cin, name=f"rec{i}_ln"), curr, train
            )
            r = conv_block(r, cin, d, 1, f"rec{i}_k1")
            r = conv_block(r, d, d, 3, f"rec{i}_k3")
            r = apply_adn(adn(d, name=f"rec{i}_adn"), r, train)
            encoding_out.append(r)

        curr = encoding_out[-1]

        # inherited UNet decoder (forward :987-1009)
        rev_depth = depth[-2::-1]
        rev_k = list(self.kernel_sizes)[-2::-1]
        up_strides = strides[::-1][1:]
        for i, d in enumerate(rev_depth):
            skip = encoding_out[-i - 2]
            if self.link_type == "identity":
                encoded = skip
            elif self.link_type == "conv":
                encoded = TpuConv(
                    d, _tuple(3, nd), padding="SAME", name=f"link_{i}"
                )(skip)
                encoded = apply_adn(
                    adn(d, name=f"link_adn_{i}"), encoded, train
                )
            elif self.link_type == "residual":
                encoded = ResidualBlock(
                    kernel_size=3,
                    inter_channels=None,
                    out_channels=d,
                    adn_fn=adn,
                    name=f"link_{i}",
                )(skip, train=train)
            else:
                raise NotImplementedError(self.link_type)
            if self.upscale_type == "transpose":
                curr = TpuConvTranspose(
                    d, tuple(up_strides[i]), name=f"up_{i}"
                )(curr)
            else:
                raise NotImplementedError(
                    "SWINUNetRef import surface covers "
                    "upscale_type='transpose'"
                )
            curr = jnp.concatenate([curr, encoded], axis=-1)
            curr = conv_block(curr, 2 * d, d, rev_k[i], f"dec_{i}")
            curr = apply_adn(adn(d, name=f"dec_adn_{i}"), curr, train)

        # final layer on cat([first_encoder, decoder]) (:1013-1018)
        curr = jnp.concatenate([z0, curr], axis=-1)
        out_ch = self.n_classes if self.n_classes > 2 else 1
        d0 = depth[0] * 2
        curr = TpuConv(
            d0, _tuple(3, nd), padding="SAME", name="Conv_0"
        )(curr)
        curr = apply_adn(adn(d0, name="final_adn"), curr, train)
        logits = nn.Conv(out_ch, _tuple(1, nd), name="Conv_1")(curr)
        if return_logits:
            return logits, None
        pred = (
            jax.nn.softmax(logits, -1)
            if self.n_classes > 2
            else jax.nn.sigmoid(logits)
        )
        return pred, None
