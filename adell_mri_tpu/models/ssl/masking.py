"""
Token maskers for MAE / iBOT / I-JEPA.

Parity target: adell_mri/utils/masking.py (:14,186,329, get_masker :471).
Jit-safe fixed-count masking: shuffles token indices with jax.random and
splits at a static count, so shapes stay static (no boolean gathers).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def random_masking(
    key: jax.Array, tokens: jax.Array, mask_ratio: float = 0.75
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """
    MAE-style random masking (parity: autoencoders.py random_masking:15).
    Returns (visible_tokens [B, N_keep, E], mask [B, N] with 1 = masked,
    restore_idx [B, N] to unshuffle).
    """
    b, n, e = tokens.shape
    n_keep = max(1, int(n * (1 - mask_ratio)))
    noise = jax.random.uniform(key, (b, n))
    shuffle = jnp.argsort(noise, axis=1)
    restore = jnp.argsort(shuffle, axis=1)
    keep_idx = shuffle[:, :n_keep]
    visible = jnp.take_along_axis(tokens, keep_idx[..., None], axis=1)
    mask = jnp.take_along_axis(
        jnp.concatenate(
            [jnp.zeros((b, n_keep)), jnp.ones((b, n - n_keep))], axis=1
        ),
        restore,
        axis=1,
    )
    return visible, mask, restore


def block_masking(
    key: jax.Array,
    grid: Sequence[int],
    n_blocks: int = 4,
    block_scale: Tuple[float, float] = (0.1, 0.25),
) -> jax.Array:
    """
    Contiguous block masking over a token grid (iBOT/I-JEPA style, parity:
    masking.py:186,329). Returns flat [prod(grid)] {0,1} mask with 1 =
    masked. Static shapes: blocks have a fixed max extent and are clipped.
    """
    ndim = len(grid)
    keys = jax.random.split(key, n_blocks * 2)
    mask = jnp.zeros(tuple(grid))
    coords = jnp.meshgrid(
        *[jnp.arange(g) for g in grid], indexing="ij"
    )
    for i in range(n_blocks):
        size_frac = jax.random.uniform(
            keys[2 * i], (ndim,),
            minval=block_scale[0] ** (1 / ndim),
            maxval=block_scale[1] ** (1 / ndim),
        )
        sizes = jnp.maximum(
            (jnp.asarray(grid) * size_frac).astype(jnp.int32), 1
        )
        starts = (
            jax.random.uniform(keys[2 * i + 1], (ndim,))
            * (jnp.asarray(grid) - sizes)
        ).astype(jnp.int32)
        inside = jnp.ones(tuple(grid), bool)
        for d in range(ndim):
            inside &= (coords[d] >= starts[d]) & (
                coords[d] < starts[d] + sizes[d]
            )
        mask = jnp.maximum(mask, inside.astype(jnp.float32))
    return mask.reshape(-1)


def get_masker(
    masker_type: str = "random",
    mask_ratio: float = 0.75,
    n_blocks: int = 4,
):
    """Masker factory (parity: masking.py:471)."""
    if masker_type == "random":
        def masker(key, tokens, grid=None):
            return random_masking(key, tokens, mask_ratio)

        return masker
    if masker_type == "block":
        def masker(key, tokens, grid):
            flat_mask = block_masking(key, grid, n_blocks=n_blocks)
            return None, jnp.tile(flat_mask[None], (tokens.shape[0], 1)), None

        return masker
    raise NotImplementedError(f"masker {masker_type!r}")
