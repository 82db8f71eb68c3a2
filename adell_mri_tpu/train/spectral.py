"""
Spectral normalization of parameter trees.

Parity target: adell_mri/utils/pl_callbacks.py — SpectralNorm (:124):
power-iteration spectral normalization applied to weight matrices before
each training batch, with the u/v vectors kept outside the module.

Functional: ``spectral_normalize`` is a pure function (params, u_tree) ->
(normalized params, new u_tree) run inside the jit step — no hooks needed.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _is_weight(path: Tuple, leaf) -> bool:
    name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
    return name == "kernel" and getattr(leaf, "ndim", 0) >= 2


def init_spectral_state(params) -> Any:
    """One unit-norm u vector per >=2D kernel leaf (None elsewhere)."""

    def init(path, leaf):
        if not _is_weight(path, leaf):
            return None
        mat = leaf.reshape(-1, leaf.shape[-1])
        u = jnp.ones((mat.shape[0],), jnp.float32)
        return u / jnp.linalg.norm(u)

    return jax.tree_util.tree_map_with_path(init, params)


def spectral_normalize(
    params, u_tree, power_iterations: int = 1, eps: float = 1e-8
):
    """
    Divides each kernel by its leading singular value estimated with
    ``power_iterations`` rounds of power iteration (stop-grad, like the
    reference's torch.no_grad update). Returns (params, new_u_tree).
    """

    def one(path, leaf, u):
        if u is None:
            return leaf, None
        mat = leaf.reshape(-1, leaf.shape[-1]).astype(jnp.float32)
        v = None
        for _ in range(power_iterations):
            v = mat.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), eps)
            u = mat @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (mat @ v)
        return (leaf / jnp.maximum(sigma, eps)).astype(leaf.dtype), u

    flat_p = jax.tree_util.tree_flatten_with_path(params)
    leaves_u = jax.tree.leaves(
        u_tree, is_leaf=lambda x: x is None or hasattr(x, "ndim")
    )
    new_p, new_u = [], []
    for (path, leaf), u in zip(flat_p[0], leaves_u):
        p2, u2 = one(path, leaf, u)
        new_p.append(p2)
        new_u.append(u2)
    treedef = flat_p[1]
    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        jax.tree_util.tree_unflatten(treedef, new_u),
    )
