"""
Mixture-of-experts FFN with expert parallelism.

The reference has no MoE or model parallelism (SURVEY.md §2.5); this is the
TPU-native capability extension: a GShard-style top-1/top-2 routed FFN whose
expert weights are STACKED on a leading [E, ...] axis. Under pjit, sharding
that axis over a mesh axis ("model"/"expert") makes the dispatch/combine
einsums lower to all-to-alls over ICI — no hand-written collectives.

Dense dispatch math (einsum-friendly, fully static shapes):
  gate [S, E] -> top-k experts per token, position-in-expert by cumsum,
  tokens beyond ``capacity`` are dropped (standard GShard semantics);
  dispatch [S, E, C] one-hot tensor routes tokens in, combine = dispatch *
  gate prob routes expert outputs back.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _top1_dispatch(gate_logits, capacity: int):
    """Returns (dispatch [S,E,C], combine [S,E,C], aux_loss)."""
    s, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)  # [S]
    expert_prob = jnp.max(probs, axis=-1)  # [S]
    onehot = jax.nn.one_hot(expert_idx, e)  # [S, E]
    # position of each token within its expert's queue
    position = jnp.cumsum(onehot, axis=0) * onehot - onehot  # [S, E]
    pos_in_expert = jnp.sum(position, axis=-1)  # [S]
    keep = pos_in_expert < capacity
    dispatch = (
        onehot[:, :, None]
        * jax.nn.one_hot(pos_in_expert, capacity)[:, None, :]
        * keep[:, None, None]
    )  # [S, E, C]
    combine = dispatch * expert_prob[:, None, None]
    # load-balancing auxiliary loss (Switch/GShard): E * sum_e f_e * p_e
    frac_tokens = jnp.mean(onehot, axis=0)
    frac_probs = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_tokens * frac_probs)
    return dispatch, combine, aux


class MoEFFN(nn.Module):
    """
    Routed feed-forward block over tokens [B, N, D] (or [S, D]).

    ``apply`` returns ``(y, aux_loss)``; add ``aux_weight * aux_loss`` to
    the training objective for load balancing. Shard params under pjit
    with :func:`shard_params_moe` to run expert-parallel.
    """

    n_experts: int = 4
    d_ff: Optional[int] = None
    capacity_factor: float = 1.25
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        orig_shape = x.shape
        d = x.shape[-1]
        d_ff = self.d_ff or 4 * d
        tokens = x.reshape(-1, d)  # [S, D]
        s = tokens.shape[0]
        capacity = max(1, int(self.capacity_factor * s / self.n_experts))

        gate_logits = nn.Dense(self.n_experts, use_bias=False, name="gate")(
            tokens
        )
        dispatch, combine, aux = _top1_dispatch(gate_logits, capacity)

        w_in = self.param(
            "w_in",
            nn.initializers.lecun_normal(),
            (self.n_experts, d, d_ff),
        )
        w_out = self.param(
            "w_out",
            nn.initializers.lecun_normal(),
            (self.n_experts, d_ff, d),
        )
        # dispatch tokens to expert queues: [E, C, D]
        expert_in = jnp.einsum("sec,sd->ecd", dispatch, tokens)
        h = self.activation(jnp.einsum("ecd,edf->ecf", expert_in, w_in))
        expert_out = jnp.einsum("ecf,efd->ecd", h, w_out)
        # combine back to tokens, weighted by the gate probability
        y = jnp.einsum("sec,ecd->sd", combine, expert_out)
        return y.reshape(orig_shape), aux


def shard_params_moe(params, mesh, axis: str = "model"):
    """Lays MoE expert-stacked leaves ([E, ...]) over ``axis``; everything
    else replicates. Compose after/with shard_params for DP+EP."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    axis_size = mesh.shape[axis]

    def place(path, x):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if (
            ("w_in" in names or "w_out" in names)
            and x.ndim >= 2
            and x.shape[0] % axis_size == 0
        ):
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
