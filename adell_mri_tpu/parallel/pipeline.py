"""
Pipeline parallelism: GPipe-style microbatched execution over a mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2.5 — its
entire distributed surface is Lightning DDP). This module adds the TPU-native
pipeline primitive: stages live on consecutive devices of a mesh axis, the
microbatch stream flows through a ``ppermute`` ring inside one jitted
``shard_map`` program, and the schedule is the classic GPipe fill-drain
(bubble fraction (S-1)/(M+S-1)). Activations transfer over ICI; no host
involvement.

Design notes (scaling-book recipe):
- stage parameters are STACKED on a leading axis [S, ...] and sharded over
  the pipeline mesh axis, so each device holds exactly its stage's weights;
- one ``lax.fori_loop`` runs M + S - 1 ticks; device s computes microbatch
  t - s at tick t (devices idle in the fill/drain bubble compute garbage
  that is masked out of the output);
- outputs are valid on the LAST stage only; a ``psum`` over the masked
  per-device buffers replicates them (cheap: one output-sized collective);
- the schedule is REVERSE-DIFFERENTIABLE: the fori_loop has static bounds
  (lowers to scan) and ppermute transposes to the inverse ring, so
  ``jax.grad`` through ``pipeline_apply`` reproduces the sequential
  model's gradients exactly (tested) — this is trainable pipeline
  parallelism, not an inference-only primitive.
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    microbatches,
    mesh,
    axis: str = "model",
):
    """
    Runs ``y = stage_{S-1}(...stage_1(stage_0(x)))`` for every microbatch,
    pipelined over the ``axis`` devices of ``mesh``.

    Args:
        stage_fn: ``(params, x) -> y`` with y.shape == x.shape (equal-width
            stages — the usual transformer-block pipeline).
        stacked_params: pytree whose leaves have leading dim S (one slice
            per stage), e.g. built with ``jnp.stack([p0, p1, ...])``.
        microbatches: [M, mb, ...] input microbatch stack.
        mesh: the device mesh; ``axis`` must have size S.

    Returns:
        [M, mb, ...] outputs, replicated over ``axis``.
    """
    n_stages = mesh.shape[axis]
    n_micro = microbatches.shape[0]

    def local(params, xs):
        # this device's stage weights: leading stage axis is sharded to
        # size 1 inside shard_map
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(t, carry):
            incoming, outs = carry
            # stage 0 ingests microbatch t; later stages consume the ring
            m_in = jnp.clip(t, 0, n_micro - 1)
            x_in = jnp.where(stage == 0, xs[m_in], incoming)
            y = stage_fn(params, x_in)
            # the last stage finishes microbatch t - (S-1) at tick t
            m_out = t - (n_stages - 1)
            is_valid = jnp.logical_and(
                stage == n_stages - 1,
                jnp.logical_and(m_out >= 0, m_out < n_micro),
            )
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(
                    is_valid,
                    y,
                    jax.lax.dynamic_index_in_dim(
                        outs, jnp.clip(m_out, 0, n_micro - 1), 0,
                        keepdims=False,
                    ),
                ),
                jnp.clip(m_out, 0, n_micro - 1),
                0,
            )
            incoming = jax.lax.ppermute(y, axis, perm)
            return incoming, outs

        incoming0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)
        _, outs = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, tick, (incoming0, outs0)
        )
        # outputs are only valid on the last stage: zero elsewhere and
        # psum-replicate
        outs = jnp.where(stage == n_stages - 1, outs, 0.0)
        return jax.lax.psum(outs, axis)

    param_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(param_spec, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, microbatches)


def stack_stage_params(param_list):
    """[p_stage0, p_stage1, ...] -> one pytree with leading stage axis."""
    return jax.tree.map(lambda *ps: jnp.stack(ps), *param_list)
