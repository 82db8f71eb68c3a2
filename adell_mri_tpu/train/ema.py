"""
Exponential moving average of parameter pytrees.

Parity target: adell_mri/utils/utils.py:395 (ExponentialMovingAverage) —
shadow = shadow - (1-decay)*(shadow-params), with an optional linear ramp of
``decay`` to ``final_decay`` over ``n_steps``. Here the shadow is a second
param pytree carried in the train state and updated INSIDE the jit step
(SURVEY.md §5 "EMA teacher under pjit"), so teacher models (BYOL/semi-SL)
cost no extra host sync.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def ema_decay_at(
    step,
    decay: float,
    final_decay: Optional[float] = None,
    n_steps: Optional[int] = None,
):
    """Linear decay ramp (parity: utils.py:489-492), clamped to the
    [decay, final_decay] interval — clipping at 1.0 instead would
    overshoot a final_decay < 1 (freezing the teacher) and never stop a
    ramp-down (decay going negative diverges ema_update)."""
    if final_decay is None or n_steps is None:
        return jnp.asarray(decay, jnp.float32)
    slope = (final_decay - decay) / n_steps
    ramp = jnp.asarray(step, jnp.float32) * slope + decay
    lo, hi = min(decay, final_decay), max(decay, final_decay)
    return jnp.clip(ramp, lo, hi)


def ema_update(shadow, params, decay):
    """One EMA step over matching pytrees."""
    return jax.tree.map(
        lambda s, p: s - (1.0 - decay) * (s - p), shadow, params
    )
