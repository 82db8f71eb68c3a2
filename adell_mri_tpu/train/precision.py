"""
Mixed-precision policy for train/eval steps.

Parity target: the reference passes Lightning ``Trainer(precision=...)``
(adell_mri/entrypoints/segmentation/train.py:785-803) which autocasts the
forward to 16-bit. TPU-native version: master params stay float32, the
forward (convs/matmuls — the MXU path) computes in bfloat16, and model
outputs are upcast to float32 so losses/softmax/metrics accumulate in f32.
Gradients flow through the downcast and arrive in f32 automatically (the
``astype`` VJP upcasts), so the optimizer sees full-precision updates and
no loss scaling is needed (bf16 has the f32 exponent range).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

# CLI surface accepts the Lightning spellings
_PRECISION_ALIASES = {
    "32": None,
    "32-true": None,
    "f32": None,
    "fp32": None,
    "bf16": jnp.bfloat16,
    "bf16-mixed": jnp.bfloat16,
    "bf16-true": jnp.bfloat16,
    # on TPU f16 has no hardware advantage over bf16 and needs loss
    # scaling; map the reference's "16" to bf16 (the TPU-native 16-bit)
    "16": jnp.bfloat16,
    "16-mixed": jnp.bfloat16,
    "16-true": jnp.bfloat16,
    "f16": jnp.bfloat16,
}


def compute_dtype(precision: Optional[str]):
    """Maps a CLI precision string to a compute dtype (None = full f32)."""
    if precision is None:
        return None
    key = str(precision).lower()
    if key not in _PRECISION_ALIASES:
        raise ValueError(
            f"unknown precision {precision!r}; "
            f"one of {sorted(_PRECISION_ALIASES)}"
        )
    return _PRECISION_ALIASES[key]


def cast_floats(tree: Any, dtype) -> Any:
    """Casts float array leaves to ``dtype``; ints/bools/keys untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def wrap_apply(apply_fn: Callable, precision: Optional[str]) -> Callable:
    """
    Wraps ``apply_fn(params, *args, **kwargs)`` in the mixed-precision
    policy: float leaves of params and positional inputs are downcast to
    the compute dtype, float outputs are upcast to f32. Identity when
    precision is full f32. Kwargs (rngs, conditioning flags) pass through
    uncast except float arrays, which are downcast too.
    """
    dtype = compute_dtype(precision)
    if dtype is None:
        return apply_fn

    def wrapped(params, *args, **kwargs):
        params = cast_floats(params, dtype)
        args = cast_floats(args, dtype)
        kwargs = {
            k: cast_floats(v, dtype) if k != "rngs" else v
            for k, v in kwargs.items()
        }
        out = apply_fn(params, *args, **kwargs)
        return cast_floats(out, jnp.float32)

    return wrapped
