"""
Activation registry (parity: adell_mri/modules/activations.py
activation_factory). All map to jax.nn primitives, which XLA fuses into the
preceding matmul/conv, so there is no reason for the reference's hand-written
analytic gradients here.
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _identity(x):
    return x


activation_factory: Dict[str, Callable] = {
    "identity": _identity,
    "linear": _identity,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "hard_shrink": lambda x, l=0.5: jnp.where(jnp.abs(x) > l, x, 0.0),
    "hard_tanh": jax.nn.hard_tanh,
    "leaky_relu": jax.nn.leaky_relu,
    "logsigmoid": jax.nn.log_sigmoid,
    "prelu": lambda x: jax.nn.leaky_relu(x, 0.25),
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "selu": jax.nn.selu,
    "celu": jax.nn.celu,
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "softmax": jax.nn.softmax,
    "softplus": jax.nn.softplus,
    "soft_shrink": lambda x, l=0.5: jnp.sign(x) * jnp.maximum(jnp.abs(x) - l, 0.0),
    "softsign": jax.nn.soft_sign,
    "tanh": jnp.tanh,
    "tanh_shrink": lambda x: x - jnp.tanh(x),
    "threshold": lambda x, t=0.0, v=0.0: jnp.where(x > t, x, v),
    "mish": jax.nn.mish,
    "hard_swish": jax.nn.hard_swish,
    "hard_sigmoid": jax.nn.hard_sigmoid,
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    if name is None:
        return _identity
    try:
        return activation_factory[name]
    except KeyError:
        raise NotImplementedError(
            f"activation {name!r}; available: {sorted(activation_factory)}"
        )
