"""
Activation registry (parity: adell_mri/modules/activations.py
activation_factory). All map to jax.nn primitives, which XLA fuses into the
preceding matmul/conv, so there is no reason for the reference's hand-written
analytic gradients here.
"""

from typing import Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


def _identity(x):
    return x


activation_factory: Dict[str, Callable] = {
    "identity": _identity,
    "linear": _identity,
    "elu": jax.nn.elu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),  # torch GELU default is exact erf
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


class NormalizedActivation(nn.Module):
    """
    Normalized activation from https://arxiv.org/abs/2208.13315 (parity:
    adell_mri/modules/activations.py:335): output =
    (lambda + f(alpha)) * (act(x) - mu) where lambda normalizes both the
    activation second moment (rho) and its gradient second moment
    (rho'); mu/rho/rho' are momentum-tracked in a mutable
    ``activation_stats`` collection.

    Where the reference maintains a hand-written analytic-gradient factory
    per activation, here the elementwise derivative is one ``jax.jvp``
    against a ones-tangent — exact for any activation.
    """

    act_str: str = "relu"
    momentum: float = 0.9
    L: float = 0.8
    U: float = 1.2
    f_scale: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.act_str)
        alpha = self.param(
            "alpha", lambda k: jnp.zeros((1,), jnp.float32)
        )
        mu = self.variable(
            "activation_stats", "mu", lambda: jnp.zeros((1,), jnp.float32)
        )
        rho = self.variable(
            "activation_stats", "rho", lambda: jnp.ones((1,), jnp.float32)
        )
        rho_dash = self.variable(
            "activation_stats", "rho_dash",
            lambda: jnp.ones((1,), jnp.float32),
        )

        y, dy = jax.jvp(act, (x,), (jnp.ones_like(x),))
        rho_now = jnp.mean(jnp.square(y)) / jnp.maximum(jnp.var(x), 1e-8)
        rho_dash_now = jnp.mean(jnp.square(dy))
        mu_now = jnp.mean(y)

        def bounded_update(old, new):
            out_of_bounds = jnp.logical_or(
                new < old * self.L, new > old * self.U
            )
            blended = old * self.momentum + (1 - self.momentum) * new
            return jnp.where(out_of_bounds, old, blended)

        # the mutability guard mirrors GlobalBatchNorm (adn.py): steps that
        # thread only params call apply() without marking activation_stats
        # mutable, which would raise on the first assignment
        if train and self.is_mutable_collection("activation_stats"):
            rho.value = bounded_update(rho.value, rho_now)
            rho_dash.value = bounded_update(rho_dash.value, rho_dash_now)
            mu.value = (
                mu.value * self.momentum + (1 - self.momentum) * mu_now
            )
        lam = jnp.sqrt(
            (rho.value + rho_dash.value)
            / jnp.maximum(2 * rho.value * rho_dash.value, 1e-8)
        )
        return (lam + self.f_scale * jnp.tanh(alpha)) * (y - mu.value)
