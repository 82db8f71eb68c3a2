"""
Functional train state.

Replaces the reference's Lightning adapter layer (the ``*/pl.py`` diamond
inheritance, SURVEY.md §2.4): model forward, optimizer state, EMA shadow and
mutable collections (batch stats) live in one pytree that flows through a
jit-compiled update.
"""

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # mutable flax collections (batch_stats etc.)
    variables: Any = None
    # EMA shadow params (teacher models / EMA validation); None disables
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.99)
    ema_final_decay: Optional[float] = struct.field(
        pytree_node=False, default=None
    )
    ema_n_steps: Optional[int] = struct.field(pytree_node=False, default=None)
    # "ema": exponential shadow; "swa": equal-weight running average of
    # params from ``swa_start_step`` on (stochastic weight averaging —
    # parity: the reference's Lightning --swa callback; here averaged
    # per step inside the jit update instead of per epoch)
    ema_mode: str = struct.field(pytree_node=False, default="ema")
    swa_start_step: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def create(
        cls,
        apply_fn: Callable,
        params: Any,
        tx: optax.GradientTransformation,
        variables: Any = None,
        with_ema: bool = False,
        ema_decay: float = 0.99,
        ema_final_decay: Optional[float] = None,
        ema_n_steps: Optional[int] = None,
        ema_mode: str = "ema",
        swa_start_step: int = 0,
    ) -> "TrainState":
        import jax.numpy as jnp  # local to keep module import light

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
            variables=variables,
            # a real copy: donation would otherwise see aliased buffers
            ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
            ema_decay=ema_decay,
            ema_final_decay=ema_final_decay,
            ema_n_steps=ema_n_steps,
            ema_mode=ema_mode,
            swa_start_step=swa_start_step,
        )

    def apply_gradients(self, grads, variables=None) -> "TrainState":
        from adell_mri_tpu.train.ema import ema_decay_at, ema_update

        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            if self.ema_mode == "swa":
                import jax.numpy as jnp

                # equal-weight running mean from swa_start_step on; before
                # that the shadow just tracks params (decay 0)
                n = jnp.maximum(
                    self.step.astype(jnp.float32) - self.swa_start_step, 0.0
                )
                decay = n / (n + 1.0)
            else:
                decay = ema_decay_at(
                    self.step,
                    self.ema_decay,
                    self.ema_final_decay,
                    self.ema_n_steps,
                )
            new_ema = ema_update(self.ema_params, new_params, decay)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            variables=variables if variables is not None else self.variables,
            ema_params=new_ema,
        )
