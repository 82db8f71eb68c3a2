"""
Conditioning embedder with classifier-free-guidance dropout.

Parity target: adell_mri/modules/diffusion/embedder.py:14,109 — categorical
and numerical condition embeddings concatenated into one conditioning
vector, with ``uncondition_proba`` randomly replacing conditions by a
learned null embedding during training (used for classifier-free guidance,
network_factories.py:984-1016).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Embedder(nn.Module):
    cat_feat: Sequence[int] = ()  # cardinality per categorical condition
    n_num_feat: int = 0
    embedding_size: int = 64
    uncondition_proba: float = 0.0

    @nn.compact
    def __call__(
        self,
        x_cat: Optional[Sequence[jax.Array]] = None,
        x_num: Optional[jax.Array] = None,
        batch_size: Optional[int] = None,
        train: bool = False,
    ):
        parts = []
        b = batch_size
        if x_cat is not None:
            for i, card in enumerate(self.cat_feat):
                emb = nn.Embed(card, self.embedding_size, name=f"cat_{i}")(
                    x_cat[i].astype(jnp.int32)
                )
                parts.append(emb)
                b = emb.shape[0]
        if x_num is not None and self.n_num_feat > 0:
            parts.append(
                nn.Dense(self.embedding_size, name="num")(
                    x_num.astype(jnp.float32)
                )
            )
            b = x_num.shape[0]
        if not parts:
            if b is None:
                raise ValueError("need batch_size when unconditioned")
            null = self.param(
                "null_embedding",
                nn.initializers.normal(0.02),
                (1, self.embedding_size),
            )
            return jnp.tile(null, (b, 1))
        emb = jnp.concatenate(parts, axis=-1)
        emb = nn.Dense(self.embedding_size, name="merge")(emb)
        null = self.param(
            "null_embedding",
            nn.initializers.normal(0.02),
            (1, self.embedding_size),
        )
        if train and self.uncondition_proba > 0:
            rng = self.make_rng("uncondition")
            drop = jax.random.bernoulli(
                rng, self.uncondition_proba, (emb.shape[0], 1)
            )
            emb = jnp.where(drop, null, emb)
        return emb
