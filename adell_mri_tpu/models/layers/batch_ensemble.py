"""
Batch-ensemble layers (rank-1 weight ensembles).

Parity targets: adell_mri/modules/layers/batch_ensemble.py — BatchEnsemble
(:14), BatchEnsembleWrapper (:150). A shared conv weight is modulated by
per-member input/output rank-1 vectors; at train time each sample draws a
random member, at eval the ensemble is averaged (or a member is selected).
"""

from typing import Optional

import flax.linen as nn
import jax

from adell_mri_tpu.models.layers.blocks import AdnFactory, _tuple, apply_adn, identity_adn


class BatchEnsembleConv(nn.Module):
    """
    Conv wrapped with rank-1 multiplicative input/output modulation per
    ensemble member (parity: batch_ensemble.py:14).
    """

    n_ensemble: int
    out_channels: int
    kernel_size: int = 3
    adn_fn: AdnFactory = identity_adn

    @nn.compact
    def __call__(self, x, train: bool = False, idx: Optional[int] = None):
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        r = self.param(
            "r", nn.initializers.normal(0.1), (self.n_ensemble, in_ch)
        ) + 1.0
        s = self.param(
            "s", nn.initializers.normal(0.1), (self.n_ensemble, self.out_channels)
        ) + 1.0
        conv = nn.Conv(
            self.out_channels, _tuple(self.kernel_size, ndim), padding="SAME"
        )

        def member(x, member_idx):
            ri = r[member_idx].reshape((1,) * (x.ndim - 1) + (in_ch,))
            si = s[member_idx].reshape((1,) * (x.ndim - 1) + (self.out_channels,))
            return conv(x * ri) * si

        if idx is not None:
            y = member(x, idx)
        elif train:
            rng = self.make_rng("ensemble")
            members = jax.random.randint(
                rng, (x.shape[0],), 0, self.n_ensemble
            )
            ri = r[members].reshape(
                (x.shape[0],) + (1,) * (x.ndim - 2) + (in_ch,)
            )
            si = s[members].reshape(
                (x.shape[0],) + (1,) * (x.ndim - 2) + (self.out_channels,)
            )
            y = conv(x * ri) * si
        else:
            ys = [member(x, i) for i in range(self.n_ensemble)]
            y = sum(ys) / self.n_ensemble
        y = apply_adn(self.adn_fn(self.out_channels), y, train)
        return y
