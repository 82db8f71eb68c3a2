"""
Self-supervised loss zoo.

Parity targets: adell_mri/modules/self_supervised/losses/ — VICRegLoss
(vicreg.py:30-165: variance hinge + covariance off-diagonal + invariance
MSE), VICRegLocalLoss (:168), simsiam/byol (functional.py:138,153),
barlow_twins (:106), NTXentLoss (ntxent.py:11), DinoLoss (dino.py — the
reference's only explicitly distributed code: async all_reduce centering and
Sinkhorn-Knopp), KoLeoLoss (koleo.py:12), ContrastiveDistanceLoss
(contrastive.py).

Cross-replica semantics (SURVEY.md §2.5, BASELINE north star): these
functions are written against the GLOBAL batch. Under pjit with the batch
axis sharded, jnp.mean/covariance contractions ARE global — XLA inserts the
all-reduces the reference does by hand with torch.distributed. Where an
explicit in-shard-map reduction is needed, pass ``axis_name`` and the
functions use lax.p* collectives.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _maybe_pmean(x, axis_name: Optional[str]):
    if axis_name is not None:
        return jax.lax.pmean(x, axis_name)
    return x


# ---------------------------------------------------------------------------
# non-contrastive pair losses
# ---------------------------------------------------------------------------


def cosine_similarity(a, b, eps=1e-8):
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)


def simsiam_loss(pred, target_stopgrad):
    """Negative cosine with stop-grad target (parity: functional.py:138)."""
    return -jnp.mean(
        cosine_similarity(pred, jax.lax.stop_gradient(target_stopgrad))
    )


def byol_loss(pred, target_stopgrad):
    """2 - 2*cos (parity: functional.py:153)."""
    return jnp.mean(
        2.0
        - 2.0
        * cosine_similarity(pred, jax.lax.stop_gradient(target_stopgrad))
    )


def vicreg_loss(
    z1,
    z2,
    lam: float = 25.0,
    mu: float = 25.0,
    nu: float = 0.1,
    gamma: float = 1.0,
    eps: float = 1e-4,
    axis_name: Optional[str] = None,
):
    """
    VICReg, formula-exact vs the reference (vicreg.py:30-165 —
    UNBIASED variance in the hinge, per-side var/cov halves, nu default
    0.1; tests/test_reference_parity.py executes the reference class).
    Stats are over the global batch under pjit; with shard_map pass
    axis_name for explicit pmean. Returns (total, dict of components).
    """

    def _one_side(z):
        n = z.shape[0]
        mean = _maybe_pmean(jnp.mean(z, axis=0), axis_name)
        zc = z - mean
        # torch.var default: unbiased /(n-1) (ref variance_loss :58).
        # Under an explicit axis the GLOBAL sum divides by (N-1): pmean of
        # per-shard /(n_local-1) terms would divide by N-P instead,
        # inflating variance with the shard count
        if axis_name is not None:
            n_total = n * jax.lax.psum(1, axis_name)
            var = jax.lax.psum(jnp.sum(zc**2, axis=0), axis_name) / (
                jnp.maximum(n_total - 1, 1)
            )
            cov = jax.lax.psum(zc.T @ zc, axis_name) / jnp.maximum(
                n_total - 1, 1
            )
        else:
            var = jnp.sum(zc**2, axis=0) / max(n - 1, 1)
            cov = (zc.T @ zc) / max(n - 1, 1)
        std = jnp.sqrt(var + eps)
        var_loss = jnp.mean(jax.nn.relu(gamma - std))
        d = z.shape[-1]
        off_diag = cov - jnp.diag(jnp.diag(cov))
        cov_loss = jnp.sum(off_diag**2) / d
        return var_loss, cov_loss

    v1, c1 = _one_side(z1)
    v2, c2 = _one_side(z2)
    # global-batch mean under an explicit axis (equal-size shards), so the
    # loss VALUE matches the pjit/global computation on every shard
    inv = _maybe_pmean(jnp.mean((z1 - z2) ** 2), axis_name)
    # the reference averages the two sides (vicreg_loss :141-150)
    var_loss = (v1 + v2) / 2
    cov_loss = (c1 + c2) / 2
    total = lam * inv + mu * var_loss + nu * cov_loss
    return total, {
        "invariance": inv,
        "variance": var_loss,
        "covariance": cov_loss,
    }


def vicregl_loss(
    z1,
    z2,
    local1,
    local2,
    coords1,
    coords2,
    alpha: float = 0.75,
    top_k: int = 4,
    **vicreg_kwargs,
):
    """
    VICRegL (parity: vicreg.py:168): global VICReg + local feature matching.
    local*: [B, N, F] feature maps (flattened grids); coords*: [B, N, d]
    absolute positions of each local feature (from the view crop boxes,
    ExposeTransformKeyMetad analogue). Matches by nearest coordinates both
    ways, takes the ``top_k`` best matches.
    """
    g_total, g_comp = vicreg_loss(z1, z2, **vicreg_kwargs)

    def match(a_feat, a_xy, b_feat, b_xy):
        d = jnp.sum(
            (a_xy[:, :, None, :] - b_xy[:, None, :, :]) ** 2, -1
        )  # [B, Na, Nb]
        nn_idx = jnp.argmin(d, axis=-1)  # [B, Na]
        nn_dist = jnp.min(d, axis=-1)
        b_matched = jnp.take_along_axis(
            b_feat, nn_idx[..., None], axis=1
        )
        pair_mse = jnp.mean((a_feat - b_matched) ** 2, axis=-1)  # [B, Na]
        k = min(top_k, pair_mse.shape[1])
        # select the k SPATIALLY closest pairs (VICRegL's gamma selection
        # runs on the coordinate-distance matrix, ref local_loss :237-239);
        # ranking by feature agreement instead let the term collapse —
        # gradient only ever reached pairs that already matched
        _, best_idx = jax.lax.top_k(-nn_dist, k)
        best = jnp.take_along_axis(pair_mse, best_idx, axis=1)
        return jnp.mean(best)

    local = match(local1, coords1, local2, coords2) + match(
        local2, coords2, local1, coords1
    )
    total = alpha * g_total + (1 - alpha) * local
    return total, {**g_comp, "local": local}


def barlow_twins_loss(z1, z2, lam: float = 5e-3, eps: float = 1e-5):
    """Cross-correlation to identity (parity: functional.py:106)."""
    n = z1.shape[0]
    z1n = (z1 - z1.mean(0)) / jnp.maximum(z1.std(0), eps)
    z2n = (z2 - z2.mean(0)) / jnp.maximum(z2.std(0), eps)
    c = (z1n.T @ z2n) / n
    on_diag = jnp.sum((jnp.diag(c) - 1.0) ** 2)
    off_diag = jnp.sum(c**2) - jnp.sum(jnp.diag(c) ** 2)
    return on_diag + lam * off_diag


def ntxent_loss(
    z1,
    z2,
    temperature: float = 1.0,
    eps: float = 1e-8,
    apply_relu: bool = True,
):
    """
    SimCLR NT-Xent over the (global) batch, formula-exact vs the
    reference (ntxent.py:11 — ReLU'd features and temperature 1.0 by
    default; positives pair i <-> i+n).
    """
    if apply_relu:
        z1 = jax.nn.relu(z1)
        z2 = jax.nn.relu(z2)
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    n = z1.shape[0]
    sim = z @ z.T / temperature
    mask = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(mask, -1e9, sim)
    targets = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(logp[jnp.arange(2 * n), targets])


# ---------------------------------------------------------------------------
# DINO / iBOT
# ---------------------------------------------------------------------------


def sinkhorn_knopp(
    scores, n_iter: int = 3, eps: float = 0.05, axis_name: Optional[str] = None
):
    """
    Sinkhorn normalization of teacher scores (parity: dino.py:174-181 —
    reference all_reduces row sums; global batch semantics here).
    """
    q = jnp.exp(scores / eps).T  # [K, B_local]
    # row (prototype) statistics are GLOBAL-batch quantities: the
    # reference all_reduces them (dino.py:174-181). Columns are
    # per-sample, so they stay local.
    if axis_name is not None:
        total = jax.lax.psum(jnp.sum(q), axis_name)
        B = q.shape[1] * jax.lax.psum(1, axis_name)
    else:
        total = jnp.sum(q)
        B = q.shape[1]
    q = q / total
    K = q.shape[0]
    for _ in range(n_iter):
        rows = jnp.sum(q, axis=1, keepdims=True)
        if axis_name is not None:
            rows = jax.lax.psum(rows, axis_name)
        q = q / jnp.maximum(rows, 1e-12) / K
        cols = jnp.sum(q, axis=0, keepdims=True)
        q = q / jnp.maximum(cols, 1e-12) / B
    return (q * B).T


def dino_loss(
    student_logits,
    teacher_logits,
    center,
    student_temp: float = 0.1,
    teacher_temp: float = 0.04,
    center_momentum: float = 0.9,
    use_sinkhorn: bool = False,
    axis_name: Optional[str] = None,
):
    """
    DINO cross-entropy between student log-probs and centered/sharpened
    teacher probs (parity: dino.py:121). Returns (loss, new_center) — the
    center EMA update is the reference's async all_reduce, realized here as
    a global batch mean inside the jit step.
    """
    teacher = jax.lax.stop_gradient(teacher_logits)
    if use_sinkhorn:
        t_probs = sinkhorn_knopp(teacher, axis_name=axis_name)
    else:
        t_probs = jax.nn.softmax((teacher - center) / teacher_temp, axis=-1)
    s_logp = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
    loss = -jnp.mean(jnp.sum(t_probs * s_logp, axis=-1))
    batch_center = _maybe_pmean(jnp.mean(teacher, axis=0), axis_name)
    new_center = center * center_momentum + batch_center * (
        1 - center_momentum
    )
    return loss, new_center


def koleo_loss(z, eps: float = 1e-8):
    """
    Kozachenko-Leonenko entropy regularizer (parity: koleo.py:12):
    -mean log(nearest neighbour distance) on normalized features.
    """
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    d = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, -1)
    d = d + jnp.eye(z.shape[0]) * 1e9
    nn_d = jnp.sqrt(jnp.maximum(jnp.min(d, axis=-1), eps))
    return -jnp.mean(jnp.log(nn_d + eps))


def contrastive_distance_loss(z1, z2, labels, margin: float = 1.0):
    """Siamese contrastive loss (parity: contrastive.py)."""
    d = jnp.sqrt(jnp.maximum(jnp.sum((z1 - z2) ** 2, -1), 1e-12))
    pos = labels * d**2
    neg = (1 - labels) * jax.nn.relu(margin - d) ** 2
    return jnp.mean(pos + neg)


def kl_divergence_loss(p_logits, q_logits):
    p = jax.nn.softmax(p_logits, -1)
    return jnp.mean(
        jnp.sum(
            p
            * (
                jax.nn.log_softmax(p_logits, -1)
                - jax.nn.log_softmax(q_logits, -1)
            ),
            axis=-1,
        )
    )


def mae_loss(pred_patches, target_patches, mask):
    """
    Masked-autoencoder reconstruction: MSE on masked patches only
    (parity: self_supervised/autoencoders.py random_masking usage).
    mask: [B, N] 1 = masked (to reconstruct).
    """
    per = jnp.mean((pred_patches - target_patches) ** 2, axis=-1)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ijepa_loss(pred_features, target_features, mask=None):
    """I-JEPA: L2 in representation space on the MASKED target blocks
    ([B, N] mask, 1 = target position). Without the mask the mean would be
    diluted by the unmasked majority where prediction is trivial (the
    context encoder saw those tokens)."""
    err = (pred_features - jax.lax.stop_gradient(target_features)) ** 2
    if mask is None:
        return jnp.mean(err)
    w = mask[..., None]
    return jnp.sum(err * w) / jnp.maximum(
        jnp.sum(w) * pred_features.shape[-1], 1.0
    )
