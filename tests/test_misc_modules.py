"""GP head, conformal prediction, EWC, semi-SL losses, AHNet/MIMUNet tests."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.layers.conformal import AdaptivePredictionSets
from adell_mri_tpu.models.layers.gaussian_process import (
    GaussianProcessLayer,
    fit_covariance,
    predictive_logits,
)
from adell_mri_tpu.models.segmentation.ahnet import (
    AHNet,
    MIMUNet,
    transfer_2d_to_3d,
)
from adell_mri_tpu.models.semi_supervised import (
    AnatomicalContrastiveLoss,
    local_contrastive_loss,
    nearest_neighbour_loss,
    pseudo_label_cross_entropy,
)
from adell_mri_tpu.train.continuous_learning import (
    estimate_fisher,
    ewc_penalty,
    wrap_loss_with_ewc,
)

KEY = jax.random.PRNGKey(0)


def test_gp_layer_and_uncertainty():
    m = GaussianProcessLayer(out_features=2, n_random_features=32)
    x = jax.random.normal(KEY, (16, 8))
    vars_ = m.init({"params": KEY}, x)
    logits, inter = m.apply(vars_, x, mutable=["intermediates"])
    phi = inter["intermediates"]["phi"][0]
    assert logits.shape == (16, 2)
    cov = fit_covariance(phi)
    adj = predictive_logits(logits, phi, cov)
    # mean-field correction shrinks logits
    assert float(jnp.mean(jnp.abs(adj))) <= float(jnp.mean(jnp.abs(logits)))


def test_conformal_coverage():
    rng = np.random.default_rng(0)
    n, c = 2000, 4
    labels = rng.integers(0, c, n)
    logits = rng.normal(0, 1, (n, c))
    logits[np.arange(n), labels] += 2.0
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    aps = AdaptivePredictionSets(alpha=0.1).calibrate(
        probs[:1000], labels[:1000]
    )
    sets = aps(probs[1000:])
    coverage = sets[np.arange(1000), labels[1000:]].mean()
    assert coverage >= 0.85  # target 0.9 with slack


def test_ewc_penalty_zero_at_anchor():
    params = {"w": jnp.ones(4)}
    fisher = {"w": jnp.ones(4)}
    assert float(ewc_penalty(params, params, fisher)) == 0.0
    moved = {"w": jnp.ones(4) * 2}
    assert float(ewc_penalty(moved, params, fisher)) == pytest.approx(4.0)


def test_ewc_wrap_and_fisher():
    def loss_fn(params, batch, rng):
        loss = jnp.sum((params["w"] - batch["target"]) ** 2)
        return loss, {"loss": loss}

    params = {"w": jnp.zeros(2)}
    batches = [{"target": jnp.ones(2)}, {"target": -jnp.ones(2)}]
    fisher = estimate_fisher(loss_fn, params, batches, KEY)
    assert float(fisher["w"][0]) > 0
    wrapped = wrap_loss_with_ewc(loss_fn, params, fisher, weight=1.0)
    loss, metrics = wrapped({"w": jnp.ones(2)}, batches[0], KEY)
    assert "ewc_penalty" in metrics


def test_pseudo_label_ce_reference_and_masked_modes():
    student = jnp.full((1, 4, 4, 1), 0.4)
    confident_teacher = jnp.full((1, 4, 4, 1), 0.99)
    unconfident_teacher = jnp.full((1, 4, 4, 1), 0.6)
    # reference semantics (losses.py:430): CE over ALL voxels against
    # (teacher > threshold) — an unconfident 0.6 still pseudo-labels 1
    high = float(pseudo_label_cross_entropy(student, confident_teacher))
    also_high = float(
        pseudo_label_cross_entropy(student, unconfident_teacher)
    )
    assert high > 0 and also_high == pytest.approx(high)
    # opt-in FixMatch masking: unconfident voxels drop out entirely
    low = float(
        pseudo_label_cross_entropy(
            student, unconfident_teacher, confidence_threshold=0.9
        )
    )
    assert low == pytest.approx(0.0)


def test_local_contrastive_identity_views():
    f = jax.random.normal(KEY, (2, 4, 4, 8))
    same = float(local_contrastive_loss(f, f))
    other = float(
        local_contrastive_loss(f, jax.random.normal(jax.random.PRNGKey(1), f.shape))
    )
    assert same < other


def test_nn_and_anatomical_losses_finite():
    f = jax.random.normal(KEY, (32, 8))
    bank = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    assert np.isfinite(float(nearest_neighbour_loss(f, bank)))
    acl = AnatomicalContrastiveLoss(n_classes=2, top_k=16)
    feats = jax.random.normal(KEY, (1, 8, 8, 4))
    probs = jax.nn.sigmoid(jax.random.normal(KEY, (1, 8, 8, 1)))
    labels = (jax.random.uniform(KEY, (1, 8, 8)) > 0.5).astype(jnp.float32)
    assert np.isfinite(float(acl(feats, probs, labels)))


def test_ahnet_2d_forward():
    m = AHNet(spatial_dim=2, out_channels=8, n_layers=3, dropout_param=0.0)
    x = jnp.ones((1, 32, 32, 1))
    v = m.init({"params": KEY}, x)
    pred, _ = m.apply(v, x)
    assert pred.shape == (1, 32, 32, 1)
    assert float(pred.min()) >= 0 and float(pred.max()) <= 1


def test_ahnet_2d_to_3d_transfer():
    """The reference's convert_to_3d flow (segmentation/ahnet.py:72-78):
    train in 2D, transfer the trunk into the 3D net, fresh 3D decoders."""
    m2 = AHNet(spatial_dim=2, out_channels=8, n_layers=3, dropout_param=0.0)
    m3 = AHNet(spatial_dim=3, out_channels=8, n_layers=3, dropout_param=0.0)
    x2 = jnp.ones((1, 32, 32, 1))
    x3 = jnp.ones((1, 32, 32, 8, 1))
    p2 = m2.init({"params": KEY}, x2)["params"]
    p3 = m3.init({"params": KEY}, x3)["params"]
    p3t = transfer_2d_to_3d(p2, p3)
    # stem 7x7 kernel stacked 3x along z (AnysotropicHybridInput surgery)
    k2 = np.asarray(p2["stem"]["conv"]["kernel"])
    k3 = np.asarray(p3t["stem"]["conv"]["kernel"])
    assert k3.shape[2] == 3
    for z in range(3):
        np.testing.assert_allclose(k3[:, :, z], k2)
    # residual k x k kernel unsqueezed to (k, k, 1)
    r2 = np.asarray(p2["res_0"]["conv_mid"]["kernel"])
    r3 = np.asarray(p3t["res_0"]["conv_mid"]["kernel"])
    assert r3.shape[2] == 1
    np.testing.assert_allclose(r3[:, :, 0], r2)
    # 3D decoder stays fresh (exists only in 3D)
    assert "dec_0" in p3t
    pred, _ = m3.apply({"params": p3t}, x3)
    assert pred.shape == (1, 32, 32, 8, 1)
    assert np.all(np.isfinite(np.asarray(pred)))


def test_transfer_2d_to_3d_leaf_semantics():
    k2 = np.random.default_rng(0).normal(size=(3, 3, 4, 8)).astype(np.float32)
    k3 = np.zeros((3, 3, 1, 4, 8), np.float32)
    out = transfer_2d_to_3d({"w": k2}, {"w": k3})
    np.testing.assert_allclose(out["w"][:, :, 0], k2)


def test_mimunet_pyramid_mode():
    """2D module returning a feature pyramid -> 3D decode with links and
    deep supervision (parity: mimunet.py v_module_2d + init_decoder)."""

    class Pyramid2D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            f1 = nn.Conv(4, (3, 3), padding="SAME")(x)
            f2 = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME")(f1)
            f3 = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME")(f2)
            return [f1, f2, f3]

    for link in ("identity", "conv", "residual"):
        m = MIMUNet(
            module_2d=Pyramid2D(), n_classes=2, link_type=link,
            deep_supervision=(link == "conv"), dropout_param=0.0,
        )
        x = jnp.ones((1, 16, 16, 4, 1))
        v = m.init({"params": KEY}, x)
        out = m.apply(v, x)
        pred = out[0]
        assert pred.shape == (1, 16, 16, 4, 1)
        # probability-domain contract (CompoundLoss takes log(p + eps))
        assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0
        if link == "conv":
            # deep supervision returns the 3-tuple the step unpacks
            assert len(out) == 3 and out[1] is None
            ds = out[2]
            assert ds is not None and len(ds) == 2
            for d in ds:
                assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
        else:
            assert len(out) == 2


def test_mimunet_slicewise():
    from adell_mri_tpu.models.segmentation.unet import UNet

    class Slice2D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            unet2d = UNet(
                spatial_dimensions=2, norm_type="instance", dropout_param=0.0,
                depth=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
            )
            return unet2d(x, train=train)[0]

    m = MIMUNet(module_2d=Slice2D())
    x = jnp.ones((1, 16, 16, 4, 1))
    v = m.init({"params": KEY}, x)
    pred, _ = m.apply(v, x)
    assert pred.shape == (1, 16, 16, 4, 1)


def test_slice_linear_embedding():
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.vit import SliceLinearEmbedding

    x = jnp.ones((2, 16, 16, 8, 1))
    m = SliceLinearEmbedding(
        patch_size=(4, 4), embed_dim=32, use_class_token=True
    )
    out = m.apply(m.init({"params": jax.random.PRNGKey(0)}, x), x)
    assert out.shape == (2, 8, 17, 32)  # 16 patches + class token per slice
    conv = SliceLinearEmbedding(
        patch_size=(4, 4), embed_dim=32, embed_method="convolutional"
    )
    out = conv.apply(conv.init({"params": jax.random.PRNGKey(0)}, x), x)
    assert out.shape == (2, 8, 16, 32)


def test_efficient_conditioning_attention():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adell_mri_tpu.models.layers.self_attention import (
        EfficientConditioningAttentionBlock,
    )

    feat = jnp.ones((2, 8, 8, 4, 16))
    cls = jnp.ones((2, 3))
    for op in ("conv", "linear"):
        m = EfficientConditioningAttentionBlock(class_dimension=3, op_type=op)
        out = m.apply(
            m.init({"params": jax.random.PRNGKey(0)}, feat, cls), feat, cls
        )
        assert out.shape == feat.shape
        # sigmoid gate bounds the output by the input magnitude
        assert float(jnp.abs(out).max()) <= float(jnp.abs(feat).max()) + 1e-6


def test_gcn_block():
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.layers.multi_resolution import GCN

    x = jnp.ones((2, 16, 16, 4))
    m = GCN(out_channels=8, kernel_size=7)
    out = m.apply(m.init({"params": jax.random.PRNGKey(0)}, x), x)
    assert out.shape == (2, 16, 16, 8)
