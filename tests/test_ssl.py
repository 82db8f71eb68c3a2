"""SSL losses, maskers, models, and train-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.models.classification import CatNet
from adell_mri_tpu.models.ssl import (
    ConvNeXtAutoEncoder,
    DINOHead,
    IJEPA,
    NonContrastiveWrapper,
    ViTMaskedAutoEncoder,
    random_masking,
    block_masking,
)
from adell_mri_tpu.models.ssl import losses as L
from adell_mri_tpu.train import TrainState, get_optimizer
from adell_mri_tpu.train.ssl_steps import (
    make_ijepa_step,
    make_mae_step,
    make_ssl_train_step,
    make_two_view_step,
)

KEY = jax.random.PRNGKey(0)
Z1 = jax.random.normal(KEY, (8, 16))
Z2 = Z1 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 16))


def test_vicreg_components_and_perfect_case():
    total, comp = L.vicreg_loss(Z1, Z2)
    assert all(np.isfinite(float(v)) for v in comp.values())
    # identical, well-spread views: invariance term ~0
    t2, c2 = L.vicreg_loss(Z1, Z1)
    assert float(c2["invariance"]) == pytest.approx(0.0, abs=1e-6)


def test_simsiam_byol_bounds():
    assert -1.0 <= float(L.simsiam_loss(Z1, Z2)) <= 1.0
    assert 0.0 <= float(L.byol_loss(Z1, Z2)) <= 4.0
    # identical views -> minimum
    assert float(L.byol_loss(Z1, Z1)) == pytest.approx(0.0, abs=1e-5)


def test_ntxent_prefers_matching_pairs():
    easy = float(L.ntxent_loss(Z1, Z1 + 1e-3))
    perm = jnp.roll(Z1, 1, axis=0)
    hard = float(L.ntxent_loss(Z1, perm))
    assert easy < hard


def test_barlow_twins_zero_for_identical_decorrelated():
    z = jax.random.normal(KEY, (512, 8))
    v = float(L.barlow_twins_loss(z, z))
    assert v < 1.0  # on-diag ~0, off-diag small


def test_dino_loss_and_center_update():
    s = jax.random.normal(KEY, (8, 32))
    t = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    center = jnp.zeros(32)
    loss, new_center = L.dino_loss(s, t, center)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        np.asarray(new_center),
        0.1 * np.asarray(t.mean(0)),
        atol=1e-5,
    )


def test_sinkhorn_doubly_stochastic():
    scores = jax.random.normal(KEY, (16, 8))
    q = L.sinkhorn_knopp(scores, n_iter=10)
    np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, atol=1e-2)


def test_koleo_finite():
    assert np.isfinite(float(L.koleo_loss(Z1)))


def test_random_masking_counts():
    tokens = jax.random.normal(KEY, (2, 16, 8))
    visible, mask, restore = random_masking(KEY, tokens, mask_ratio=0.75)
    assert visible.shape == (2, 4, 8)
    np.testing.assert_allclose(np.asarray(mask.sum(-1)), 12)
    # restore index is a permutation
    assert sorted(np.asarray(restore[0]).tolist()) == list(range(16))


def test_block_masking_contiguous():
    mask = block_masking(KEY, (8, 8), n_blocks=2)
    assert mask.shape == (64,)
    assert 0 < float(mask.sum()) < 64


def _tiny_backbone():
    return CatNet(
        resnet_structure=[(4, 4, 3, 1)], norm_type="instance",
        feature_extraction=True,
    )


def test_two_view_vicreg_step_learns():
    model = NonContrastiveWrapper(
        backbone=_tiny_backbone(),
        projection_dims=(16, 8),
        prediction_dims=(8, 8),
    )
    x = jax.random.normal(KEY, (4, 8, 8, 4, 1))
    params = model.init({"params": KEY}, x)["params"]
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(model.apply, params, tx, with_ema=True)
    step = make_ssl_train_step(
        make_two_view_step(model, method="vicreg")
    )
    batch = {
        "view1": x,
        "view2": x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_byol_step_with_ema_teacher():
    model = NonContrastiveWrapper(
        backbone=_tiny_backbone(),
        projection_dims=(16, 8),
        prediction_dims=(8, 8),
    )
    x = jax.random.normal(KEY, (2, 8, 8, 4, 1))
    params = model.init({"params": KEY}, x)["params"]
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(
        model.apply, params, tx, with_ema=True, ema_decay=0.99
    )
    step = make_ssl_train_step(
        make_two_view_step(model, method="byol", ema_teacher=True)
    )
    batch = {"view1": x, "view2": x}
    state, metrics = step(state, batch, KEY)
    assert np.isfinite(float(metrics["loss"]))


def test_mae_forward_and_step():
    model = ViTMaskedAutoEncoder(
        patch_size=(4, 4, 4), embed_dim=16, n_blocks=1, n_heads=2,
        decoder_dim=8, decoder_blocks=1,
    )
    x = jax.random.normal(KEY, (2, 8, 8, 8, 1))
    params = model.init(
        {"params": KEY, "masking": KEY}, x, rng=KEY
    )["params"]
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(model.apply, params, tx)
    step = make_ssl_train_step(make_mae_step(model))
    state, metrics = step(state, {"image": x}, KEY)
    assert np.isfinite(float(metrics["loss"]))


def test_ijepa_forward_and_step():
    model = IJEPA(
        patch_size=(4, 4, 4), embed_dim=16, n_blocks=1, n_heads=2,
        predictor_dim=8, predictor_blocks=1,
    )
    x = jax.random.normal(KEY, (2, 8, 8, 8, 1))
    params = model.init({"params": KEY, "masking": KEY}, x, rng=KEY)["params"]
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(model.apply, params, tx, with_ema=True)
    step = make_ssl_train_step(make_ijepa_step(model))
    state, metrics = step(state, {"image": x}, KEY)
    assert np.isfinite(float(metrics["loss"]))


def test_dino_head_prototypes():
    head = DINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8)
    x = jax.random.normal(KEY, (4, 24))
    v = head.init({"params": KEY}, x)
    out = head.apply(v, x)
    assert out.shape == (4, 32)
    # logits bounded by |z|=1 prototypes: |logit| <= 1
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5


def test_convnext_autoencoder_roundtrip_shape():
    m = ConvNeXtAutoEncoder(depths=(4, 8))
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    v = m.init({"params": KEY}, x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    feats = m.apply(v, x, return_features=True)
    assert feats.shape == (2, 8)


def test_dino_multicrop_step_learns_and_centers_update():
    from adell_mri_tpu.models.ssl import DINO
    from adell_mri_tpu.train.ssl_steps import make_dino_step

    model = DINO(
        patch_size=(4, 4, 4), embed_dim=16, n_blocks=1, n_heads=2,
        out_dim=32, hidden_dim=16, bottleneck_dim=8,
    )
    x = jax.random.normal(KEY, (2, 8, 8, 8, 1))
    params = model.init({"params": KEY}, x)["params"]
    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(
        model.apply, params, tx, with_ema=True,
        variables={"dino_center": jnp.zeros(32)},
    )
    step = make_ssl_train_step(make_dino_step(model))
    batch = {
        "view1": x,
        "view2": x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        # two local crops at half size: same params must serve both shapes
        "local_crops": jax.random.normal(jax.random.PRNGKey(3), (2, 2, 4, 4, 4, 1)),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(4))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert float(jnp.abs(state.variables["dino_center"]).max()) > 0


def test_ibot_step_learns_and_mask_loss_reported():
    from adell_mri_tpu.models.ssl import IBOT
    from adell_mri_tpu.train.ssl_steps import make_ibot_step

    model = IBOT(
        patch_size=(4, 4, 4), embed_dim=16, n_blocks=1, n_heads=2,
        out_dim=32, hidden_dim=16, bottleneck_dim=8, n_mask_blocks=2,
    )
    x = jax.random.normal(KEY, (2, 8, 8, 8, 1))
    variables = {
        "ibot_center_global": jnp.zeros(32),
        "ibot_center_mask": jnp.zeros(32),
    }
    params = model.init(
        {"params": KEY, "masking": jax.random.PRNGKey(1)}, x, mask=True
    )["params"]
    # forward contract: (reduced, tokens, mask)
    red, tok, m = model.apply(
        {"params": params}, x, mask=True,
        rngs={"masking": jax.random.PRNGKey(5)},
    )
    assert red.shape == (2, 32) and tok.shape == (2, 8, 32)
    assert m.shape == (2, 8) and float(m.sum()) > 0
    # unmasked: mask all zeros
    _, _, m0 = model.apply({"params": params}, x, mask=False)
    assert float(m0.sum()) == 0

    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(
        model.apply, params, tx, with_ema=True, variables=variables
    )
    step = make_ssl_train_step(make_ibot_step(model))
    batch = {
        "view1": x,
        "view2": x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(4))
        losses.append(float(metrics["loss"]))
        assert "loss_global" in metrics and "loss_mask" in metrics
    assert losses[-1] < losses[0]
    assert float(jnp.abs(state.variables["ibot_center_mask"]).max()) > 0


def test_vicregl_step_with_exposed_boxes():
    """SSLTransforms(expose_boxes=True) emits per-view crop matrices; the
    vicregl step matches local features by absolute position and learns."""
    from adell_mri_tpu.train.ssl_steps import make_vicregl_step
    from adell_mri_tpu.transforms import SSLTransforms

    model = NonContrastiveWrapper(
        backbone=_tiny_backbone(),
        projection_dims=(16, 8),
        prediction_dims=(8, 8),
    )
    tf = SSLTransforms(crop_size=(8, 8, 4), expose_boxes=True)
    img = jax.random.normal(KEY, (2, 12, 12, 6, 1))
    batch = jax.jit(tf.augment)(jax.random.PRNGKey(0), {"image": img})
    assert "view1_mat" in batch and batch["view1_mat"].shape == (2, 4, 4)
    assert batch["view1"].shape == (2, 8, 8, 4, 1)

    params = model.init({"params": KEY}, batch["view1"], ret="local")["params"]
    # local return contract
    proj, local = model.apply({"params": params}, batch["view1"], ret="local")
    assert proj.ndim == 2 and local.ndim == 5

    tx = get_optimizer("adamw", learning_rate=1e-3, params=params)
    state = TrainState.create(model.apply, params, tx)
    step = make_ssl_train_step(make_vicregl_step(model, top_k=2))
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(4))
        losses.append(float(metrics["loss"]))
        assert "local" in metrics
    assert losses[-1] < losses[0]


def test_two_view_step_bf16_precision():
    """precision='bf16' runs the encoder forward in the compute dtype but
    returns f32 projections/losses close to the f32 step (same policy as
    segmentation/classification training)."""
    model = NonContrastiveWrapper(
        backbone=_tiny_backbone(),
        projection_dims=(16, 8),
        prediction_dims=(8, 8),
    )
    x = jax.random.normal(KEY, (2, 8, 8, 4, 1))
    params = model.init({"params": KEY}, x)["params"]
    batch = {
        "view1": x,
        "view2": x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
    }
    rng = jax.random.PRNGKey(3)
    lm32 = make_two_view_step(model, method="vicreg")
    lm16 = make_two_view_step(model, method="vicreg", precision="bf16")
    l32, m32 = lm32(params, batch, rng)
    l16, m16 = lm16(params, batch, rng)
    assert l16.dtype == jnp.float32
    assert jnp.isfinite(l16)
    assert abs(float(l16) - float(l32)) < 0.1 * max(abs(float(l32)), 1.0)
    # gradients flow and arrive in f32
    g = jax.grad(lambda p: lm16(p, batch, rng)[0])(params)
    leaf = jax.tree.leaves(g)[0]
    assert leaf.dtype == jnp.float32


def test_ijepa_target_is_ema_of_context_encoder():
    """The I-JEPA teacher must be the EMA of the CONTEXT encoder: the
    in-module target_encoder subtree gets zero gradient, so tracking IT
    would freeze the teacher at random init forever."""
    model = IJEPA(
        patch_size=(4, 4, 4), embed_dim=16, n_blocks=1, n_heads=2,
        predictor_dim=8, predictor_blocks=1,
    )
    x = jax.random.normal(KEY, (1, 8, 8, 8, 1))
    params = model.init({"params": KEY, "masking": KEY}, x, rng=KEY)["params"]
    lm = make_ijepa_step(model)
    # ema with a SHIFTED context encoder must change the loss; a shifted
    # target_encoder subtree must NOT (it is substituted away)
    base, _ = lm(params, {"image": x}, KEY, ema_params=params)
    ema_ctx = jax.tree.map(lambda a: a, params)
    ema_ctx["context_encoder"] = jax.tree.map(
        lambda a: a + 1.0, ema_ctx["context_encoder"]
    )
    moved, _ = lm(params, {"image": x}, KEY, ema_params=ema_ctx)
    assert abs(float(moved) - float(base)) > 1e-8
    ema_tgt = jax.tree.map(lambda a: a, params)
    ema_tgt["target_encoder"] = jax.tree.map(
        lambda a: a + 1.0, ema_tgt["target_encoder"]
    )
    same, _ = lm(params, {"image": x}, KEY, ema_params=ema_tgt)
    assert abs(float(same) - float(base)) < 1e-8


def test_vicregl_local_selects_spatially_nearest():
    """Regression: the top_k local pairs were ranked by feature MSE, so
    gradient only ever reached pairs that ALREADY matched (collapse path).
    VICRegL's gamma selection runs on the coordinate distance matrix."""
    import jax.numpy as jnp

    from adell_mri_tpu.models.ssl.losses import vicregl_loss

    B, N, F = 2, 8, 4
    # coords drift apart with index: low-i pairs are spatially nearest
    c1 = jnp.tile(jnp.arange(N, dtype=jnp.float32)[None, :, None], (B, 1, 1))
    c2 = c1 * 1.1
    # features DISAGREE at the near (low-i) pairs, agree at far ones
    f1 = jnp.zeros((B, N, F))
    f2 = jnp.zeros((B, N, F)).at[:, :4].set(1.0)
    z = jnp.ones((B, 16))
    _, comp = vicregl_loss(z, z, f1, f2, c1, c2, top_k=4)
    # old ranking picked the 4 agreeing background pairs -> local == 0
    assert float(comp["local"]) > 0.5


def test_ijepa_encode_target_method():
    """Regression: apply(method=IJEPA.encode_target) crashed with
    AssignSubModuleError (submodules created outside a compact scope)."""
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.models.ssl.nets import IJEPA

    m = IJEPA(patch_size=(4, 4, 4), embed_dim=32, n_blocks=1, n_heads=2)
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        x,
        rng=jax.random.PRNGKey(2),
    )
    out = m.apply(variables, x, method=IJEPA.encode_target)
    assert out.shape == (1, 8, 32)


def test_sinkhorn_and_vicreg_global_semantics_under_shard_map():
    """Regression: sinkhorn_knopp ignored axis_name (per-shard row sums)
    and vicreg's sharded variance divided by N-P instead of N-1."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from adell_mri_tpu.models.ssl.losses import sinkhorn_knopp, vicreg_loss
    from adell_mri_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)

    sharded_sk = jax.shard_map(
        lambda s: sinkhorn_knopp(s, axis_name="data"),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
        check_vma=False,
    )(scores)
    ref_sk = sinkhorn_knopp(scores)
    np.testing.assert_allclose(
        np.asarray(sharded_sk), np.asarray(ref_sk), rtol=1e-5, atol=1e-6
    )

    z1 = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)

    def local(a, b):
        total, _ = vicreg_loss(a, b, axis_name="data")
        return jnp.full((a.shape[0],), total)

    sharded_v = jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )(z1, z2)
    ref_total, _ = vicreg_loss(z1, z2)
    np.testing.assert_allclose(
        float(sharded_v[0]), float(ref_total), rtol=1e-5
    )
