"""
Mesh/sharding tests on the 8-virtual-device CPU platform — the multi-device
coverage the reference never had (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adell_mri_tpu.parallel import (
    batch_sharding,
    get_devices,
    make_mesh,
    shard_batch,
    shard_params,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_get_devices_parsing():
    platform, devs = get_devices("cpu")
    assert platform == "cpu" and len(devs) == 8
    _, devs2 = get_devices("cpu:0,3")
    assert [d.id for d in devs2] == [0, 3]


def test_make_mesh_shapes():
    mesh = make_mesh(jax.devices(), data=-1, fsdp=2)
    assert dict(mesh.shape) == {"data": 4, "fsdp": 2, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(jax.devices(), data=3, fsdp=2)


def test_shard_batch_and_global_mean():
    mesh = make_mesh(jax.devices())
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1), "id": ["a"]}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.num_devices == 8  # actually spec check
    with mesh:
        mean = jax.jit(lambda b: jnp.mean(b["x"]))({"x": sharded["x"]})
    assert float(mean) == pytest.approx(7.5)


def test_shard_params_fsdp():
    mesh = make_mesh(jax.devices(), data=-1, fsdp=2)
    params = {
        "big": jnp.ones((1024, 512)),
        "small": jnp.ones((8,)),
    }
    sharded = shard_params(params, mesh, fsdp_min_size=2**10)
    big_spec = sharded["big"].sharding.spec
    assert "fsdp" in str(big_spec)
    small_spec = sharded["small"].sharding.spec
    assert "fsdp" not in str(small_spec)


def test_data_parallel_train_step_matches_single_device():
    """DP-sharded grads must equal single-device grads on the same batch."""
    from adell_mri_tpu.train import TrainState, get_optimizer

    def apply_fn(variables, x):
        return x @ variables["params"]["w"]

    w = jnp.ones((4, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 2))

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"loss": loss}

    from adell_mri_tpu.train.steps import make_train_step

    def make_state():
        tx = get_optimizer("sgd", learning_rate=0.1, momentum=0.0)
        return TrainState.create(apply_fn, {"w": w}, tx)

    step = make_train_step(loss_fn, donate=False)
    # single device
    s1, m1 = step(make_state(), {"x": x, "y": y}, jax.random.PRNGKey(2))
    # mesh-sharded
    mesh = make_mesh(jax.devices())
    with mesh:
        batch = shard_batch({"x": np.asarray(x), "y": np.asarray(y)}, mesh)
        s2, m2 = step(make_state(), batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(s2.params["w"]), rtol=1e-5
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)


def test_tensor_parallel_matches_replicated():
    """shard_params_tp over the model axis must not change the math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adell_mri_tpu.models.classification.nets import ViTClassifier
    from adell_mri_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_params_tp,
    )

    devices = jax.devices()[:4]
    mesh = make_mesh(devices, data=-1, fsdp=1, model=2)
    vit = ViTClassifier(
        n_classes=2, patch_size=(4, 4, 4), embed_dim=32, n_blocks=1, n_heads=4
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 8, 8, 8, 1)), jnp.float32
    )
    params = vit.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    ref = vit.apply({"params": params}, x)

    with mesh:
        sp = shard_params_tp(params, mesh)
        xb = shard_batch({"image": x}, mesh)["image"]
        out = jax.jit(lambda p, x: vit.apply({"params": p}, x))(sp, xb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )
    # at least one kernel actually landed on the model axis
    from jax.sharding import PartitionSpec

    specs = jax.tree.leaves(
        jax.tree.map(lambda a: a.sharding.spec, sp),
        is_leaf=lambda s: isinstance(s, PartitionSpec),
    )
    assert any("model" in str(s) for s in specs)


def test_shard_batch_pads_to_full_mesh():
    """batch 4 on 8 devices: pad=True duplicates samples so no chip idles
    (DistributedSampler semantics); pad=False replicates (val tails)."""
    import numpy as np

    from adell_mri_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(jax.devices()[:8])
    x = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    out = shard_batch({"x": x}, mesh, pad=True)["x"]
    assert out.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(out)[4:], x)  # wrapped copies
    rep = shard_batch({"x": x}, mesh, pad=False)["x"]
    assert rep.shape == (4, 3)


def test_mesh_for_batch_uses_all_devices():
    from adell_mri_tpu.parallel.mesh import mesh_for_batch

    mesh = mesh_for_batch(4, jax.devices()[:8])
    assert mesh.devices.size == 8


def test_pipeline_parallel_matches_sequential():
    """GPipe pipeline over the model axis == sequential stage application
    (fill-drain schedule, ppermute ring, masked psum output)."""
    import numpy as np

    from adell_mri_tpu.parallel.mesh import make_mesh
    from adell_mri_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    mesh = make_mesh(jax.devices()[:4], data=1, fsdp=1, model=4)
    rng = np.random.default_rng(0)
    d = 16
    stages = [
        {
            "w": jnp.asarray(rng.normal(scale=0.3, size=(d, d)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(d,)), jnp.float32),
        }
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    xs = jnp.asarray(rng.normal(size=(6, 2, d)), jnp.float32)
    with mesh:
        out = pipeline_apply(
            stage_fn, stack_stage_params(stages), xs, mesh, axis="model"
        )
    ref = xs
    for p in stages:
        ref = jax.vmap(lambda x, p=p: stage_fn(p, x))(ref)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_moe_expert_parallel():
    """Top-1 MoE matches the per-token oracle; sharding experts over the
    model axis leaves outputs bitwise-comparable."""
    import numpy as np

    from adell_mri_tpu.models.layers.moe import MoEFFN, shard_params_moe
    from adell_mri_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    m = MoEFFN(n_experts=4, d_ff=32, capacity_factor=4.0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y, aux = m.apply({"params": params}, x)
    assert np.isfinite(float(aux))

    tokens = np.asarray(x.reshape(-1, 16))
    gate = tokens @ np.asarray(params["gate"]["kernel"])
    idx = np.argmax(gate, -1)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(gate), -1)).max(-1)
    ref = np.zeros_like(tokens)
    for s_i in range(tokens.shape[0]):
        e = idx[s_i]
        h = np.asarray(
            jax.nn.gelu(jnp.asarray(tokens[s_i] @ np.asarray(params["w_in"][e])))
        )
        ref[s_i] = prob[s_i] * (h @ np.asarray(params["w_out"][e]))
    assert float(np.abs(np.asarray(y).reshape(-1, 16) - ref).max()) < 1e-5

    mesh = make_mesh(jax.devices()[:4], data=1, fsdp=1, model=4)
    with mesh:
        sp = shard_params_moe(params, mesh, axis="model")
        y2, _ = jax.jit(lambda p, xx: m.apply({"params": p}, xx))(sp, x)
    assert float(jnp.abs(y2 - y).max()) < 1e-5


def test_moe_capacity_drops_tokens():
    """Tokens beyond expert capacity are dropped (GShard semantics): with
    capacity_factor small enough, some tokens produce zero output."""
    import numpy as np

    from adell_mri_tpu.models.layers.moe import MoEFFN

    rng = np.random.default_rng(1)
    m = MoEFFN(n_experts=2, d_ff=8, capacity_factor=0.25)
    x = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    y, _ = m.apply({"params": params}, x)
    norms = np.linalg.norm(np.asarray(y).reshape(-1, 8), axis=-1)
    assert (norms == 0).sum() > 0  # dropped tokens
    assert (norms > 0).sum() > 0  # routed tokens


def test_pipeline_parallel_is_trainable():
    """Gradients flow through the fill-drain schedule: grad of a pipelined
    loss wrt stage params matches the sequential oracle (fori_loop with
    static bounds lowers to scan; ppermute transposes to the reverse
    permutation)."""
    import numpy as np

    from adell_mri_tpu.parallel.mesh import make_mesh
    from adell_mri_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_stage_params,
    )

    mesh = make_mesh(jax.devices()[:4], data=1, fsdp=1, model=4)
    rng = np.random.default_rng(0)
    d = 8
    stages = [
        {
            "w": jnp.asarray(rng.normal(scale=0.3, size=(d, d)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(d,)), jnp.float32),
        }
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    xs = jnp.asarray(rng.normal(size=(5, 2, d)), jnp.float32)
    stacked = stack_stage_params(stages)

    def loss_pp(sp):
        with mesh:
            return jnp.sum(
                pipeline_apply(stage_fn, sp, xs, mesh, axis="model") ** 2
            )

    def loss_seq(stage_list):
        h = xs
        for p in stage_list:
            h = jax.vmap(lambda x, p=p: stage_fn(p, x))(h)
        return jnp.sum(h**2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.tree.map(
        lambda *ps: jnp.stack(ps), *jax.grad(loss_seq)(stages)
    )
    err = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq))
    )
    assert err < 1e-4


def test_shard_batch_replicates_non_batch_leaves():
    """Auxiliary arrays whose leading dim is not the batch dim (e.g. a
    [n_classes] weight vector) replicate instead of hitting a batch-axis
    divisibility error."""
    mesh = make_mesh(jax.devices())
    batch = {
        "x": np.zeros((16, 4), np.float32),
        "class_weights": np.asarray([0.2, 0.3, 0.5], np.float32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].shape == (16, 4)
    assert sharded["class_weights"].shape == (3,)
    with mesh:
        s = jax.jit(lambda b: jnp.sum(b["class_weights"]))(
            {"class_weights": sharded["class_weights"]}
        )
    assert float(s) == pytest.approx(1.0)
    # padded path: aux leaf still replicates while x pads 6 -> 8
    batch2 = {
        "x": np.zeros((6, 4), np.float32),
        "w": np.ones((3,), np.float32),
    }
    sharded2 = shard_batch(batch2, mesh, pad=True)
    assert sharded2["x"].shape[0] == 8
    assert sharded2["w"].shape == (3,)


def test_shard_batch_aux_leaf_first(monkeypatch):
    """Regression: the batch size was inferred from the FIRST array leaf —
    an auxiliary (non-batch) array appearing first corrupted padding and
    left the real batch leaves replicated."""
    import numpy as np

    from adell_mri_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    n_dev = mesh.devices.size
    # dict order puts a 3-element class-weight vector first
    batch = {
        "weights": np.asarray([1.0, 2.0, 3.0], np.float32),
        "image": np.ones((4, 6, 6, 2), np.float32),
        "label": np.zeros((4, 6, 6), np.float32),
    }
    out = shard_batch(batch, mesh, pad=True)
    pad_to = -(-4 // n_dev) * n_dev
    assert out["image"].shape[0] == pad_to
    assert out["label"].shape[0] == pad_to
    assert out["weights"].shape == (3,)  # aux leaf untouched, replicated
    # the batch leaves actually shard (not silently replicated)
    assert not out["image"].sharding.is_fully_replicated


def test_multistep_dp_fsdp_training_matches_single_device():
    """N STEPS of dp x fsdp training on a real UNet must equal
    single-device training — params, EMA shadow and optimizer state —
    including gradient accumulation. This is the test that catches a
    wrong psum axis, a dropped rng fold, or accumulation that divides by
    the wrong count (the inference path has had this in
    test_sharded_sliding_window_matches_single_device since round 3;
    VERDICT r3 item 4 mirrors it for training)."""
    import optax

    from adell_mri_tpu.models.segmentation.losses import (
        CompoundLoss,
        binary_generalized_dice_loss,
    )
    from adell_mri_tpu.models.segmentation.unet import UNet
    from adell_mri_tpu.train import TrainState, get_optimizer
    from adell_mri_tpu.train.optim import accumulate_gradients
    from adell_mri_tpu.train.steps import (
        make_segmentation_step,
        make_train_step,
    )

    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="identity",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        n_classes=2,
        depth=(4, 8),
        kernel_sizes=(3, 3),
        strides=(2, 2),
    )
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((8, 8, 8, 4, 1), jnp.float32)
    params = model.init({"params": rng}, x0)["params"]
    loss = CompoundLoss({"dice": binary_generalized_dice_loss})
    lm = make_segmentation_step(model, loss, train=True)
    step = make_train_step(lm, donate=False)

    def make_state(p):
        tx = get_optimizer("sgd", learning_rate=0.05, momentum=0.9)
        tx = accumulate_gradients(tx, 2)
        return TrainState.create(
            model.apply, p, tx, with_ema=True, ema_decay=0.9
        )

    n_steps = 6
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(n_steps)]
    batches = []
    for i in range(n_steps):
        ki, kl = jax.random.split(jax.random.fold_in(rng, 100 + i))
        batches.append(
            {
                "image": np.asarray(jax.random.normal(ki, (8, 8, 8, 4, 1))),
                "label": np.asarray(
                    (jax.random.normal(kl, (8, 8, 8, 4)) > 0).astype(
                        jnp.float32
                    )
                ),
            }
        )

    # single device
    s1 = make_state(params)
    for i in range(n_steps):
        s1, m1 = step(s1, {k: jnp.asarray(v) for k, v in batches[i].items()}, keys[i])

    # dp x fsdp mesh
    mesh = make_mesh(jax.devices(), data=4, fsdp=2)
    with mesh:
        s2 = make_state(shard_params(params, mesh, fsdp_min_size=2**8))
        for i in range(n_steps):
            s2, m2 = step(s2, shard_batch(batches[i], mesh), keys[i])

    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s2.ema_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    # optimizer state (momentum buffers + accumulation slots)
    for a, b in zip(
        jax.tree.leaves(s1.opt_state), jax.tree.leaves(s2.opt_state)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)


def test_tensor_parallel_vit_gradient_parity():
    """Gradients of a TP-sharded ViT classifier must match the unsharded
    gradients (the forward-parity test above does not catch a psum
    missing from the BACKWARD of a sharded contraction)."""
    from adell_mri_tpu.models.classification.nets import ViTClassifier
    from adell_mri_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_params_tp,
    )

    devices = jax.devices()[:4]
    mesh = make_mesh(devices, data=-1, fsdp=1, model=2)
    vit = ViTClassifier(
        n_classes=2, patch_size=(4, 4, 4), embed_dim=32, n_blocks=1, n_heads=4
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 8, 8, 8, 1)), jnp.float32
    )
    y = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    params = vit.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    def loss(p, xb, yb):
        logits = vit.apply({"params": p}, xb)
        return jnp.mean(
            optax_sigmoid_bce(logits[..., 0] if logits.ndim > 1 else logits, yb)
        )

    def optax_sigmoid_bce(logits, labels):
        import optax

        return optax.sigmoid_binary_cross_entropy(logits, labels)

    g_ref = jax.grad(loss)(params, x, y)
    with mesh:
        sp = shard_params_tp(params, mesh)
        xb = shard_batch({"image": np.asarray(x)}, mesh)["image"]
        yb = shard_batch({"y": np.asarray(y)}, mesh)["y"]
        g_tp = jax.jit(jax.grad(loss))(sp, xb, yb)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )
