"""
Train-step ablation: where does fwd+bwd+update sit against the FLOP bound?

The forward-only flagship runs F vol/s; an MXU-bound train step should run
~F/3 (bwd = 2x fwd FLOPs). Rows, one knob each, against that bound:

- no-remat (production default, train/steps.py remat=False)
- full remat (the pre-2026-08-19 bench behavior: +1 forward in the bwd,
  bound drops to F/4)
- remat policy dots_with_no_batch_dims_saveable (keeps MXU dot outputs)
- batch 8 (is the bwd batch-starved at 4?)
- adamw (update-cost delta vs SGD-momentum; both f32 master params)
- pure-bf16 params (no f32 master copy: halves optimizer HBM traffic,
  production uses f32 masters so this is an upper bound, not a config)

Protocol: dynamic-trip-count fori_loop slope timing with matmul
calibrations bracketing every row (BASELINE.md measurement-contention
findings). Run on the real chip.
"""

import time

import numpy as np

from benchmarks.benchmark_unet_ablation import slope

SHAPE = (128, 128, 32)
DEPTH = (32, 32, 64, 128, 256)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from adell_mri_tpu.models.segmentation.unet import UNet
    from adell_mri_tpu.transforms import augment_pipeline_for_bench

    m = 4096
    a_mm = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def mm(a, n):
        return jax.lax.fori_loop(0, n, lambda i, c: (c @ c) * 1e-3, a)

    def calib():
        dt, ok = slope(lambda n: mm(a_mm, n), n_small=25)
        print(
            f"calib: {2 * m**3 / dt / 1e12:.1f} TFLOP/s"
            f" (resolved={ok})",
            flush=True,
        )

    model = UNet(
        spatial_dimensions=3,
        conv_type="regular",
        link_type="residual",
        upscale_type="transpose",
        norm_type="instance",
        activation_fn="swish",
        dropout_param=0.0,
        n_classes=2,
        depth=DEPTH,
        kernel_sizes=(3,) * len(DEPTH),
        strides=(2,) * len(DEPTH),
    )
    aug = augment_pipeline_for_bench(SHAPE)
    key0 = jax.random.PRNGKey(0)

    def make_row(batch, remat, policy, opt, master_dtype):
        x = jnp.ones((batch,) + SHAPE + (1,), jnp.bfloat16)
        params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        params = jax.tree.map(
            lambda p: p.astype(master_dtype), params
        )
        tx = (
            optax.adamw(1e-3)
            if opt == "adamw"
            else optax.sgd(1e-3, momentum=0.9)
        )
        opt_state = tx.init(params)
        y = (jnp.mean(x, axis=-1) > 0).astype(jnp.float32)

        def loss_fn(p, x, key):
            xa = aug(key, x)
            apply_fn = lambda q, xi: model.apply({"params": q}, xi)[0]
            if remat:
                kw = (
                    {"policy": getattr(jax.checkpoint_policies, policy)}
                    if policy
                    else {}
                )
                apply_fn = jax.checkpoint(apply_fn, **kw)
            pred = apply_fn(
                jax.tree.map(lambda q: q.astype(jnp.bfloat16), p), xa
            )
            pr = pred[..., 0].astype(jnp.float32)
            return jnp.mean((pr - y) ** 2)

        @jax.jit
        def chain(p, o, n):
            def body(i, carry):
                p_, o_ = carry
                grads = jax.grad(loss_fn)(
                    p_, x, jax.random.fold_in(key0, i)
                )
                updates, o_ = tx.update(grads, o_, p_)
                return optax.apply_updates(p_, updates), o_

            p_out, _ = jax.lax.fori_loop(0, n, body, (p, o))
            return jax.tree.leaves(p_out)[0].ravel()[:4]

        return lambda n: chain(params, opt_state, n), batch

    rows = [
        ("no-remat (default)", dict(batch=4, remat=False, policy=None,
                                    opt="sgd", master_dtype=jnp.float32)),
        ("full-remat", dict(batch=4, remat=True, policy=None,
                            opt="sgd", master_dtype=jnp.float32)),
        ("remat dots-saveable", dict(
            batch=4, remat=True, policy="dots_with_no_batch_dims_saveable",
            opt="sgd", master_dtype=jnp.float32)),
        ("batch8 no-remat", dict(batch=8, remat=False, policy=None,
                                 opt="sgd", master_dtype=jnp.float32)),
        ("adamw no-remat", dict(batch=4, remat=False, policy=None,
                                opt="adamw", master_dtype=jnp.float32)),
        ("bf16-masters no-remat", dict(
            batch=4, remat=False, policy=None, opt="sgd",
            master_dtype=jnp.bfloat16)),
    ]
    calib()
    for name, kw in rows:
        try:
            chain, batch = make_row(**kw)
            t0 = time.perf_counter()
            dt, ok = slope(chain, n_small=2)
            print(
                f"{name}: {batch / dt:.2f} vol/s"
                f" ({dt * 1e3:.1f} ms/step, batch {batch},"
                f" resolved={ok}, wall {time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
        except Exception as exc:
            print(f"{name}: FAILED {exc}", flush=True)
        calib()


if __name__ == "__main__":
    main()
