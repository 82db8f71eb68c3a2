"""
3D conv lowering sweep: XLA conv vs im2col matmul at the UNet's hot layer
shapes, with the dense-matmul calibration alongside (the speed-of-light
reference). Run on the real chip; prints one line per configuration.

The interesting question (VERDICT r1 item 2b): is the 4.2 TFLOP/s 3D-conv
wall an XLA conv-tiling limitation (im2col wins) or an HBM/compute bound
(both match)?
"""

import time

import numpy as np


def timed_chain(fn, x, iters=10):
    o = fn(x)
    np.asarray(o).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    np.asarray(x).ravel()[0]
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from adell_mri_tpu.ops.conv import conv3d_im2col, conv3d_xla

    B = 4
    shapes = [
        # (input shape, cout): the flagship UNet's per-level hot convs
        ((B, 128, 128, 32, 32), 32),
        ((B, 64, 64, 16, 32), 64),
        ((B, 32, 32, 8, 64), 128),
        ((B, 16, 16, 4, 128), 256),
    ]
    for dtype in (jnp.bfloat16,):
        for xs, cout in shapes:
            cin = xs[-1]
            w = jnp.ones((3, 3, 3, cin, cout), dtype)
            flops = 2 * int(np.prod(xs[:4])) * 27 * cin * cout
            for name, fn in (
                ("xla", conv3d_xla),
                ("im2col", conv3d_im2col),
            ):
                conv = jax.jit(lambda x, w=w, fn=fn: fn(x, w))
                x = jnp.ones(xs, dtype)
                if cin == cout:
                    dt = timed_chain(conv, x)
                else:
                    o = conv(x)
                    np.asarray(o).ravel()[0]
                    t0 = time.perf_counter()
                    for _ in range(10):
                        o = conv(x + o.mean() * 0)
                    np.asarray(o).ravel()[0]
                    dt = (time.perf_counter() - t0) / 10
                print(
                    f"{name:7s} {str(xs):28s} -> {cout:4d}: "
                    f"{dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.2f} TFLOP/s"
                )
    # calibration
    m = 8192
    a = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda a: (a @ a).astype(jnp.bfloat16))
    dt = timed_chain(mm, a)
    print(f"matmul  {m}^3 bf16: {dt * 1e3:8.2f} ms  {2 * m**3 / dt / 1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
