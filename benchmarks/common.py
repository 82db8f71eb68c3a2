"""Shared timing helper: chained dispatch + forced final completion (see
bench.py — block_until_ready can return early through the remote tunnel)."""

import time

import numpy as np


def timed_chain(fn, x0, n_iters: int = 10, warmup: int = 1):
    """fn(x) -> same-shaped array; returns seconds/iteration."""
    o = x0
    for _ in range(warmup):
        o = fn(o)
    np.asarray(o)
    t0 = time.perf_counter()
    o = x0
    for _ in range(n_iters):
        o = fn(o)
    np.asarray(o)
    return (time.perf_counter() - t0) / n_iters
