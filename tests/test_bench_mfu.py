"""Regression tests for bench.py's compiled-FLOPs accounting.

XLA's HloCostAnalysis counts a while-loop (lax.scan) body ONCE, not
x trip-count. bench.py's flagship train phase is one scan over
n_epochs * n_minibatches minibatch updates, so rounds 1-4 under-reported
MFU/HBM-util by the 16x trip count (the 10-epoch --full bench reported
exactly headline/10 MFU at equal per-frame throughput — the smoking gun).
These tests pin both the XLA behavior the correction assumes and the
corrected helper itself, on CPU.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import lax

import bench


def _counted_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _scanned_matmul(length):
    def f(x):
        def body(c, _):
            return c @ c / 32.0, None

        y, _ = lax.scan(body, x, None, length=length)
        return y

    return f


def test_xla_counts_scan_body_once():
    """The assumption behind bench's scan_trips correction: counted flops
    are trip-count-invariant for a scanned body, while the unrolled loop
    scales linearly. If an XLA upgrade starts multiplying trip counts,
    this fails and the correction must be removed."""
    x = jnp.ones((32, 32), jnp.float32)
    f1 = _counted_flops(_scanned_matmul(1), x)
    f8 = _counted_flops(_scanned_matmul(8), x)
    assert f1 > 0
    # rel: the scan carries a few loop-counter flops per trip (66562 vs
    # 66560 at length 8) — body flops are trip-invariant, the counter isn't
    assert f8 == pytest.approx(f1, rel=0.01), (
        "XLA now scales scan-body flops by trip count; drop bench.py's "
        "scan_trips correction"
    )

    def unrolled(x):
        for _ in range(8):
            x = x @ x / 32.0
        return x

    fu = _counted_flops(unrolled, x)
    assert fu == pytest.approx(8 * f1, rel=0.05)


def test_mfu_helper_applies_trip_count():
    x = jnp.ones((32, 32), jnp.float32)
    wall = 1.0
    jitted = jax.jit(_scanned_matmul(8))
    mfu1, tf1, hbm1 = bench._mfu_from_cost_analysis(jitted, (x,), wall, scan_trips=1)
    mfu8, tf8, hbm8 = bench._mfu_from_cost_analysis(jitted, (x,), wall, scan_trips=8)
    assert mfu1 is not None and mfu8 is not None
    assert mfu8 == pytest.approx(8 * mfu1, rel=1e-9)
    assert tf8 == pytest.approx(8 * tf1, rel=1e-9)
    assert hbm8 == pytest.approx(8 * hbm1, rel=1e-9)
