"""Tests for the CDF-based DiscretePDF (reference include/nori/dpdf.h contract)."""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import dpdf


def test_build_normalizes():
    d = dpdf.build(jnp.array([1.0, 3.0, 0.0, 4.0]))
    np.testing.assert_allclose(np.asarray(d.pmf), [0.125, 0.375, 0.0, 0.5], atol=1e-6)
    assert float(d.sum_before_normalize) == 8.0
    np.testing.assert_allclose(float(d.cdf[-1]), 1.0, atol=1e-6)


def test_sample_distribution():
    w = jnp.array([1.0, 2.0, 3.0, 4.0])
    d = dpdf.build(w)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(200_000, dtype=np.float32))
    idx = np.asarray(dpdf.sample(d, u))
    counts = np.bincount(idx, minlength=4) / len(idx)
    np.testing.assert_allclose(counts, np.asarray(w) / 10.0, atol=0.01)


def test_sample_zero_weight_never_chosen():
    d = dpdf.build(jnp.array([1.0, 0.0, 1.0]))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random(50_000, dtype=np.float32))
    idx = np.asarray(dpdf.sample(d, u))
    assert not np.any(idx == 1)


def test_sample_reuse_uniformity():
    """Rescaled sample must stay uniform in [0,1) (dpdf.h:166-180 contract)."""
    d = dpdf.build(jnp.array([2.0, 1.0, 5.0]))
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random(100_000, dtype=np.float32))
    idx, u2 = dpdf.sample_reuse(d, u)
    u2 = np.asarray(u2)
    assert u2.min() >= 0.0 and u2.max() < 1.0
    # uniformity per selected index
    for i in range(3):
        sel = u2[np.asarray(idx) == i]
        assert abs(sel.mean() - 0.5) < 0.01
        assert abs(sel.var() - 1 / 12) < 0.01


def test_batched_shapes():
    d = dpdf.build(jnp.ones(7))
    u = jnp.zeros((4, 5))
    assert dpdf.sample(d, u).shape == (4, 5)
