"""χ² goodness-of-fit tests for the warp library.

Same validation methodology as the reference's warptest/chi2test
(src/utils/warptest.cpp:439-561, src/utils/chi2test.cpp): histogram the
sampler's output and compare against the numerically-integrated pdf.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.core import warp
from optix_renderer_tpu.utils.hypothesis import chi2_sphere_test


def _run_sphere_chi2(sample_fn, pdf_fn, **kw):
    ok, msg = chi2_sphere_test(jax.jit(sample_fn), jax.jit(pdf_fn), **kw)
    assert ok, msg


def test_uniform_sphere():
    _run_sphere_chi2(warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf)


def test_uniform_hemisphere():
    _run_sphere_chi2(
        warp.square_to_uniform_hemisphere, warp.square_to_uniform_hemisphere_pdf
    )


def test_cosine_hemisphere():
    _run_sphere_chi2(
        warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf
    )


@pytest.mark.parametrize("alpha", [0.1, 0.5])
def test_beckmann(alpha):
    _run_sphere_chi2(
        lambda u: warp.square_to_beckmann(u, alpha),
        lambda d: warp.square_to_beckmann_pdf(d, alpha),
        theta_res=20,
    )


@pytest.mark.parametrize("g", [0.0, 0.5, -0.7])
def test_henyey_greenstein(g):
    _run_sphere_chi2(
        lambda u: warp.square_to_henyey_greenstein(u, g),
        lambda d: warp.square_to_henyey_greenstein_pdf(d, g),
    )


@pytest.mark.parametrize("k", [0.0, 0.5, -0.6])
def test_schlick(k):
    _run_sphere_chi2(
        lambda u: warp.square_to_schlick(u, k),
        lambda d: warp.square_to_schlick_pdf(d, k),
    )


@pytest.mark.parametrize("cos_max", [0.0, 0.5, 0.9])
def test_sphere_cap(cos_max):
    _run_sphere_chi2(
        lambda u: warp.square_to_uniform_sphere_cap(u, cos_max),
        lambda d: warp.square_to_uniform_sphere_cap_pdf(d, cos_max),
        theta_res=20,
    )


def test_uniform_disk_pdf_normalizes():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((100_000, 2), dtype=np.float32))
    p = warp.square_to_uniform_disk(u)
    r2 = np.asarray(jnp.sum(p * p, axis=-1))
    assert r2.max() <= 1.0 + 1e-5
    # radius CDF: P(r <= x) = x^2
    r = np.sqrt(r2)
    for x in [0.25, 0.5, 0.75]:
        assert abs((r <= x).mean() - x * x) < 0.01


def test_uniform_triangle_barycentric():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random((50_000, 2), dtype=np.float32))
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert np.all(b >= -1e-6)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
    # mean barycentric coords of a uniform triangle distribution = 1/3
    np.testing.assert_allclose(b.mean(0), [1 / 3] * 3, atol=0.01)


def test_sphere_volume_uniform():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((100_000, 3), dtype=np.float32))
    p = np.asarray(warp.square_to_uniform_sphere_volume(u))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-5
    # radius CDF: P(r <= x) = x^3
    for x in [0.4, 0.7, 0.9]:
        assert abs((r <= x).mean() - x**3) < 0.01


def test_warps_are_differentiable():
    """Gradients flow through parameterized warps (needed for Phase 5)."""
    u = jnp.array([[0.3, 0.7]])

    def f(alpha):
        return jnp.sum(warp.square_to_beckmann(u, alpha))

    g = jax.grad(f)(0.3)
    assert np.isfinite(float(g))

    def h(g_par):
        return jnp.sum(warp.square_to_henyey_greenstein(u, g_par))

    gg = jax.grad(h)(0.4)
    assert np.isfinite(float(gg))
