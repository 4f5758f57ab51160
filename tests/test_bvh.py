"""LBVH correctness: traversal must agree with the brute-force sweep.

The brute-force chunked sweep (ops/intersect.py) is the reference
implementation; the BVH must return the identical nearest hit and identical
occlusion answers on random soups (the same CPU-validates-GPU pattern the
reference uses between its CPU BVH and OptiX paths, SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.core.math import Ray
from optix_renderer_tpu.ops import bvh as bvh_mod
from optix_renderer_tpu.ops import intersect as isect
from optix_renderer_tpu.scene.data import Geometry


def _soup_geometry(n_tris: int, seed: int, with_bvh: bool) -> Geometry:
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2.0, 2.0, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    v0 = base
    v1 = base + e1
    v2 = base + e2
    z3 = jnp.zeros((n_tris, 3), jnp.float32)
    z2 = jnp.zeros((n_tris, 2), jnp.float32)
    bvh = (
        bvh_mod.build_bvh(v0, v1, v2)
        if with_bvh
        else bvh_mod.empty_bvh()
    )
    return Geometry(
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(v1 - v0),
        tri_e2=jnp.asarray(v2 - v0),
        tri_n0=z3, tri_n1=z3, tri_n2=z3,
        tri_uv0=z2, tri_uv1=z2, tri_uv2=z2,
        tri_tang=jnp.zeros((n_tris, 4), jnp.float32),
        tri_shape=jnp.zeros(n_tris, jnp.int32),
        sph_center=jnp.zeros((0, 3), jnp.float32),
        sph_radius=jnp.zeros((0,), jnp.float32),
        sph_shape=jnp.zeros((0,), jnp.int32),
        bvh=bvh,
        sph_bvh=bvh_mod.empty_bvh(),
    )


def _sphere_geometry(n_sph: int, seed: int, with_bvh: bool) -> Geometry:
    rng = np.random.default_rng(seed)
    center = rng.uniform(-3.0, 3.0, (n_sph, 3)).astype(np.float32)
    radius = rng.uniform(0.05, 0.4, n_sph).astype(np.float32)
    z3 = jnp.zeros((0, 3), jnp.float32)
    z2 = jnp.zeros((0, 2), jnp.float32)
    sph_bvh = (
        bvh_mod.build_sphere_bvh(center, radius)
        if with_bvh
        else bvh_mod.empty_bvh()
    )
    return Geometry(
        tri_v0=z3, tri_e1=z3, tri_e2=z3,
        tri_n0=z3, tri_n1=z3, tri_n2=z3,
        tri_uv0=z2, tri_uv1=z2, tri_uv2=z2,
        tri_tang=jnp.zeros((0, 4), jnp.float32),
        tri_shape=jnp.zeros(0, jnp.int32),
        sph_center=jnp.asarray(center),
        sph_radius=jnp.asarray(radius),
        sph_shape=jnp.zeros(n_sph, jnp.int32),
        bvh=bvh_mod.empty_bvh(),
        sph_bvh=sph_bvh,
    )


def _rays(n_rays: int, seed: int) -> Ray:
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4.0, 4.0, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(
        o=jnp.asarray(o),
        d=jnp.asarray(d),
        mint=jnp.full(n_rays, 1e-4, jnp.float32),
        maxt=jnp.full(n_rays, jnp.inf, jnp.float32),
    )


@pytest.mark.parametrize("n_tris", [5, 64, 777])
def test_bvh_matches_brute_force_closest_hit(n_tris):
    ray = _rays(512, seed=1)
    g_brute = _soup_geometry(n_tris, seed=7, with_bvh=False)
    g_bvh = _soup_geometry(n_tris, seed=7, with_bvh=True)

    h0 = isect.intersect(g_brute, ray)
    h1 = isect.intersect(g_bvh, ray)

    hit0 = np.asarray(h0.prim_kind) != isect.PRIM_NONE
    hit1 = np.asarray(h1.prim_kind) != isect.PRIM_NONE
    np.testing.assert_array_equal(hit0, hit1)
    # nearest t identical (same FP math, both exact Möller–Trumbore)
    np.testing.assert_allclose(
        np.asarray(h0.t)[hit0], np.asarray(h1.t)[hit1], rtol=1e-5
    )
    # prim ids may legitimately differ only for exactly-equal t ties
    same = np.asarray(h0.prim_id)[hit0] == np.asarray(h1.prim_id)[hit1]
    ties = np.isclose(np.asarray(h0.t)[hit0], np.asarray(h1.t)[hit1])
    assert np.all(same | ties)


def test_bvh_matches_brute_force_occlusion():
    ray = _rays(512, seed=3)
    # bounded shadow rays
    ray = ray._replace(maxt=jnp.full(ray.o.shape[0], 3.0, jnp.float32))
    g_brute = _soup_geometry(300, seed=11, with_bvh=False)
    g_bvh = _soup_geometry(300, seed=11, with_bvh=True)
    occ0 = np.asarray(isect.occluded(g_brute, ray))
    occ1 = np.asarray(isect.occluded(g_bvh, ray))
    np.testing.assert_array_equal(occ0, occ1)


@pytest.mark.parametrize("n_sph", [7, 64, 1000])
def test_sphere_bvh_matches_brute_force(n_sph):
    """M4: spheres in an acceleration structure — identical nearest hits to
    the brute sweep on a 1000-sphere soup (same asymptotics as triangles)."""
    ray = _rays(512, seed=5)
    g_brute = _sphere_geometry(n_sph, seed=13, with_bvh=False)
    g_bvh = _sphere_geometry(n_sph, seed=13, with_bvh=True)

    h0 = isect.intersect(g_brute, ray)
    h1 = isect.intersect(g_bvh, ray)

    hit0 = np.asarray(h0.prim_kind) != isect.PRIM_NONE
    hit1 = np.asarray(h1.prim_kind) != isect.PRIM_NONE
    np.testing.assert_array_equal(hit0, hit1)
    # near-tangent hits amplify one-ULP fusion differences between the two
    # compilations through the b²−4ac cancellation (disc ~1e-3 at b² ~1e2
    # → ~1e-4 in t), so the t comparison is looser than the triangle test
    np.testing.assert_allclose(
        np.asarray(h0.t)[hit0], np.asarray(h1.t)[hit1], rtol=1e-3, atol=1e-5
    )
    same = np.asarray(h0.prim_id)[hit0] == np.asarray(h1.prim_id)[hit1]
    ties = np.isclose(
        np.asarray(h0.t)[hit0], np.asarray(h1.t)[hit1], rtol=1e-3, atol=1e-5
    )
    assert np.all(same | ties)


def test_sphere_bvh_occlusion():
    ray = _rays(512, seed=9)
    ray = ray._replace(maxt=jnp.full(ray.o.shape[0], 4.0, jnp.float32))
    g_brute = _sphere_geometry(500, seed=17, with_bvh=False)
    g_bvh = _sphere_geometry(500, seed=17, with_bvh=True)
    occ0 = np.asarray(isect.occluded(g_brute, ray))
    occ1 = np.asarray(isect.occluded(g_bvh, ray))
    np.testing.assert_array_equal(occ0, occ1)


def test_bvh_build_invariants():
    rng = np.random.default_rng(0)
    v0 = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32)
    node_min, node_max, skip, first, prim = bvh_mod.build_lbvh_numpy(v0, v1, v2)
    n_leaves = -(-100 // bvh_mod.LEAF_SIZE)
    assert len(skip) == 2 * n_leaves - 1
    # every real triangle appears exactly once in prim
    ids = prim[prim >= 0]
    assert sorted(ids.tolist()) == list(range(100))
    # root bbox contains everything
    allmin = np.minimum(np.minimum(v0, v1), v2).min(0)
    allmax = np.maximum(np.maximum(v0, v1), v2).max(0)
    assert np.all(node_min[0] <= allmin + 1e-6)
    assert np.all(node_max[0] >= allmax - 1e-6)
    # escape links are monotonically forward and in range
    assert np.all(skip > np.arange(len(skip)))
    assert np.all(skip <= len(skip))
