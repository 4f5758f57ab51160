"""Clustered traversal (ops/pallas/cluster.py) ≡ brute-force Möller–Trumbore.

Same CPU-validates-accelerator strategy as the rest of the Pallas suite:
interpret-mode kernel vs a numpy reference on randomized meshes/rays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.ops.pallas import cluster


def _mesh_sphere(n_tris_target=3000, seed=0):
    """UV-sphere triangle soup, ~n_tris_target triangles."""
    nu = int(np.sqrt(n_tris_target / 2)) + 1
    nv = nu
    th = np.linspace(0, np.pi, nv + 1)
    ph = np.linspace(0, 2 * np.pi, nu + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    )
    v0, v1, v2 = [], [], []
    for i in range(nv):
        for j in range(nu):
            a, b, c, d = pts[i, j], pts[i + 1, j], pts[i + 1, j + 1], pts[i, j + 1]
            v0 += [a, a]
            v1 += [b, c]
            v2 += [c, d]
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    # drop degenerate pole slivers (zero area → ambiguous brute/cluster ties)
    area = np.linalg.norm(np.cross(e1, e2), axis=-1)
    keep = area > 1e-7
    return v0[keep], e1[keep], e2[keep]


def _brute(o, d, mint, cutoff, v0, e1, e2):
    """Numpy MT reference: returns (t, u, v, id) with id −1 on miss."""
    n = o.shape[0]
    bt = cutoff.copy()
    bu = np.zeros(n, np.float32)
    bv = np.zeros(n, np.float32)
    bi = np.full(n, -1, np.int64)
    for k in range(v0.shape[0]):
        pv = np.cross(d, e2[k])
        det = pv @ e1[k]
        inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1e-12)
        tv = o - v0[k]
        u = np.sum(tv * pv, -1) * inv
        qv = np.cross(tv, e1[k])
        v = qv @ d.T if False else np.sum(d * qv, -1) * inv
        t = np.sum(qv * e2[k], -1) * inv
        hit = (
            (np.abs(det) > 1e-12)
            & (u >= 0) & (v >= 0) & (u + v <= 1)
            & (t >= mint) & (t < bt)
        )
        bt = np.where(hit, t, bt)
        bu = np.where(hit, u, bu)
        bv = np.where(hit, v, bv)
        bi = np.where(hit, k, bi)
    return bt, bu, bv, bi


@pytest.fixture(scope="module")
def mesh():
    return _mesh_sphere()


@pytest.mark.heavy
def test_cluster_closest_matches_brute(mesh):
    v0, e1, e2 = mesh
    cl = cluster.build_clusters(v0, e1, e2)
    rng = np.random.default_rng(1)
    n = 512
    o = (rng.normal(size=(n, 3)) * 0.2 + np.array([0, 0, 3.0])).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d -= np.array([0, 0, 3.2]) * 0  # aim roughly at the sphere
    d = (np.array([0, 0, -1.0]) + 0.6 * d).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.zeros(n, np.float32)
    cutoff = np.full(n, 1e9, np.float32)

    t, u, v, idf = cluster.cluster_raw(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(cutoff), cl, interpret=True,
    )
    rt, ru, rv, ri = _brute(o, d, mint, cutoff, v0, e1, e2)

    t = np.asarray(t)
    idf = np.asarray(idf)
    hit_ref = ri >= 0
    hit_got = idf >= 0.0
    assert (hit_ref == hit_got).mean() > 0.995  # bf16 silhouette ties allowed
    both = hit_ref & hit_got
    # t agreement where both hit (bf16 selection + exact rounding at winner)
    np.testing.assert_allclose(t[both], rt[both], rtol=5e-3, atol=5e-3)
    # the vast majority of winners are identical triangles
    assert (idf[both].astype(np.int64) == ri[both]).mean() > 0.98


@pytest.mark.heavy
def test_cluster_any_hit_matches_brute(mesh):
    v0, e1, e2 = mesh
    cl = cluster.build_clusters(v0, e1, e2)
    rng = np.random.default_rng(7)
    n = 256
    o = (rng.normal(size=(n, 3)) * 2.0).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.full(n, 1e-4, np.float32)
    cutoff = rng.uniform(0.5, 6.0, n).astype(np.float32)

    occ = cluster.cluster_any_hit(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint),
        jnp.asarray(cutoff), cl, interpret=True,
    )
    rt, _, _, ri = _brute(o, d, mint, cutoff, v0, e1, e2)
    ref = ri >= 0
    # boundary-t bf16 differences may flip rays whose first hit is ~at cutoff
    agree = np.asarray(occ) == ref
    assert agree.mean() > 0.99, agree.mean()


def test_build_clusters_tables_shape(mesh):
    v0, e1, e2 = mesh
    cl = cluster.build_clusters(v0, e1, e2)
    C = cl.coeffs.shape[0]
    assert C == (v0.shape[0] + cluster.CS - 1) // cluster.CS
    assert cl.coeffs.shape == (C, 32, 4 * cluster.CS)
    assert cl.ids.shape == (C, 1, cluster.CS)
    ids = np.asarray(cl.ids).reshape(-1)
    real = ids[ids >= 0].astype(np.int64)
    # a permutation of all triangle ids
    assert len(real) == v0.shape[0]
    assert sorted(real.tolist()) == list(range(v0.shape[0]))
