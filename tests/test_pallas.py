"""Pallas intersection megakernel: interpret-mode equivalence vs the jnp sweep.

The CPU path IS the reference implementation for the accelerator path
(SURVEY.md §4 "multi-device testing without hardware"): the kernel runs in
the Pallas interpreter here and compiled on the real chip in bench.py.
"""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.ops.pallas.mt_kernel import _mt_jnp, _mt_pallas


def _random_case(n_rays, n_tris, seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    v0 = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(size=(n_tris, 3)).astype(np.float32)
    e2 = rng.normal(size=(n_tris, 3)).astype(np.float32)
    mint = np.full(n_rays, 1e-4, np.float32)
    cutoff = np.full(n_rays, 3.4e38, np.float32)
    return tuple(map(jnp.asarray, (o, d, mint, cutoff, v0, e1, e2)))


def test_mt_kernel_matches_jnp_sweep():
    for seed, (nr, nt) in enumerate([(64, 7), (700, 40), (1100, 300)]):
        args = _random_case(nr, nt, seed)
        t0, u0, v0_, i0 = _mt_jnp(*args)
        t1, u1, v1_, i1 = _mt_pallas(*args, interpret=True)
        hit = np.asarray(i0) >= 0
        assert (np.asarray(i1) >= 0).tolist() == hit.tolist()
        # tolerances absorb fp association differences (separate cross-product
        # component evaluation in the kernel vs jnp.cross)
        np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                                   rtol=1e-4)
        # ids may differ only on exact-tie t; require equality where unique
        np.testing.assert_array_equal(np.asarray(i1)[hit], np.asarray(i0)[hit])
        np.testing.assert_allclose(np.asarray(u1)[hit], np.asarray(u0)[hit],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(v1_)[hit], np.asarray(v0_)[hit],
                                   rtol=1e-3, atol=1e-4)


def test_mt_kernel_respects_mint_cutoff():
    (o, d, mint, cutoff, v0, e1, e2) = _random_case(256, 31, 99)
    # shrink the cutoff: kernel must never report t ≥ cutoff
    cutoff = jnp.full(256, 1.5, jnp.float32)
    t1, _, _, i1 = _mt_pallas(o, d, mint, cutoff, v0, e1, e2, interpret=True)
    t1, i1 = np.asarray(t1), np.asarray(i1)
    assert (t1[i1 >= 0] < 1.5).all()
    assert (t1[i1 < 0] == np.float32(1.5)).all()
    t0, _, _, i0 = _mt_jnp(o, d, mint, cutoff, v0, e1, e2)
    np.testing.assert_array_equal(i1, np.asarray(i0))


def test_mt_grad_flows_through_custom_vjp():
    """The custom VJP replays the jnp sweep — hit distances stay
    differentiable w.r.t. ray origins (differentiable-rendering contract)."""
    import jax

    from optix_renderer_tpu.ops.pallas.mt_kernel import mt_closest_hit

    (o, d, mint, cutoff, v0, e1, e2) = _random_case(128, 16, 3)

    def loss(o):
        t, u, v, idf = mt_closest_hit(o, d, mint, cutoff, v0, e1, e2)
        return jnp.sum(jnp.where(idf >= 0, t, 0.0))

    g = jax.grad(loss)(o)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0
