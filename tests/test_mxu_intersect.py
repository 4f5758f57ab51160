"""MXU matmul-form Möller–Trumbore ≡ the elementwise sweep.

Validates the coefficient algebra (det, t·det, u·det, v·det as linear forms
in the 16 ray features) and the Pallas kernel (interpret mode on CPU)
against the reference jnp sweep at matched inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.ops.pallas import mxu_intersect as mx
from optix_renderer_tpu.ops.pallas.mt_kernel import _mt_jnp


def _random_tris(rng, t):
    v0 = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    return v0, e1, e2


def test_coefficient_algebra():
    """F·c reproduces det, t·det, u·det, v·det of classic Möller–Trumbore."""
    rng = np.random.default_rng(0)
    v0, e1, e2 = _random_tris(rng, 64)
    o = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (128, 3)).astype(np.float32)

    C = mx.build_tri_coeffs(v0, e1, e2)  # [4*Tpad, 16]
    t_pad = C.shape[0] // 4
    F = np.concatenate(
        [
            (o[:, :, None] * d[:, None, :]).reshape(-1, 9),
            d,
            o,
            np.ones((o.shape[0], 1), np.float32),
        ],
        axis=1,
    )  # [N,16]
    got = F @ C.T  # [N, 4*Tpad]
    det_g = got[:, 0:64]
    tn_g = got[:, t_pad : t_pad + 64]
    un_g = got[:, 2 * t_pad : 2 * t_pad + 64]
    vn_g = got[:, 3 * t_pad : 3 * t_pad + 64]

    # classic MT
    pvec = np.cross(d[:, None, :], e2[None, :, :])
    det = np.sum(e1[None] * pvec, -1)
    tvec = o[:, None, :] - v0[None]
    un = np.sum(tvec * pvec, -1)
    qvec = np.cross(tvec, e1[None])
    vn = np.sum(d[:, None, :] * qvec, -1)
    tn = np.sum(e2[None] * qvec, -1)

    np.testing.assert_allclose(det_g, det, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(tn_g, tn, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(un_g, un, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(vn_g, vn, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t_cnt", [12, 300])
def test_kernel_matches_jnp_sweep(t_cnt):
    rng = np.random.default_rng(1)
    v0, e1, e2 = _random_tris(rng, t_cnt)
    n = 777
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    mint = np.full(n, 1e-4, np.float32)
    cutoff = np.full(n, 3.4e38, np.float32)

    C = jnp.asarray(mx.build_tri_coeffs(v0, e1, e2))
    t_k, u_k, v_k, id_k = mx.mxu_raw(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint), jnp.asarray(cutoff),
        C, interpret=True,
    )
    t_r, u_r, v_r, id_r = _mt_jnp(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(mint), jnp.asarray(cutoff),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
    )
    hit_k = np.asarray(id_k) >= 0
    hit_r = np.asarray(id_r) >= 0
    # identical hit classification and near-identical distances; ids may
    # differ only on exact ties (none in random geometry)
    np.testing.assert_array_equal(hit_k, hit_r)
    np.testing.assert_allclose(
        np.asarray(t_k)[hit_k], np.asarray(t_r)[hit_r], rtol=1e-3, atol=1e-3
    )
    assert (np.asarray(id_k)[hit_k] == np.asarray(id_r)[hit_r]).mean() > 0.995


def test_closest_hit_differentiable():
    """Detach-and-replay: gradients flow to vertex data through the winner."""
    import jax

    rng = np.random.default_rng(2)
    v0, e1, e2 = _random_tris(rng, 16)
    C = jnp.asarray(mx.build_tri_coeffs(v0, e1, e2))
    o = jnp.asarray(rng.uniform(-3, 3, (32, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (32, 3)), jnp.float32)
    mint = jnp.full(32, 1e-4)
    cutoff = jnp.full(32, 3.4e38)

    def loss(v0j):
        t, u, v, idf = mx.mxu_closest_hit(
            o, d, mint, cutoff, v0j, jnp.asarray(e1), jnp.asarray(e2), C,
            interpret=True,
        )
        return jnp.sum(jnp.where(idf >= 0, t, 0.0))

    g = jax.grad(loss)(jnp.asarray(v0))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
