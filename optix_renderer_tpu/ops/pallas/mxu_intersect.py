"""MXU ray–triangle intersection: Möller–Trumbore as a matrix multiply.

TPU-native replacement for both the brute-force sweep (ops/pallas/mt_kernel)
and — for small/medium scenes — the BVH (src/utils/bvh.cpp traversal): the
four Möller–Trumbore quantities are (bi)linear forms in per-ray features, so
closest-hit against T triangles becomes ONE [16,N]ᵀ-style matmul on the MXU
instead of thousands of VPU ops or HBM gathers:

    det  = e1·(d×e2)            = F · c_det      (linear in d)
    t·det  = tvec·(e1×e2)       = F · c_t        (linear in o; affine)
    u·det  = tvec·(d×e2)        = F · c_u        (bilinear in o⊗d, linear d)
    v·det  = d·(tvec×e1)        = F · c_v        (bilinear in o⊗d, linear d)

with the 16 ray features F = [o⊗d (9), d (3), o (3), 1] and per-triangle
coefficient columns precomputed on the host at scene-build time. At 128
flops/(ray·tri) the MXU sustains brute-force closest-hit for thousands of
triangles faster than any gather-based traversal reaches ONE node on this
backend (see BASELINE.md backend cost model). The same matmul serves shadow
rays (any-hit = closest-hit vs the shadow segment).

Layout: triangles on sublanes, rays on lanes ([TC,16] @ [16,RB] → [TC,RB]),
matching the mt_kernel conventions; coefficient rows are grouped
[det | t | u | v] so each group is a static slice.

Differentiability follows the detach-and-replay policy of ops/bvh.py: the
kernel selects the winning triangle on detached inputs; (t,u,v) are then
recomputed differentiably from the live arrays at the winner.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 512  # rays per block (lanes)
TC = 256  # triangle rows per matmul chunk (sublanes)
BIG = 3.4e38
# coefficient table cap: [4*Tpad,16] f32 must stay comfortably in VMEM
MAX_MXU_TRIS = 8192


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cross_mat(e: np.ndarray) -> np.ndarray:
    """[T,3,3] with M[i,j] = Σ_k ε_ijk e_k  (the o⊗d coefficients of
    det(o,d,e))."""
    z = np.zeros(e.shape[0], np.float32)
    ex, ey, ez = e[:, 0], e[:, 1], e[:, 2]
    return np.stack(
        [
            np.stack([z, ez, -ey], -1),
            np.stack([-ez, z, ex], -1),
            np.stack([ey, -ex, z], -1),
        ],
        axis=1,
    )


def build_tri_coeffs(v0, e1, e2) -> np.ndarray:
    """Host precompute → [4*Tpad, 16] float32, row groups [det|t|u|v].

    Padding triangles are all-zero → det == 0 → rejected by the hit mask.
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t_cnt = v0.shape[0]
    # small scenes pad only to the 8-sublane tile (a 12-tri Cornell costs a
    # [64,16] matmul, not [1024,16]); larger ones to full TC chunks
    t_pad = _round_up(t_cnt, 8) if t_cnt <= TC else _round_up(t_cnt, TC)
    assert t_pad <= MAX_MXU_TRIS

    n = np.cross(e1, e2).astype(np.float32)  # unnormalized geometric normal
    C = np.zeros((4, t_pad, 16), np.float32)
    # det = -d·n      (= e1·(d×e2))
    C[0, :t_cnt, 9:12] = -n
    # t·det = o·n - v0·n
    C[1, :t_cnt, 12:15] = n
    C[1, :t_cnt, 15] = -np.sum(v0 * n, -1)
    # u·det = det(o,d,e2) - d·(e2×v0)
    C[2, :t_cnt, 0:9] = _cross_mat(e2).reshape(t_cnt, 9)
    C[2, :t_cnt, 9:12] = -np.cross(e2, v0)
    # v·det = -det(o,d,e1) + d·(e1×v0)
    C[3, :t_cnt, 0:9] = -_cross_mat(e1).reshape(t_cnt, 9)
    C[3, :t_cnt, 9:12] = np.cross(e1, v0)
    return C.reshape(4 * t_pad, 16)


def _features(rays_ref):
    """[16, RB] ray features from the packed [8, RB] ray block."""
    o = rays_ref[0:3, :]
    d = rays_ref[3:6, :]
    ox, oy, oz = o[0:1], o[1:2], o[2:3]
    dx, dy, dz = d[0:1], d[1:2], d[2:3]
    one = jnp.ones_like(ox)
    return jnp.concatenate(
        [
            ox * dx, ox * dy, ox * dz,
            oy * dx, oy * dy, oy * dz,
            oz * dx, oz * dy, oz * dz,
            dx, dy, dz,
            ox, oy, oz,
            one,
        ],
        axis=0,
    )


def _mxu_kernel(rays_ref, coeff_ref, out_ref):
    """One ray block vs ALL triangle chunks (coeffs fully VMEM-resident).

    rays_ref: [8, RB]  rows = ox oy oz dx dy dz mint cutoff
    coeff_ref: [4*Tpad, 16]  row groups [det|t|u|v]
    out_ref:  [8, RB]  rows = t u v id(float) pad(4)
    """
    t_pad4 = coeff_ref.shape[0]
    t_pad = t_pad4 // 4
    tc = min(TC, t_pad)
    F = _features(rays_ref)  # [16, RB]
    mint = rays_ref[6:7, :]
    cut = rays_ref[7:8, :]

    best_t = cut
    best_u = jnp.zeros_like(cut)
    best_v = jnp.zeros_like(cut)
    best_id = jnp.full_like(cut, -1.0)

    for c0 in range(0, t_pad, tc):
        # precision=HIGHEST: the MXU's default f32 matmul truncates inputs to
        # bf16 — the o⊗d features span ~|o|² in scene units and their bf16
        # rounding corrupts t/u/v outright on metre++-scale scenes (observed:
        # 38% wrong t on the 550-unit reference cbox). HIGHEST runs the
        # 3-pass f32 emulation; the matmul stays ~40× cheaper than gathers.
        hp = jax.lax.Precision.HIGHEST
        det = jnp.dot(coeff_ref[c0 : c0 + tc, :], F,
                      preferred_element_type=jnp.float32, precision=hp)
        tn = jnp.dot(coeff_ref[t_pad + c0 : t_pad + c0 + tc, :], F,
                     preferred_element_type=jnp.float32, precision=hp)
        un = jnp.dot(coeff_ref[2 * t_pad + c0 : 2 * t_pad + c0 + tc, :], F,
                     preferred_element_type=jnp.float32, precision=hp)
        vn = jnp.dot(coeff_ref[3 * t_pad + c0 : 3 * t_pad + c0 + tc, :], F,
                     preferred_element_type=jnp.float32, precision=hp)
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        u = un * inv_det
        v = vn * inv_det
        t = tn * inv_det
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= mint)
            & (t < best_t)
        )
        tm = jnp.where(hit, t, BIG)
        tmin = jnp.min(tm, axis=0, keepdims=True)  # [1, RB]
        better = tmin < best_t
        jloc = jnp.argmin(tm, axis=0).reshape(1, -1)
        onehot = jax.lax.broadcasted_iota(jnp.int32, (tc, RB), 0) == jloc
        ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=0, keepdims=True)
        vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=0, keepdims=True)
        idb = (jloc + c0).astype(jnp.float32)
        best_u = jnp.where(better, ub, best_u)
        best_v = jnp.where(better, vb, best_v)
        best_id = jnp.where(better, idb, best_id)
        best_t = jnp.where(better, tmin, best_t)

    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = best_u
    out_ref[2:3, :] = best_v
    out_ref[3:4, :] = best_id
    out_ref[4:8, :] = jnp.zeros_like(out_ref[4:8, :])


def mxu_raw(o, d, mint, cutoff, coeffs, interpret=False):
    """Raw launch. o,d: [N,3]; mint/cutoff: [N]; coeffs: [4*Tpad,16] (device).

    Returns (t, u, v, idf) each [N]; idf −1 on miss (t = cutoff there).
    """
    n = o.shape[0]
    n_pad = _round_up(max(n, RB), RB)

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T)
    rays = rays.at[3:6, :n].set(d.T)
    rays = rays.at[6, :n].set(mint)
    rays = rays.at[7, :].set(BIG)
    rays = rays.at[7, :n].set(cutoff)

    out = pl.pallas_call(
        _mxu_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=(n_pad // RB,),
        in_specs=[
            pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(coeffs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, coeffs)
    return out[0, :n], out[1, :n], out[2, :n], out[3, :n]


def mxu_closest_hit(o, d, mint, cutoff, v0, e1, e2, coeffs, interpret=False):
    """Closest-hit with the detach-and-replay differentiability contract of
    mt_closest_hit (same output signature: t, u, v, idf)."""
    from optix_renderer_tpu.ops.bvh import replay_tri

    sg = jax.lax.stop_gradient
    _, _, _, idf = mxu_raw(
        sg(o), sg(d), sg(mint), sg(cutoff), coeffs, interpret=interpret
    )
    found = idf >= 0.0
    gid = jnp.minimum(
        jnp.maximum(idf, 0.0).astype(jnp.int32), v0.shape[0] - 1
    )
    t_r, u_r, v_r = replay_tri(o, d, v0[gid], e1[gid], e2[gid])
    t = jnp.where(found, t_r, cutoff)
    u = jnp.where(found, u_r, 0.0)
    v = jnp.where(found, v_r, 0.0)
    return t, u, v, jnp.where(found, idf, -1.0)
