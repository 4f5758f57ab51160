"""Pallas TPU ray–triangle intersection megakernel (Möller–Trumbore).

The brute-force closest-hit sweep of ops/intersect.py (`Mesh::rayIntersect`
semantics, src/shapes/mesh.cpp; the SIMT analog of the OptiX built-in
triangle IS + the wavefront replacement of raygen.cpp:102-131's per-thread
trace) as a single fused kernel:

* rays live on the **lane** axis (RB = 512 lanes per block), triangles on the
  **sublane** axis (TB rows per chunk) — one [TB, RB] Möller–Trumbore
  evaluation per grid step, entirely VPU element-wise ops;
* the per-ray argmin over triangles is fused into the kernel (sublane-axis
  min + one-hot select), so the [N, T] candidate matrix never materializes
  in HBM — the jnp path relies on XLA to fuse the same reduction;
* the running best across triangle chunks accumulates in the revisited
  output block (grid = ray-blocks × tri-chunks, last axis innermost).

Differentiability: `pl.pallas_call` has no autodiff rule, but the renderer's
gradient path (parallel/shard.py train step) differentiates through
intersection — `mt_closest_hit` runs the sweep on detached inputs to select
the winning triangle, then recomputes (t, u, v) differentiably from the live
inputs by a one-triangle replay at the winner (see ops/bvh.py replay_tri).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 512  # rays per block (lanes; 4 × 128)
BIG = 3.4e38  # plain float: jnp scalars would be captured consts in the kernel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mt_kernel(rays_ref, tri_ref, out_ref):
    """One (ray-block, tri-chunk) step.

    rays_ref: [8, RB]  rows = ox oy oz dx dy dz mint cutoff
    tri_ref:  [TB, 16] cols = v0(3) e1(3) e2(3) pad(7); pad rows have e1=e2=0
    out_ref:  [8, RB]  rows = t u v id(float) pad(4); revisited across chunks
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0:1, :] = rays_ref[7:8, :]  # running best t ← cutoff
        out_ref[1:3, :] = jnp.zeros_like(out_ref[1:3, :])
        out_ref[3:4, :] = jnp.full_like(out_ref[3:4, :], -1.0)
        out_ref[4:8, :] = jnp.zeros_like(out_ref[4:8, :])

    ox, oy, oz = rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :]
    dx, dy, dz = rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :]
    mint = rays_ref[6:7, :]

    v0x, v0y, v0z = tri_ref[:, 0:1], tri_ref[:, 1:2], tri_ref[:, 2:3]
    e1x, e1y, e1z = tri_ref[:, 3:4], tri_ref[:, 4:5], tri_ref[:, 5:6]
    e2x, e2y, e2z = tri_ref[:, 6:7], tri_ref[:, 7:8], tri_ref[:, 8:9]

    # pvec = d × e2  → [TB, RB] per component
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec × e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

    cut = out_ref[0:1, :]
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= mint)
        & (t < cut)
    )
    tm = jnp.where(hit, t, BIG)
    tmin = jnp.min(tm, axis=0, keepdims=True)  # [1, RB]
    better = tmin < cut

    tb = tm.shape[0]
    jloc = jnp.argmin(tm, axis=0).reshape(1, -1)  # [1, RB] row of the winner
    onehot = jax.lax.broadcasted_iota(jnp.int32, (tb, RB), 0) == jloc
    ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=0, keepdims=True)
    vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=0, keepdims=True)
    gid = (j * tb + jloc).astype(jnp.float32)

    out_ref[0:1, :] = jnp.where(better, tmin, cut)
    out_ref[1:2, :] = jnp.where(better, ub, out_ref[1:2, :])
    out_ref[2:3, :] = jnp.where(better, vb, out_ref[2:3, :])
    out_ref[3:4, :] = jnp.where(better, gid, out_ref[3:4, :])


def _mt_pallas(o, d, mint, cutoff, v0, e1, e2, interpret=False):
    """Raw kernel launch. o,d: [N,3]; mint/cutoff: [N]; v0/e1/e2: [T,3].

    Returns (t, u, v, idf) each [N]; idf is the winning triangle id as float
    (−1 where no hit; t = cutoff there).
    """
    n = o.shape[0]
    t_cnt = v0.shape[0]
    n_pad = _round_up(max(n, RB), RB)
    # triangle sublane chunk: small scenes stay in one skinny chunk instead
    # of padding to 128 rows of dead compute
    tb = min(256, _round_up(max(t_cnt, 8), 8))
    t_pad = _round_up(max(t_cnt, tb), tb)
    # the winning id rides a float32 lane register — exact only to 2^24.
    # intersect() routes meshes ≥257 tris to the BVH, but this is a public
    # entry (tests/benches call it directly): make the bound explicit.
    assert t_pad < (1 << 24), (
        f"mt_closest_hit id channel is float32-exact only below 2^24 "
        f"triangles (got {t_cnt}); use the BVH path"
    )

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(o.T)
    rays = rays.at[3:6, :n].set(d.T)
    rays = rays.at[6, :n].set(mint)
    rays = rays.at[7, :].set(BIG)
    rays = rays.at[7, :n].set(cutoff)

    tris = jnp.zeros((t_pad, 16), jnp.float32)
    tris = tris.at[:t_cnt, 0:3].set(v0)
    tris = tris.at[:t_cnt, 3:6].set(e1)  # pad rows keep e1=e2=0 → det=0
    tris = tris.at[:t_cnt, 6:9].set(e2)

    grid = (n_pad // RB, t_pad // tb)
    out = pl.pallas_call(
        _mt_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, RB), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, tris)
    return out[0, :n], out[1, :n], out[2, :n], out[3, :n]


def _mt_jnp(o, d, mint, cutoff, v0, e1, e2):
    """Pure-jnp reference sweep with identical outputs (also the VJP body)."""
    pvec = jnp.cross(d[:, None, :], e2[None, :, :])
    det = jnp.sum(e1[None, :, :] * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    tvec = o[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= mint[:, None])
        & (t < cutoff[:, None])
    )
    tm = jnp.where(hit, t, BIG)
    j = jnp.argmin(tm, axis=-1)
    rows = jnp.arange(o.shape[0])
    tj = tm[rows, j]
    better = tj < cutoff
    t_out = jnp.where(better, tj, cutoff)
    u_out = jnp.where(better, u[rows, j], 0.0)
    v_out = jnp.where(better, v[rows, j], 0.0)
    idf = jnp.where(better, j.astype(jnp.float32), -1.0)
    return t_out, u_out, v_out, idf


def mt_closest_hit(o, d, mint, cutoff, v0, e1, e2):
    """Closest-hit of a ray wavefront against a triangle table.

    Pallas forward on TPU; jnp everywhere else. Outputs (t, u, v, idf[N]
    float, −1 = miss, t = cutoff there).

    Differentiable by detach-and-replay (round-3 VERDICT W5): the sweep runs
    on `stop_gradient`-detached inputs (pallas_call has no autodiff rule, and
    the winner *selection* is discrete anyway); (t, u, v) are then recomputed
    from the live inputs at the winning triangle, so the backward pass is one
    gather + ~40 flops per lane — the [N, T] candidate matrix the kernel
    exists to avoid never materializes under grad either.
    """
    from optix_renderer_tpu.ops.bvh import replay_tri

    sg = jax.lax.stop_gradient
    args_det = (sg(o), sg(d), sg(mint), sg(cutoff), sg(v0), sg(e1), sg(e2))
    if jax.default_backend() == "tpu":
        _, _, _, idf = _mt_pallas(*args_det)
    else:
        _, _, _, idf = _mt_jnp(*args_det)
    found = idf >= 0.0
    gid = jnp.maximum(idf, 0.0).astype(jnp.int32)
    t_r, u_r, v_r = replay_tri(o, d, v0[gid], e1[gid], e2[gid])
    t = jnp.where(found, t_r, cutoff)
    u = jnp.where(found, u_r, 0.0)
    v = jnp.where(found, v_r, 0.0)
    return t, u, v, idf
