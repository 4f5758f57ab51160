"""Two-level clustered ray traversal for large meshes (the TPU BVH).

The reference traverses a binned-SAH BVH per ray with an iterative stack
(src/utils/bvh.cpp:300+, include/nori/bvh.h:127-171). Per-lane pointer
chasing is the one thing this hardware cannot do (no vector gather), so the
TPU redesign replaces the deep tree with a two-level scheme built for the
MXU + DMA engines:

* triangles are Morton-sorted and chunked into **clusters of CS=256**; each
  cluster gets an AABB, a centroid, and a Möller–Trumbore coefficient block
  in matmul form (mxu_intersect.py derivation), **re-centered at the cluster
  centroid**; in-kernel each lane's origin is additionally advanced to its
  box-entry point, so features span only the cluster extent and the
  multi-pass f32 MXU contraction (precision=HIGHEST) selects winners to ~1e-5 —
  the winner is then re-verified exactly per lane (detach-and-replay,
  ops/bvh.py policy);
* culling runs OUTSIDE the kernel: per ray block, a conservative interval-
  arithmetic slab test of every cluster AABB against the block's ray-bundle
  summary builds a worklist in a few fused XLA ops, fed to the kernel via
  scalar prefetch (per-cluster control flow on the in-kernel scalar core
  costs ~1 µs/cluster — measured — so it must not run per block there);
* the kernel sweeps only worklisted clusters: each visit re-tests the exact
  per-lane slab against the RUNNING best-t (cheap skip), then DMAs that
  cluster's coefficient block HBM→VMEM and runs the [CS,16]ᵀ@[16,W]
  closest-hit contraction. Culling is at ray-BLOCK granularity — coherence
  does the work, like the reference's packet traversals but 2048 wide, and
  `cluster_closest_hit(sort=True)` restores coherence for incoherent
  wavefronts by (octant, origin-Morton-cell) sorting.

Scale: coefficient tables live in HBM and stream on demand, so scene size is
bounded by HBM, not VMEM (a 1M-tri scene is ~256 MB of coefficients).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS = 256  # triangles per cluster
W = 2048  # rays per kernel block (8 sublanes x 256 lanes per component)
BIG = 3.4e38
MAX_CLUSTERS = 4096  # SMEM box-table bound (~1M tris)


class Clusters(NamedTuple):
    """Device tables for the two-level clustered traversal."""

    coeffs: jnp.ndarray  # [C, 32, 4*CS] bf16 (rows 0:16 hi, 16:32 lo), col groups [det|t|u|v], re-centered
    ids: jnp.ndarray  # [C, 1, CS] f32 global tri id (-1 on padding)
    boxes: jnp.ndarray  # [C, 16] f32: lo 0:3, hi 3:6, centroid 6:9, pad
    boxes_t: jnp.ndarray  # [8, Cpad] f32: rows 0:3 lo, 3:6 hi (lane-major)


def build_clusters(v0, e1, e2) -> Clusters:
    """Host build: Morton-order triangles, chunk, re-center, pack (numpy)."""
    from optix_renderer_tpu.ops.bvh import morton3d
    from optix_renderer_tpu.ops.pallas.mxu_intersect import _cross_mat

    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t_cnt = v0.shape[0]
    cent = v0 + (e1 + e2) / 3.0
    lo = cent.min(0)
    extent = np.maximum(cent.max(0) - lo, 1e-12)
    order = np.argsort(morton3d((cent - lo) / extent), kind="stable")

    C = (t_cnt + CS - 1) // CS
    assert C <= MAX_CLUSTERS, f"{t_cnt} tris exceeds the cluster table bound"
    n_pad = C * CS
    idx = np.full(n_pad, -1, np.int64)
    idx[:t_cnt] = order
    gv0 = np.zeros((n_pad, 3), np.float32)
    ge1 = np.zeros((n_pad, 3), np.float32)
    ge2 = np.zeros((n_pad, 3), np.float32)
    gv0[:t_cnt] = v0[order]
    ge1[:t_cnt] = e1[order]
    ge2[:t_cnt] = e2[order]

    gv0 = gv0.reshape(C, CS, 3)
    ge1 = ge1.reshape(C, CS, 3)
    ge2 = ge2.reshape(C, CS, 3)
    mask = (idx >= 0).reshape(C, CS)

    # cluster AABBs over all three vertices of member triangles
    pts = np.stack([gv0, gv0 + ge1, gv0 + ge2], axis=2)  # [C, CS, 3, 3]
    big = np.where(mask[:, :, None, None], 0.0, BIG)
    blo = (pts + big).min(axis=(1, 2))
    bhi = (pts - big).max(axis=(1, 2))
    empty = ~mask.any(axis=1)
    blo[empty] = 1.0
    bhi[empty] = -1.0  # inverted → slab test always misses
    centroid = 0.5 * (blo + bhi)
    centroid[empty] = 0.0

    # re-centered MT coefficients (mxu_intersect.build_tri_coeffs with
    # v0' = v0 − centroid; the o-features are translated in-kernel to match)
    cv0 = gv0 - centroid[:, None, :]
    n = np.cross(ge1, ge2).astype(np.float32)
    Cf = np.zeros((C, 4, CS, 16), np.float32)
    Cf[:, 0, :, 9:12] = -n
    Cf[:, 1, :, 12:15] = n
    Cf[:, 1, :, 15] = -np.sum(cv0 * n, -1)
    Cf[:, 2, :, 0:9] = np.stack(
        [_cross_mat(ge2[c]).reshape(CS, 9) for c in range(C)]
    )
    Cf[:, 2, :, 9:12] = -np.cross(ge2, cv0)
    Cf[:, 3, :, 0:9] = -np.stack(
        [_cross_mat(ge1[c]).reshape(CS, 9) for c in range(C)]
    )
    Cf[:, 3, :, 9:12] = np.cross(ge1, cv0)
    Cf = Cf * mask[:, None, :, None]  # zero padding rows → det 0 → no hit

    boxes = np.zeros((C, 16), np.float32)
    boxes[:, 0:3] = blo
    boxes[:, 3:6] = bhi
    boxes[:, 6:9] = centroid

    # layouts chosen for aligned HBM→VMEM DMA slices (lane dim multiple of
    # 128): coefficients transposed to [16, 4*CS] and split into bf16 hi/lo
    # halves (rows 0:16 / 16:32) for the in-kernel 3-pass contractions;
    # ids as a [1, CS] row fetched by a one-hot matmul
    ct = np.ascontiguousarray(
        Cf.reshape(C, 4 * CS, 16).transpose(0, 2, 1))  # [C, 16, 4CS] f32
    hi = jnp.asarray(ct, jnp.bfloat16)
    lo = jnp.asarray(ct - np.asarray(hi, np.float32), jnp.bfloat16)
    c_pad = (C + 127) // 128 * 128
    bt = np.zeros((8, c_pad), np.float32)
    bt[0:3, :C] = blo.T
    bt[3:6, :C] = bhi.T
    bt[0:3, C:] = 1.0   # padding clusters: inverted box → never flagged
    bt[3:6, C:] = -1.0
    return Clusters(
        coeffs=jnp.concatenate([hi, lo], axis=1),  # [C, 32, 4CS] bf16
        ids=jnp.asarray(idx.reshape(C, 1, CS).astype(np.float32)),
        boxes=jnp.asarray(boxes),
        boxes_t=jnp.asarray(bt),
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _slab(o, inv_d, mint, cutoff, lo, hi):
    """Vector slab test of a [8,256]-component ray set vs scalar box."""
    tx0 = (lo[0] - o[0]) * inv_d[0]
    tx1 = (hi[0] - o[0]) * inv_d[0]
    ty0 = (lo[1] - o[1]) * inv_d[1]
    ty1 = (hi[1] - o[1]) * inv_d[1]
    tz0 = (lo[2] - o[2]) * inv_d[2]
    tz1 = (hi[2] - o[2]) * inv_d[2]
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), mint),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), cutoff),
    )
    return tn <= tf


def _cluster_kernel(
    wl_ref,  # scalar-prefetch [nb, C] int32: per-block cluster visit order
    cnt_ref,  # scalar-prefetch [nb, 1] int32: per-block worklist length
    ox_ref, oy_ref, oz_ref,  # [8, 256] per block
    dx_ref, dy_ref, dz_ref,
    mint_ref, cut_ref,
    boxes_ref,  # SMEM [C, 16]
    coeff_hbm,  # ANY [C, 32, 4*CS] bf16 hi/lo
    ids_hbm,  # ANY [C, 1, CS] f32
    out_ref,  # [8, 8, 256]: rows t u v idf n_work n_swept pad pad
    coeff_buf,  # VMEM [32, 4*CS] bf16 hi/lo
    ids_buf,  # VMEM [1, CS] f32
    sem_c,
    sem_i,
    *,
    n_clusters: int,
    any_hit: bool,
):
    i = pl.program_id(0)
    o = (ox_ref[:], oy_ref[:], oz_ref[:])
    d = (dx_ref[:], dy_ref[:], dz_ref[:])
    mint = mint_ref[:]
    cutoff = cut_ref[:]
    inv_d = tuple(1.0 / jnp.where(jnp.abs(c) > 1e-20, c, 1e-20) for c in d)
    n_work = cnt_ref[i, 0]

    # ---- wide ray rows [1, W] (features are rebuilt per cluster, re-centered
    # at each lane's cluster-entry point — see hit_case)
    def wide(x):
        return x.reshape(1, W)

    ox, oy, oz = wide(o[0]), wide(o[1]), wide(o[2])
    dx, dy, dz = wide(d[0]), wide(d[1]), wide(d[2])
    ix, iy, iz = wide(inv_d[0]), wide(inv_d[1]), wide(inv_d[2])
    one = jnp.ones_like(ox)
    mint_w = wide(mint)
    cut_w = wide(cutoff)

    # ---- visit loop: sweep worklisted clusters (cull + ordering were
    # computed in XLA from per-block ray-bundle summaries — see cluster_raw)
    def visit(k, carry):
        carry, n_swept = carry
        c = wl_ref[i, k]

        def flagged_case(carry):
            best_t = carry[0]
            # per-lane re-centering: advance each ray origin to its entry
            # point into this cluster's box and express it relative to the
            # cluster centroid (the coefficients were built with v0−centroid).
            # Features then span only the cluster extent, so bf16 MXU passes
            # keep full precision at cluster scale — without this, far-away
            # origins round to ~4% t error and rays leak through mesh cracks.
            cx, cy, cz = boxes_ref[c, 6], boxes_ref[c, 7], boxes_ref[c, 8]
            lx, ly, lz = boxes_ref[c, 0], boxes_ref[c, 1], boxes_ref[c, 2]
            hx, hy, hz = boxes_ref[c, 3], boxes_ref[c, 4], boxes_ref[c, 5]
            tx0, tx1 = (lx - ox) * ix, (hx - ox) * ix
            ty0, ty1 = (ly - oy) * iy, (hy - oy) * iy
            tz0, tz1 = (lz - oz) * iz, (hz - oz) * iz
            t_in = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), mint_w),
            )  # [1, W] entry parameter (≥ mint)
            t_out = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), jnp.minimum(cut_w, best_t)),
            )
            # culling is block-granular and static: re-test per lane with the
            # RUNNING best_t so clusters fully behind known hits are skipped
            in_box = t_in <= t_out

            def sweep(carry):
                best_t, best_u, best_v, best_id = carry
                cpc = pltpu.make_async_copy(coeff_hbm.at[c], coeff_buf, sem_c)
                cpc.start()
                cpi = pltpu.make_async_copy(ids_hbm.at[c], ids_buf, sem_i)
                cpi.start()
                rx = ox + t_in * dx - cx
                ry = oy + t_in * dy - cy
                rz = oz + t_in * dz - cz
                F = jnp.concatenate(
                    [
                        rx * dx, rx * dy, rx * dz,
                        ry * dx, ry * dy, ry * dz,
                        rz * dx, rz * dy, rz * dz,
                        dx, dy, dz,
                        rx, ry, rz,
                        one,
                    ],
                    axis=0,
                )  # [16, W] f32
                Fh = F.astype(jnp.bfloat16)
                Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
                cpc.wait()
                cpi.wait()

                # u·det / v·det cancel ~20x at cluster scale, so single-pass
                # bf16 leaks rays through shared edges. Manual two-term split
                # (hi/lo bf16, 3 MXU passes) restores ~f32 accuracy for the
                # boundary-critical quantities; det/tn ride single-pass (their
                # error only rescales u,v,t uniformly / reorders near-ties,
                # and the winner is replayed exactly outside the kernel).
                dnum = (((0,), (0,)), ((), ()))  # [16,K]ᵀ·[16,W] → [K,W]

                def dotq(ch, cl_, three_pass):
                    r = jax.lax.dot_general(
                        ch, Fh, dimension_numbers=dnum,
                        preferred_element_type=jnp.float32)
                    if three_pass:
                        r = r + jax.lax.dot_general(
                            ch, Fl, dimension_numbers=dnum,
                            preferred_element_type=jnp.float32)
                        r = r + jax.lax.dot_general(
                            cl_, Fh, dimension_numbers=dnum,
                            preferred_element_type=jnp.float32)
                    return r

                def cslice(part, q):
                    # rows 0:16 hi, 16:32 lo; col groups det|t|u|v
                    r0 = 0 if part == "hi" else 16
                    return coeff_buf[r0 : r0 + 16, q * CS : (q + 1) * CS]

                det = dotq(cslice("hi", 0), cslice("lo", 0), True)
                tn = dotq(cslice("hi", 1), cslice("lo", 1), False)
                un = dotq(cslice("hi", 2), cslice("lo", 2), True)
                vn = dotq(cslice("hi", 3), cslice("lo", 3), True)
                # sign-consistent hit test: no divisions, and the u=0 / v=0 /
                # u+v=1 boundaries depend only on the 3-pass quantities
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                dmag = jnp.abs(det)
                hit = (
                    in_box
                    & (dmag > 1e-12)
                    & (un * sgn >= 0.0) & (vn * sgn >= 0.0)
                    & ((un + vn) * sgn <= dmag)
                )
                if any_hit:
                    # conservative t window in multiplied-through form
                    tt_lo = tn * sgn >= (mint_w - t_in) * dmag
                    tt_hi = tn * sgn < (best_t - t_in) * dmag
                    got = jnp.max(
                        jnp.where(hit & tt_lo & tt_hi, 1.0, 0.0),
                        axis=0, keepdims=True,
                    )  # [1, W] ∈ {0,1}
                    return (best_t, best_u, best_v,
                            jnp.maximum(best_id, 2.0 * got - 1.0))
                tt = t_in + tn / jnp.where(dmag > 1e-12, det, 1e-12)
                hit = hit & (tt >= mint_w) & (tt < best_t)
                tm = jnp.where(hit, tt, BIG)
                tmin = jnp.min(tm, axis=0, keepdims=True)
                better = tmin < best_t
                jloc = jnp.argmin(tm, axis=0).reshape(1, W)
                oh = jax.lax.broadcasted_iota(jnp.int32, (CS, W), 0) == jloc
                det_w = jnp.sum(jnp.where(oh, det, 0.0), axis=0, keepdims=True)
                un_w = jnp.sum(jnp.where(oh, un, 0.0), axis=0, keepdims=True)
                vn_w = jnp.sum(jnp.where(oh, vn, 0.0), axis=0, keepdims=True)
                idb = jnp.dot(ids_buf[:], oh.astype(jnp.float32),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                inv_w = 1.0 / jnp.where(jnp.abs(det_w) > 1e-12, det_w, 1e-12)
                return (
                    jnp.where(better, tmin, best_t),
                    jnp.where(better, un_w * inv_w, best_u),
                    jnp.where(better, vn_w * inv_w, best_v),
                    jnp.where(better, idb, best_id),
                )

            # nested skip: the block flag was computed against the static
            # cutoff; with best_t tightened during the sweep whole clusters
            # drop out — one cheap reduce saves a DMA + 8 MXU passes
            any_lane = jnp.max(jnp.where(in_box, 1.0, 0.0))
            return (jax.lax.cond(any_lane > 0.5, sweep, lambda x: x, carry),
                    any_lane)

        carry, swept = flagged_case(carry)
        return (carry, n_swept + swept)

    init = (
        cut_w,
        jnp.zeros((1, W), jnp.float32),
        jnp.zeros((1, W), jnp.float32),
        jnp.full((1, W), -1.0),
    )
    (best_t, best_u, best_v, best_id), n_swept = jax.lax.fori_loop(
        0, n_work, visit, (init, jnp.float32(0.0))
    )

    out_ref[0] = best_t.reshape(8, 256)
    out_ref[1] = best_u.reshape(8, 256)
    out_ref[2] = best_v.reshape(8, 256)
    out_ref[3] = best_id.reshape(8, 256)
    # rows 4/5: scheduling diagnostics (worklist size, clusters swept)
    out_ref[4] = jnp.zeros((8, 256), jnp.float32) + n_work.astype(jnp.float32)
    out_ref[5] = jnp.zeros((8, 256), jnp.float32) + n_swept
    for r in range(6, 8):
        out_ref[r] = jnp.zeros((8, 256), jnp.float32)


def cluster_raw(o, d, mint, cutoff, clusters: Clusters, *, any_hit=False,
                interpret=False, debug=False):
    """Raw launch. o,d [N,3]; mint/cutoff [N] → (t, u, v, idf) each [N].

    idf is the ORIGINAL (pre-Morton-sort) triangle id; −1 on miss. In
    any_hit mode idf ≥ 0 marks occlusion (t/u/v are meaningless).
    """
    n = o.shape[0]
    nb = max(1, (n + W - 1) // W)
    n_pad = nb * W
    pad = n_pad - n

    # component-wise packing with FREE reshapes ([N] → [nb·8, 256] is a
    # bitcast in row-major layout): transpose-style [8,N] packing cost more
    # XLA-op time than the whole traversal on this backend
    def comp(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(nb * 8, 256)

    args = [
        comp(o[:, 0], 0.0), comp(o[:, 1], 0.0), comp(o[:, 2], 0.0),
        comp(d[:, 0], 1.0), comp(d[:, 1], 1.0), comp(d[:, 2], 1.0),
        comp(mint, 0.0),
        comp(cutoff, -1.0),  # padding rays: cutoff < mint → all-miss
    ]

    # ---- conservative cull + visit order, in XLA: per-block ray-bundle
    # interval summaries vs every cluster AABB. Over-inclusion is pruned
    # per-visit by the exact per-lane slab + running-best_t skip in-kernel.
    # (Padding rays in the last block widen its summary — conservative.)
    stacked = jnp.stack(args).reshape(8, nb, W)
    lo8 = stacked.min(axis=2)  # [8, nb]
    hi8 = stacked.max(axis=2)
    inv_all = 1.0 / jnp.where(jnp.abs(stacked[3:6]) > 1e-20,
                              stacked[3:6], 1e-20)
    ilo = inv_all.min(axis=2)  # [3, nb]
    ihi = inv_all.max(axis=2)
    C = clusters.coeffs.shape[0]
    blo = clusters.boxes[:, 0:3]  # [C, 3]
    bhi = clusters.boxes[:, 3:6]
    tn_int = jnp.broadcast_to(lo8[6][:, None], (nb, C))  # mint lower bound
    tf_int = jnp.broadcast_to(hi8[7][:, None], (nb, C))  # cutoff upper bound
    for ax in range(3):
        o_lo = lo8[ax][:, None]  # [nb, 1]
        o_hi = hi8[ax][:, None]
        i_lo = ilo[ax][:, None]
        i_hi = ihi[ax][:, None]
        spans = (i_lo < 0.0) & (i_hi > 0.0)
        n0_lo, n0_hi = blo[None, :, ax] - o_hi, blo[None, :, ax] - o_lo
        n1_lo, n1_hi = bhi[None, :, ax] - o_hi, bhi[None, :, ax] - o_lo
        cands = [n0_lo * i_lo, n0_lo * i_hi, n0_hi * i_lo, n0_hi * i_hi,
                 n1_lo * i_lo, n1_lo * i_hi, n1_hi * i_lo, n1_hi * i_hi]
        t_min = cands[0]
        t_max = cands[0]
        for x in cands[1:]:
            t_min = jnp.minimum(t_min, x)
            t_max = jnp.maximum(t_max, x)
        t_min = jnp.where(spans, -BIG, t_min)
        t_max = jnp.where(spans, BIG, t_max)
        tn_int = jnp.maximum(tn_int, t_min)
        tf_int = jnp.minimum(tf_int, t_max)
    flags = tn_int <= tf_int  # [nb, C]
    # flagged clusters first, in Morton (index) order; count per block
    order = jnp.argsort(~flags, axis=1, stable=True).astype(jnp.int32)
    counts = flags.sum(axis=1, dtype=jnp.int32)[:, None]

    kern = partial(_cluster_kernel, n_clusters=C, any_hit=any_hit)
    ray_spec = pl.BlockSpec((8, 256), lambda i, wl, cnt: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[ray_spec] * 8 + [
            pl.BlockSpec(clusters.boxes.shape, lambda i, wl, cnt: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 8, 256), lambda i, wl, cnt: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((32, 4 * CS), jnp.bfloat16),
            pltpu.VMEM((1, CS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, nb * 8, 256), jnp.float32),
        grid_spec=grid_spec,
        # four [CS, W] f32 quantities + one-hot live across the winner merge
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        interpret=interpret,
    )(order, counts, *args, clusters.boxes, clusters.coeffs, clusters.ids)
    flat = out.reshape(8, n_pad)
    if debug:  # per-block scheduling diagnostics (rows 4/5)
        return tuple(flat[r, :n] for r in range(6))
    return flat[0, :n], flat[1, :n], flat[2, :n], flat[3, :n]


def _part1by2(x):
    """Spread 10 bits of x over 30 (Morton interleave), jnp uint32."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return x


def sort_rays_key(o, d, clusters: Clusters):
    """Coherence key: direction octant (3 bits) ‖ 5-bit-per-axis Morton cell
    of the origin within the scene bounds.

    Bounce rays arrive incoherent, and the kernel's culling is at ray-BLOCK
    granularity — an unsorted block's union of candidate clusters is the
    whole scene. Grouping rays by (octant, origin cell) restores the packet
    coherence the reference gets implicitly from image-space tiles
    (render.cpp:288-347); the device-side win is ~10-100x fewer cluster
    sweeps per block.
    """
    lo = clusters.boxes[:, 0:3].min(axis=0)
    hi = clusters.boxes[:, 3:6].max(axis=0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-12) * 32.0, 0.0, 31.0)
    q = q.astype(jnp.uint32)
    cell = (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << jnp.uint32(1))
        | (_part1by2(q[:, 2]) << jnp.uint32(2))
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << jnp.uint32(1))
        | ((d[:, 2] >= 0).astype(jnp.uint32) << jnp.uint32(2))
    )
    return (octant << jnp.uint32(15)) | cell


def cluster_closest_hit(o, d, mint, cutoff, v0, e1, e2, clusters: Clusters,
                        sort=True, interpret=False):
    """Closest-hit with the detach-and-replay differentiability contract of
    mxu_closest_hit (same output signature: t, u, v, idf). `sort` permutes
    rays by the coherence key first (see sort_rays_key) and un-permutes the
    results — a large win for incoherent bounce/shadow wavefronts."""
    from optix_renderer_tpu.ops.bvh import replay_tri

    sg = jax.lax.stop_gradient
    o_, d_, mi_, cu_ = sg(o), sg(d), sg(mint), sg(cutoff)
    if sort:
        perm = jnp.argsort(sort_rays_key(o_, d_, clusters))
        _, _, _, idf_s = cluster_raw(
            o_[perm], d_[perm], mi_[perm], cu_[perm], clusters,
            interpret=interpret,
        )
        idf = jnp.zeros_like(idf_s).at[perm].set(idf_s)
    else:
        _, _, _, idf = cluster_raw(o_, d_, mi_, cu_, clusters,
                                   interpret=interpret)
    found = idf >= 0.0
    gid = jnp.minimum(jnp.maximum(idf, 0.0).astype(jnp.int32), v0.shape[0] - 1)
    t_r, u_r, v_r = replay_tri(o, d, v0[gid], e1[gid], e2[gid])
    t = jnp.where(found, t_r, cutoff)
    u = jnp.where(found, u_r, 0.0)
    v = jnp.where(found, v_r, 0.0)
    return t, u, v, jnp.where(found, idf, -1.0)


def cluster_any_hit(o, d, mint, cutoff, clusters: Clusters, sort=True,
                    interpret=False):
    """Shadow query: True where any triangle lies in [mint, cutoff)."""
    sg = jax.lax.stop_gradient
    o_, d_, mi_, cu_ = sg(o), sg(d), sg(mint), sg(cutoff)
    if sort:
        perm = jnp.argsort(sort_rays_key(o_, d_, clusters))
        _, _, _, idf_s = cluster_raw(
            o_[perm], d_[perm], mi_[perm], cu_[perm], clusters,
            any_hit=True, interpret=interpret,
        )
        idf = jnp.zeros_like(idf_s).at[perm].set(idf_s)
    else:
        _, _, _, idf = cluster_raw(o_, d_, mi_, cu_, clusters, any_hit=True,
                                   interpret=interpret)
    return idf >= 0.0
