"""In-kernel path-tracing component library + host table packing.

Shared substrate for the regenerating megakernel (ops/pallas/pathk.py — the
production TPU path): component-wise ((x,y,z) tuples of [S,L] arrays) BSDF
sample/eval/pdf for the four classic BSDFs (src/bsdf/*.cpp semantics via
ops/bsdf.py), NEE with the balance heuristic (path_mis.cpp:74-140), sphere
intersection (sphere.cpp:67-124), the MXU matmul form of Möller–Trumbore
closest-hit with one-hot attribute fetch — the TPU-native analog of the
reference's SBT hit-group records (OptixState.cpp:344-411) — and the host
packers that lower the scene pytree into kernel tables.

pcg32 draws reuse core/rng.py verbatim (validated bit-exact in-kernel), with
the same per-(pixel,sample) streams as the XLA path — so the two backends
are statistically identical and differ only in FP association.

Scenes are eligible (see `mega_eligible`) when geometry is ≤MAX_MXU_TRIS
triangles, materials are the five BSDFs (diffuse/mirror/dielectric/
microfacet/disney) with constant textures, and emitters are
area/point/spot/directional (+ constant envmap). Everything
else falls back to the general XLA wavefront path — the same graceful-
degradation contract as the reference's GPU→CPU fallback
(render.cpp:567-573).

Why fused kernels at all: on this backend each XLA op costs ~0.3-1 ms at
wavefront sizes and jit-boundary outputs stream at ~10-170 MB/s (measured —
BASELINE.md "backend cost model"), so the scan integrator's ~2500-op graph
costs seconds regardless of FLOPs. One Pallas call is bounded by real
compute + one dispatch.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optix_renderer_tpu.core import rng

S = 8  # sublane strips per block
L = 512  # lanes per strip (rays per block = S*L = 4096)
BIG = 3.4e38
EPS = 1e-4
PI = 3.14159265358979
INV_PI = 1.0 / PI
HP = jax.lax.Precision.HIGHEST
# Mosaic supports only DEFAULT and HIGHEST dot precision; DEFAULT (bf16
# single-pass) corrupts the large o⊗d features, so selection matmuls run at
# HIGHEST too. The winner's t/u/v are still recomputed exactly per lane
# from the fetched v0/e1/e2 (the in-kernel analog of detach-and-replay) —
# shading accuracy does not depend on the matmul path.
SP = jax.lax.Precision.HIGHEST

# BSDF type codes — must match scene/data.py BsdfType
BSDF_DIFFUSE = 0
BSDF_MIRROR = 1
BSDF_DIELECTRIC = 2
BSDF_MICROFACET = 3
BSDF_DISNEY = 4

# emitter type codes — must match scene/data.py EmitterType
EM_POINT = 0
EM_SPOT = 1
EM_AREA = 2
EM_ENVMAP = 3
EM_DIRECTIONAL = 4

# attribute-table columns (transposed [A, Tpad] on device)
A_COLS = 56
# 0:3 n_g (unit), 3:6 n0, 6:9 dn1, 9:12 dn2, 12:14 uv0, 14:16 duv1,
# 16:18 duv2, 18 bsdf_type, 19 alpha, 20 int_ior, 21 ext_ior, 22 ks,
# 23:26 kd, 26:29 albedo, 29 emitter_id, 30:33 v0, 33:36 e1, 36:39 e2,
# 39 pad, 40:50 disney params (disney.cpp:32-41 order), 50:56 pad —
# v0/e1/e2 feed the exact per-winner Möller–Trumbore refine

# emissive-triangle table columns (transposed [ET_COLS, TEpad])
ET_COLS = 24
# 0:3 v0, 3:6 e1, 6:9 e2, 9:12 n0, 12:15 dn1, 15:18 dn2, 18 cdf,
# 19 emitter_id, 20 cdf_lo (previous cdf, for sampleReuse), 21:24 pad

# emitter-row columns (SMEM [E, ER_COLS])
ER_COLS = 24
# 0 type, 1:4 radiance, 4:7 position, 7:10 power, 10 area_total,
# 11 pick_pdf, 12 pick_cdf, 13:16 direction, 16 cos_falloff_start,
# 17 cos_falloff_end, 18 angular_radius, 19:24 pad


# ---------------------------------------------------------------------------
# small vector algebra on (x, y, z) triples of [S, L] arrays
# ---------------------------------------------------------------------------


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vwhere(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def vnormalize(a):
    n2 = vdot(a, a)
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    return vscale(a, inv)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def onb(n):
    """Duff et al. branchless ONB (same construction as core/math.make_frame)."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    t = (b, sign + ny * ny * a, -ny)
    return s, t


def to_local(sf, tf, nf, w):
    return (vdot(sf, w), vdot(tf, w), vdot(nf, w))


def to_world(sf, tf, nf, wl):
    return (
        sf[0] * wl[0] + tf[0] * wl[1] + nf[0] * wl[2],
        sf[1] * wl[0] + tf[1] * wl[1] + nf[1] * wl[2],
        sf[2] * wl[0] + tf[2] * wl[1] + nf[2] * wl[2],
    )


def fresnel_dielectric(cos_i, ext_ior, int_ior):
    """common.h:275 fresnel(), component form; handles both sides."""
    ei = jnp.where(cos_i >= 0.0, ext_ior, int_ior)
    et = jnp.where(cos_i >= 0.0, int_ior, ext_ior)
    ci = jnp.abs(cos_i)
    eta = ei / et
    sin_t2 = eta * eta * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin_t2 >= 1.0
    ct = safe_sqrt(1.0 - sin_t2)
    rs = (ei * ci - et * ct) / jnp.maximum(jnp.abs(ei * ci + et * ct), 1e-12)
    rp = (et * ci - ei * ct) / jnp.maximum(jnp.abs(et * ci + ei * ct), 1e-12)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


# ---------------------------------------------------------------------------
# host-side table packing
# ---------------------------------------------------------------------------


def mega_eligible(scene, config) -> bool:
    """Can this (scene, config) run in the megakernel?

    The fallback contract mirrors the reference GPU backend's partial
    coverage (its device shaders stub dielectric/microfacet/disney and most
    emitters, shaders/bsdf.h:21-99) — except our fallback is the fully
    general XLA path rather than a black image.
    """
    import numpy as _np

    g = scene.geometry
    if g.tri_mxu is None or g.tri_v0.shape[0] == 0:
        return False
    n_sph = int(g.sph_center.shape[0])
    if n_sph > 64:
        return False  # sphere LBVH territory → XLA path
    if n_sph:
        sph_em = _np.asarray(scene.shapes.emitter)[_np.asarray(g.sph_shape)]
        if _np.any(sph_em >= 0):
            return False  # sphere-area emitters → XLA path
    if config.integrator not in ("path_mis", "path_mats"):
        return False
    sh = scene.shapes
    if _np.any(_np.asarray(sh.interior_medium) >= 0) or _np.any(
        _np.asarray(sh.exterior_medium) >= 0
    ):
        return False
    if int(scene.ambient_medium) >= 0:
        return False
    if _np.any(_np.asarray(sh.normal_tex) >= 0):
        return False
    bt = _np.asarray(scene.bsdfs.type)
    if bt.size and bt.max() > BSDF_DISNEY:
        return False
    # constant textures only (albedo of diffuse)
    tex_t = _np.asarray(scene.textures.type)
    used = _np.asarray(scene.bsdfs.albedo_tex)
    used = used[used >= 0]
    if used.size and _np.any(tex_t[used] != 0):
        return False
    et = _np.asarray(scene.emitters.type)
    if et.size == 0:
        return False
    for e in et:
        if e not in (EM_POINT, EM_SPOT, EM_AREA, EM_ENVMAP, EM_DIRECTIONAL):
            return False
    # mesh-area emitters only (sphere-area → XLA path)
    for e in range(len(et)):
        if et[e] == EM_AREA and int(_np.asarray(scene.emitters.geom_kind)[e]) != 1:
            return False
    # image-based envmap → XLA path (importance CDF not in-kernel yet);
    # constant envmaps are a 1×1 radiance grid (ops/envmap.py)
    img = scene.envmap.img
    if int(scene.envmap_emitter) >= 0 and img.shape[0] * img.shape[1] != 1:
        return False
    return True


def build_mega_tables(scene):
    """Host packing → dict of device arrays for the kernel."""
    g = scene.geometry
    v0 = np.asarray(g.tri_v0, np.float32)
    e1 = np.asarray(g.tri_e1, np.float32)
    e2 = np.asarray(g.tri_e2, np.float32)
    t_cnt = v0.shape[0]
    coeffs = np.asarray(jax.device_get(g.tri_mxu)) if isinstance(
        g.tri_mxu, jnp.ndarray
    ) else np.asarray(g.tri_mxu)
    t_pad = coeffs.shape[0] // 4
    # chunk-major reorder: rows of chunk c = [c*4tc, (c+1)*4tc) hold that
    # chunk's [det|t|u|v] groups contiguously → ONE matmul per chunk in the
    # kernel instead of four (4× fewer MXU ops, 4× faster Mosaic compile)
    tc0 = min(256, t_pad)
    cm = coeffs.reshape(4, t_pad, 16)
    cm = np.concatenate(
        [
            cm[:, c0 : c0 + tc0].reshape(4 * tc0, 16)
            for c0 in range(0, t_pad, tc0)
        ],
        axis=0,
    )
    coeffs = cm

    # ---- per-triangle attribute table [A_COLS, Tpad]
    attr = np.zeros((t_pad, A_COLS), np.float32)
    n_g = np.cross(e1, e2)
    n_g /= np.maximum(np.linalg.norm(n_g, axis=-1, keepdims=True), 1e-20)
    attr[:t_cnt, 0:3] = n_g
    n0 = np.asarray(g.tri_n0, np.float32)
    attr[:t_cnt, 3:6] = n0
    attr[:t_cnt, 6:9] = np.asarray(g.tri_n1, np.float32) - n0
    attr[:t_cnt, 9:12] = np.asarray(g.tri_n2, np.float32) - n0
    uv0 = np.asarray(g.tri_uv0, np.float32)
    attr[:t_cnt, 12:14] = uv0
    attr[:t_cnt, 14:16] = np.asarray(g.tri_uv1, np.float32) - uv0
    attr[:t_cnt, 16:18] = np.asarray(g.tri_uv2, np.float32) - uv0

    shape_id = np.asarray(g.tri_shape)
    bsdf_id = np.asarray(scene.shapes.bsdf)[shape_id]
    em_id = np.asarray(scene.shapes.emitter)[shape_id]
    btype = np.asarray(scene.bsdfs.type)
    attr[:t_cnt, 18] = btype[bsdf_id]
    attr[:t_cnt, 19] = np.asarray(scene.bsdfs.alpha)[bsdf_id]
    attr[:t_cnt, 20] = np.asarray(scene.bsdfs.int_ior)[bsdf_id]
    attr[:t_cnt, 21] = np.asarray(scene.bsdfs.ext_ior)[bsdf_id]
    attr[:t_cnt, 22] = np.asarray(scene.bsdfs.ks)[bsdf_id]
    attr[:t_cnt, 23:26] = np.asarray(scene.bsdfs.kd)[bsdf_id]
    tex_val = np.asarray(scene.textures.value)
    alb_tex = np.asarray(scene.bsdfs.albedo_tex)[bsdf_id]
    attr[:t_cnt, 26:29] = np.where(
        (alb_tex >= 0)[:, None], tex_val[np.maximum(alb_tex, 0)], 1.0
    )
    attr[:t_cnt, 29] = em_id.astype(np.float32)
    attr[:t_cnt, 30:33] = v0
    attr[:t_cnt, 33:36] = e1
    attr[:t_cnt, 36:39] = e2
    attr[:t_cnt, 40:50] = np.asarray(scene.bsdfs.disney)[bsdf_id]
    attr_t = attr.T.copy()  # [A_COLS, Tpad]

    # ---- emitter rows [E, ER_COLS]
    em = scene.emitters
    E = int(np.asarray(em.type).shape[0])
    rows = np.zeros((max(E, 1), ER_COLS), np.float32)
    pick_pdf = np.asarray(scene.emitter_pick.pmf, np.float32)
    pick_cdf = np.asarray(scene.emitter_pick.cdf, np.float32)
    for e in range(E):
        rows[e, 0] = float(np.asarray(em.type)[e])
        rows[e, 1:4] = np.asarray(em.radiance)[e]
        rows[e, 4:7] = np.asarray(em.position)[e]
        rows[e, 7:10] = np.asarray(em.power)[e]
        rows[e, 10] = float(np.asarray(em.area)[e])
        rows[e, 11] = pick_pdf[e] if e < len(pick_pdf) else 0.0
        rows[e, 12] = pick_cdf[e] if e < len(pick_cdf) else 1.0
        rows[e, 13:16] = np.asarray(em.direction)[e]
        rows[e, 16] = float(np.asarray(em.cos_falloff_start)[e])
        rows[e, 17] = float(np.asarray(em.cos_falloff_end)[e])
        rows[e, 18] = float(np.asarray(em.angular_radius)[e])

    # ---- emissive-triangle table [ET_COLS, TEpad]
    et_rows = []
    gn0 = np.asarray(g.tri_n0, np.float32)
    gn1 = np.asarray(g.tri_n1, np.float32)
    gn2 = np.asarray(g.tri_n2, np.float32)
    for e in range(E):
        if int(np.asarray(em.type)[e]) != EM_AREA:
            continue
        if int(np.asarray(em.geom_kind)[e]) != 1:  # mesh-area only (MESH=1)
            continue
        off = int(np.asarray(em.tri_offset)[e])
        cnt = int(np.asarray(em.tri_count)[e])
        cdf = np.asarray(em.tri_cdf)[e]
        for k in range(cnt):
            t = off + k
            row = np.zeros(ET_COLS, np.float32)
            row[0:3] = v0[t]
            row[3:6] = e1[t]
            row[6:9] = e2[t]
            row[9:12] = gn0[t]
            row[12:15] = gn1[t] - gn0[t]
            row[15:18] = gn2[t] - gn0[t]
            row[18] = cdf[k]
            row[19] = float(e)
            row[20] = cdf[k - 1] if k > 0 else 0.0
            et_rows.append(row)
    te = len(et_rows)
    te_pad = max(8, int(np.ceil(max(te, 1) / 8) * 8))
    et_tab = np.zeros((te_pad, ET_COLS), np.float32)
    et_tab[:, 19] = -1.0  # pad rows match no emitter
    et_tab[:, 18] = 2.0  # pad cdf beyond any u
    if te:
        et_tab[:te] = np.stack(et_rows)
    et_t = et_tab.T.copy()  # [ET_COLS, TEpad]

    # ---- sphere rows [Ns, 32] (SMEM select-loop; non-emissive by
    # eligibility): 0:3 center, 3 radius, 4 btype, 5 alpha, 6:8 iors, 8 ks,
    # 9:12 kd, 12:15 albedo, 16:26 disney params
    ns_ = int(np.asarray(g.sph_center).shape[0])
    sph = np.zeros((max(ns_, 1), 32), np.float32)
    if ns_:
        sc = np.asarray(g.sph_center, np.float32)
        sr = np.asarray(g.sph_radius, np.float32)
        s_shape = np.asarray(g.sph_shape)
        s_bsdf = np.asarray(scene.shapes.bsdf)[s_shape]
        sph[:ns_, 0:3] = sc
        sph[:ns_, 3] = sr
        sph[:ns_, 4] = btype[s_bsdf]
        sph[:ns_, 5] = np.asarray(scene.bsdfs.alpha)[s_bsdf]
        sph[:ns_, 6] = np.asarray(scene.bsdfs.int_ior)[s_bsdf]
        sph[:ns_, 7] = np.asarray(scene.bsdfs.ext_ior)[s_bsdf]
        sph[:ns_, 8] = np.asarray(scene.bsdfs.ks)[s_bsdf]
        sph[:ns_, 9:12] = np.asarray(scene.bsdfs.kd)[s_bsdf]
        s_alb = np.asarray(scene.bsdfs.albedo_tex)[s_bsdf]
        sph[:ns_, 12:15] = np.where(
            (s_alb >= 0)[:, None], tex_val[np.maximum(s_alb, 0)], 1.0
        )
        sph[:ns_, 16:26] = np.asarray(scene.bsdfs.disney)[s_bsdf]
    # constant-envmap radiance (0 if none): 1×1 grids hold the radiance
    # directly (ops/envmap.py build path)
    env_rad = np.zeros(4, np.float32)
    if int(scene.envmap_emitter) >= 0:
        env_rad[:3] = np.asarray(scene.envmap.img).reshape(-1, 3)[0]
        env_rad[3] = 1.0

    return {
        "coeffs": jnp.asarray(coeffs),
        "attr": jnp.asarray(attr_t),
        "em_rows": jnp.asarray(rows),
        "et": jnp.asarray(et_t),
        "etc": jnp.asarray(et_tab),
        "env": jnp.asarray(env_rad),
        "sph": jnp.asarray(sph),
    }


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _features_row(o, d, s):
    """[16, L] MT features of sublane strip s from (x,y,z) [S,L] comps."""
    ox, oy, oz = o[0][s : s + 1], o[1][s : s + 1], o[2][s : s + 1]
    dx, dy, dz = d[0][s : s + 1], d[1][s : s + 1], d[2][s : s + 1]
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


def closest_hit(coeff_ref, o, d, mint, cutoff, t_pad, tc, want_attrs=True,
                attr_ref=None):
    """MXU closest-hit for all S strips. Returns dict of [S,L] arrays:
    t, u, v, idf (−1 miss) and (optionally) the A_COLS attribute rows."""
    t_rows, u_rows, v_rows, id_rows = [], [], [], []
    for s in range(S):
        F = _features_row(o, d, s)  # [16, L]
        mint_r = mint[s : s + 1]
        cut_r = cutoff[s : s + 1]
        best_t, best_u, best_v, best_id = cut_r, jnp.zeros_like(cut_r), \
            jnp.zeros_like(cut_r), jnp.full_like(cut_r, -1.0)
        for ci, c0 in enumerate(range(0, t_pad, tc)):
            # chunk-major coeff rows: [det|t|u|v] of this chunk contiguous
            g4 = jnp.dot(coeff_ref[ci * 4 * tc : (ci + 1) * 4 * tc, :], F,
                         preferred_element_type=jnp.float32, precision=SP)
            det = g4[0 * tc : 1 * tc]
            tn = g4[1 * tc : 2 * tc]
            un = g4[2 * tc : 3 * tc]
            vn = g4[3 * tc : 4 * tc]
            inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
            uu = un * inv_det
            vv = vn * inv_det
            tt = tn * inv_det
            hit = (
                (jnp.abs(det) > 1e-12)
                & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt >= mint_r) & (tt < best_t)
            )
            tm = jnp.where(hit, tt, BIG)
            tmin = jnp.min(tm, axis=0, keepdims=True)
            better = tmin < best_t
            jloc = jnp.argmin(tm, axis=0).reshape(1, -1)
            oh = jax.lax.broadcasted_iota(jnp.int32, (tc, L), 0) == jloc
            ub = jnp.sum(jnp.where(oh, uu, 0.0), axis=0, keepdims=True)
            vb = jnp.sum(jnp.where(oh, vv, 0.0), axis=0, keepdims=True)
            best_u = jnp.where(better, ub, best_u)
            best_v = jnp.where(better, vb, best_v)
            best_id = jnp.where(better, (jloc + c0).astype(jnp.float32), best_id)
            best_t = jnp.where(better, tmin, best_t)
        t_rows.append(best_t)
        u_rows.append(best_u)
        v_rows.append(best_v)
        id_rows.append(best_id)
    out = {
        "t": jnp.concatenate(t_rows, axis=0),
        "u": jnp.concatenate(u_rows, axis=0),
        "v": jnp.concatenate(v_rows, axis=0),
        "idf": jnp.concatenate(id_rows, axis=0),
    }
    if want_attrs:
        arows = []
        for s in range(S):
            idr = out["idf"][s : s + 1].astype(jnp.int32)  # [1,L]
            acc = jnp.zeros((A_COLS, L), jnp.float32)
            for c0 in range(0, t_pad, tc):
                oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (tc, L), 0)
                    == (idr - c0)
                ).astype(jnp.float32)
                acc = acc + jnp.dot(
                    attr_ref[:, c0 : c0 + tc], oh,
                    preferred_element_type=jnp.float32, precision=SP,
                )
            arows.append(acc[:, None, :])  # [A,1,L]
        out["attr"] = jnp.concatenate(arows, axis=1)  # [A, S, L]
    return out


def sphere_hit(sph_ref, o, d, mint, cutoff):
    """Stable-quadratic sphere test against the (tiny) SMEM sphere table
    (sphere.cpp:67-124 contract). Returns (t [S,L], sid float [S,L] −1 miss).

    Rows with radius ≤ 0 are padding and never hit.
    """
    n_rows = sph_ref.shape[0]
    best_t = cutoff
    best_id = jnp.full_like(cutoff, -1.0)
    a = vdot(d, d)
    for j in range(n_rows):
        cx, cy, cz = sph_ref[j, 0], sph_ref[j, 1], sph_ref[j, 2]
        r = sph_ref[j, 3]
        oc = (o[0] - cx, o[1] - cy, o[2] - cz)
        b = 2.0 * vdot(oc, d)
        c = vdot(oc, oc) - r * r
        disc = b * b - 4.0 * a * c
        ok = (disc >= 0.0) & (r > 0.0)
        sq = safe_sqrt(disc)
        q = -0.5 * (b + jnp.sign(b) * sq)
        t0 = q / a
        t1 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1e-20)
        tn = jnp.minimum(t0, t1)
        tf_ = jnp.maximum(t0, t1)
        in_n = ok & (tn >= mint) & (tn < best_t)
        in_f = ok & (tf_ >= mint) & (tf_ < best_t)
        t_c = jnp.where(in_n, tn, jnp.where(in_f, tf_, BIG))
        better = t_c < best_t
        best_t = jnp.where(better, t_c, best_t)
        best_id = jnp.where(better, float(j), best_id)
    return best_t, best_id


def sphere_params(sph_ref, sid, P, ns_tri, p_hit):
    """Override per-lane BSDF params + shading normal where a sphere won."""
    is_s = sid >= 0.0
    n_rows = sph_ref.shape[0]
    fields = {"btype": 4, "alpha": 5, "int_ior": 6, "ext_ior": 7, "ks": 8}
    out = dict(P)
    for k, col in fields.items():
        v = P[k]
        for j in range(n_rows):
            v = jnp.where(sid == float(j), sph_ref[j, col], v)
        out[k] = v
    for base, k in ((9, "kd"), (12, "albedo")):
        comps = list(P[k])
        for c in range(3):
            v = comps[c]
            for j in range(n_rows):
                v = jnp.where(sid == float(j), sph_ref[j, base + c], v)
            comps[c] = v
        out[k] = tuple(comps)
    if "disney" in P:
        comps = list(P["disney"])
        for c in range(10):
            v = comps[c]
            for j in range(n_rows):
                v = jnp.where(sid == float(j), sph_ref[j, 16 + c], v)
            comps[c] = v
        out["disney"] = tuple(comps)
    # outward normal (p-c)/r (sphere.cpp:87-124)
    nx, ny, nz = ns_tri
    for j in range(n_rows):
        m = sid == float(j)
        inv_r = 1.0 / jnp.maximum(sph_ref[j, 3], 1e-12)
        nx = jnp.where(m, (p_hit[0] - sph_ref[j, 0]) * inv_r, nx)
        ny = jnp.where(m, (p_hit[1] - sph_ref[j, 1]) * inv_r, ny)
        nz = jnp.where(m, (p_hit[2] - sph_ref[j, 2]) * inv_r, nz)
    return out, (nx, ny, nz), is_s


def occluded_mxu(coeff_ref, sph_ref, o, d, mint, maxt, t_pad, tc):
    """Any-hit: is something in [mint, maxt)? Returns bool [S,L]."""
    h = closest_hit(coeff_ref, o, d, mint, maxt, t_pad, tc, want_attrs=False)
    _, sid = sphere_hit(sph_ref, o, d, mint, maxt)
    return (h["idf"] >= 0.0) | (sid >= 0.0)


# -- pcg32 helpers on [S,L] uint32 state tuples ------------------------------


def draw1(st):
    st2, u = rng.pcg32_next_float(rng.Pcg32State(*st))
    return (st2.state_hi, st2.state_lo, st2.inc_hi, st2.inc_lo), u


def draw2(st):
    st, u1 = draw1(st)
    st, u2 = draw1(st)
    return st, (u1, u2)


def draw3(st):
    st, u1 = draw1(st)
    st, u2 = draw1(st)
    st, u3 = draw1(st)
    return st, (u1, u2, u3)


# ---------------------------------------------------------------------------
# BSDF sample / eval / pdf — component-wise port of ops/bsdf.py (same
# reference semantics: diffuse.cpp, mirror.cpp, dielectric.cpp:52-102,
# microfacet.cpp:20-160)
# ---------------------------------------------------------------------------


def _cosine_hemisphere(u1, u2):
    rho = jnp.sqrt(jnp.maximum(u1, 0.0))
    th = u2 * (2.0 * PI)
    x = rho * jnp.cos(th)
    y = rho * jnp.sin(th)
    z = safe_sqrt(1.0 - (x * x + y * y))
    return (x, y, z)


def _beckmann_sample(u1, u2, alpha):
    log_s = jnp.log(jnp.maximum(1.0 - u1, 1e-38))
    tan2 = -alpha * alpha * log_s
    phi = u2 * (2.0 * PI)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st_ = safe_sqrt(1.0 - ct * ct)
    return (st_ * jnp.cos(phi), st_ * jnp.sin(phi), ct)


def _beckmann_d(m, alpha):
    ct = jnp.maximum(m[2], 1e-4)
    inv_ct2 = 1.0 / (ct * ct)
    tan2 = jnp.maximum(0.0, 1.0 - ct * ct) * inv_ct2
    return jnp.exp(-tan2 / (alpha * alpha)) * inv_ct2 * inv_ct2 / (PI * alpha * alpha)


def _smith_g1(v, m, alpha):
    ct = v[2]
    tan_t = safe_sqrt(1.0 - ct * ct) / jnp.where(jnp.abs(ct) > 1e-8, ct, 1e-8)
    a = 1.0 / jnp.maximum(alpha * jnp.abs(tan_t), 1e-8)
    a2 = a * a
    approx = (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2)
    g = jnp.where(a >= 1.6, 1.0, approx)
    g = jnp.where(jnp.abs(tan_t) < 1e-8, 1.0, g)
    back = vdot(m, v) * ct <= 0.0
    return jnp.where(back, 0.0, g)


def _microfacet_eval_c(kd, ks, alpha, ext_ior, int_ior, wi, wo):
    """Returns rgb triple of [S,L]."""
    wh = vnormalize(vadd(wi, wo))
    d = _beckmann_d(wh, alpha)
    f = fresnel_dielectric(vdot(wh, wi), ext_ior, int_ior)
    g = _smith_g1(wi, wh, alpha) * _smith_g1(wo, wh, alpha)
    denom = 4.0 * wi[2] * wo[2]
    spec = ks * d * f * g / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    ok = wo[2] > 0.0
    return tuple(jnp.where(ok, kd[c] * INV_PI + spec, 0.0) for c in range(3))


def _microfacet_pdf_c(ks, alpha, wi, wo):
    wh = vnormalize(vadd(wi, wo))
    d = _beckmann_d(wh, alpha)
    dwh = vdot(wo, wh)
    part1 = ks * d * wh[2] / jnp.where(jnp.abs(4.0 * dwh) > 1e-12, 4.0 * dwh, 1e-12)
    part2 = (1.0 - ks) * wo[2] * INV_PI
    return jnp.where(wo[2] > 0.0, part1 + part2, 0.0)


def _schlick_fresnel_c(a):
    m = jnp.clip(1.0 - a, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _smith_g_ggx_aniso_c(ndotv, vdotx, vdoty, ax, ay):
    return 1.0 / jnp.maximum(
        ndotv + jnp.sqrt(vdotx * ax * vdotx * ax + vdoty * ay * vdoty * ay
                         + ndotv * ndotv),
        1e-8,
    )


def _smith_g_ggx_c(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(a + b - a * b), 1e-8)


def disney_eval_c(P, wi, wo):
    """Component port of ops/disney.disney_eval (disney.cpp:111-176); base
    color = P["albedo"], params = P["disney"] (10-tuple of [S,L])."""
    (metallic, subsurface, specular, roughness, specular_tint, anisotropic,
     sheen, sheen_tint, clearcoat, clearcoat_gloss) = P["disney"]
    Lv, Vv = wi, wo
    ndotl = Lv[2]
    ndotv = Vv[2]
    valid = (ndotl >= EPS) & (ndotv >= EPS)
    H = vnormalize(vadd(Lv, Vv))
    ndoth = H[2]
    ldoth = vdot(Lv, H)

    cdlin = tuple(jnp.power(jnp.maximum(P["albedo"][c], 1e-6), 2.2)
                  for c in range(3))
    cdlum = 0.3 * cdlin[0] + 0.6 * cdlin[1] + 0.1 * cdlin[2]
    inv_lum = 1.0 / jnp.maximum(cdlum, 1e-12)
    ctint = tuple(jnp.where(cdlum > 0.0, cdlin[c] * inv_lum, 1.0)
                  for c in range(3))
    cspec0 = tuple(
        (specular * 0.08 * (1.0 + (ctint[c] - 1.0) * specular_tint))
        * (1.0 - metallic) + cdlin[c] * metallic
        for c in range(3)
    )
    csheen = tuple(1.0 + (ctint[c] - 1.0) * sheen_tint for c in range(3))

    fl = _schlick_fresnel_c(ndotl)
    fv = _schlick_fresnel_c(ndotv)
    fd90 = 0.5 + 2.0 * ldoth * ldoth * roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fss90 = ldoth * ldoth * roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, 1e-8) - 0.5) + 0.5)

    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    ax = jnp.maximum(0.001, roughness * roughness / aspect)
    ay = jnp.maximum(0.001, roughness * roughness * aspect)
    denom = PI * ax * ay * (
        (H[0] / ax) ** 2 + (H[1] / ay) ** 2 + ndoth * ndoth
    ) ** 2
    ds = 1.0 / jnp.maximum(denom, 1e-12)
    fh = _schlick_fresnel_c(ldoth)
    fs = tuple(cspec0[c] + (1.0 - cspec0[c]) * fh for c in range(3))
    gs = _smith_g_ggx_aniso_c(ndotl, Lv[0], Lv[1], ax, ay) *         _smith_g_ggx_aniso_c(ndotv, Vv[0], Vv[1], ax, ay)
    fsheen = tuple(fh * sheen * csheen[c] for c in range(3))

    # GTR1 clearcoat lobe (disney.cpp: mix(0.1, 0.001, gloss))
    a_cc = jnp.clip(0.1 + (0.001 - 0.1) * clearcoat_gloss, 1e-4, None)
    a2 = a_cc * a_cc
    t_cc = 1.0 + (a2 - 1.0) * ndoth * ndoth
    dr = jnp.where(
        a_cc >= 1.0, INV_PI,
        (a2 - 1.0) / (PI * jnp.log(a2) * t_cc),
    )
    fr = 0.04 + 0.96 * fh
    gr = _smith_g_ggx_c(ndotl, 0.25) * _smith_g_ggx_c(ndotv, 0.25)

    diff_mix = fd + (ss - fd) * subsurface
    final = tuple(
        (INV_PI * diff_mix * cdlin[c] + fsheen[c]) * (1.0 - metallic)
        + gs * ds * fs[c]
        + 0.25 * clearcoat * gr * fr * dr
        for c in range(3)
    )
    lum = (final[0] * 0.212671 + final[1] * 0.715160 + final[2] * 0.072169)
    inv_l = 1.0 / jnp.maximum(lum, 1e-12)
    final = tuple(jnp.where(lum > 1.0, final[c] * inv_l, final[c])
                  for c in range(3))
    return tuple(jnp.where(valid, final[c], 0.0) for c in range(3))


def bsdf_eval_c(P, wi, wo):
    """f(wi,wo) rgb under solid angle; P = per-lane param dict."""
    diff_ok = (wi[2] > 0.0) & (wo[2] > 0.0)
    f_diff = tuple(
        jnp.where(diff_ok, P["albedo"][c] * INV_PI, 0.0) for c in range(3)
    )
    f_mf = _microfacet_eval_c(
        P["kd"], P["ks"], P["alpha"], P["ext_ior"], P["int_ior"], wi, wo
    )
    is_diff = P["btype"] == BSDF_DIFFUSE
    is_mf = P["btype"] == BSDF_MICROFACET
    is_dis = P["btype"] == BSDF_DISNEY
    f_dis = disney_eval_c(P, wi, wo) if "disney" in P else (0.0, 0.0, 0.0)
    return tuple(
        jnp.where(is_diff, f_diff[c],
                  jnp.where(is_mf, f_mf[c],
                            jnp.where(is_dis, f_dis[c], 0.0)))
        for c in range(3)
    )


def bsdf_pdf_c(P, wi, wo):
    diff_ok = (wi[2] > 0.0) & (wo[2] > 0.0)
    p_diff = jnp.where(diff_ok, INV_PI * wo[2], 0.0)
    p_mf = _microfacet_pdf_c(P["ks"], P["alpha"], wi, wo)
    is_cos = (P["btype"] == BSDF_DIFFUSE) | (P["btype"] == BSDF_DISNEY)
    return jnp.where(
        is_cos,
        p_diff,
        jnp.where(P["btype"] == BSDF_MICROFACET, p_mf, 0.0),
    )


def bsdf_sample_c(P, wi, u1, u2):
    """Sample wo; returns (wo triple, weight rgb triple, pdf, is_discrete)."""
    cos_i = wi[2]

    # diffuse
    wo_diff = _cosine_hemisphere(u1, u2)
    w_diff = tuple(jnp.where(cos_i > 0.0, P["albedo"][c], 0.0) for c in range(3))

    # mirror
    wo_mirror = (-wi[0], -wi[1], wi[2])
    w_mirror = tuple(jnp.where(cos_i > 0.0, 1.0, 0.0) for _ in range(3))

    # dielectric (dielectric.cpp:52-102)
    fr = fresnel_dielectric(cos_i, P["ext_ior"], P["int_ior"])
    reflect_event = u1 < fr
    entering = cos_i >= 0.0
    eta_ratio = jnp.where(
        entering, P["ext_ior"] / P["int_ior"], P["int_ior"] / P["ext_ior"]
    )
    nz = jnp.where(entering, 1.0, -1.0)
    wi_dot_n = wi[2] * nz
    sq = safe_sqrt(1.0 - eta_ratio * eta_ratio * (1.0 - wi_dot_n * wi_dot_n))
    # tangential part of wi: (wi_x, wi_y, wi_z - wi_dot_n*nz)
    wo_refr = (
        -eta_ratio * wi[0],
        -eta_ratio * wi[1],
        -eta_ratio * (wi[2] - wi_dot_n * nz) - sq * nz,
    )
    wo_diel = vwhere(reflect_event, wo_mirror, wo_refr)
    w_refr = 1.0 / (eta_ratio * eta_ratio)
    w_diel_s = jnp.where(reflect_event, 1.0, w_refr)
    w_diel = (w_diel_s, w_diel_s, w_diel_s)

    # microfacet (microfacet.cpp:123-160)
    ks = P["ks"]
    alpha = P["alpha"]
    spec_event = u2 < ks
    u2_spec = u2 / jnp.maximum(ks, 1e-8)
    u2_diff = (u2 - ks) / jnp.maximum(1.0 - ks, 1e-8)
    wh = _beckmann_sample(u1, u2_spec, alpha)
    dw = 2.0 * vdot(wi, wh)
    wo_spec = (dw * wh[0] - wi[0], dw * wh[1] - wi[1], dw * wh[2] - wi[2])
    wo_cos = _cosine_hemisphere(u1, u2_diff)
    wo_mf = vwhere(spec_event, wo_spec, wo_cos)
    f_mf = _microfacet_eval_c(
        P["kd"], ks, alpha, P["ext_ior"], P["int_ior"], wi, wo_mf
    )
    p_mf = _microfacet_pdf_c(ks, alpha, wi, wo_mf)
    mf_ok = (wo_mf[2] > 0.0) & (cos_i >= 0.0) & (p_mf > 1e-12)
    scale = jnp.where(mf_ok, wo_mf[2] / jnp.maximum(p_mf, 1e-12), 0.0)
    w_mf = tuple(f_mf[c] * scale for c in range(3))

    is_mirror = P["btype"] == BSDF_MIRROR
    is_diel = P["btype"] == BSDF_DIELECTRIC
    is_mf = P["btype"] == BSDF_MICROFACET
    is_dis = P["btype"] == BSDF_DISNEY

    # disney (disney.cpp:181-199): cosine sample, weight f·π (the estimator
    # f·cosθ/pdf with pdf = cosθ/π — see ops/disney.py docstring note)
    if "disney" in P:
        f_dis = disney_eval_c(P, wi, wo_diff)
        p_dis = INV_PI * jnp.maximum(wo_diff[2], 0.0)
        dis_ok = (cos_i > 0.0) & (p_dis >= EPS)
        w_dis = tuple(jnp.where(dis_ok, f_dis[c] * PI, 0.0) for c in range(3))
    else:
        w_dis = w_diff

    wo = vwhere(is_mirror, wo_mirror, vwhere(is_diel, wo_diel,
                vwhere(is_mf, wo_mf, wo_diff)))
    weight = tuple(
        jnp.where(is_mirror, w_mirror[c], jnp.where(is_diel, w_diel[c],
                  jnp.where(is_mf, w_mf[c],
                            jnp.where(is_dis, w_dis[c], w_diff[c]))))
        for c in range(3)
    )
    is_discrete = is_mirror | is_diel
    pdf_cont = jnp.where(
        is_mf,
        p_mf,
        jnp.where(
            ((P["btype"] == BSDF_DIFFUSE) | is_dis) & (cos_i > 0.0),
            INV_PI * jnp.maximum(wo[2], 0.0),
            0.0,
        ),
    )
    pdf = jnp.where(is_discrete, 0.0, pdf_cont)
    return wo, weight, pdf, is_discrete


# ---------------------------------------------------------------------------
# emitters in-kernel
# ---------------------------------------------------------------------------


def em_scalar(em_ref, e, j):
    return em_ref[e, j]


def emitter_lookup(em_ref, n_emitters, eid, cols):
    """Per-lane emitter row fields via a select-loop over the (tiny) table.

    eid: [S,L] float ids; cols: list of column indices. Returns list of [S,L].
    """
    outs = [jnp.zeros_like(eid) for _ in cols]
    for e in range(n_emitters):
        m = eid == float(e)
        for k, j in enumerate(cols):
            outs[k] = jnp.where(m, em_ref[e, j], outs[k])
    return outs


def nee_sample(em_ref, et_ref, env_ref, n_emitters, te_pad, p_hit, st,
               etc_ref=None):
    """Next-event estimation sample (path_mis.cpp:74-106 EMS side).

    Draws u_pick (1D) + u_ems (3D) from `st` in the scan-integrator order.
    Returns (st, dict): wi world triple, pdf_sa (already /n_lights applied by
    caller), radiance rgb, shadow dist, valid mask. `etc_ref` is the
    [TEpad, ET_COLS] column layout used for broadcast compares (Mosaic-side
    transposes of skinny rows are avoided).
    """
    st, u_pick = draw1(st)
    st, (ua, ub, _uc) = draw3(st)

    # emitter pick: idx = #\{cdf <= u\} (dpdf.h:140-152)
    eid = jnp.zeros_like(u_pick)
    for e in range(n_emitters - 1):
        eid = eid + (em_ref[e, 12] <= u_pick).astype(jnp.float32)

    etype, = emitter_lookup(em_ref, n_emitters, eid, [0])

    # ---- area: pick tri in the emissive-tri table (first row of this
    # emitter with cdf > ua), sampleReuse-rescale ua, uniform barycentric
    et_eid_col = etc_ref[:, 19:20]  # [TE, 1]
    et_cdf_col = etc_ref[:, 18:19]
    # broadcast per-lane: for each lane, score rows
    # NOTE: per-sublane loop keeps everything 2D [TE, L]
    v0s, e1s, e2s, n0s, dn1s, dn2s = [], [], [], [], [], []
    cdf_lo_s, cdf_hi_s = [], []
    for s in range(S):
        ua_r = ua[s : s + 1, :]  # [1,L]
        eid_r = eid[s : s + 1, :]
        elig = (et_eid_col == eid_r) & (et_cdf_col > ua_r)
        # int iota only — Mosaic rejects tpu.iota on float vectors
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (te_pad, L), 0)
        sel = jnp.min(jnp.where(elig, iota_i, te_pad), axis=0,
                      keepdims=True)  # [1,L] int32
        sel = jnp.minimum(sel, te_pad - 1)
        oh = (iota_i == sel).astype(jnp.float32)
        rows = jnp.dot(et_ref[:, :], oh, preferred_element_type=jnp.float32,
                       precision=HP)  # [24, L]
        v0s.append(rows[0:3])
        e1s.append(rows[3:6])
        e2s.append(rows[6:9])
        n0s.append(rows[9:12])
        dn1s.append(rows[12:15])
        dn2s.append(rows[15:18])
        cdf_hi_s.append(rows[18:19])
        cdf_lo_s.append(rows[20:21])

    def cat(rowlist, c):
        return jnp.concatenate([r[c : c + 1] for r in rowlist], axis=0)

    tv0 = (cat(v0s, 0), cat(v0s, 1), cat(v0s, 2))
    te1 = (cat(e1s, 0), cat(e1s, 1), cat(e1s, 2))
    te2 = (cat(e2s, 0), cat(e2s, 1), cat(e2s, 2))
    tn0 = (cat(n0s, 0), cat(n0s, 1), cat(n0s, 2))
    td1 = (cat(dn1s, 0), cat(dn1s, 1), cat(dn1s, 2))
    td2 = (cat(dn2s, 0), cat(dn2s, 1), cat(dn2s, 2))
    cdf_hi = jnp.concatenate(cdf_hi_s, axis=0)
    cdf_lo = jnp.concatenate(cdf_lo_s, axis=0)

    ua_re = jnp.clip(
        (ua - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-12), 0.0, 1.0 - 1e-7
    )
    # squareToUniformTriangle (warp.cpp:162-166): bc = (1-√u, v√u, ...)
    su = jnp.sqrt(jnp.maximum(ua_re, 0.0))
    b0 = 1.0 - su
    b1 = ub * su
    b2 = 1.0 - b0 - b1
    p_surf = vadd(tv0, vadd(vscale(te1, b1), vscale(te2, b2)))
    n_surf = vnormalize(
        vadd(vscale(tn0, 1.0), vadd(vscale(td1, b1), vscale(td2, b2)))
    )
    to_p = vsub(p_surf, p_hit)
    dist2 = jnp.maximum(vdot(to_p, to_p), 1e-20)
    dist = jnp.sqrt(dist2)
    wi_area = vscale(to_p, 1.0 / dist)
    cos_em = vdot(n_surf, vneg(wi_area))
    front = cos_em > 0.0
    area_tot, rad_r, rad_g, rad_b = emitter_lookup(
        em_ref, n_emitters, eid, [10, 1, 2, 3]
    )
    inv_area = 1.0 / jnp.maximum(area_tot, 1e-20)
    pdf_area = inv_area * dist2 / jnp.maximum(jnp.abs(cos_em), 1e-12)
    ok_area = front & (pdf_area > EPS)
    inv_pdf = jnp.where(ok_area, 1.0 / jnp.maximum(pdf_area, 1e-12), 0.0)
    val_area = (rad_r * inv_pdf, rad_g * inv_pdf, rad_b * inv_pdf)

    # ---- point (pointlight.cpp): radiance = power/4π stored in rows 1:4
    px_, py_, pz_ = emitter_lookup(em_ref, n_emitters, eid, [4, 5, 6])
    to_l = (px_ - p_hit[0], py_ - p_hit[1], pz_ - p_hit[2])
    d2pt = jnp.maximum(vdot(to_l, to_l), 1e-20)
    dpt = jnp.sqrt(d2pt)
    wi_pt = vscale(to_l, 1.0 / dpt)
    val_pt = (rad_r / d2pt, rad_g / d2pt, rad_b / d2pt)

    # ---- spot (spotlight.cpp:54-74): same delta position as point, with
    # the normalized-cone intensity power/2π and the delta⁴ falloff ramp
    dx_e, dy_e, dz_e, c_start, c_end, ang_r = emitter_lookup(
        em_ref, n_emitters, eid, [13, 14, 15, 16, 17, 18]
    )
    pw_r, pw_g, pw_b = emitter_lookup(em_ref, n_emitters, eid, [7, 8, 9])
    cos_theta = -(wi_pt[0] * dx_e + wi_pt[1] * dy_e + wi_pt[2] * dz_e)
    delta = (cos_theta - c_end) / jnp.maximum(c_start - c_end, 1e-12)
    ramp = jnp.clip(delta, 0.0, 1.0) ** 4
    falloff = jnp.where(cos_theta < c_end, 0.0,
                        jnp.where(cos_theta >= c_start, 1.0, ramp))
    i_norm = falloff / (
        2.0 * PI * jnp.maximum(1.0 - 0.5 * (c_end + c_start), 1e-12) * d2pt
    )
    val_spot = (pw_r * i_norm, pw_g * i_norm, pw_b * i_norm)

    # ---- directional (directionalLight.cpp:90-136): uniform sphere cap
    # around −direction, angular radius ang_r
    cos_cap = jnp.cos(ang_r)
    dir_t = vnormalize((dx_e, dy_e, dz_e))
    sD, tD = onb(dir_t)
    zc = ua * (1.0 - cos_cap) + cos_cap
    rc = safe_sqrt(1.0 - zc * zc)
    thc = 2.0 * PI * ub
    cap = (rc * jnp.cos(thc), rc * jnp.sin(thc), zc)
    wi_dir = vneg(to_world(sD, tD, dir_t, cap))
    pdf_dir = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_cap), 1e-12)
    inv_pd = 1.0 / pdf_dir
    val_dir = (rad_r * inv_pd, rad_g * inv_pd, rad_b * inv_pd)

    # ---- constant envmap: uniform sphere, pdf = 1/4π
    z = 2.0 * ua - 1.0
    r_ = safe_sqrt(1.0 - z * z)
    sig = 2.0 * PI * ub
    wi_env = (r_ * jnp.cos(sig), r_ * jnp.sin(sig), z)
    env_r, env_g, env_b = env_ref[0, 0], env_ref[0, 1], env_ref[0, 2]
    fourpi = 4.0 * PI
    val_env = (env_r * fourpi + 0.0 * ua, env_g * fourpi + 0.0 * ua,
               env_b * fourpi + 0.0 * ua)

    is_area = etype == float(EM_AREA)
    is_pt = etype == float(EM_POINT)
    is_spot = etype == float(EM_SPOT)
    is_dir = etype == float(EM_DIRECTIONAL)
    is_env = etype == float(EM_ENVMAP)
    is_delta = is_pt | is_spot

    wi = vwhere(is_area, wi_area,
                vwhere(is_delta, wi_pt, vwhere(is_dir, wi_dir, wi_env)))
    value = tuple(
        jnp.where(is_area, val_area[c],
                  jnp.where(is_pt, val_pt[c],
                            jnp.where(is_spot, val_spot[c],
                                      jnp.where(is_dir, val_dir[c],
                                                val_env[c]))))
        for c in range(3)
    )
    pdf_sa = jnp.where(is_area, jnp.where(ok_area, pdf_area, 0.0),
                       jnp.where(is_delta, 1.0,
                                 jnp.where(is_dir, pdf_dir, 1.0 / fourpi)))
    shadow_dist = jnp.where(is_area | is_delta,
                            jnp.where(is_area, dist, dpt) - EPS,
                            jnp.float32(BIG))
    return st, {
        "wi": wi, "value": value, "pdf_sa": pdf_sa,
        "shadow_dist": shadow_dist, "is_delta": is_delta, "is_env": is_env,
    }
