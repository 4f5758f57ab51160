"""Regenerating path-trace megakernel: whole renders in ONE pallas_call.

Second-generation TPU path tracer (replaces the fixed-depth kernel that used
to live in mega.py). The reference analog is still `__raygen__perspective`'s
`samplesPerLaunch` loop (include/nori/optix/cuda/raygen.cpp:75-147), but the
schedule is redesigned around the measured v5e cost model (BASELINE.md):

* **In-kernel sample regeneration** — every lane owns one pixel; when its
  path terminates (miss / RR / absorption / depth cap) it immediately
  re-seeds its pcg32 stream for the next (pixel, sample) pair, generates a
  fresh camera ray *inside the kernel*, and keeps tracing. With mean path
  length ~3.5 vs the depth-16 cap, this removes the ~80% masked-lane waste
  of a fixed `fori_loop` over bounces and lets a whole 16-spp render run as
  ONE dispatch. (This is render/wavefront.py's persistent-lane idea pushed
  into the Pallas grid step, where the film never crosses a jit boundary.)
* **Pipelined shadow rays** — the NEE shadow ray of bounce b is traced
  together with the closest-hit of bounce b+1 in the same geometry sweep
  (one pass over the triangle list serves both), halving sweep cost. The
  reference's separate radiance/occlusion launches (cuda/shading.cpp:28-37)
  become one fused loop.
* **Filter importance sampling** — instead of splatting each sample into a
  5×5 filter window (an XLA scatter / lane-shift stencil that measured
  ~1.9 s/round on this backend), the pixel jitter is drawn FROM the
  reconstruction filter's distribution (piecewise-linear inverse CDF, baked
  as compile-time constants) and every sample lands on its own pixel with
  weight 1. Expectation matches the filter-weighted estimate; `box` is
  bit-identical to splatting (weight ≡ 1 in its own pixel). `mitchell` has
  negative lobes and cannot be importance-sampled → those renders take the
  XLA path.
* **VPU-direct intersection for small scenes** — for ≤ VPU_MAX_TRIS the
  Möller–Trumbore loop runs unrolled over SMEM triangle rows as pure
  [S,L]-shaped VPU arithmetic (~95 ops/tri for bounce+shadow rays fused,
  with the winner's attributes selected in the same sweep). No matmuls, no
  relayouts, no one-hot gathers. Larger scenes (≤ MAX_MXU_TRIS) use the MXU
  matmul closest-hit from mega.py.

Sampler streams are the same per-(pixel,sample) pcg32 streams as the XLA
path (render/sampler.py), in the same consumption order — early termination
plus re-seeding leaves the consumed prefix identical, so with `box` filtering
the two backends produce bit-comparable films (tests/test_pathk.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optix_renderer_tpu.core import rng
from optix_renderer_tpu.ops.pallas import mega
from optix_renderer_tpu.ops.pallas.mega import (
    BIG,
    EPS,
    PI,
    S,
    L,
    EM_AREA,
    EM_POINT,
    draw1,
    draw2,
    draw3,
    bsdf_sample_c,
    bsdf_eval_c,
    bsdf_pdf_c,
    emitter_lookup,
    onb,
    sphere_hit,
    sphere_params,
    to_local,
    to_world,
    vadd,
    vdot,
    vneg,
    vnormalize,
    vscale,
    vsub,
    vwhere,
    safe_sqrt,
)

BLOCK = S * L  # 4096 pixels per grid step
VPU_MAX_TRIS = 64  # above this, intersection moves to the MXU matmul form

# triangle SMEM row columns (VPU path)
TR_COLS = 48
# 0:3 v0, 3:6 e1, 6:9 e2, 9:12 n_g(unit), 12:15 n0, 15:18 dn1, 18:21 dn2,
# 21 btype, 22 alpha, 23 int_ior, 24 ext_ior, 25 ks, 26:29 kd, 29:32 albedo,
# 32 em_id, 33:43 disney params (disney.cpp:32-41 order), 43:48 pad

# float scalar pack (SMEM [1, 40])
# 0:16 sample_to_camera (row-major), 16:32 camera to_world (row-major),
# 32 lens_radius, 33 focal_distance, 34 near_clip, 35 far_clip,
# 36 1/width, 37 1/height, 38:40 pad
SF_COLS = 40
# int scalar pack (SMEM [1, 8]): 0 n_pix, 1 width, 2 spp0, 3 seed,
# 4 base_block, 5:8 pad
SI_COLS = 8


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------


def _filter_eval_np(name: str, x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    if name == "gaussian":
        stddev, radius = 0.5, 2.0
        alpha = -1.0 / (2.0 * stddev * stddev)
        return np.maximum(0.0, np.exp(alpha * ax * ax) - np.exp(alpha * radius * radius))
    if name == "tent":
        return np.maximum(0.0, 1.0 - ax)
    if name == "box":
        return np.where(ax <= 0.5, 1.0, 0.0)
    raise ValueError(f"filter '{name}' cannot be importance-sampled")


def _fis_jitter2(u1, u2, rfilter: str):
    """(u1,u2) uniforms → (jx, jy) jitter distributed as the reconstruction
    filter (filter importance sampling: samples land on their own pixel with
    weight 1; `px + j` is the continuous sample position, same convention as
    the splat path).

    box      → identity (bit-identical to box splatting).
    tent     → exact inverse CDF of (1−|x|) per component.
    gaussian → Box–Muller normal pair at the filter's σ=0.5, clamped to the
               r=2 support (rfilter.cpp:34-52). The truncation tail and the
               −exp(−r²/2σ²) pedestal carry ≤3e−4 of the mass, so the
               sampled density matches the true filter to ~0.03% — far
               below Monte-Carlo noise at any spp.
    """
    if rfilter == "box":
        return u1, u2

    def tent_inv(u):
        lo = jnp.sqrt(jnp.maximum(2.0 * u, 0.0)) - 1.0
        hi = 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0))
        return jnp.where(u < 0.5, lo, hi)

    if rfilter == "tent":
        return tent_inv(u1) + 0.5, tent_inv(u2) + 0.5
    if rfilter == "gaussian":
        sigma, radius = 0.5, 2.0
        r_ = sigma * jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u1, 1e-12)))
        th = 2.0 * PI * u2
        jx = jnp.clip(r_ * jnp.cos(th), -radius, radius) + 0.5
        jy = jnp.clip(r_ * jnp.sin(th), -radius, radius) + 0.5
        return jx, jy
    raise ValueError(f"filter '{rfilter}' cannot be importance-sampled")


def pathk_eligible(scene, config) -> bool:
    """Same coverage contract as mega.mega_eligible, minus mitchell (negative
    lobes defeat filter importance sampling → XLA splat path)."""
    if config.rfilter == "mitchell":
        return False
    return mega.mega_eligible(scene, config)


def build_pathk_tables(scene, config):
    """Host packing → dict of device arrays + static metadata."""
    import numpy as _np

    from optix_renderer_tpu.ops.camera import sample_to_camera_matrix

    g = scene.geometry
    t_cnt = int(_np.asarray(g.tri_v0).shape[0])
    mt = mega.build_mega_tables(scene)  # em_rows / et(c) / env / sph (+ mxu)

    use_mxu = t_cnt > VPU_MAX_TRIS
    tables = {
        "em_rows": mt["em_rows"],
        "env": mt["env"],
        "sph": mt["sph"],
    }
    et_np = _np.asarray(jax.device_get(mt["etc"]))  # [TEpad, ET_COLS]
    # count real emissive-tri rows (pad rows have emitter_id −1)
    te_cnt = int((_np.asarray(et_np[:, 19]) >= 0).sum())
    if use_mxu:
        tables["coeffs"] = mt["coeffs"]
        tables["attr"] = mt["attr"]
        tables["et"] = mt["et"]
        tables["etc"] = mt["etc"]
    else:
        v0 = _np.asarray(g.tri_v0, _np.float32)
        e1 = _np.asarray(g.tri_e1, _np.float32)
        e2 = _np.asarray(g.tri_e2, _np.float32)
        tri = _np.zeros((max(t_cnt, 1), TR_COLS), _np.float32)
        n_g = _np.cross(e1, e2)
        n_g /= _np.maximum(_np.linalg.norm(n_g, axis=-1, keepdims=True), 1e-20)
        n0 = _np.asarray(g.tri_n0, _np.float32)
        tri[:t_cnt, 0:3] = v0
        tri[:t_cnt, 3:6] = e1
        tri[:t_cnt, 6:9] = e2
        tri[:t_cnt, 9:12] = n_g
        tri[:t_cnt, 12:15] = n0
        tri[:t_cnt, 15:18] = _np.asarray(g.tri_n1, _np.float32) - n0
        tri[:t_cnt, 18:21] = _np.asarray(g.tri_n2, _np.float32) - n0
        shape_id = _np.asarray(g.tri_shape)
        bsdf_id = _np.asarray(scene.shapes.bsdf)[shape_id]
        em_id = _np.asarray(scene.shapes.emitter)[shape_id]
        tri[:t_cnt, 21] = _np.asarray(scene.bsdfs.type)[bsdf_id]
        tri[:t_cnt, 22] = _np.asarray(scene.bsdfs.alpha)[bsdf_id]
        tri[:t_cnt, 23] = _np.asarray(scene.bsdfs.int_ior)[bsdf_id]
        tri[:t_cnt, 24] = _np.asarray(scene.bsdfs.ext_ior)[bsdf_id]
        tri[:t_cnt, 25] = _np.asarray(scene.bsdfs.ks)[bsdf_id]
        tri[:t_cnt, 26:29] = _np.asarray(scene.bsdfs.kd)[bsdf_id]
        tex_val = _np.asarray(scene.textures.value)
        alb_tex = _np.asarray(scene.bsdfs.albedo_tex)[bsdf_id]
        tri[:t_cnt, 29:32] = _np.where(
            (alb_tex >= 0)[:, None], tex_val[_np.maximum(alb_tex, 0)], 1.0
        )
        tri[:t_cnt, 32] = em_id.astype(_np.float32)
        tri[:t_cnt, 33:43] = _np.asarray(scene.bsdfs.disney)[bsdf_id]
        tables["tri"] = jnp.asarray(tri)
        tables["et_smem"] = jnp.asarray(et_np[: max(te_cnt, 1)])

    # camera pack (host floats — camera edits retrace, the NVRTC-
    # specialization analog of OptixState.rtc.cpp:220-243)
    cam = scene.camera
    s2c = _np.asarray(jax.device_get(
        sample_to_camera_matrix(cam, config.width, config.height)
    ), _np.float32)
    tw = _np.asarray(jax.device_get(cam.to_world), _np.float32)
    sf = _np.zeros((1, SF_COLS), _np.float32)
    sf[0, 0:16] = s2c.reshape(-1)
    sf[0, 16:32] = tw.reshape(-1)
    sf[0, 32] = float(jax.device_get(cam.lens_radius))
    sf[0, 33] = float(jax.device_get(cam.focal_distance))
    sf[0, 34] = float(jax.device_get(cam.near_clip))
    sf[0, 35] = float(jax.device_get(cam.far_clip))
    sf[0, 36] = 1.0 / config.width
    sf[0, 37] = 1.0 / config.height
    tables["scal_f"] = jnp.asarray(sf)

    meta = {
        "t_cnt": t_cnt,
        "te_cnt": te_cnt,
        "use_mxu": use_mxu,
        "use_dof": float(sf[0, 32]) > 1e-4,
        "n_sph": int(_np.asarray(g.sph_center).shape[0]),
        "n_emitters": int(tables["em_rows"].shape[0]),
    }
    return tables, meta


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _seed_sampler(pix_u32, sample_u32, seed_u32):
    """render/sampler.make_sampler, component form (tea + pcg32 seed)."""
    h = rng.tea(pix_u32, sample_u32 ^ seed_u32)
    zeros = jnp.zeros_like(pix_u32)
    st = rng.pcg32_seed(zeros, h, zeros, pix_u32)
    return (st.state_hi, st.state_lo, st.inc_hi, st.inc_lo)


def _camera_ray(sf_ref, px, py, st, *, rfilter, use_dof):
    """In-kernel PerspectiveCamera::sampleRay (ops/camera.py semantics).

    Draws jitter (2) + aperture (2) from `st` — same stream consumption as
    the XLA path; jitter goes through the filter inverse CDF (FIS).
    Returns (st, o, d, mint, maxt).
    """
    st, (uj1, uj2) = draw2(st)
    jx, jy = _fis_jitter2(uj1, uj2, rfilter)
    st, (a1, a2) = draw2(st)

    x = (px + jx) * sf_ref[0, 36]
    y = (py + jy) * sf_ref[0, 37]
    # near-plane point: s2c · [x, y, 0, 1] (projective)
    m = lambda i, j: sf_ref[0, i * 4 + j]
    nx = m(0, 0) * x + m(0, 1) * y + m(0, 3)
    ny = m(1, 0) * x + m(1, 1) * y + m(1, 3)
    nz = m(2, 0) * x + m(2, 1) * y + m(2, 3)
    wq = m(3, 0) * x + m(3, 1) * y + m(3, 3)
    inv_w = 1.0 / wq
    p = (nx * inv_w, ny * inv_w, nz * inv_w)
    dl = vnormalize(p)

    if use_dof:
        lr = sf_ref[0, 32]
        r_ = lr * jnp.sqrt(jnp.maximum(a1, 0.0))
        th = 2.0 * PI * a2
        p_lens = (r_ * jnp.cos(th), r_ * jnp.sin(th), jnp.zeros_like(r_))
        ft = sf_ref[0, 33] / dl[2]
        p_focus = vscale(dl, ft)
        d_cam = vnormalize(vsub(p_focus, p_lens))
        o_cam = p_lens
    else:
        d_cam = dl
        o_cam = (jnp.zeros_like(dl[0]),) * 3

    tm = lambda i, j: sf_ref[0, 16 + i * 4 + j]
    o = (
        tm(0, 0) * o_cam[0] + tm(0, 1) * o_cam[1] + tm(0, 2) * o_cam[2] + tm(0, 3),
        tm(1, 0) * o_cam[0] + tm(1, 1) * o_cam[1] + tm(1, 2) * o_cam[2] + tm(1, 3),
        tm(2, 0) * o_cam[0] + tm(2, 1) * o_cam[1] + tm(2, 2) * o_cam[2] + tm(2, 3),
    )
    d = (
        tm(0, 0) * d_cam[0] + tm(0, 1) * d_cam[1] + tm(0, 2) * d_cam[2],
        tm(1, 0) * d_cam[0] + tm(1, 1) * d_cam[1] + tm(1, 2) * d_cam[2],
        tm(2, 0) * d_cam[0] + tm(2, 1) * d_cam[1] + tm(2, 2) * d_cam[2],
    )
    inv_z = 1.0 / dl[2]
    mint = sf_ref[0, 34] * inv_z
    maxt = sf_ref[0, 35] * inv_z
    return st, o, d, mint, maxt


# attribute registers selected during the VPU sweep
_ATTR_COLS = {
    "n0x": 12, "n0y": 13, "n0z": 14,
    "d1x": 15, "d1y": 16, "d1z": 17,
    "d2x": 18, "d2y": 19, "d2z": 20,
    "btype": 21, "alpha": 22, "int_ior": 23, "ext_ior": 24, "ks": 25,
    "kdr": 26, "kdg": 27, "kdb": 28,
    "alr": 29, "alg": 30, "alb": 31,
    "em": 32,
    "ds0": 33, "ds1": 34, "ds2": 35, "ds3": 36, "ds4": 37,
    "ds5": 38, "ds6": 39, "ds7": 40, "ds8": 41, "ds9": 42,
}


def _isect_vpu(tri_ref, t_cnt, o, d, mint, maxt, so, sd, s_maxt):
    """Fused sweep: closest-hit for (o,d) + any-hit for the shadow segment
    (so, sd, [EPS, s_maxt)), one unrolled pass over SMEM triangle rows.

    Winner attributes are selected with the same `better` mask — the VPU
    analog of the SBT hit-group fetch. Returns (t, u, v, hit_mask, attrs
    dict, occluded)."""
    best_t = maxt
    best_u = jnp.zeros_like(maxt)
    best_v = jnp.zeros_like(maxt)
    hit_any = jnp.zeros_like(maxt, dtype=jnp.bool_)
    occl = jnp.zeros_like(maxt, dtype=jnp.bool_)
    A = {k: jnp.zeros_like(maxt) for k in _ATTR_COLS}

    for j in range(t_cnt):
        v0 = (tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2])
        e1 = (tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5])
        e2 = (tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8])

        # bounce ray (Möller–Trumbore, mesh.cpp:61-97 contract)
        pv = (
            d[1] * e2[2] - d[2] * e2[1],
            d[2] * e2[0] - d[0] * e2[2],
            d[0] * e2[1] - d[1] * e2[0],
        )
        det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2]
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        tv = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
        uu = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv
        qv = (
            tv[1] * e1[2] - tv[2] * e1[1],
            tv[2] * e1[0] - tv[0] * e1[2],
            tv[0] * e1[1] - tv[1] * e1[0],
        )
        vv = (d[0] * qv[0] + d[1] * qv[1] + d[2] * qv[2]) * inv
        tt = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv
        better = (
            (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt >= mint) & (tt < best_t)
        )
        best_t = jnp.where(better, tt, best_t)
        best_u = jnp.where(better, uu, best_u)
        best_v = jnp.where(better, vv, best_v)
        hit_any = hit_any | better
        for k, col in _ATTR_COLS.items():
            A[k] = jnp.where(better, tri_ref[j, col], A[k])

        # shadow ray any-hit (bvh.h:80-81 early-out semantics → mask OR)
        pv2 = (
            sd[1] * e2[2] - sd[2] * e2[1],
            sd[2] * e2[0] - sd[0] * e2[2],
            sd[0] * e2[1] - sd[1] * e2[0],
        )
        det2 = e1[0] * pv2[0] + e1[1] * pv2[1] + e1[2] * pv2[2]
        inv2 = 1.0 / jnp.where(jnp.abs(det2) > 1e-12, det2, 1e-12)
        tv2 = (so[0] - v0[0], so[1] - v0[1], so[2] - v0[2])
        uu2 = (tv2[0] * pv2[0] + tv2[1] * pv2[1] + tv2[2] * pv2[2]) * inv2
        qv2 = (
            tv2[1] * e1[2] - tv2[2] * e1[1],
            tv2[2] * e1[0] - tv2[0] * e1[2],
            tv2[0] * e1[1] - tv2[1] * e1[0],
        )
        vv2 = (sd[0] * qv2[0] + sd[1] * qv2[1] + sd[2] * qv2[2]) * inv2
        tt2 = (e2[0] * qv2[0] + e2[1] * qv2[1] + e2[2] * qv2[2]) * inv2
        occl = occl | (
            (jnp.abs(det2) > 1e-12)
            & (uu2 >= 0.0) & (vv2 >= 0.0) & (uu2 + vv2 <= 1.0)
            & (tt2 >= EPS) & (tt2 < s_maxt)
        )

    return best_t, best_u, best_v, hit_any, A, occl


def _nee_sample_smem(em_ref, et_ref, env_ref, n_emitters, te_cnt, p_hit, st):
    """NEE sample with the emissive-tri pick as an SMEM select-loop (the
    small-scene analog of mega.nee_sample; same math, same stream order:
    draw1 pick + draw3)."""
    st, u_pick = draw1(st)
    st, (ua, ub, _uc) = draw3(st)

    eid = jnp.zeros_like(u_pick)
    for e in range(n_emitters - 1):
        eid = eid + (em_ref[e, 12] <= u_pick).astype(jnp.float32)
    etype, = emitter_lookup(em_ref, n_emitters, eid, [0])

    # ---- area: first et row of this emitter with cdf > ua (dpdf sampleReuse)
    zero = jnp.zeros_like(u_pick)
    found = zero > 1.0
    R = {c: zero for c in range(21)}
    for k in range(max(te_cnt, 1)):
        m = (~found) & (et_ref[k, 19] == eid) & (et_ref[k, 18] > ua)
        for c in list(range(18)) + [18, 20]:
            R[c] = jnp.where(m, et_ref[k, c], R[c])
        found = found | m
    tv0 = (R[0], R[1], R[2])
    te1 = (R[3], R[4], R[5])
    te2 = (R[6], R[7], R[8])
    tn0 = (R[9], R[10], R[11])
    td1 = (R[12], R[13], R[14])
    td2 = (R[15], R[16], R[17])
    cdf_hi = R[18]
    cdf_lo = R[20]

    ua_re = jnp.clip(
        (ua - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-12), 0.0, 1.0 - 1e-7
    )
    su = jnp.sqrt(jnp.maximum(ua_re, 0.0))
    b1 = ub * su
    b2 = 1.0 - (1.0 - su) - b1
    p_surf = vadd(tv0, vadd(vscale(te1, b1), vscale(te2, b2)))
    n_surf = vnormalize(vadd(tn0, vadd(vscale(td1, b1), vscale(td2, b2))))
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
    ok_area = front & (pdf_area > EPS) & found
    inv_pdf = jnp.where(ok_area, 1.0 / jnp.maximum(pdf_area, 1e-12), 0.0)
    val_area = (rad_r * inv_pdf, rad_g * inv_pdf, rad_b * inv_pdf)

    # ---- point
    px_, py_, pz_ = emitter_lookup(em_ref, n_emitters, eid, [4, 5, 6])
    to_l = (px_ - p_hit[0], py_ - p_hit[1], pz_ - p_hit[2])
    d2pt = jnp.maximum(vdot(to_l, to_l), 1e-20)
    dpt = jnp.sqrt(d2pt)
    wi_pt = vscale(to_l, 1.0 / dpt)
    val_pt = (rad_r / d2pt, rad_g / d2pt, rad_b / d2pt)

    # ---- spot (spotlight.cpp:54-74): delta position with the normalized
    # cone intensity power/2π and delta⁴ falloff ramp
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

    # ---- constant envmap: uniform sphere, pdf 1/4π
    z = 2.0 * ua - 1.0
    r_ = safe_sqrt(1.0 - z * z)
    sig = 2.0 * PI * ub
    wi_env = (r_ * jnp.cos(sig), r_ * jnp.sin(sig), z)
    env_r, env_g, env_b = env_ref[0, 0], env_ref[0, 1], env_ref[0, 2]
    fourpi = 4.0 * PI
    val_env = (env_r * fourpi + zero, env_g * fourpi + zero, env_b * fourpi + zero)

    is_area = etype == float(EM_AREA)
    is_pt = etype == float(EM_POINT)
    is_spot = etype == float(mega.EM_SPOT)
    is_dir = etype == float(mega.EM_DIRECTIONAL)
    is_env = etype == float(mega.EM_ENVMAP)
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


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _pathk_kernel(
    si_ref,  # SMEM int32 [1, SI_COLS]
    sf_ref,  # SMEM f32 [1, SF_COLS]
    em_ref,  # SMEM [E, 16]
    env_ref,  # SMEM [1, 4]
    sph_ref,  # SMEM [Ns, 16]
    *rest,
    mis: bool,
    n_spp: int,
    max_depth: int,
    t_cnt: int,
    te_cnt: int,
    te_pad: int,
    n_emitters: int,
    n_lights: int,
    use_mxu: bool,
    use_dof: bool,
    rfilter: str,
    t_pad: int,
    tc: int,
):
    if use_mxu:
        coeff_ref, attr_ref, et_ref, etc_ref, out_ref = rest
        tri_ref = None
        ets_ref = None
    else:
        tri_ref, ets_ref, out_ref = rest
        coeff_ref = attr_ref = et_ref = etc_ref = None

    i = pl.program_id(0)
    n_pix = si_ref[0, 0]
    width = si_ref[0, 1]
    spp0 = si_ref[0, 2]
    seed = si_ref[0, 3]
    base_block = si_ref[0, 4]

    lane = (
        (base_block + i) * BLOCK
        + jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1)
    )
    is_pad = lane >= n_pix
    pix = jnp.minimum(lane, n_pix - 1)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    pix_u = pix.astype(jnp.uint32)

    zero = jnp.zeros((S, L), jnp.float32)
    one = jnp.ones((S, L), jnp.float32)

    def cam_gen(sample_idx_f):
        st_seed = _seed_sampler(
            pix_u,
            spp0.astype(jnp.uint32)
            + sample_idx_f.astype(jnp.int32).astype(jnp.uint32),
            seed.astype(jnp.uint32),
        )
        return _camera_ray(sf_ref, px, py, st_seed, rfilter=rfilter,
                           use_dof=use_dof)

    def nee(p_hit, st):
        if use_mxu:
            return mega.nee_sample(em_ref, et_ref, env_ref, n_emitters,
                                   te_pad, p_hit, st, etc_ref=etc_ref)
        return _nee_sample_smem(em_ref, ets_ref, env_ref, n_emitters,
                                te_cnt, p_hit, st)

    # ---- initial sample for every lane
    st0, o0_, d0_, mint0_, maxt0_ = cam_gen(zero)

    def body(carry):
        (it, work, o, d, mint, maxt, depth, active_f, started,
         tr, tg, tb_, pdf_prev, prev_disc_f,
         sh_ox, sh_oy, sh_oz, sh_dx, sh_dy, sh_dz, sh_dist, sh_pend,
         sh_cr, sh_cg, sh_cb,
         aLr, aLg, aLb, n_done, aAr, aAg, aAb, aNx, aNy, aNz, st) = carry
        active = active_f > 0.5
        prev_disc = prev_disc_f > 0.5
        first = depth < 0.5
        sh_o = (sh_ox, sh_oy, sh_oz)
        sh_d = (sh_dx, sh_dy, sh_dz)

        # ---- 1. fused geometry sweep: closest-hit(cur ray) + any-hit(shadow)
        if use_mxu:
            hit = mega.closest_hit(coeff_ref, o, d, mint, maxt, t_pad, tc,
                                   want_attrs=True, attr_ref=attr_ref)
            tri_valid = hit["idf"] >= 0.0
            at = hit["attr"]
            # exact per-winner Möller–Trumbore refine (mega.py contract)
            w_v0 = (at[30], at[31], at[32])
            w_e1 = (at[33], at[34], at[35])
            w_e2 = (at[36], at[37], at[38])
            pvec = (
                d[1] * w_e2[2] - d[2] * w_e2[1],
                d[2] * w_e2[0] - d[0] * w_e2[2],
                d[0] * w_e2[1] - d[1] * w_e2[0],
            )
            r_det = vdot(w_e1, pvec)
            r_inv = 1.0 / jnp.where(jnp.abs(r_det) > 1e-12, r_det, 1e-12)
            tvec = vsub(o, w_v0)
            u_r = vdot(tvec, pvec) * r_inv
            qvec = (
                tvec[1] * w_e1[2] - tvec[2] * w_e1[1],
                tvec[2] * w_e1[0] - tvec[0] * w_e1[2],
                tvec[0] * w_e1[1] - tvec[1] * w_e1[0],
            )
            v_r = vdot(d, qvec) * r_inv
            t_r = vdot(w_e2, qvec) * r_inv
            t_tri = jnp.where(tri_valid, t_r, hit["t"])
            u = jnp.where(tri_valid, u_r, hit["u"])
            v = jnp.where(tri_valid, v_r, hit["v"])
            n0 = (at[3], at[4], at[5])
            dn1 = (at[6], at[7], at[8])
            dn2 = (at[9], at[10], at[11])
            P = {
                "btype": at[18], "alpha": at[19], "int_ior": at[20],
                "ext_ior": at[21], "ks": at[22],
                "kd": (at[23], at[24], at[25]),
                "albedo": (at[26], at[27], at[28]),
                "disney": tuple(at[40 + k] for k in range(10)),
            }
            em_id_tri = at[29]
            occ_tri = mega.occluded_mxu(
                coeff_ref, sph_ref, sh_o, sh_d, jnp.full_like(mint, EPS),
                sh_dist, t_pad, tc,
            )
        else:
            t_tri, u, v, tri_valid, A, occ_tri = _isect_vpu(
                tri_ref, t_cnt, o, d, mint, maxt, sh_o, sh_d, sh_dist
            )
            n0 = (A["n0x"], A["n0y"], A["n0z"])
            dn1 = (A["d1x"], A["d1y"], A["d1z"])
            dn2 = (A["d2x"], A["d2y"], A["d2z"])
            P = {
                "btype": A["btype"], "alpha": A["alpha"],
                "int_ior": A["int_ior"], "ext_ior": A["ext_ior"],
                "ks": A["ks"],
                "kd": (A["kdr"], A["kdg"], A["kdb"]),
                "albedo": (A["alr"], A["alg"], A["alb"]),
                "disney": tuple(A[f"ds{k}"] for k in range(10)),
            }
            em_id_tri = A["em"]
            # sphere any-hit for the shadow segment
            _, s_sid = sphere_hit(sph_ref, sh_o, sh_d,
                                  jnp.full_like(mint, EPS), sh_dist)
            occ_tri = occ_tri | (s_sid >= 0.0)

        # ---- 2. resolve the pending NEE shadow ray from last iteration
        vis = (sh_pend > 0.5) & (~occ_tri)
        aLr = aLr + jnp.where(vis, sh_cr, 0.0)
        aLg = aLg + jnp.where(vis, sh_cg, 0.0)
        aLb = aLb + jnp.where(vis, sh_cb, 0.0)
        sh_pend = zero

        # ---- 3. sphere closest-hit must beat the best triangle
        t_sph, sid = sphere_hit(sph_ref, o, d, mint, t_tri)
        sphere_wins = sid >= 0.0
        t_best = jnp.where(sphere_wins, t_sph, t_tri)
        valid = tri_valid | sphere_wins
        ns = vnormalize((
            n0[0] + u * dn1[0] + v * dn2[0],
            n0[1] + u * dn1[1] + v * dn2[1],
            n0[2] + u * dn1[2] + v * dn2[2],
        ))
        p_hit = vadd(o, vscale(d, jnp.where(valid, t_best, 1.0)))
        P, ns, _ = sphere_params(sph_ref, sid, P, ns, p_hit)
        sf, tf = onb(ns)
        em_id = jnp.where(tri_valid & (~sphere_wins), em_id_tri, -1.0)

        # ---- 4. miss → constant envmap (MIS as li_path_mis)
        # NOTE (documented backend divergence): the kernel's EMS strategy for
        # constant envmaps is uniform-sphere, so this MATS-side MIS weight
        # uses pdf_env = 1/4π/n_lights; the XLA path importance-samples the
        # equirect image CDF and weights with its own pdf. Each estimator is
        # internally consistent (both unbiased) — env-lit films agree in
        # expectation but not per-seed across backends.
        has_env = env_ref[0, 3] > 0.0
        env_r, env_g, env_b = env_ref[0, 0], env_ref[0, 1], env_ref[0, 2]
        miss = active & (~valid)
        if mis:
            pdf_env_dir = jnp.where(has_env, 1.0 / (4.0 * PI) / n_lights, 0.0)
            denom_env = pdf_prev + pdf_env_dir
            w_env = jnp.where(
                first | prev_disc,
                1.0,
                jnp.where(denom_env > EPS,
                          pdf_prev / jnp.maximum(denom_env, 1e-20), 1.0),
            )
        else:
            w_env = one
        me = jnp.where(miss, w_env, 0.0)
        aLr = aLr + me * tr * env_r
        aLg = aLg + me * tg * env_g
        aLb = aLb + me * tb_ * env_b
        active = active & valid

        # ---- 5. first-hit AOVs (accumulated per sample; mean at readout)
        firstm = first & valid & (~is_pad)
        aAr = aAr + jnp.where(firstm, P["albedo"][0], 0.0)
        aAg = aAg + jnp.where(firstm, P["albedo"][1], 0.0)
        aAb = aAb + jnp.where(firstm, P["albedo"][2], 0.0)
        aNx = aNx + jnp.where(firstm, ns[0], 0.0)
        aNy = aNy + jnp.where(firstm, ns[1], 0.0)
        aNz = aNz + jnp.where(firstm, ns[2], 0.0)

        # ---- 6. emitter hit (MATS side)
        hit_em = active & (em_id >= 0.0)
        er, eg, eb = emitter_lookup(em_ref, n_emitters, em_id, [1, 2, 3])
        front = vdot(ns, vneg(d)) >= 0.0
        add_em = hit_em & front
        if mis:
            area_tot, _pick_p = emitter_lookup(em_ref, n_emitters, em_id, [10, 11])
            cos_e = vdot(ns, vneg(vnormalize(d)))
            dist2 = vdot(vsub(p_hit, o), vsub(p_hit, o))
            pdf_ems_here = jnp.where(
                hit_em & (cos_e > 0.0),
                (1.0 / jnp.maximum(area_tot, 1e-20)) * dist2
                / jnp.maximum(jnp.abs(cos_e), 1e-12) / n_lights,
                0.0,
            )
            denom = pdf_prev + pdf_ems_here
            w_mats = jnp.where(
                first | prev_disc,
                1.0,
                jnp.where(denom > EPS,
                          pdf_prev / jnp.maximum(denom, 1e-20), 1.0),
            )
        else:
            w_mats = one
        ae = jnp.where(add_em, w_mats, 0.0)
        aLr = aLr + ae * tr * er
        aLg = aLg + ae * tg * eg
        aLb = aLb + ae * tb_ * eb

        # ---- 7. Russian roulette (path_mis.cpp:58-71 / raygen.cpp:119-127)
        st, u_rr = draw1(st)
        tmax_c = jnp.maximum(tr, jnp.maximum(tg, tb_))
        if mis:
            succ = jnp.clip(tmax_c, EPS, 0.99)
            die = (u_rr > succ) & active
            inv_s = 1.0 / succ
            tr = jnp.where(active, tr * inv_s, tr)
            tg = jnp.where(active, tg * inv_s, tg)
            tb_ = jnp.where(active, tb_ * inv_s, tb_)
            active = active & (~die)
        else:
            succ = jnp.minimum(tmax_c, 0.99)
            rr_on = depth >= 2.5
            die = rr_on & (u_rr > succ) & active
            inv_s = 1.0 / jnp.maximum(succ, 1e-12)
            scale_on = rr_on & active
            tr = jnp.where(scale_on, tr * inv_s, tr)
            tg = jnp.where(scale_on, tg * inv_s, tg)
            tb_ = jnp.where(scale_on, tb_ * inv_s, tb_)
            active = active & (~die)

        d_unit = vnormalize(d)
        wi_l = to_local(sf, tf, ns, vneg(d_unit))

        if mis:
            # ---- 8. EMS: sample NEE, queue the shadow ray for next sweep
            st, nr = nee(p_hit, st)
            wi_w = nr["wi"]
            wi_light_l = to_local(sf, tf, ns, wi_w)
            nz_val = (jnp.abs(nr["value"][0]) > EPS) | \
                     (jnp.abs(nr["value"][1]) > EPS) | \
                     (jnp.abs(nr["value"][2]) > EPS)
            cand = nz_val & valid & active
            f_l = bsdf_eval_c(P, wi_l, wi_light_l)
            cos_l = vdot(wi_w, ns)
            pdf_mat_at = jnp.where(cand, bsdf_pdf_c(P, wi_l, wi_light_l), 0.0)
            pdf_ems = jnp.where(cand, nr["pdf_sa"] / n_lights, 0.0)
            contrib = tuple(
                jnp.where(cand, nr["value"][c] * cos_l * f_l[c] * n_lights, 0.0)
                for c in range(3)
            )
            w_ems = jnp.where(
                pdf_ems + pdf_mat_at > EPS,
                pdf_ems / jnp.maximum(pdf_ems + pdf_mat_at, 1e-20),
                0.0,
            )
            # ---- 9. MATS sample
            st, (um1, um2) = draw2(st)
            wo_l, bw, bpdf, bdisc = bsdf_sample_c(P, wi_l, um1, um2)
            w_ems = jnp.where(bdisc, 0.0, w_ems)
            amask = jnp.where(cand, w_ems, 0.0)
            sh_pend = (amask * contrib[0] != 0.0) | (amask * contrib[1] != 0.0) \
                | (amask * contrib[2] != 0.0)
            sh_pend = sh_pend.astype(jnp.float32)
            sh_cr = amask * tr * contrib[0]
            sh_cg = amask * tg * contrib[1]
            sh_cb = amask * tb_ * contrib[2]
            sh_ox, sh_oy, sh_oz = p_hit
            sh_dx, sh_dy, sh_dz = wi_w
            sh_dist = nr["shadow_dist"]
            pdf_prev_new = bpdf
            prev_disc_new = bdisc
        else:
            st, (um1, um2) = draw2(st)
            wo_l, bw, bpdf, bdisc = bsdf_sample_c(P, wi_l, um1, um2)
            sh_cr = sh_cg = sh_cb = zero
            sh_dist = jnp.full_like(mint, -1.0)
            pdf_prev_new = pdf_prev
            prev_disc_new = prev_disc

        tr = jnp.where(active, tr * bw[0], tr)
        tg = jnp.where(active, tg * bw[1], tg)
        tb_ = jnp.where(active, tb_ * bw[2], tb_)
        alive = (jnp.abs(tr) > 1e-12) | (jnp.abs(tg) > 1e-12) | (jnp.abs(tb_) > 1e-12)
        active = active & alive

        wo_w = to_world(sf, tf, ns, wo_l)
        o = vwhere(active, p_hit, o)
        d = vwhere(active, wo_w, d)
        mint = jnp.where(active, jnp.full_like(mint, EPS), mint)
        maxt = jnp.where(active, jnp.full_like(maxt, BIG), maxt)
        depth = depth + 1.0  # every in-flight sample ages one bounce

        # ---- 10. termination + regeneration
        was = active_f > 0.5
        end = was & ((~active) | (depth > max_depth - 0.5))
        n_done = n_done + end.astype(jnp.float32)
        regen = end & (started < n_spp - 0.5)
        st_new, o2, d2, mint2, maxt2 = cam_gen(started)
        o = vwhere(regen, o2, o)
        d = vwhere(regen, d2, d)
        mint = jnp.where(regen, mint2, mint)
        maxt = jnp.where(regen, maxt2, maxt)
        st = tuple(jnp.where(regen, a, b) for a, b in zip(st_new, st))
        started = started + regen.astype(jnp.float32)
        depth = jnp.where(regen, 0.0, depth)
        tr = jnp.where(regen, 1.0, tr)
        tg = jnp.where(regen, 1.0, tg)
        tb_ = jnp.where(regen, 1.0, tb_)
        pdf_prev_new = jnp.where(regen, 0.0, pdf_prev_new)
        prev_disc_f_new = jnp.where(
            regen, 0.0, prev_disc_new.astype(jnp.float32)
        )
        active = (active & (~end)) | regen
        active_f = active.astype(jnp.float32)

        work = jnp.max(active_f + sh_pend)
        return (it + 1, work, o, d, mint, maxt, depth, active_f, started,
                tr, tg, tb_, pdf_prev_new, prev_disc_f_new,
                sh_ox, sh_oy, sh_oz, sh_dx, sh_dy, sh_dz, sh_dist, sh_pend,
                sh_cr, sh_cg, sh_cb,
                aLr, aLg, aLb, n_done, aAr, aAg, aAb, aNx, aNy, aNz, st)

    max_iters = n_spp * max_depth + 2
    active0 = (~is_pad).astype(jnp.float32)
    carry = (
        jnp.int32(0), jnp.float32(1.0), o0_, d0_, mint0_, maxt0_, zero, active0,
        jnp.where(is_pad, float(n_spp), 1.0),
        one, one, one, zero, zero,
        zero, zero, zero, zero, zero, one, jnp.full_like(zero, -1.0), zero,
        zero, zero, zero,
        zero, zero, zero, zero, zero, zero, zero, zero, zero, zero,
        st0,
    )
    carry = jax.lax.while_loop(
        lambda c: (c[0] < max_iters) & (c[1] > 0.5), body, carry
    )
    (aLr, aLg, aLb, n_done, aAr, aAg, aAb, aNx, aNy, aNz) = carry[25:35]

    out_ref[0, 0] = aLr
    out_ref[1, 0] = aLg
    out_ref[2, 0] = aLb
    out_ref[3, 0] = n_done
    out_ref[4, 0] = aAr
    out_ref[5, 0] = aAg
    out_ref[6, 0] = aAb
    out_ref[7, 0] = aNx
    out_ref[8, 0] = aNy
    out_ref[9, 0] = aNz
    # row 10: iterations this block ran (scheduling diagnostic, see bench.py)
    out_ref[10, 0] = jnp.zeros_like(aLr) + carry[0].astype(jnp.float32)
    for c in range(11, 16):
        out_ref[c, 0] = jnp.zeros_like(aLr)


def pathk_trace(tables, meta, config, *, n_pix, nb, spp0, n_spp,
                base_block=0, interpret=False):
    """Launch the regenerating kernel over `nb` pixel blocks.

    Returns [16, nb, S, L]: rows 0:3 ΣL rgb, 3 samples done, 4:7 Σalbedo,
    7:10 Σnormal (divide by row 3 for means)."""
    mis = config.integrator == "path_mis"
    n_lights = max(config.n_emitters, 1)
    use_mxu = meta["use_mxu"]

    si = jnp.asarray(
        np.array([[n_pix, config.width, 0, config.seed, 0, 0, 0, 0]], np.int32)
    )
    si = si.at[0, 2].set(jnp.int32(spp0))
    si = si.at[0, 4].set(jnp.int32(base_block))

    if use_mxu:
        t_pad = tables["coeffs"].shape[0] // 4
        tc = min(256, t_pad)
        te_pad = tables["et"].shape[1]
    else:
        t_pad = tc = 0
        te_pad = 0

    kern = partial(
        _pathk_kernel,
        mis=mis,
        n_spp=n_spp,
        max_depth=config.max_depth,
        t_cnt=meta["t_cnt"],
        te_cnt=meta["te_cnt"],
        te_pad=te_pad,
        n_emitters=meta["n_emitters"],
        n_lights=n_lights,
        use_mxu=use_mxu,
        use_dof=meta["use_dof"],
        rfilter=config.rfilter,
        t_pad=t_pad,
        tc=tc,
    )
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        smem((1, SI_COLS)),
        smem((1, SF_COLS)),
        smem(tables["em_rows"].shape),
        smem((1, 4)),
        smem(tables["sph"].shape),
    ]
    args = [
        si,
        tables["scal_f"],
        tables["em_rows"],
        tables["env"].reshape(1, 4),
        tables["sph"],
    ]
    if use_mxu:
        in_specs += [
            vmem(tables["coeffs"].shape),
            vmem(tables["attr"].shape),
            vmem(tables["et"].shape),
            vmem(tables["etc"].shape),
        ]
        args += [tables["coeffs"], tables["attr"], tables["et"], tables["etc"]]
    else:
        in_specs += [
            smem(tables["tri"].shape),
            smem(tables["et_smem"].shape),
        ]
        args += [tables["tri"], tables["et_smem"]]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, nb, S, L), jnp.float32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((16, 1, S, L), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
