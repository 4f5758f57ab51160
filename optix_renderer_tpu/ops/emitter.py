"""Emitter kernel: sample/eval/pdf over the tagged-union emitter table.

Batched counterpart of the reference emitter plugins (src/emitters/*.cpp,
interface emitter.h:86-118). Per-lane emitter ids select between types.

Conventions follow the reference exactly:
- `wi` points from the shading point toward the emitter;
- `sample` returns eval/pdf with the pdf in the record, shadow-ray interval
  [ε, dist−ε] (arealight.cpp:90, pointlight.cpp sample);
- area-light pdf is solid-angle converted: (1/A)·dist²/|n·(−wi)|
  (arealight.cpp:104-127);
- delta lights (point/spot) have pdf ≡ 1; directional uses the sphere-cap pdf
  (directionalLight.cpp:90-136); constant envmap is uniform-sphere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from optix_renderer_tpu.core import warp
from optix_renderer_tpu.ops import envmap as envmap_ops
from optix_renderer_tpu.core.math import (
    EPSILON,
    INV_FOURPI,
    PI,
    dot,
    make_frame,
    frame_to_local,
    frame_to_world,
    normalize,
    squared_norm,
)
from optix_renderer_tpu.scene.data import EmitterGeom, EmitterType, SceneData


class EmitterSample(NamedTuple):
    wi: jnp.ndarray  # [N,3] direction toward the emitter
    p: jnp.ndarray  # [N,3] sampled point on the emitter
    n: jnp.ndarray  # [N,3] emitter normal at p (0 for delta lights)
    pdf: jnp.ndarray  # [N] solid-angle pdf (1 for delta)
    value: jnp.ndarray  # [N,3] = eval/pdf (reference sample() return)
    shadow_maxt: jnp.ndarray  # [N] occlusion-test upper bound


def _sample_shape_surface(scene: SceneData, em_id, u2):
    """Sample a point on the emitter's attached shape surface.

    Mesh: area-weighted triangle pick via the per-emitter CDF (mesh.cpp:15-46
    m_pdf.sampleReuse) + uniform barycentric (squareToUniformTriangle).
    Sphere: uniform (sphere.cpp:126-137).
    Returns p, n, inv_area (surface pdf).
    """
    em = scene.emitters
    geom = scene.geometry
    n_lanes = em_id.shape[0]

    cdf_rows = em.tri_cdf[em_id]  # [N, MAXT]
    ux = u2[..., 0]
    local = jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"))(cdf_rows, ux)
    local = jnp.clip(local, 0, em.tri_count[em_id] - 1).astype(jnp.int32)
    # sampleReuse: rescale ux inside the chosen cell (dpdf.h:166-180)
    rows = jnp.arange(n_lanes)
    lo = jnp.where(local > 0, cdf_rows[rows, jnp.maximum(local - 1, 0)], 0.0)
    hi = cdf_rows[rows, local]
    ux_re = jnp.clip((ux - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-7)

    tri = jnp.clip(em.tri_offset[em_id] + local, 0, max(geom.tri_v0.shape[0] - 1, 0))
    bc = warp.square_to_uniform_triangle(jnp.stack([ux_re, u2[..., 1]], axis=-1))
    if geom.tri_v0.shape[0] > 0:
        v0 = geom.tri_v0[tri]
        p_mesh = v0 + geom.tri_e1[tri] * bc[..., 1:2] + geom.tri_e2[tri] * bc[..., 2:3]
        n_mesh = normalize(
            geom.tri_n0[tri] * bc[..., 0:1]
            + geom.tri_n1[tri] * bc[..., 1:2]
            + geom.tri_n2[tri] * bc[..., 2:3]
        )
    else:
        p_mesh = jnp.zeros((n_lanes, 3))
        n_mesh = jnp.zeros((n_lanes, 3))

    # sphere branch
    if geom.sph_center.shape[0] > 0:
        sid = jnp.maximum(em.sphere_id[em_id], 0)
        dir_ = warp.square_to_uniform_sphere(u2)
        p_sph = geom.sph_center[sid] + geom.sph_radius[sid][..., None] * dir_
        n_sph = dir_
    else:
        p_sph = jnp.zeros((n_lanes, 3))
        n_sph = jnp.zeros((n_lanes, 3))

    is_mesh = em.geom_kind[em_id] == EmitterGeom.MESH
    p = jnp.where(is_mesh[..., None], p_mesh, p_sph)
    nrm = jnp.where(is_mesh[..., None], n_mesh, n_sph)
    inv_area = 1.0 / jnp.maximum(em.area[em_id], 1e-20)
    return p, nrm, inv_area


def _spot_falloff(scene: SceneData, em_id, w):
    """Spotlight angular falloff (spotlight.cpp:184-203): delta⁴ ramp."""
    em = scene.emitters
    cos_theta = dot(w, em.direction[em_id])
    c_start = em.cos_falloff_start[em_id]
    c_end = em.cos_falloff_end[em_id]
    delta = (cos_theta - c_end) / jnp.maximum(c_start - c_end, 1e-12)
    ramp = jnp.clip(delta, 0.0, 1.0) ** 4
    return jnp.where(
        cos_theta < c_end, 0.0, jnp.where(cos_theta >= c_start, 1.0, ramp)
    )


def sample_emitter(
    scene: SceneData, em_id: jnp.ndarray, ref: jnp.ndarray, u3: jnp.ndarray
) -> EmitterSample:
    """Sample all emitter types branchlessly; select by `em_id`'s type.

    `u3` is [N,3]: surface/direction emitters use the first two components;
    volume emitters consume all three (volumelight.cpp:58-60 draws an extra
    1D sample for the third bbox axis).
    """
    em = scene.emitters
    eid = jnp.maximum(em_id, 0)
    etype = em.type[eid]
    n_lanes = ref.shape[0]
    u2 = u3[..., :2]

    # ---- area (arealight.cpp:75-101) + shared shape sampling
    p_surf, n_surf, inv_area = _sample_shape_surface(scene, eid, u2)
    to_p = p_surf - ref
    dist2_area = squared_norm(to_p)
    dist_area = jnp.sqrt(jnp.maximum(dist2_area, 1e-20))
    wi_area = to_p / dist_area[..., None]
    cos_emitter = dot(n_surf, -wi_area)
    front = cos_emitter > 0.0
    pdf_area = inv_area * dist2_area / jnp.maximum(jnp.abs(cos_emitter), 1e-12)
    val_area = jnp.where(
        (front & (pdf_area > EPSILON))[..., None],
        em.radiance[eid] / jnp.maximum(pdf_area, 1e-12)[..., None],
        0.0,
    )

    # ---- point (pointlight.cpp): eval = power/(4π·dist²), pdf = 1
    to_l = em.position[eid] - ref
    dist2_pt = jnp.maximum(squared_norm(to_l), 1e-20)
    dist_pt = jnp.sqrt(dist2_pt)
    wi_pt = to_l / dist_pt[..., None]
    val_point = em.radiance[eid] / dist2_pt[..., None]

    # ---- spot (spotlight.cpp:54-74): radiance = power/2π, normalized cone
    i_spot = (em.power[eid] / (2.0 * PI)) / jnp.maximum(
        1.0 - 0.5 * (em.cos_falloff_end[eid] + em.cos_falloff_start[eid]), 1e-12
    )[..., None]
    val_spot = i_spot * _spot_falloff(scene, eid, -wi_pt)[..., None] / dist2_pt[..., None]

    # ---- directional (directionalLight.cpp:90-136): cap around -direction
    cos_cap = jnp.cos(em.angular_radius[eid])
    frame_dir = make_frame(em.direction[eid])
    cap_local = warp.square_to_uniform_sphere_cap(u2, cos_cap)
    wi_dir = -frame_to_world(frame_dir, cap_local)
    pdf_dir = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_cap), 1e-12)
    val_dir = em.radiance[eid] / pdf_dir[..., None]

    # ---- envmap (environmentmap.cpp:73-104): luminance-importance sample
    # over the lat-long image, eval/pdf in ops/envmap (constant 1×1 maps
    # degenerate to uniform-sphere, like the reference's fallback texture)
    wi_env, pdf_env, rad_env = envmap_ops.sample_dir(scene.envmap, scene.envmap_pick, u2)
    val_env = rad_env / jnp.maximum(pdf_env, 1e-20)[..., None]

    # ---- volume emitter (volumelight.cpp:52-77 via Shape::sampleVolume):
    # bbox-uniform point for meshes (shape.cpp:97-101), exact uniform ball
    # for spheres (sphere.cpp:139-143); pdf = (1/volume)·dist²
    p_box = em.bbox_min[eid] + em.bbox_extent[eid] * u3
    sid_v = jnp.maximum(em.sphere_id[eid], 0)
    if scene.geometry.sph_center.shape[0] > 0:
        p_ball = (
            scene.geometry.sph_center[sid_v]
            + scene.geometry.sph_radius[sid_v][..., None]
            * warp.square_to_uniform_sphere_volume(u3)
        )
    else:
        p_ball = p_box
    is_sph_vol = em.geom_kind[eid] == EmitterGeom.SPHERE
    p_vol = jnp.where(is_sph_vol[..., None], p_ball, p_box)
    to_v = p_vol - ref
    dist2_vol = jnp.maximum(squared_norm(to_v), 1e-20)
    dist_vol = jnp.sqrt(dist2_vol)
    wi_vol = to_v / dist_vol[..., None]
    pdf_vol = dist2_vol / jnp.maximum(em.volume[eid], 1e-20)
    val_vol = em.radiance[eid] / jnp.maximum(pdf_vol, 1e-12)[..., None]

    is_area = etype == EmitterType.AREA
    is_vol = etype == EmitterType.VOLUME
    is_point = etype == EmitterType.POINT
    is_spot = etype == EmitterType.SPOT
    is_dir = etype == EmitterType.DIRECTIONAL
    is_env = etype == EmitterType.ENVMAP
    is_delta = is_point | is_spot

    wi = jnp.where(
        is_area[..., None],
        wi_area,
        jnp.where(
            is_delta[..., None],
            wi_pt,
            jnp.where(
                is_dir[..., None],
                wi_dir,
                jnp.where(is_vol[..., None], wi_vol, wi_env),
            ),
        ),
    )
    p = jnp.where(
        is_area[..., None],
        p_surf,
        jnp.where(
            is_delta[..., None],
            em.position[eid],
            jnp.where(is_vol[..., None], p_vol, ref + wi * 1e8),
        ),
    )
    # volumelight.cpp:64: n = -wi (no meaningful normal inside a volume)
    nrm = jnp.where(
        is_area[..., None],
        n_surf,
        jnp.where(is_vol[..., None], -wi_vol, jnp.zeros((n_lanes, 3))),
    )
    pdf = jnp.where(
        is_area,
        pdf_area,
        jnp.where(
            is_delta,
            1.0,
            jnp.where(is_dir, pdf_dir, jnp.where(is_vol, pdf_vol, pdf_env)),
        ),
    )
    value = jnp.where(
        is_area[..., None],
        val_area,
        jnp.where(
            is_point[..., None],
            val_point,
            jnp.where(
                is_spot[..., None],
                val_spot,
                jnp.where(
                    is_dir[..., None],
                    val_dir,
                    jnp.where(is_vol[..., None], val_vol, val_env),
                ),
            ),
        ),
    )
    shadow_maxt = jnp.where(
        is_area | is_delta | is_vol,
        jnp.where(is_area, dist_area, jnp.where(is_vol, dist_vol, dist_pt))
        - EPSILON,
        jnp.float32(jnp.inf),
    )
    return EmitterSample(
        wi=wi, p=p, n=nrm, pdf=pdf, value=value, shadow_maxt=shadow_maxt
    )


def eval_hit_emitter(
    scene: SceneData, em_id: jnp.ndarray, wi: jnp.ndarray, n: jnp.ndarray
) -> jnp.ndarray:
    """Radiance of an emitter hit by a ray (MATS side): area front-face check
    (arealight.cpp:58-72). `wi` = direction from viewer toward the emitter."""
    em = scene.emitters
    eid = jnp.maximum(em_id, 0)
    etype = em.type[eid]
    front = dot(n, -wi) >= 0.0
    val = jnp.where(
        ((etype == EmitterType.AREA) & front)[..., None], em.radiance[eid], 0.0
    )
    return jnp.where(em_id[..., None] >= 0, val, 0.0)


def pdf_hit_emitter(
    scene: SceneData,
    em_id: jnp.ndarray,
    ref: jnp.ndarray,
    p: jnp.ndarray,
    n: jnp.ndarray,
    wi: jnp.ndarray,
) -> jnp.ndarray:
    """Solid-angle pdf that `sample_emitter` would have produced this hit —
    the MATS-side MIS probe (path_mis.cpp:123-125)."""
    em = scene.emitters
    eid = jnp.maximum(em_id, 0)
    etype = em.type[eid]
    cos_e = dot(n, -wi)
    inv_area = 1.0 / jnp.maximum(em.area[eid], 1e-20)
    dist2 = squared_norm(p - ref)
    pdf_area = jnp.where(
        cos_e > 0.0, inv_area * dist2 / jnp.maximum(jnp.abs(cos_e), 1e-12), 0.0
    )
    return jnp.where((etype == EmitterType.AREA) & (em_id >= 0), pdf_area, 0.0)


def pdf_volume_emitter(
    scene: SceneData, em_id: jnp.ndarray, ref: jnp.ndarray, p: jnp.ndarray
) -> jnp.ndarray:
    """Solid-angle pdf of `sample_emitter` producing volume point `p` from
    `ref` for a VOLUME emitter (volumelight.cpp:73-77: pdfVolume·dist²)."""
    em = scene.emitters
    eid = jnp.maximum(em_id, 0)
    dist2 = squared_norm(p - ref)
    pdf = dist2 / jnp.maximum(em.volume[eid], 1e-20)
    return jnp.where((em.type[eid] == EmitterType.VOLUME) & (em_id >= 0), pdf, 0.0)


def pdf_envmap_direction(scene: SceneData, d: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf with which `sample_emitter` draws direction `d` from the
    scene's envmap emitter (0 if none). Constant envmap → uniform sphere;
    image-based envmaps override this via the luminance DPDF (ops/envmap).

    Used to MIS-weight the miss-shader env contribution — the reference adds
    it unweighted (path_mis.cpp:36-43) while ALSO listing the envmap as a
    sampleable emitter (scene.cpp:218-222), double-counting env light; we
    apply the balance heuristic instead.
    """
    has = scene.envmap_emitter >= 0
    return jnp.where(has, envmap_ops.pdf_dir(scene.envmap, scene.envmap_pick, d), 0.0)


def eval_envmap(scene: SceneData, d: jnp.ndarray) -> jnp.ndarray:
    """Environment radiance for escaped rays (miss shader, shading.cpp:39-60;
    image lookup environmentmap.cpp:118-131). 0 when no envmap emitter."""
    has = scene.envmap_emitter >= 0
    val = envmap_ops.eval_dir(scene.envmap, normalize(d))
    return jnp.where(has, val, 0.0)
