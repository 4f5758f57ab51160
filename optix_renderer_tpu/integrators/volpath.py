"""Volumetric wavefront path tracer (path_vol_mats / path_vol_mis).

Batched counterpart of src/integrators/{path_vol_mats,path_vol_mis}.cpp:
free-path sampling against surface hits, phase-function scattering,
pass-through medium boundaries (shapes without a BSDF), medium transitions on
transmission, and (MIS mode) transmittance-accumulating shadow rays through
boundaries (path_vol_mis.cpp:26-46 traceShadowray) with balance-heuristic
emitter weights (path_vol_mis.cpp:147-172 lazy MATS pdf).

Estimator deviates from the reference where the reference is biased — see
ops/medium.py. RR matches path_vol_mis.cpp:176-185 (from bounce 3, only at
real interactions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optix_renderer_tpu.core.math import (
    EPSILON,
    Ray,
    dot,
    frame_to_local,
    frame_to_world,
    make_frame,
    normalize,
)
from optix_renderer_tpu.integrators import common
from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops import emitter as emitter_ops
from optix_renderer_tpu.ops import medium as medium_ops
from optix_renderer_tpu.ops.intersect import intersect, make_interaction
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import RenderConfig, SceneData

def _shadow_transmittance(scene, s, p_from, wi, maxt, medium_id, n_segments=8):
    """Trace a shadow ray accumulating transmittance through pass-through
    boundaries; blocked when any hit carries a BSDF.

    `n_segments` statically bounds the boundary crossings (traceShadowray's
    unbounded while-loop, path_vol_mis.cpp:26-46) — configure via
    RenderConfig.shadow_segments for deeply nested media.

    Returns (sampler, Tr): heterogeneous segments are estimated by ratio
    tracking, which consumes sampler state."""
    n = p_from.shape[0]
    tr = jnp.ones((n, 3))
    blocked = jnp.zeros(n, bool)
    o = p_from
    remaining = maxt
    med = medium_id
    for _ in range(n_segments):
        ray = Ray(o=o, d=wi, mint=jnp.full(n, EPSILON), maxt=remaining)
        hit = intersect(scene.geometry, ray)
        its = make_interaction(scene.geometry, ray, hit)
        sid = jnp.maximum(its.shape, 0)
        has_bsdf = its.valid & (scene.shapes.bsdf[sid] >= 0)
        blocked = blocked | has_bsdf
        seg = jnp.where(its.valid, its.t, remaining)
        s, tr_seg = medium_ops.transmittance_est(scene.media, med, s, o, wi, seg)
        tr = tr * tr_seg
        # step through the boundary: update medium by crossing direction
        entering = (dot(wi, its.n_g) < 0.0) & (
            scene.shapes.interior_medium[sid] >= 0
        )
        med = jnp.where(
            its.valid & (~has_bsdf),
            jnp.where(entering, scene.shapes.interior_medium[sid], scene.ambient_medium),
            med,
        )
        o = jnp.where(its.valid[..., None], its.p, o)
        remaining = jnp.where(its.valid, remaining - its.t, 0.0)
    return s, jnp.where(blocked[..., None], 0.0, tr)


def li_vol(scene: SceneData, config: RenderConfig, ray: Ray, sampler, use_mis: bool):
    n = ray.o.shape[0]
    n_lights = max(config.n_emitters, 1)

    def body(carry, bounce):
        # pv = last REAL scattering vertex (camera / bsdf / phase event) —
        # pass-through medium boundaries advance ro but not pv, so MATS-side
        # emitter-pdf probes stay in the solid-angle measure of the vertex
        # where pdf_mat was generated (the reference probes from the segment
        # origin, path_vol_mis.cpp:155-161, which biases MIS when a boundary
        # sits between the scatter vertex and the light).
        (ro, rd, t, L, active, med, pdf_mat, pdf_discrete, pv, albedo, normal, s) = carry
        first = bounce == 0
        # first segment honours the camera near/far clip (perspective.cpp:10-31)
        r = Ray(
            o=ro,
            d=rd,
            mint=jnp.where(first, ray.mint, jnp.full(n, EPSILON)),
            maxt=jnp.where(first, ray.maxt, jnp.full(n, jnp.inf)),
        )
        ctx = common.trace(scene, r)

        # miss → env (MIS-weighted like path_mis), terminate
        pdf_env_dir = emitter_ops.pdf_envmap_direction(scene, rd) / float(n_lights)
        denom_env = pdf_mat + pdf_env_dir
        w_env = jnp.where(
            first | pdf_discrete,
            1.0,
            jnp.where(denom_env > EPSILON, pdf_mat / jnp.maximum(denom_env, 1e-20), 1.0),
        )
        env = common.miss_envmap(scene, rd, active & (~ctx.its.valid))
        L = L + (w_env[..., None] * t * env if use_mis else t * env)
        active = active & ctx.its.valid

        a0, n0 = common.first_hit_aovs(scene, ctx)
        albedo = jnp.where(first, a0, albedo)
        normal = jnp.where(first, n0, normal)

        # ---- free-path sampling in the current medium (homog analytic /
        # heterog delta tracking, ops/medium.py sample_interaction)
        (
            s,
            is_medium,
            t_med,
            w_medium,
            w_surface,
            w_emission,
        ) = medium_ops.sample_interaction(scene.media, med, s, ro, rd, ctx.its.t)
        is_medium = is_medium & active
        p = jnp.where(
            is_medium[..., None], ro + rd * t_med[..., None], ctx.its.p
        )

        # ---- medium emission at real medium events (path_vol_mis.cpp:146-172
        # "Apply captured emission - MATS" + temperature emission): uses the
        # PRE-update throughput × the emission event weight Tr/pdf_t
        # Volume-light emission strategy split (deviation from the reference's
        # balance heuristic, path_vol_mis.cpp:146-172, which is inconsistent —
        # a correct balance would need the free-path density in both weights):
        # NEE covers volume lights from every real scattering vertex (weight 1
        # below), so MATS-side emission counts ONLY on delta prefixes
        # (camera / discrete-BSDF chains) where NEE cannot run. Unbiased:
        # every path suffix is covered by exactly one strategy.
        mid_lane = jnp.maximum(med, 0)
        med_em = jnp.where(med >= 0, scene.media.emitter[mid_lane], -1)
        has_med_em = is_medium & (med_em >= 0)
        w_mats_med = jnp.where(first | pdf_discrete, 1.0, 0.0)
        if not use_mis:
            w_mats_med = jnp.ones_like(w_mats_med)
        le_const = jnp.where(
            has_med_em[..., None],
            w_mats_med[..., None] * scene.emitters.radiance[jnp.maximum(med_em, 0)],
            0.0,
        )
        le_temp = medium_ops.event_emission(scene.media, med, p)  # weight-1 (no NEE)
        L = L + jnp.where(
            is_medium[..., None], t * w_emission * (le_const + le_temp), 0.0
        )

        t = jnp.where(
            active[..., None], t * jnp.where(is_medium[..., None], w_medium, w_surface), t
        )

        sid = jnp.maximum(ctx.its.shape, 0)
        has_bsdf = ctx.its.valid & (scene.shapes.bsdf[sid] >= 0) & (~is_medium)
        pass_through = ctx.its.valid & (scene.shapes.bsdf[sid] < 0) & (~is_medium)

        # ---- MATS-side emitter hit (surface emitters only; medium emission
        # handled by the volume-emitter subsystem)
        hit_em = active & (~is_medium) & (ctx.emitter_id >= 0)
        pdf_ems_here = emitter_ops.pdf_hit_emitter(
            scene, ctx.emitter_id, pv, ctx.its.p, ctx.frame.n, normalize(rd)
        ) / float(n_lights)
        denom = pdf_mat + pdf_ems_here
        w_mats = jnp.where(
            first | pdf_discrete,
            1.0,
            jnp.where(denom > EPSILON, pdf_mat / jnp.maximum(denom, 1e-20), 0.0),
        )
        if not use_mis:
            w_mats = jnp.ones_like(w_mats)
        L = L + jnp.where(
            hit_em[..., None],
            w_mats[..., None] * t * common.hit_emitter_radiance(scene, ctx, rd),
            0.0,
        )

        # ---- RR from bounce 3, only at real interactions (path_vol_mis.cpp:176-185)
        s, u_rr = smp.next_1d(s)
        succ = jnp.minimum(jnp.max(t, axis=-1), 0.99)
        rr_on = (bounce >= 3) & (is_medium | has_bsdf) & active
        die = rr_on & ((u_rr > succ) | (succ < EPSILON))
        t = jnp.where(rr_on[..., None], t / jnp.maximum(succ, 1e-12)[..., None], t)
        active = active & (~die)

        # ---- next direction
        # medium event: phase sample in the frame of rd
        s, u_ph = smp.next_2d(s)
        ray_frame = make_frame(normalize(rd))
        wo_phase_local = medium_ops.phase_sample(scene.media, med, u_ph)
        wo_phase = frame_to_world(ray_frame, wo_phase_local)
        pdf_phase = medium_ops.phase_pdf(scene.media, med, wo_phase_local)

        # surface event: bsdf sample
        wo_local_view = common.to_local(ctx, -normalize(rd))
        s, u_bs = smp.next_2d(s)
        bs = bsdf_ops.sample_bsdf(
            scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local_view, ctx.its.uv, u_bs
        )
        wo_surf = common.to_world(ctx, bs.wo)

        wo = jnp.where(
            is_medium[..., None],
            wo_phase,
            jnp.where(has_bsdf[..., None], wo_surf, rd),
        )
        new_pdf_mat = jnp.where(
            is_medium, pdf_phase, jnp.where(has_bsdf, bs.pdf, pdf_mat)
        )
        new_discrete = jnp.where(
            is_medium,
            False,
            jnp.where(has_bsdf, bs.is_discrete, pdf_discrete),
        )

        # ---- EMS (MIS only; path_vol_mis.cpp:48-105 sampleEmitter)
        if use_mis:
            s, u_pick = smp.next_1d(s)
            em_id = common.pick_emitter(scene, u_pick)
            s, u_ems = smp.next_3d(s)  # volume emitters need a 3D sample
            es = emitter_ops.sample_emitter(scene, em_id, p, u_ems)
            # shadow medium: crossing vs reflected (path_vol_mis.cpp:70-77)
            same_dir = dot(rd, es.wi) > 0.0
            entering = (dot(es.wi, ctx.its.n_g) < 0.0) & (
                scene.shapes.interior_medium[sid] >= 0
            )
            shadow_med = jnp.where(
                is_medium,
                med,
                jnp.where(
                    same_dir,
                    jnp.where(entering, scene.shapes.interior_medium[sid], scene.ambient_medium),
                    med,
                ),
            )
            s, tr = _shadow_transmittance(
                scene, s, p, es.wi, es.shadow_maxt, shadow_med,
                n_segments=config.shadow_segments,
            )

            wi_local_surface = common.to_local(ctx, es.wi)
            f_surf = bsdf_ops.eval_bsdf(
                scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local_view,
                wi_local_surface, ctx.its.uv,
            )
            cos_surf = dot(es.wi, ctx.frame.n)
            pdf_mat_at_ems_surf = bsdf_ops.pdf_bsdf(
                scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local_view,
                wi_local_surface, ctx.its.uv,
            )
            # phase side: f = phase pdf value (phase integrates to 1; its
            # "eval" equals its pdf, path_vol_mis.cpp:96-103 uses |wi·d|≈1)
            wi_phase_local = frame_to_local(ray_frame, es.wi)
            pdf_mat_at_ems_phase = medium_ops.phase_pdf(scene.media, med, wi_phase_local)
            f_phase = pdf_mat_at_ems_phase[..., None] * jnp.ones((n, 3))

            f_ems = jnp.where(is_medium[..., None], f_phase, f_surf * jnp.maximum(cos_surf, 0.0)[..., None])
            pdf_mat_at_ems = jnp.where(is_medium, pdf_mat_at_ems_phase, pdf_mat_at_ems_surf)
            pdf_ems = es.pdf / float(n_lights)
            w_ems = jnp.where(
                pdf_ems > EPSILON, pdf_ems / jnp.maximum(pdf_ems + pdf_mat_at_ems, 1e-20), 0.0
            )
            # volume lights are NEE-only (see emission-strategy note above)
            from optix_renderer_tpu.scene.data import EmitterType

            is_vol_light = scene.emitters.type[jnp.maximum(em_id, 0)] == EmitterType.VOLUME
            w_ems = jnp.where(is_vol_light & (pdf_ems > EPSILON), 1.0, w_ems)
            valid_ems = active & (is_medium | (has_bsdf & (~bs.is_discrete)))
            contrib = (
                w_ems[..., None]
                * t
                * tr
                * es.value
                * float(n_lights)
                * f_ems
            )
            L = L + jnp.where(valid_ems[..., None], contrib, 0.0)

        # surface throughput update after EMS (path_vol_mis.cpp:225-228)
        t = jnp.where(has_bsdf[..., None], t * bs.weight, t)

        # medium transition on transmission (path_vol_mis.cpp:230-236)
        crossing = (~is_medium) & ctx.its.valid & (dot(rd, wo) > 0.0)
        enter2 = (dot(wo, ctx.its.n_g) < 0.0) & (scene.shapes.interior_medium[sid] >= 0)
        med = jnp.where(
            crossing & active,
            jnp.where(enter2, scene.shapes.interior_medium[sid], scene.ambient_medium),
            med,
        )

        dead = jnp.all(jnp.abs(t) < 1e-12, axis=-1)
        active = active & (~dead)
        # real scattering vertex → becomes the new pdf-probe origin
        pv = jnp.where((active & (is_medium | has_bsdf))[..., None], p, pv)
        ro = jnp.where(active[..., None], p, ro)
        rd = jnp.where(active[..., None], wo, rd)
        return (ro, rd, t, L, active, med, new_pdf_mat, new_discrete, pv, albedo, normal, s), None

    init = (
        ray.o,
        ray.d,
        jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
        jnp.ones(n, bool),
        jnp.broadcast_to(scene.ambient_medium, (n,)).astype(jnp.int32),
        jnp.ones(n),  # pdf_mat ("camera is like delta bsdf")
        jnp.ones(n, bool),  # pdf_discrete — first-vertex w=1
        ray.o,  # pv: the camera vertex
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        sampler,
    )
    carry, _ = jax.lax.scan(body, init, jnp.arange(config.max_depth))
    L, albedo, normal, sampler = carry[3], carry[9], carry[10], carry[11]
    return L, albedo, normal, sampler


def li_path_vol_mats(scene, config, ray, sampler):
    """Registry entry for `path_vol_mats` (src/integrators/path_vol_mats.cpp)."""
    return li_vol(scene, config, ray, sampler, use_mis=False)


def li_path_vol_mis(scene, config, ray, sampler):
    """Registry entry for `path_vol_mis` (src/integrators/path_vol_mis.cpp)."""
    return li_vol(scene, config, ray, sampler, use_mis=True)
