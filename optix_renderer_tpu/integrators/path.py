"""Wavefront path tracers: path_mats and path_mis.

Mask-based `lax.scan` over bounces replaces the reference's per-pixel while
loops (path_mats.cpp, path_mis.cpp:16-149): the whole wavefront advances one
bounce per step; dead lanes are masked. MIS weights are computed lazily — the
MATS-side pdf is carried to the next hit instead of re-intersecting
(mathematically identical to the reference's double trace, half the rays).

Semantics matched to the reference:
- path_mats: RR starts after 3 bounces, survival = min(maxThroughput, 0.99)
  (path_mats.cpp:47-58);
- path_mis: RR from the first vertex, survival clamped to [ε, 0.99]
  (path_mis.cpp:58-71); EMS contribution scaled ×numLights with pdf/numLights
  (path_mis.cpp:98-100); discrete-measure override w_ems=0, w_mats=1
  (path_mis.cpp:135-140); envmap added unweighted on miss (path_mis.cpp:36-43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optix_renderer_tpu.core.math import EPSILON, Ray, normalize
from optix_renderer_tpu.integrators import common
from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops import emitter as emitter_ops
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import RenderConfig, SceneData


def li_path_mats(scene: SceneData, config: RenderConfig, ray: Ray, sampler):
    n = ray.o.shape[0]

    def body(carry, bounce):
        (ro, rd, t, L, active, albedo, normal, s) = carry
        # first segment honours the camera's near/far clip (perspective.cpp:
        # 10-31); subsequent bounces are [ε, ∞)
        first_seg = bounce == 0
        r = Ray(
            o=ro,
            d=rd,
            mint=jnp.where(first_seg, ray.mint, jnp.full(n, EPSILON)),
            maxt=jnp.where(first_seg, ray.maxt, jnp.full(n, jnp.inf)),
        )
        ctx = common.trace(scene, r)
        hit = ctx.its.valid & active

        # miss → envmap, terminate
        env = common.miss_envmap(scene, rd, active & (~ctx.its.valid))
        L = L + t * env
        active = active & ctx.its.valid

        # first-hit AOVs
        a0, n0 = common.first_hit_aovs(scene, ctx)
        first = bounce == 0
        albedo = jnp.where(first, a0, albedo)
        normal = jnp.where(first, n0, normal)

        # emitter hit
        L = L + jnp.where(
            hit[..., None], t * common.hit_emitter_radiance(scene, ctx, rd), 0.0
        )

        # Russian roulette after 3 bounces (path_mats.cpp:47-58)
        s, u_rr = smp.next_1d(s)
        succ = jnp.minimum(jnp.max(t, axis=-1), 0.99)
        rr_on = bounce >= 3
        die = rr_on & (u_rr > succ) & active
        t = jnp.where((rr_on & active)[..., None], t / jnp.maximum(succ, 1e-12)[..., None], t)
        active = active & (~die)

        # BSDF sampling
        wo_local = common.to_local(ctx, -normalize(rd))
        s, u2 = smp.next_2d(s)
        bs = bsdf_ops.sample_bsdf(
            scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, ctx.its.uv, u2
        )
        t = jnp.where(active[..., None], t * bs.weight, t)
        active = active & jnp.any(jnp.abs(t) > 1e-12, axis=-1)

        rd_new = common.to_world(ctx, bs.wo)
        ro = jnp.where(active[..., None], ctx.its.p, ro)
        rd = jnp.where(active[..., None], rd_new, rd)
        return (ro, rd, t, L, active, albedo, normal, s), None

    init = (
        ray.o,
        ray.d,
        jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
        jnp.ones(n, bool),
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        sampler,
    )
    (ro, rd, t, L, active, albedo, normal, sampler), _ = jax.lax.scan(
        body, init, jnp.arange(config.max_depth)
    )
    return L, albedo, normal, sampler


def li_path_mis(scene: SceneData, config: RenderConfig, ray: Ray, sampler):
    n = ray.o.shape[0]
    n_lights = max(config.n_emitters, 1)

    def body(carry, bounce):
        (ro, rd, t, L, active, pdf_mats_prev, prev_discrete, w_mats_prev,
         albedo, normal, s) = carry
        first_seg = bounce == 0
        r = Ray(
            o=ro,
            d=rd,
            mint=jnp.where(first_seg, ray.mint, jnp.full(n, EPSILON)),
            maxt=jnp.where(first_seg, ray.maxt, jnp.full(n, jnp.inf)),
        )
        ctx = common.trace(scene, r)

        # miss → envmap, MIS-weighted against the EMS envmap pdf. Deviation
        # from the reference (path_mis.cpp:36-43 adds it unweighted while the
        # envmap is also EMS-sampleable — double counting); the balance
        # heuristic here keeps the furnace test exact.
        first = bounce == 0
        pdf_env_dir = emitter_ops.pdf_envmap_direction(scene, rd) / float(n_lights)
        denom_env = pdf_mats_prev + pdf_env_dir
        w_env = jnp.where(
            first | prev_discrete,
            1.0,
            jnp.where(denom_env > EPSILON, pdf_mats_prev / jnp.maximum(denom_env, 1e-20), 1.0),
        )
        env = common.miss_envmap(scene, rd, active & (~ctx.its.valid))
        L = L + w_env[..., None] * t * env
        active = active & ctx.its.valid

        a0, n0 = common.first_hit_aovs(scene, ctx)
        albedo = jnp.where(first, a0, albedo)
        normal = jnp.where(first, n0, normal)

        # emitter hit with lazily-computed w_mats (path_mis.cpp:51-56,119-133)
        hit_em = active & (ctx.emitter_id >= 0)
        pdf_ems_here = emitter_ops.pdf_hit_emitter(
            scene, ctx.emitter_id, ro, ctx.its.p, ctx.frame.n, normalize(rd)
        ) / float(n_lights)
        denom = pdf_mats_prev + pdf_ems_here
        w_mats = jnp.where(
            first | prev_discrete,
            1.0,
            jnp.where(denom > EPSILON, pdf_mats_prev / jnp.maximum(denom, 1e-20), w_mats_prev),
        )
        L = L + jnp.where(
            hit_em[..., None],
            w_mats[..., None] * t * common.hit_emitter_radiance(scene, ctx, rd),
            0.0,
        )

        # Russian roulette from the first vertex (path_mis.cpp:58-71)
        s, u_rr = smp.next_1d(s)
        succ = jnp.clip(jnp.max(t, axis=-1), EPSILON, 0.99)
        die = (u_rr > succ) & active
        t = jnp.where(active[..., None], t / succ[..., None], t)
        active = active & (~die)

        # ===== EMS (path_mis.cpp:74-106)
        wo_local = common.to_local(ctx, -normalize(rd))
        s, u_pick = smp.next_1d(s)
        em_id = common.pick_emitter(scene, u_pick)
        s, u_ems = smp.next_3d(s)
        ems_contrib, pdf_ems, pdf_mat_at_ems, _ = common.nee(
            scene, ctx, wo_local, em_id, u_ems, n_lights=n_lights, abs_cos=False
        )
        w_ems = jnp.where(
            pdf_ems + pdf_mat_at_ems > EPSILON,
            pdf_ems / jnp.maximum(pdf_ems + pdf_mat_at_ems, 1e-20),
            0.0,
        )

        # ===== MATS (path_mis.cpp:108-133)
        s, u_mats = smp.next_2d(s)
        bs = bsdf_ops.sample_bsdf(
            scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, ctx.its.uv, u2=u_mats
        )
        # discrete override (path_mis.cpp:135-140)
        w_ems = jnp.where(bs.is_discrete, 0.0, w_ems)

        L = L + jnp.where(active[..., None], w_ems[..., None] * t * ems_contrib, 0.0)
        t = jnp.where(active[..., None], t * bs.weight, t)
        alive = jnp.any(jnp.abs(t) > 1e-12, axis=-1)
        active = active & alive

        ro = jnp.where(active[..., None], ctx.its.p, ro)
        rd = jnp.where(active[..., None], common.to_world(ctx, bs.wo), rd)
        return (
            ro, rd, t, L, active, bs.pdf, bs.is_discrete, w_mats, albedo, normal, s
        ), None

    init = (
        ray.o,
        ray.d,
        jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
        jnp.ones(n, bool),
        jnp.zeros(n),  # pdf_mats_prev
        jnp.zeros(n, bool),  # prev_discrete
        jnp.ones(n),  # w_mats carry
        jnp.zeros((n, 3)),
        jnp.zeros((n, 3)),
        sampler,
    )
    carry, _ = jax.lax.scan(body, init, jnp.arange(config.max_depth))
    L, albedo, normal, sampler = carry[3], carry[8], carry[9], carry[10]
    return L, albedo, normal, sampler
