"""Single-bounce integrators: normals, av, direct family, preview.

Batched counterparts of src/integrators/{normals,av,direct,direct_ems,
direct_mats,direct_mis,PreviewIntegrator,EnvMapTester}.cpp. Control flow is
mask-based: every lane runs every branch, selects by predicate.
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_renderer_tpu.core import warp
from optix_renderer_tpu.core.math import EPSILON, Ray, dot, normalize
from optix_renderer_tpu.integrators import common
from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops import emitter as emitter_ops
from optix_renderer_tpu.ops.intersect import occluded
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import RenderConfig, SceneData


def li_normals(scene: SceneData, config: RenderConfig, ray: Ray, sampler):
    """Shading-normal visualization (normals.cpp:16-36): |n| as color."""
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    col = jnp.abs(ctx.frame.n)
    env = common.miss_envmap(scene, ray.d, ~ctx.its.valid)
    L = jnp.where(ctx.its.valid[..., None], col, env)
    return L, albedo, normal, sampler


def li_av(scene: SceneData, config: RenderConfig, ray: Ray, sampler):
    """Average visibility / ambient occlusion (av.cpp:18-43)."""
    length = config.iprop("length", 1e30)
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    sampler, u2 = smp.next_2d(sampler)
    d_local = warp.square_to_uniform_hemisphere(u2)
    d_world = common.to_world(ctx, d_local)
    shadow = Ray(
        o=ctx.its.p,
        d=d_world,
        mint=jnp.full_like(ray.mint, EPSILON),
        maxt=jnp.full_like(ray.mint, length),
    )
    blocked = occluded(scene.geometry, shadow)
    vis = jnp.where(ctx.its.valid, jnp.where(blocked, 0.0, 1.0), 1.0)
    return vis[..., None] * jnp.ones((ray.o.shape[0], 3)), albedo, normal, sampler


def _direct_all_lights(scene, config, ray, sampler, add_hit_emitter: bool, abs_cos=True):
    """Shared body of `direct` / `direct_ems`: loop over every light
    (direct.cpp:23-50, direct_ems.cpp:28-57)."""
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    n = ray.o.shape[0]
    L = jnp.zeros((n, 3))
    if add_hit_emitter:
        L = L + jnp.where(
            ctx.its.valid[..., None],
            common.hit_emitter_radiance(scene, ctx, ray.d),
            0.0,
        )
    wo_local = common.to_local(ctx, normalize(ray.o - ctx.its.p))

    for e in range(config.n_emitters):
        sampler, u2 = smp.next_3d(sampler)
        em_id = jnp.full(n, e, jnp.int32)
        contrib, _, _, _ = common.nee(
            scene, ctx, wo_local, em_id, u2, n_lights=1, abs_cos=abs_cos
        )
        L = L + contrib

    env = common.miss_envmap(scene, ray.d, ~ctx.its.valid)
    L = jnp.where(ctx.its.valid[..., None], L, env)
    return L, albedo, normal, sampler


def li_direct(scene, config, ray, sampler):
    return _direct_all_lights(scene, config, ray, sampler, add_hit_emitter=False)


def li_direct_ems(scene, config, ray, sampler):
    return _direct_all_lights(scene, config, ray, sampler, add_hit_emitter=True)


def li_direct_mats(scene, config, ray, sampler):
    """BSDF-sampling direct illumination (direct_mats.cpp)."""
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    n = ray.o.shape[0]
    L = jnp.where(
        ctx.its.valid[..., None], common.hit_emitter_radiance(scene, ctx, ray.d), 0.0
    )
    wo_local = common.to_local(ctx, -normalize(ray.d))
    sampler, u2 = smp.next_2d(sampler)
    bs = bsdf_ops.sample_bsdf(
        scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, ctx.its.uv, u2
    )
    nonzero = jnp.any(jnp.abs(bs.weight) > EPSILON, axis=-1) & ctx.its.valid
    d2 = common.to_world(ctx, bs.wo)
    ray2 = Ray(o=ctx.its.p, d=d2, mint=jnp.full(n, EPSILON), maxt=jnp.full(n, jnp.inf))
    ctx2 = common.trace(scene, ray2)
    hit_em = common.hit_emitter_radiance(scene, ctx2, ray2.d)
    secondary = jnp.where(
        (nonzero & ctx2.its.valid)[..., None],
        hit_em * bs.weight,
        common.miss_envmap(scene, ray2.d, nonzero & (~ctx2.its.valid)) * bs.weight,
    )
    L = L + secondary
    env = common.miss_envmap(scene, ray.d, ~ctx.its.valid)
    L = jnp.where(ctx.its.valid[..., None], L, env)
    return L, albedo, normal, sampler


def li_direct_mis(scene, config, ray, sampler):
    """Balance-heuristic MIS direct illumination (direct_mis.cpp:16-150)."""
    n_lights = max(config.n_emitters, 1)
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    n = ray.o.shape[0]
    L = jnp.where(
        ctx.its.valid[..., None], common.hit_emitter_radiance(scene, ctx, ray.d), 0.0
    )
    wo_local = common.to_local(ctx, -normalize(ray.d))

    # EMS side
    sampler, u1 = smp.next_1d(sampler)
    em_id = common.pick_emitter(scene, u1)
    sampler, u2 = smp.next_3d(sampler)
    ems_contrib, pdf_ems, pdf_mat_at_ems, _ = common.nee(
        scene, ctx, wo_local, em_id, u2, n_lights=n_lights, abs_cos=False
    )
    w_ems = jnp.where(
        pdf_ems + pdf_mat_at_ems > EPSILON,
        pdf_ems / jnp.maximum(pdf_ems + pdf_mat_at_ems, 1e-20),
        0.0,
    )

    # MATS side
    sampler, u2b = smp.next_2d(sampler)
    bs = bsdf_ops.sample_bsdf(
        scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, ctx.its.uv, u2b
    )
    nonzero = jnp.any(jnp.abs(bs.weight) > EPSILON, axis=-1) & ctx.its.valid
    d2 = common.to_world(ctx, bs.wo)
    ray2 = Ray(o=ctx.its.p, d=d2, mint=jnp.full(n, EPSILON), maxt=jnp.full(n, jnp.inf))
    ctx2 = common.trace(scene, ray2)
    hit_is_em = ctx2.its.valid & (ctx2.emitter_id >= 0) & nonzero
    env_miss = nonzero & (~ctx2.its.valid)
    mats_contrib = jnp.where(
        hit_is_em[..., None],
        bs.weight * common.hit_emitter_radiance(scene, ctx2, ray2.d),
        common.miss_envmap(scene, ray2.d, env_miss) * bs.weight,
    )
    # MIS pdfs: env misses weighted like emitter hits against the envmap pdf
    # (deviation from direct_mis.cpp which drops the MATS env term — see
    # ops/emitter.pdf_envmap_direction)
    pdf_mat = jnp.where(hit_is_em | env_miss, bs.pdf, 0.0)
    pdf_ems_at_hit = emitter_ops.pdf_hit_emitter(
        scene, ctx2.emitter_id, ctx.its.p, ctx2.its.p, ctx2.frame.n, normalize(ray2.d)
    ) / float(n_lights)
    pdf_env = emitter_ops.pdf_envmap_direction(scene, ray2.d) / float(n_lights)
    pdf_ems_at_hit = jnp.where(
        hit_is_em, pdf_ems_at_hit, jnp.where(env_miss, pdf_env, 0.0)
    )
    hit_is_em = hit_is_em | env_miss
    w_mat = jnp.where(
        pdf_mat + pdf_ems_at_hit > EPSILON,
        pdf_mat / jnp.maximum(pdf_mat + pdf_ems_at_hit, 1e-20),
        0.0,
    )
    # discrete BSDFs: MATS weight 1 (mirror of path_mis.cpp:135-140)
    w_mat = jnp.where(bs.is_discrete & nonzero, 1.0, w_mat)
    w_ems = jnp.where(bs.is_discrete, 0.0, w_ems)

    L = L + w_ems[..., None] * ems_contrib + w_mat[..., None] * mats_contrib
    env = common.miss_envmap(scene, ray.d, ~ctx.its.valid)
    L = jnp.where(ctx.its.valid[..., None], L, env)
    return L, albedo, normal, sampler


def li_preview(scene, config, ray, sampler):
    """Fast 1-sample preview with AOVs (PreviewIntegrator.cpp:17-60)."""
    n_lights = max(config.n_emitters, 1)
    ctx = common.trace(scene, ray)
    albedo, normal = common.first_hit_aovs(scene, ctx)
    wo_local = common.to_local(ctx, normalize(ray.o - ctx.its.p))
    sampler, u1 = smp.next_1d(sampler)
    em_id = common.pick_emitter(scene, u1)
    sampler, u2 = smp.next_3d(sampler)
    contrib, _, _, _ = common.nee(
        scene, ctx, wo_local, em_id, u2, n_lights=n_lights, abs_cos=True
    )
    no_lights = config.n_emitters == 0
    fallback = jnp.abs(ctx.frame.n)
    L = fallback if no_lights else contrib
    env = common.miss_envmap(scene, ray.d, ~ctx.its.valid)
    L = jnp.where(ctx.its.valid[..., None], L, env)
    return L, albedo, normal, sampler


def li_envmaptester(scene, config, ray, sampler):
    """Debug envmap lookup (EnvMapTester.cpp): evaluate the envmap along d."""
    L = emitter_ops.eval_envmap(scene, normalize(ray.d))
    z = jnp.zeros_like(L)
    return L, z, z, sampler
