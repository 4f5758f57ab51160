"""Shared integrator machinery: shading context, NEE, MIS helpers.

Factors the per-hit setup every reference integrator repeats (gather shape →
BSDF/emitter, build shading frame, `its.toLocal/toWorld`) into batched helpers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from optix_renderer_tpu.core.math import (
    EPSILON,
    Frame,
    Ray,
    dot,
    frame_to_local,
    frame_to_world,
    make_frame,
    normalize,
)
from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops import emitter as emitter_ops
from optix_renderer_tpu.ops.intersect import Interaction, intersect, make_interaction, occluded
from optix_renderer_tpu.ops.texture import eval_texture
from optix_renderer_tpu.core import dpdf as dpdf_mod
from optix_renderer_tpu.scene.data import RenderConfig, SceneData


class ShadingCtx(NamedTuple):
    """Per-lane hit context (the reference `Intersection` + plugin lookups)."""

    its: Interaction
    frame: Frame  # shading frame (normal-mapped when a normal map is attached)
    bsdf_id: jnp.ndarray  # [N]
    emitter_id: jnp.ndarray  # [N] (-1 none)


def trace(scene: SceneData, ray: Ray) -> ShadingCtx:
    """Closest-hit + shading setup; invalid lanes get id 0 / emitter -1."""
    hit = intersect(scene.geometry, ray)
    its = make_interaction(scene.geometry, ray, hit)
    sid = jnp.maximum(its.shape, 0)
    bsdf_id = jnp.where(its.valid, scene.shapes.bsdf[sid], 0)
    emitter_id = jnp.where(its.valid, scene.shapes.emitter[sid], -1)

    n = its.n_s
    # tangent-space normal mapping (mesh.cpp:141-186): perturb n_s by the
    # texture normal in a UV-aligned TBN so tangent-space maps keep their
    # authored orientation; triangles with a degenerate UV chart (and spheres)
    # fall back to the Duff ONB.
    ntex = scene.shapes.normal_tex[sid]
    has_nm = ntex >= 0
    fallback = make_frame(n)
    tang3 = its.tang[..., :3]
    t_proj = tang3 - n * dot(n, tang3)[..., None]
    has_tbn = jnp.sum(t_proj * t_proj, axis=-1) > 1e-12
    t_hat = normalize(jnp.where(has_tbn[..., None], t_proj, fallback.s))
    # bitangent carries the UV handedness sign (tang.w, build.py) so mirrored
    # UV charts don't flip the normal map's green channel (mesh.cpp:176-185)
    b_hat = its.tang[..., 3:4] * jnp.cross(n, t_hat)
    tbn = Frame(
        s=jnp.where(has_tbn[..., None], t_hat, fallback.s),
        t=jnp.where(has_tbn[..., None], b_hat, fallback.t),
        n=n,
    )
    tex_n = eval_texture(scene.textures, ntex, its.uv) * 2.0 - 1.0
    pert = normalize(frame_to_world(tbn, tex_n))
    n2 = jnp.where((has_nm & its.valid)[..., None], pert, n)
    frame = make_frame(normalize(n2))

    return ShadingCtx(its=its, frame=frame, bsdf_id=bsdf_id, emitter_id=emitter_id)


def to_local(ctx: ShadingCtx, v: jnp.ndarray) -> jnp.ndarray:
    return frame_to_local(ctx.frame, v)


def to_world(ctx: ShadingCtx, v: jnp.ndarray) -> jnp.ndarray:
    return frame_to_world(ctx.frame, v)


def hit_emitter_radiance(scene: SceneData, ctx: ShadingCtx, ray_d: jnp.ndarray):
    """`shape->getEmitter()->eval(...)` when a path hits an emissive surface."""
    return emitter_ops.eval_hit_emitter(
        scene, ctx.emitter_id, normalize(ray_d), ctx.frame.n
    )


def pick_emitter(scene: SceneData, u1: jnp.ndarray) -> jnp.ndarray:
    """scene->getRandomEmitter (scene.cpp getRandomEmitter via lightProb DPDF)."""
    return dpdf_mod.sample(scene.emitter_pick, u1)


def nee(
    scene: SceneData,
    ctx: ShadingCtx,
    wo_local: jnp.ndarray,
    em_id: jnp.ndarray,
    u3: jnp.ndarray,
    n_lights: int,
    abs_cos: bool = False,
):
    """One next-event-estimation try against emitter `em_id` (u3: [N,3]).

    Returns (contrib [N,3] already scaled ×n_lights as the reference does,
    pdf_ems [N] divided by n_lights, pdf_mat [N] BSDF pdf toward the light,
    visible [N]). Mirrors path_mis.cpp:74-106.
    """
    es = emitter_ops.sample_emitter(scene, em_id, ctx.its.p, u3)
    wi_local = to_local(ctx, es.wi)
    nonzero = jnp.any(jnp.abs(es.value) > EPSILON, axis=-1)
    shadow_ray = Ray(
        o=ctx.its.p, d=es.wi, mint=jnp.full_like(es.pdf, EPSILON), maxt=es.shadow_maxt
    )
    blocked = occluded(scene.geometry, shadow_ray)
    visible = nonzero & (~blocked) & ctx.its.valid

    f = bsdf_ops.eval_bsdf(
        scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, wi_local, ctx.its.uv
    )
    cos = dot(es.wi, ctx.frame.n)
    if abs_cos:
        cos = jnp.abs(cos)
    contrib = es.value * cos[..., None] * f * float(n_lights)
    contrib = jnp.where(visible[..., None], contrib, 0.0)
    pdf_mat = bsdf_ops.pdf_bsdf(
        scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, wi_local, ctx.its.uv
    )
    pdf_mat = jnp.where(visible, pdf_mat, 0.0)
    pdf_ems = jnp.where(visible, es.pdf / float(n_lights), 0.0)
    return contrib, pdf_ems, pdf_mat, visible


def first_hit_aovs(scene: SceneData, ctx: ShadingCtx):
    """Albedo + shading-normal feature buffers (integrator.h:29-39, fed to the
    denoiser like the reference's 3-buffer interface)."""
    albedo = eval_texture(
        scene.textures, scene.bsdfs.albedo_tex[jnp.maximum(ctx.bsdf_id, 0)], ctx.its.uv
    )
    albedo = jnp.where(ctx.its.valid[..., None], albedo, 0.0)
    normal = jnp.where(ctx.its.valid[..., None], ctx.frame.n, 0.0)
    return albedo, normal


def miss_envmap(scene: SceneData, ray_d: jnp.ndarray, active: jnp.ndarray):
    """Environment contribution for escaped rays."""
    env = emitter_ops.eval_envmap(scene, ray_d)
    return jnp.where(active[..., None], env, 0.0)
