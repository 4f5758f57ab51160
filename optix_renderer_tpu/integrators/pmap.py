"""Photon-mapping integrator (src/integrators/photonmapper.cpp Li, :156-267).

Camera rays walk via BSDF sampling until the first isDiffuse surface, where
the recursion terminates with a photon-density estimate; specular chains
(mirror/dielectric/microfacet) keep bouncing under RR. Emitter hits and
envmap misses accumulate along the way, exactly as the reference.

The photon map itself is built once per render by `render.render()`
(the `Integrator::preprocess` analog, render.cpp:272) and carried in
`scene.photons`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optix_renderer_tpu.core.math import EPSILON, Ray, normalize
from optix_renderer_tpu.integrators import common
from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops import photon as photon_ops
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import BsdfType, RenderConfig, SceneData


def li_photonmapper(scene: SceneData, config: RenderConfig, ray: Ray, sampler):
    n = ray.o.shape[0]

    def body(carry, bounce):
        (ro, rd, t, L, active, albedo, normal, s) = carry
        first_seg = bounce == 0
        r = Ray(
            o=ro,
            d=rd,
            mint=jnp.where(first_seg, ray.mint, jnp.full(n, EPSILON)),
            maxt=jnp.where(first_seg, ray.maxt, jnp.full(n, jnp.inf)),
        )
        ctx = common.trace(scene, r)

        # miss → envmap (photonmapper.cpp:170-180)
        env = common.miss_envmap(scene, rd, active & (~ctx.its.valid))
        L = L + t * env
        active = active & ctx.its.valid

        a0, n0 = common.first_hit_aovs(scene, ctx)
        first = bounce == 0
        albedo = jnp.where(first, a0, albedo)
        normal = jnp.where(first, n0, normal)

        # emitter hit (photonmapper.cpp:187-192)
        L = L + jnp.where(
            active[..., None], t * common.hit_emitter_radiance(scene, ctx, rd), 0.0
        )

        # diffuse → photon gather, terminate (photonmapper.cpp:194-236)
        bt = scene.bsdfs.type[jnp.maximum(ctx.bsdf_id, 0)]
        is_diffuse = (bt == BsdfType.DIFFUSE) | (bt == BsdfType.DISNEY)
        gather_here = active & is_diffuse
        wo_local = common.to_local(ctx, -normalize(rd))
        est = photon_ops.estimate_radiance(scene.photons, scene, ctx, wo_local)
        L = L + jnp.where(gather_here[..., None], t * est, 0.0)
        active = active & (~is_diffuse)

        # RR after 3 bounces (photonmapper.cpp:238-252)
        s, u_rr = smp.next_1d(s)
        succ = jnp.minimum(jnp.max(t, axis=-1), 0.99)
        rr_on = bounce >= 3
        die = rr_on & (u_rr > succ) & active
        t = jnp.where(
            (rr_on & active)[..., None], t / jnp.maximum(succ, 1e-12)[..., None], t
        )
        active = active & (~die)

        # continue via BSDF sampling (photonmapper.cpp:254-266)
        s, u2 = smp.next_2d(s)
        bs = bsdf_ops.sample_bsdf(
            scene.bsdfs, scene.textures, ctx.bsdf_id, wo_local, ctx.its.uv, u2
        )
        t = jnp.where(active[..., None], t * bs.weight, t)
        active = active & jnp.any(jnp.abs(t) > 1e-12, axis=-1)
        ro = jnp.where(active[..., None], ctx.its.p, ro)
        rd = jnp.where(active[..., None], common.to_world(ctx, bs.wo), rd)
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
