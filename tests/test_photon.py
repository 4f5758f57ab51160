"""Photon mapper: hash-grid gather correctness + end-to-end consistency.

1. The hash-grid radiance estimate must equal a brute-force sum over all
   photons within the radius (the kd-tree search contract, kdtree.h:124).
2. A photonmapper render of the Cornell box must agree with the unbiased
   path tracer in overall brightness (the reference validates pmap against
   path_mats goldens on cbox scenes, scenes/pa4/cbox/cbox_pmap.xml).
"""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core.math import make_frame
from optix_renderer_tpu.ops import photon as ph
from optix_renderer_tpu.ops.intersect import Interaction
from optix_renderer_tpu.integrators.common import ShadingCtx
from optix_renderer_tpu.scene.presets import make_cornell_box


def _diffuse_ctx(scene, points):
    """Shading contexts on a z-up diffuse surface at given points."""
    n = len(points)
    nrm = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    its = Interaction(
        valid=jnp.ones(n, bool),
        t=jnp.ones(n),
        p=jnp.asarray(points, jnp.float32),
        n_s=nrm,
        n_g=nrm,
        uv=jnp.zeros((n, 2)),
        tang=jnp.zeros((n, 3)),
        shape=jnp.zeros(n, jnp.int32),
        prim_kind=jnp.ones(n, jnp.int32),
        prim_id=jnp.zeros(n, jnp.int32),
    )
    return ShadingCtx(
        its=its,
        frame=make_frame(nrm),
        bsdf_id=jnp.zeros(n, jnp.int32),  # cornell bsdf 0 is diffuse
        emitter_id=jnp.full(n, -1, jnp.int32),
    )


def test_gather_matches_bruteforce():
    scene, config, _ = make_cornell_box(width=8, height=8, spp=1)
    rng = np.random.default_rng(5)
    n_ph = 500
    pos = rng.uniform(-1, 1, (n_ph, 3)).astype(np.float32)
    # photons arriving from the upper hemisphere
    d = rng.normal(size=(n_ph, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    power = rng.uniform(0, 2, (n_ph, 3)).astype(np.float32)
    radius = 0.3
    emitted = 1000
    pm = ph.make_photon_map(pos, d, power, radius, emitted)

    q = rng.uniform(-0.8, 0.8, (32, 3)).astype(np.float32)
    ctx = _diffuse_ctx(scene, q)
    wo = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (32, 1))
    est = np.asarray(ph.estimate_radiance(pm, scene, ctx, wo))

    # brute force: Lambertian f = albedo/pi when photon dir is above surface
    from optix_renderer_tpu.ops.bsdf import eval_bsdf

    ref = np.zeros((32, 3), np.float32)
    for i in range(32):
        d2 = np.sum((pos - q[i]) ** 2, axis=-1)
        sel = d2 < radius * radius
        if not np.any(sel):
            continue
        wi_local = np.asarray(d[sel])  # frame is z-up world → local == world
        f = np.asarray(
            eval_bsdf(
                scene.bsdfs,
                scene.textures,
                jnp.zeros(int(sel.sum()), jnp.int32),
                jnp.tile(jnp.array([0.0, 0.0, 1.0]), (int(sel.sum()), 1)),
                jnp.asarray(wi_local),
                jnp.zeros((int(sel.sum()), 2)),
            )
        )
        ref[i] = (power[sel] * f).sum(0) / (np.pi * radius * radius * emitted)

    np.testing.assert_allclose(est, ref, rtol=2e-4, atol=1e-6)


def test_photonmapper_render_matches_path_tracer():
    scene, config, _ = make_cornell_box(width=48, height=48, spp=8)
    import dataclasses
    from optix_renderer_tpu.render.render import render

    cfg_pm = dataclasses.replace(
        config,
        integrator="photonmapper",
        max_depth=8,
        iprops=(("photonCount", 20000), ("photonRadius", 0.12)),
    )
    cfg_pt = dataclasses.replace(config, integrator="path_mats", max_depth=8)

    out_pm = render(scene, cfg_pm, sample_count=4)
    out_pt = render(scene, cfg_pt, sample_count=32)

    m_pm = float(out_pm["composite"].mean())
    m_pt = float(out_pt["composite"].mean())
    assert m_pm > 0.0
    # density estimation is biased but must land in the right ballpark
    assert abs(m_pm - m_pt) / m_pt < 0.25, (m_pm, m_pt)
