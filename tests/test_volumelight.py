"""Volume emitters + medium emission (volumelight.cpp, heterogmedium emission).

Validation strategy per SURVEY.md §4: analytic references for the samplers
(uniform-ball/bbox point sampling vs quadrature), and MATS↔MIS estimator
agreement on full renders (the reference's CPU-vs-GPU cross-check pattern).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.ops import emitter as emitter_ops
from optix_renderer_tpu.ops import medium as medium_ops
from optix_renderer_tpu.scene.build import load_scene
from optix_renderer_tpu.scene.data import EmitterType


def _sphere_volumelight_scene(tmp_path, sigma_a=0.5, sigma_s=0.0, radiance=1.0):
    """The reference's volumelight-test scene shape: emissive homog ball over
    a diffuse plane (scenes/project/volume-emission/volumelight-test-mis.xml)."""
    xml = f"""
<scene>
  <integrator type="path_vol_mis"/>
  <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
  <camera type="perspective">
    <float name="fov" value="35"/>
    <transform name="toWorld"><lookat target="0,0,0" origin="0,-4,2" up="0,0,1"/></transform>
    <integer name="width" value="48"/><integer name="height" value="48"/>
  </camera>
  <shape type="sphere">
    <point name="center" value="0 0 0.75"/>
    <float name="radius" value="0.5"/>
    <medium type="homog">
      <color name="sigma_a" value="{sigma_a} {sigma_a} {sigma_a}"/>
      <color name="sigma_s" value="{sigma_s} {sigma_s} {sigma_s}"/>
      <emitter type="volumelight">
        <color name="radiance" value="{radiance} {radiance} {radiance}"/>
      </emitter>
    </medium>
  </shape>
  <shape type="obj">
    <string name="filename" value="plane.obj"/>
    <bsdf type="diffuse"><color name="albedo" value="1 1 1"/></bsdf>
  </shape>
</scene>
"""
    (tmp_path / "plane.obj").write_text(
        "v -3 -3 0\nv 3 -3 0\nv 3 3 0\nv -3 3 0\nf 1 2 3\nf 1 3 4\n"
    )
    f = tmp_path / "scene.xml"
    f.write_text(xml)
    return load_scene(f)


@pytest.fixture(scope="module")
def vol_scene(tmp_path_factory):
    return _sphere_volumelight_scene(tmp_path_factory.mktemp("vollight"))


def test_build_volume_emitter_tables(vol_scene):
    scene, config, _ = vol_scene
    types = np.asarray(scene.emitters.type)
    (vi,) = np.nonzero(types == EmitterType.VOLUME)
    assert len(vi) == 1
    v = float(scene.emitters.volume[vi[0]])
    assert np.isclose(v, 4.0 / 3.0 * np.pi * 0.5**3, rtol=1e-5)
    # the medium carries the emitter attachment (medium.h:44)
    assert int(scene.media.emitter[0]) == vi[0] or any(
        int(e) == vi[0] for e in np.asarray(scene.media.emitter)
    )


def test_sample_volume_emitter_ball(vol_scene):
    """Sampled points uniform in the ball; pdf = dist²/V; eval = radiance."""
    scene, config, _ = vol_scene
    types = np.asarray(scene.emitters.type)
    (vi,) = np.nonzero(types == EmitterType.VOLUME)
    n = 20000
    rng = np.random.default_rng(3)
    u3 = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    em_id = jnp.full(n, int(vi[0]), jnp.int32)
    ref = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 2.0]), (n, 3))
    es = emitter_ops.sample_emitter(scene, em_id, ref, u3)
    p = np.asarray(es.p)
    c = np.array([0.0, 0.0, 0.75])
    r = np.linalg.norm(p - c, axis=-1)
    assert r.max() <= 0.5 + 1e-5
    # radial CDF of uniform ball: P(r<x) = (x/R)³
    for frac, q in [(0.5, 0.125), (0.7937, 0.5)]:
        assert abs((r < 0.5 * frac).mean() - q) < 0.02
    # solid-angle pdf = dist²/V
    V = 4.0 / 3.0 * np.pi * 0.5**3
    d2 = ((p - np.asarray(ref)) ** 2).sum(-1)
    assert np.allclose(np.asarray(es.pdf), d2 / V, rtol=1e-4)
    # value = radiance / pdf
    assert np.allclose(
        np.asarray(es.value), (1.0 / (d2 / V))[:, None], rtol=1e-4
    )


def test_volume_nee_matches_quadrature(vol_scene):
    """E[ε/p(y)] = ∫_V ε/|x−y|² dV — EMS estimate vs dense grid quadrature
    (vacuum transport: geometry term only)."""
    scene, config, _ = vol_scene
    types = np.asarray(scene.emitters.type)
    (vi,) = np.nonzero(types == EmitterType.VOLUME)
    x = np.array([0.0, -2.0, 0.75])
    n = 200_000
    rng = np.random.default_rng(11)
    u3 = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    em_id = jnp.full(n, int(vi[0]), jnp.int32)
    ref = jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n, 3))
    es = emitter_ops.sample_emitter(scene, em_id, ref, u3)
    est = float(np.asarray(es.value)[:, 0].mean())

    # quadrature over the ball
    g = np.linspace(-0.5, 0.5, 64)
    dz, dy, dx = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([dx, dy, dz], -1).reshape(-1, 3) + np.array([0, 0, 0.75])
    inside = ((pts - [0, 0, 0.75]) ** 2).sum(-1) <= 0.25
    dV = (g[1] - g[0]) ** 3
    quad = (1.0 / ((pts[inside] - x) ** 2).sum(-1)).sum() * dV
    assert abs(est - quad) / quad < 0.02, (est, quad)


def _mean_image(scene, config, integrator, spp=32):
    from optix_renderer_tpu.render.render import render

    cfg = dataclasses.replace(
        config, integrator=integrator, sample_count=spp, width=40, height=40
    )
    out = render(scene, cfg, verbose=False)
    return np.asarray(out["composite"])


def test_volumelight_mats_vs_mis(vol_scene):
    """The two estimators must agree in the mean (reference CPU↔GPU pattern);
    also asserts the light actually illuminates the scene."""
    scene, config, _ = vol_scene
    img_mats = _mean_image(scene, config, "path_vol_mats")
    img_mis = _mean_image(scene, config, "path_vol_mis")
    assert img_mats.mean() > 1e-3  # emissive ball is visible
    assert img_mis.mean() > 1e-3
    assert abs(img_mats.mean() - img_mis.mean()) / img_mis.mean() < 0.1, (
        img_mats.mean(),
        img_mis.mean(),
    )


def test_emissive_ball_direct_view_analytic(tmp_path):
    """A pure-absorption emissive ball seen head-on: radiance along a central
    ray is ∫₀ᴸ e^{−σa t}·ε dt = ε(1−e^{−σa L})/σa with L = 2R."""
    scene, config, _ = _sphere_volumelight_scene(
        tmp_path, sigma_a=2.0, sigma_s=0.0, radiance=3.0
    )
    import dataclasses as dc

    from optix_renderer_tpu.core.math import Ray
    from optix_renderer_tpu.integrators.volpath import li_vol
    from optix_renderer_tpu.render import sampler as smp

    n = 4096
    o = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 0.75]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    ray = Ray(o=o, d=d, mint=jnp.zeros(n), maxt=jnp.full(n, jnp.inf))
    s = smp.make_sampler(jnp.arange(n), jnp.zeros(n, jnp.int32))
    cfg = dc.replace(config, max_depth=8)
    L, _, _, _ = li_vol(scene, cfg, ray, s, use_mis=False)
    got = float(np.asarray(L)[:, 0].mean())
    sa, eps, length = 2.0, 3.0, 1.0
    expect = eps * (1.0 - np.exp(-sa * length)) / sa
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_temperature_emission_analytic(tmp_path):
    """Heterog slab, constant density+temperature: central-ray radiance is
    ε(1−e^{−σt L})/σt with ε = σa·ρ·ramp(T)·scale (ops/medium.py
    event_emission; heterogmedium.cpp:37-44 ramp)."""
    import dataclasses as dc

    from optix_renderer_tpu.core.math import Ray
    from optix_renderer_tpu.integrators.volpath import li_vol
    from optix_renderer_tpu.render import sampler as smp

    temp_val, temp_scale, sa = 0.8, 5.0, 1.0
    # fine grid: trilinear interpolation ramps to 0 over a half-voxel at the
    # volume faces, so a coarse grid under-integrates the ideal slab
    np.savez(
        tmp_path / "vol.npz",
        density=np.ones((64, 64, 64), np.float32),
        temperature=np.full((64, 64, 64), temp_val, np.float32),
        bbox_min=np.array([-0.5, -0.5, -0.5], np.float32),
        bbox_max=np.array([0.5, 0.5, 0.5], np.float32),
    )
    (tmp_path / "cube.obj").write_text(_CUBE_OBJ)
    xml = f"""
<scene>
  <integrator type="path_vol_mats"/>
  <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
  <camera type="perspective">
    <float name="fov" value="35"/>
    <transform name="toWorld"><lookat target="0,0,0" origin="0,-3,0" up="0,0,1"/></transform>
    <integer name="width" value="32"/><integer name="height" value="32"/>
  </camera>
  <shape type="obj">
    <string name="filename" value="cube.obj"/>
    <medium type="heterog">
      <color name="sigma_a" value="{sa} {sa} {sa}"/>
      <color name="sigma_s" value="0 0 0"/>
      <float name="temperatureScale" value="{temp_scale}"/>
      <volume type="volume"><string name="filename" value="vol.npz"/></volume>
    </medium>
  </shape>
</scene>
"""
    f = tmp_path / "scene.xml"
    f.write_text(xml)
    scene, config, _ = load_scene(f)

    n = 4096
    o = jnp.broadcast_to(jnp.asarray([0.0, -3.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    ray = Ray(o=o, d=d, mint=jnp.zeros(n), maxt=jnp.full(n, jnp.inf))
    s = smp.make_sampler(jnp.arange(n), jnp.zeros(n, jnp.int32))
    L, _, _, _ = li_vol(scene, dc.replace(config, max_depth=6), ray, s, use_mis=False)
    got = np.asarray(L).mean(axis=0)
    # ramp: (v³, v⁶, v¹²)·scale; ε_c = σa·ρ·ramp_c; σt = σa·ρ
    ramp = np.array([temp_val**3, temp_val**6, temp_val**12]) * temp_scale
    eps = sa * 1.0 * ramp
    expect = eps * (1.0 - np.exp(-sa * 1.0)) / sa
    assert np.allclose(got, expect, rtol=0.06), (got, expect)


_CUBE_OBJ = (
    "v -0.5 -0.5 -0.5\nv 0.5 -0.5 -0.5\nv 0.5 0.5 -0.5\nv -0.5 0.5 -0.5\n"
    "v -0.5 -0.5 0.5\nv 0.5 -0.5 0.5\nv 0.5 0.5 0.5\nv -0.5 0.5 0.5\n"
    "f 1 3 2\nf 1 4 3\nf 5 6 7\nf 5 7 8\nf 1 6 5\nf 1 2 6\n"
    "f 2 7 6\nf 2 3 7\nf 3 8 7\nf 3 4 8\nf 4 5 8\nf 4 1 5\n"
)
