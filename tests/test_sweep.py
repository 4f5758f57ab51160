"""Correctness-sweep regression tests (round-2 VERDICT items W2/W3/W4/M7):

- camera near/far clip propagates into the first path segment
  (perspective.cpp:10-31);
- UV-aligned TBN for tangent-space normal maps (mesh.cpp:176-185);
- shadow-ray transmittance survives > 4 medium-boundary crossings
  (path_vol_mis.cpp:26-46 traceShadowray);
- photon emission from envmap / volume emitters
  (environmentmap.cpp:133-145; volumelight extension).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.core import transform as tf
from optix_renderer_tpu.render.render import render
from optix_renderer_tpu.scene.build import build_scene
from optix_renderer_tpu.scene.parser import SceneNode


def _furnace_scene(albedo=0.75, far_clip=None, near_clip=None, integrator="path_mats"):
    root = SceneNode(tag="scene", type="scene")
    root.children.append(SceneNode(tag="integrator", type=integrator))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", 16)
    cam.props.set("height", 16)
    cam.props.set("fov", 30.0)
    cam.props.set("toWorld", tf.lookat([0, 0, 4], [0, 0, 0], [0, 1, 0]))
    if far_clip is not None:
        cam.props.set("farClip", float(far_clip))
    if near_clip is not None:
        cam.props.set("nearClip", float(near_clip))
    root.children.append(cam)
    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", 16)
    root.children.append(samp)
    sh = SceneNode(tag="shape", type="sphere")
    sh.props.set("center", np.zeros(3, np.float32))
    sh.props.set("radius", 1.0)
    b = SceneNode(tag="bsdf", type="diffuse")
    b.props.set("albedo", np.full(3, albedo, np.float32))
    sh.children.append(b)
    root.children.append(sh)
    em = SceneNode(tag="emitter", type="envmap")
    em.props.set("radiance", np.ones(3, np.float32))
    root.children.append(em)
    return build_scene(root)


def test_far_clip_culls_first_segment():
    """Camera at z=4, unit sphere at origin (front surface at distance 3):
    farClip=2 must miss the sphere on the primary segment → env everywhere."""
    scene, config, _ = _furnace_scene()
    out = render(scene, dataclasses.replace(config, max_depth=4), sample_count=8)
    center = out["composite"][8, 8].mean()
    # convex diffuse sphere in constant env: one bounce → a·L
    assert abs(center - 0.75) < 0.05, center

    scene2, config2, _ = _furnace_scene(far_clip=2.0)
    out2 = render(scene2, dataclasses.replace(config2, max_depth=4), sample_count=8)
    np.testing.assert_allclose(out2["composite"][8, 8], 1.0, atol=1e-3)


def test_near_clip_culls_first_segment():
    """nearClip=5.5 puts the whole sphere (distance ∈ [3,5]) inside the near
    plane → env everywhere."""
    scene, config, _ = _furnace_scene(near_clip=5.5)
    out = render(scene, dataclasses.replace(config, max_depth=4), sample_count=8)
    np.testing.assert_allclose(out["composite"][8, 8], 1.0, atol=1e-3)


# ---------------------------------------------------------------------------


def _normal_mapped_quad(tmp_path, u_axis):
    """Floor quad in the xy-plane (normal +z) with u running along `u_axis`
    ('x' or 'y') and a constant normal map tilting the normal toward +u."""
    # tangent-space normal (0.6, 0, 0.8): 0.6 along dp/du, 0.8 along n
    enc = (np.array([0.6, 0.0, 0.8], np.float32) + 1.0) * 0.5
    verts = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
    if u_axis == "x":
        uvs = [(0, 0), (1, 0), (1, 1), (0, 1)]
    else:  # u runs along world +y
        uvs = [(0, 0), (0, 1), (1, 1), (1, 0)]
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in verts]
    lines += [f"vt {u} {v}" for u, v in uvs]
    lines += ["f 1/1 2/2 3/3 4/4"]
    (tmp_path / "quad.obj").write_text("\n".join(lines) + "\n")

    root = SceneNode(tag="scene", type="scene", origin=str(tmp_path))
    root.children.append(SceneNode(tag="integrator", type="normals"))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", 8)
    cam.props.set("height", 8)
    cam.props.set("fov", 30.0)
    cam.props.set("toWorld", tf.lookat([0, 0, 3], [0, 0, 0], [0, 1, 0]))
    root.children.append(cam)
    sh = SceneNode(tag="shape", type="obj", origin=str(tmp_path))
    sh.props.set("filename", "quad.obj")
    sh.children.append(SceneNode(tag="bsdf", type="diffuse"))
    nm = SceneNode(tag="texture", type="constant_color", name="normal")
    nm.props.set("value", enc)
    sh.children.append(nm)
    root.children.append(sh)
    return build_scene(root)


@pytest.mark.parametrize("u_axis,expect", [("x", [0.6, 0.0, 0.8]),
                                           ("y", [0.0, 0.6, 0.8])])
def test_normal_map_uses_uv_tangent(tmp_path, u_axis, expect):
    """The perturbed shading normal must follow the authored UV chart — the
    tangent is dp/du (mesh.cpp:176-185), not an arbitrary ONB axis."""
    from optix_renderer_tpu.core.math import Ray
    from optix_renderer_tpu.integrators import common

    scene, config, _ = _normal_mapped_quad(tmp_path, u_axis)
    n = 4
    ray = Ray(
        o=jnp.tile(jnp.array([0.3, 0.2, 3.0]), (n, 1)),
        d=jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1)),
        mint=jnp.full(n, 1e-4),
        maxt=jnp.full(n, jnp.inf),
    )
    ctx = common.trace(scene, ray)
    assert bool(ctx.its.valid[0])
    np.testing.assert_allclose(np.asarray(ctx.frame.n[0]), expect, atol=1e-4)


def test_uv_tangents_precomputed(tmp_path):
    """tri_tang is dp/du of the UV chart, shared by both quad triangles."""
    scene, _, _ = _normal_mapped_quad(tmp_path, "x")
    tang = np.asarray(scene.geometry.tri_tang)
    assert tang.shape == (2, 4)
    d = tang[:, :3] / np.linalg.norm(tang[:, :3], axis=-1, keepdims=True)
    np.testing.assert_allclose(d, [[1, 0, 0], [1, 0, 0]], atol=1e-5)
    # handedness sign is +-1 for a valid UV chart
    assert set(np.abs(tang[:, 3]).tolist()) == {1.0}


# ---------------------------------------------------------------------------


def _nested_boundaries_scene(n_spheres, blocker=False, shadow_segments=None):
    """Diffuse floor point lit by a point light above, behind `n_spheres`
    concentric transparent (σ=0 homog) pass-through boundaries, optionally
    with an opaque blocker between the outermost boundary and the light."""
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp(prefix="optix_tpu_sweep_"))
    verts = [(-3, 0, -3), (-3, 0, 3), (3, 0, 3), (3, 0, -3)]
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in verts] + ["f 1 2 3 4"]
    (tmp / "floor.obj").write_text("\n".join(lines) + "\n")
    # small blocker quad at y=1 directly over the origin (misses camera rays)
    bverts = [(-0.3, 1, -0.3), (-0.3, 1, 0.3), (0.3, 1, 0.3), (0.3, 1, -0.3)]
    blines = [f"v {v[0]} {v[1]} {v[2]}" for v in bverts] + ["f 1 2 3 4"]
    (tmp / "blocker.obj").write_text("\n".join(blines) + "\n")

    root = SceneNode(tag="scene", type="scene", origin=str(tmp))
    integ = SceneNode(tag="integrator", type="path_vol_mis")
    if shadow_segments is not None:
        integ.props.set("shadowSegments", int(shadow_segments))
    root.children.append(integ)
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", 8)
    cam.props.set("height", 8)
    cam.props.set("fov", 25.0)
    cam.props.set("toWorld", tf.lookat([0, 2.0, 2.5], [0, 0, 0], [0, 1, 0]))
    root.children.append(cam)
    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", 32)
    root.children.append(samp)

    for fname in ["floor.obj"] + (["blocker.obj"] if blocker else []):
        fl = SceneNode(tag="shape", type="obj", origin=str(tmp))
        fl.props.set("filename", fname)
        b = SceneNode(tag="bsdf", type="diffuse")
        b.props.set("albedo", np.full(3, 0.8, np.float32))
        fl.children.append(b)
        root.children.append(fl)

    for i in range(n_spheres):
        sh = SceneNode(tag="shape", type="sphere")
        sh.props.set("center", np.zeros(3, np.float32))
        sh.props.set("radius", 0.1 + 0.08 * i)
        med = SceneNode(tag="medium", type="homog")
        med.props.set("sigma_a", np.zeros(3, np.float32))
        med.props.set("sigma_s", np.zeros(3, np.float32))
        sh.children.append(med)
        root.children.append(sh)

    em = SceneNode(tag="emitter", type="point")
    em.props.set("position", np.array([0, 1.8, 0], np.float32))
    em.props.set("power", np.full(3, 40.0, np.float32))
    root.children.append(em)
    return build_scene(root)


def test_shadow_segments_deep_nesting():
    """Shadow rays must keep stepping through >4 transparent boundaries:
    (a) 6 boundaries, no blocker → same direct light as the open scene;
    (b) 6 boundaries + blocker behind them → dark (occluder found at the
        7th segment); with a bound of 3 the occluder is missed → light leak.
    Reference: unbounded traceShadowray loop (path_vol_mis.cpp:26-46)."""
    depth = 10  # camera path itself crosses the 6 pass-through boundaries

    open_scene, open_cfg, _ = _nested_boundaries_scene(0)
    lit = render(open_scene, dataclasses.replace(open_cfg, max_depth=depth),
                 sample_count=32)
    lit0 = float(lit["composite"][4, 4].mean())
    assert lit0 > 0.05  # the floor is actually lit

    # (a) transparent boundaries are invisible to the shadow ray
    sc, cfg, _ = _nested_boundaries_scene(6)
    assert cfg.shadow_segments == 8
    out = render(sc, dataclasses.replace(cfg, max_depth=depth), sample_count=32)
    np.testing.assert_allclose(out["composite"][4, 4], lit["composite"][4, 4],
                               rtol=0.15)

    # (b) occluder behind 6 boundaries: found with the default bound …
    scb, cfgb, _ = _nested_boundaries_scene(6, blocker=True)
    outb = render(scb, dataclasses.replace(cfgb, max_depth=depth), sample_count=32)
    assert float(outb["composite"][4, 4].mean()) < 0.3 * lit0

    # … and leaked with a bound of 3
    sc3, cfg3, _ = _nested_boundaries_scene(6, blocker=True, shadow_segments=3)
    assert cfg3.shadow_segments == 3
    out3 = render(sc3, dataclasses.replace(cfg3, max_depth=depth), sample_count=32)
    assert float(out3["composite"][4, 4].mean()) > 0.5 * lit0


# ---------------------------------------------------------------------------


def test_envmap_photon_emission():
    """Constant envmap (uniform-sphere fallback): every photon carries
    W = L·πR²/(1/4π) = 4π²R²·L and flies inward from outside the scene."""
    from optix_renderer_tpu.ops.photon import _scene_bounding_sphere, sample_photon

    scene, config, _ = _furnace_scene()
    n = 64
    em_id = jnp.full(n, int(scene.envmap_emitter), jnp.int32)
    rng = np.random.default_rng(0)
    u2a = jnp.asarray(rng.random((n, 2), np.float32))
    u2b = jnp.asarray(rng.random((n, 2), np.float32))
    u1 = jnp.asarray(rng.random(n, np.float32))
    ro, rd, W = sample_photon(scene, em_id, u2a, u2b, u1)
    c, r = _scene_bounding_sphere(scene)
    expected = 4.0 * np.pi**2 * float(r) ** 2  # L = 1
    np.testing.assert_allclose(np.asarray(W), expected, rtol=1e-4)
    # origins outside the bounding sphere, directions pointing inward
    dist = np.linalg.norm(np.asarray(ro - c), axis=-1)
    assert (dist >= float(r) - 1e-3).all()
    inward = np.sum(np.asarray(rd) * np.asarray(c - ro), axis=-1)
    assert (inward > 0).all()


def test_volume_photon_emission():
    """Volume emitter photons: W = 4π·V·radiance, origin inside the shape."""
    from optix_renderer_tpu.ops.photon import sample_photon

    root = SceneNode(tag="scene", type="scene")
    root.children.append(SceneNode(tag="integrator", type="path_vol_mis"))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", 8)
    cam.props.set("height", 8)
    cam.props.set("toWorld", tf.lookat([0, 0, 4], [0, 0, 0], [0, 1, 0]))
    root.children.append(cam)
    sh = SceneNode(tag="shape", type="sphere")
    sh.props.set("center", np.zeros(3, np.float32))
    sh.props.set("radius", 0.5)
    med = SceneNode(tag="medium", type="homog")
    med.props.set("sigma_a", np.full(3, 0.1, np.float32))
    med.props.set("sigma_s", np.zeros(3, np.float32))
    emv = SceneNode(tag="emitter", type="volumelight")
    emv.props.set("radiance", np.full(3, 2.0, np.float32))
    med.children.append(emv)
    sh.children.append(med)
    root.children.append(sh)
    scene, config, _ = build_scene(root)

    n = 64
    em_id = jnp.zeros(n, jnp.int32)
    rng = np.random.default_rng(1)
    ro, rd, W = sample_photon(
        scene,
        em_id,
        jnp.asarray(rng.random((n, 2), np.float32)),
        jnp.asarray(rng.random((n, 2), np.float32)),
        jnp.asarray(rng.random(n, np.float32)),
    )
    vol = float(scene.emitters.volume[0])
    assert vol > 0
    np.testing.assert_allclose(np.asarray(W), 4.0 * np.pi * vol * 2.0, rtol=1e-4)
    assert (np.linalg.norm(np.asarray(ro), axis=-1) <= 0.5 + 1e-4).all()
