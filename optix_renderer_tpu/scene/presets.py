"""Procedural test scenes built through the public scene API.

Self-contained counterparts of the reference's golden scene suite (scenes/):
a Cornell-box-style interior with mirror + glass spheres and an area light,
a furnace sphere, etc. Geometry is constructed programmatically (our own
coordinates), so benchmarks and the graft entry point need no external files.
"""

from __future__ import annotations

import numpy as np
from pathlib import Path

from optix_renderer_tpu.scene.build import build_scene
from optix_renderer_tpu.scene.parser import SceneNode, load_from_string


def _quad_obj(tmpdir, name, verts):
    """Write a one-quad OBJ (two triangles) to tmpdir; returns filename."""
    p = tmpdir / f"{name}.obj"
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in verts]
    lines += ["f 1 2 3 4"]
    p.write_text("\n".join(lines) + "\n")
    return p.name


def make_cornell_box(
    width: int = 800,
    height: int = 600,
    spp: int = 32,
    integrator: str = "path_mis",
):
    """Build a Cornell-box scene directly as a SceneNode tree.

    Interior box [-1,1]³-ish with red/green side walls, two spheres
    (mirror + dielectric) and a rectangular area light in the ceiling.
    """
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp(prefix="optix_tpu_scene_"))

    # box walls: floor, ceiling, back, left, right (inward-facing windings)
    quads = {
        "floor": [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)],
        "ceiling": [(-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)],
        "back": [(-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)],
        "left": [(-1, 0, -1), (-1, 2, -1), (-1, 2, 1), (-1, 0, 1)],
        "right": [(1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)],
        "light": [(-0.4, 1.99, -0.4), (0.4, 1.99, -0.4), (0.4, 1.99, 0.4), (-0.4, 1.99, 0.4)],
    }
    albedo = {
        "floor": (0.725, 0.71, 0.68),
        "ceiling": (0.725, 0.71, 0.68),
        "back": (0.725, 0.71, 0.68),
        "left": (0.63, 0.065, 0.05),
        "right": (0.14, 0.45, 0.091),
        "light": (0.8, 0.8, 0.8),
    }

    root = SceneNode(tag="scene", type="scene", origin=str(tmp))
    root.children.append(SceneNode(tag="integrator", type=integrator))

    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", width)
    cam.props.set("height", height)
    cam.props.set("fov", 40.0)
    # lookat from +z into the box
    from optix_renderer_tpu.core import transform as tf

    cam.props.set("toWorld", tf.lookat([0, 1.0, 4.3], [0, 1.0, 0], [0, 1, 0]))
    root.children.append(cam)

    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", spp)
    root.children.append(samp)

    for name, verts in quads.items():
        fname = _quad_obj(tmp, name, verts)
        sh = SceneNode(tag="shape", type="obj", origin=str(tmp))
        sh.props.set("filename", fname)
        b = SceneNode(tag="bsdf", type="diffuse")
        b.props.set("albedo", np.array(albedo[name], np.float32))
        sh.children.append(b)
        if name == "light":
            em = SceneNode(tag="emitter", type="area")
            em.props.set("radiance", np.array([17.0, 12.0, 8.0], np.float32))
            sh.children.append(em)
        root.children.append(sh)

    # mirror + glass spheres
    s1 = SceneNode(tag="shape", type="sphere")
    s1.props.set("center", np.array([-0.45, 0.35, -0.35], np.float32))
    s1.props.set("radius", 0.35)
    s1.children.append(SceneNode(tag="bsdf", type="mirror"))
    root.children.append(s1)

    s2 = SceneNode(tag="shape", type="sphere")
    s2.props.set("center", np.array([0.45, 0.35, 0.4], np.float32))
    s2.props.set("radius", 0.35)
    s2.children.append(SceneNode(tag="bsdf", type="dielectric"))
    root.children.append(s2)

    return build_scene(root)


def make_absorbing_sphere(
    sigma_a=0.5,
    radius=1.0,
    width=64,
    height=64,
    spp=8,
    integrator="path_vol_mis",
):
    """Pass-through sphere filled with a purely absorbing homogeneous medium in
    a constant L=1 environment. The analytic center-pixel value is
    exp(−σa·2r) — the Beer–Lambert validation for free-path/transmittance
    (contract of homogmedium.cpp:61-73)."""
    root = SceneNode(tag="scene", type="scene")
    root.children.append(SceneNode(tag="integrator", type=integrator))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", width)
    cam.props.set("height", height)
    cam.props.set("fov", 30.0)
    from optix_renderer_tpu.core import transform as tf

    cam.props.set("toWorld", tf.lookat([0, 0, 6], [0, 0, 0], [0, 1, 0]))
    root.children.append(cam)
    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", spp)
    root.children.append(samp)

    sh = SceneNode(tag="shape", type="sphere")
    sh.props.set("center", np.zeros(3, np.float32))
    sh.props.set("radius", float(radius))
    med = SceneNode(tag="medium", type="homog")
    med.props.set("sigma_a", np.full(3, sigma_a, np.float32))
    med.props.set("sigma_s", np.zeros(3, np.float32))
    sh.children.append(med)
    root.children.append(sh)

    em = SceneNode(tag="emitter", type="envmap")
    em.props.set("radiance", np.ones(3, np.float32))
    root.children.append(em)

    return build_scene(root)


def make_furnace(albedo=0.75, radiance=1.0, width=128, height=128, spp=16,
                 integrator="path_mis"):
    """Furnace test: diffuse sphere inside a constant environment.

    For albedo a and env radiance L, the exact pixel value on the sphere is
    L·(1-a)⁻¹·... — for a closed furnace every path returns L·aᵏ with NEE →
    expected radiance L/(1-a) scaled appropriately; with a constant envmap and
    single bounce accumulation the analytic check lives in the tests
    (mirrors scenes/pa4/tests/test-furnace.xml).
    """
    root = SceneNode(tag="scene", type="scene")
    root.children.append(SceneNode(tag="integrator", type=integrator))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", width)
    cam.props.set("height", height)
    cam.props.set("fov", 30.0)
    from optix_renderer_tpu.core import transform as tf

    cam.props.set("toWorld", tf.lookat([0, 0, 4], [0, 0, 0], [0, 1, 0]))
    root.children.append(cam)
    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", spp)
    root.children.append(samp)

    sh = SceneNode(tag="shape", type="sphere")
    sh.props.set("center", np.zeros(3, np.float32))
    sh.props.set("radius", 1.0)
    b = SceneNode(tag="bsdf", type="diffuse")
    b.props.set("albedo", np.full(3, albedo, np.float32))
    sh.children.append(b)
    root.children.append(sh)

    em = SceneNode(tag="emitter", type="envmap")
    em.props.set("radiance", np.full(3, radiance, np.float32))
    root.children.append(em)

    return build_scene(root)


def _uv_sphere_obj(tmpdir, name, center, radius, nu=200, nv=125):
    """Write a UV-sphere OBJ with 2·nu·(nv−1) triangles; returns filename."""
    import numpy as _np

    th = _np.linspace(0.0, _np.pi, nv + 1)
    ph = _np.linspace(0.0, 2.0 * _np.pi, nu, endpoint=False)
    tt, pp = _np.meshgrid(th, ph, indexing="ij")  # [nv+1, nu]
    x = center[0] + radius * _np.sin(tt) * _np.cos(pp)
    y = center[1] + radius * _np.cos(tt)
    z = center[2] + radius * _np.sin(tt) * _np.sin(pp)
    verts = _np.stack([x, y, z], -1).reshape(-1, 3)

    def vid(i, j):
        return i * nu + (j % nu) + 1  # 1-based OBJ ids

    faces = []
    for i in range(nv):
        for j in range(nu):
            a, b, c, d = vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)
            if i > 0:
                faces.append((a, b, d))
            if i < nv - 1:
                faces.append((b, c, d))
    lines = ["v %f %f %f" % tuple(v) for v in verts]
    lines += ["f %d %d %d" % f for f in faces]
    fname = f"{name}.obj"
    (Path(tmpdir) / fname).write_text("\n".join(lines) + "\n")
    return fname


def make_tessellated_cornell(
    width: int = 800,
    height: int = 600,
    spp: int = 8,
    integrator: str = "path_mis",
    nu: int = 200,
    nv: int = 126,
):
    """Cornell box with the two analytic spheres replaced by dense UV-sphere
    meshes (2·2·nu·(nv−1) ≈ 100k triangles at defaults) — exercises the LBVH
    path (ops/bvh.py) the way the reference's ajax/sponza scenes exercise its
    SAH BVH (scenes/pa1)."""
    import tempfile

    tmp = Path(tempfile.mkdtemp(prefix="optix_tpu_scene_"))
    scene, config, extras = None, None, None

    quads = {
        "floor": [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)],
        "ceiling": [(-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)],
        "back": [(-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)],
        "left": [(-1, 0, -1), (-1, 2, -1), (-1, 2, 1), (-1, 0, 1)],
        "right": [(1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)],
        "light": [(-0.4, 1.99, -0.4), (0.4, 1.99, -0.4), (0.4, 1.99, 0.4), (-0.4, 1.99, 0.4)],
    }
    albedo = {
        "floor": (0.725, 0.71, 0.68),
        "ceiling": (0.725, 0.71, 0.68),
        "back": (0.725, 0.71, 0.68),
        "left": (0.63, 0.065, 0.05),
        "right": (0.14, 0.45, 0.091),
        "light": (0.8, 0.8, 0.8),
    }
    root = SceneNode(tag="scene", type="scene", origin=str(tmp))
    root.children.append(SceneNode(tag="integrator", type=integrator))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", width)
    cam.props.set("height", height)
    cam.props.set("fov", 40.0)
    from optix_renderer_tpu.core import transform as tf

    cam.props.set("toWorld", tf.lookat([0, 1.0, 4.3], [0, 1.0, 0], [0, 1, 0]))
    root.children.append(cam)
    samp = SceneNode(tag="sampler", type="independent")
    samp.props.set("sampleCount", spp)
    root.children.append(samp)
    for name, verts in quads.items():
        fname = _quad_obj(tmp, name, verts)
        sh = SceneNode(tag="shape", type="obj", origin=str(tmp))
        sh.props.set("filename", fname)
        b = SceneNode(tag="bsdf", type="diffuse")
        b.props.set("albedo", np.array(albedo[name], np.float32))
        sh.children.append(b)
        if name == "light":
            em = SceneNode(tag="emitter", type="area")
            em.props.set("radiance", np.array([17.0, 12.0, 8.0], np.float32))
            sh.children.append(em)
        root.children.append(sh)

    for center, kind, name in (
        ([-0.45, 0.35, -0.35], "mirror", "ball_l"),
        ([0.45, 0.35, 0.4], "diffuse", "ball_r"),
    ):
        fname = _uv_sphere_obj(tmp, name, center, 0.35, nu=nu, nv=nv)
        sh = SceneNode(tag="shape", type="obj", origin=str(tmp))
        sh.props.set("filename", fname)
        b = SceneNode(tag="bsdf", type=kind)
        if kind == "diffuse":
            b.props.set("albedo", np.array([0.3, 0.4, 0.7], np.float32))
        sh.children.append(b)
        root.children.append(sh)
    return build_scene(root)
