"""Megakernel correctness: component math ≡ XLA ops; end-to-end interpret render.

The same CPU-validates-accelerator strategy as the reference's
EDeviceMode::{Cpu,Optix} split (SURVEY §4): the XLA path is the reference
implementation; the fused Pallas path must agree.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.ops import bsdf as bsdf_ops
from optix_renderer_tpu.ops.pallas import mega
from optix_renderer_tpu.scene.data import Bsdfs, BsdfType


def _mk_bsdfs():
    """One of each supported type; disney row unused."""
    B = 4
    return Bsdfs(
        type=jnp.array([0, 1, 2, 3], jnp.int32),
        albedo_tex=jnp.full((B,), -1, jnp.int32),
        int_ior=jnp.full((B,), 1.5046),
        ext_ior=jnp.full((B,), 1.000277),
        alpha=jnp.full((B,), 0.2),
        kd=jnp.tile(jnp.array([[0.4, 0.3, 0.2]]), (B, 1)),
        ks=jnp.full((B,), 0.6),
        disney=jnp.zeros((B, 10)),
    )


def _to_sl(x):
    """[N] → [S, L]-shaped (pad to one strip block)."""
    n = x.shape[0]
    total = mega.S * mega.L
    pad = total - n
    flat = jnp.concatenate([x, jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))])
    if x.ndim == 1:
        return flat.reshape(mega.S, mega.L)
    return flat.reshape(mega.S, mega.L, -1)


@pytest.mark.parametrize("btype", [0, 1, 2, 3])
def test_bsdf_sample_component_matches_xla(btype):
    rng_ = np.random.default_rng(btype)
    n = 512
    wi = rng_.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    # mostly upper hemisphere (diffuse/microfacet care), keep some below
    wi[: n // 8, 2] *= -1
    u2 = rng_.random((n, 2)).astype(np.float32)

    bsdfs = _mk_bsdfs()
    from optix_renderer_tpu.scene.data import Textures

    textures = Textures(
        type=jnp.zeros((1,), jnp.int32),
        value=jnp.ones((1, 3)) * 0.7,
        value2=jnp.zeros((1, 3)),
        scale_uv=jnp.ones((1, 2)),
        shift_uv=jnp.zeros((1, 2)),
        image_id=jnp.full((1,), -1, jnp.int32),
        image_data=jnp.zeros((1, 1, 1, 3)),
        image_hw=jnp.ones((1, 2), jnp.int32),
    )
    bid = jnp.full((n,), btype, jnp.int32)
    uv = jnp.zeros((n, 2))
    ref = bsdf_ops.sample_bsdf(bsdfs, textures, bid, jnp.asarray(wi), uv,
                               jnp.asarray(u2))

    # component path: explicit per-lane params in [S,L] layout
    P = {
        "btype": _to_sl(jnp.full((n,), float(btype))),
        "alpha": _to_sl(jnp.full((n,), 0.2)),
        "int_ior": _to_sl(jnp.full((n,), 1.5046)),
        "ext_ior": _to_sl(jnp.full((n,), 1.000277)),
        "ks": _to_sl(jnp.full((n,), 0.6)),
        "kd": tuple(_to_sl(jnp.full((n,), v)) for v in (0.4, 0.3, 0.2)),
        "albedo": tuple(_to_sl(jnp.full((n,), 1.0)) for _ in range(3)),
    }
    wi_c = tuple(_to_sl(jnp.asarray(wi[:, c])) for c in range(3))
    wo_c, w_c, pdf_c, disc_c = mega.bsdf_sample_c(
        P, wi_c, _to_sl(jnp.asarray(u2[:, 0])), _to_sl(jnp.asarray(u2[:, 1]))
    )

    def flat(x):
        return np.asarray(x).reshape(-1)[:n]

    wo_got = np.stack([flat(wo_c[0]), flat(wo_c[1]), flat(wo_c[2])], -1)
    np.testing.assert_allclose(wo_got, np.asarray(ref.wo), rtol=2e-4, atol=2e-5)
    # diffuse albedo in ref comes from the texture (0.7); component path got 1.0
    w_ref = np.asarray(ref.weight)
    w_got = np.stack([flat(w_c[0]), flat(w_c[1]), flat(w_c[2])], -1)
    if btype == 0:
        w_ref = np.where(w_ref > 0, 1.0, 0.0)  # albedo factored out
        np.testing.assert_allclose(w_got, w_ref, rtol=2e-4, atol=2e-5)
    else:
        np.testing.assert_allclose(w_got, w_ref, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(flat(pdf_c), np.asarray(ref.pdf), rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_array_equal(flat(disc_c) != 0,
                                  np.asarray(ref.is_discrete))


def test_bsdf_eval_pdf_component_matches_xla():
    rng_ = np.random.default_rng(7)
    n = 512
    wi = rng_.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wi[:, 2] = np.abs(wi[:, 2])
    wo = rng_.normal(size=(n, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo[:, 2] = np.abs(wo[:, 2])

    bsdfs = _mk_bsdfs()
    from optix_renderer_tpu.scene.data import Textures

    textures = Textures(
        type=jnp.zeros((1,), jnp.int32),
        value=jnp.ones((1, 3)),
        value2=jnp.zeros((1, 3)),
        scale_uv=jnp.ones((1, 2)),
        shift_uv=jnp.zeros((1, 2)),
        image_id=jnp.full((1,), -1, jnp.int32),
        image_data=jnp.zeros((1, 1, 1, 3)),
        image_hw=jnp.ones((1, 2), jnp.int32),
    )
    uv = jnp.zeros((n, 2))
    for btype in (0, 3):
        bid = jnp.full((n,), btype, jnp.int32)
        f_ref = bsdf_ops.eval_bsdf(bsdfs, textures, bid, jnp.asarray(wi),
                                   jnp.asarray(wo), uv)
        p_ref = bsdf_ops.pdf_bsdf(bsdfs, textures, bid, jnp.asarray(wi),
                                  jnp.asarray(wo), uv)
        P = {
            "btype": _to_sl(jnp.full((n,), float(btype))),
            "alpha": _to_sl(jnp.full((n,), 0.2)),
            "int_ior": _to_sl(jnp.full((n,), 1.5046)),
            "ext_ior": _to_sl(jnp.full((n,), 1.000277)),
            "ks": _to_sl(jnp.full((n,), 0.6)),
            "kd": tuple(_to_sl(jnp.full((n,), v)) for v in (0.4, 0.3, 0.2)),
            "albedo": tuple(_to_sl(jnp.full((n,), 1.0)) for _ in range(3)),
        }
        wi_c = tuple(_to_sl(jnp.asarray(wi[:, c])) for c in range(3))
        wo_c = tuple(_to_sl(jnp.asarray(wo[:, c])) for c in range(3))
        f_got = mega.bsdf_eval_c(P, wi_c, wo_c)
        p_got = mega.bsdf_pdf_c(P, wi_c, wo_c)

        def flat(x):
            return np.asarray(x).reshape(-1)[:n]

        got = np.stack([flat(f_got[0]), flat(f_got[1]), flat(f_got[2])], -1)
        np.testing.assert_allclose(got, np.asarray(f_ref), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(flat(p_got), np.asarray(p_ref), rtol=3e-4,
                                   atol=3e-5)


def test_fis_jitter_samples_filter_shape():
    """Filter importance sampling: jitter pushed through _fis_jitter2 must be
    distributed as the reconstruction filter (both components)."""
    from optix_renderer_tpu.ops.pallas import pathk
    from optix_renderer_tpu.render.film import FILTER_RADIUS

    rng_ = np.random.default_rng(0)
    u1 = jnp.asarray(rng_.random(400_000).astype(np.float32))
    u2 = jnp.asarray(rng_.random(400_000).astype(np.float32))
    for name in ("gaussian", "tent"):
        jx, jy = pathk._fis_jitter2(u1, u2, name)
        r = FILTER_RADIUS[name]
        for j in (np.asarray(jx) - 0.5, np.asarray(jy) - 0.5):
            hist, edges = np.histogram(j, bins=41, range=(-r, r), density=True)
            mid = 0.5 * (edges[1:] + edges[:-1])
            f = pathk._filter_eval_np(name, mid)
            f = f / np.trapezoid(f, mid)
            np.testing.assert_allclose(hist, f, atol=0.02 * f.max())


@pytest.mark.heavy
def test_pathk_render_matches_scan_cornell():
    """End-to-end interpret-mode regenerating kernel ≈ scan render on a small
    Cornell with a box filter (FIS box jitter ≡ splat box weights, and the
    per-(pixel,sample) streams are identical — near-bit-exact films).

    The reference is computed with mega=False so it cannot route through the
    kernel under test on any backend.
    """
    from optix_renderer_tpu.render.mega_render import render_mega
    from optix_renderer_tpu.render.render import render
    from optix_renderer_tpu.scene.presets import make_cornell_box
    from optix_renderer_tpu.ops.pallas import pathk

    scene, config, _ = make_cornell_box(width=24, height=16, spp=1,
                                        integrator="path_mis")
    config = dataclasses.replace(config, max_depth=3, rfilter="box")
    assert pathk.pathk_eligible(scene, config)

    ref = render(scene, config, sample_count=2, mega=False, wavefront=False)
    got = render_mega(scene, config, sample_count=2, interpret=True)

    a = np.asarray(ref["composite"])
    b = np.asarray(got["composite"])
    # pixel-level: most pixels bit-comparable (identical streams), a few
    # diverge via RR on FP association — median relative error must be tiny
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.mean(a) == pytest.approx(np.mean(b), rel=0.1)
    np.testing.assert_allclose(got["albedo"], ref["albedo"], atol=2e-3)
    assert np.all(np.asarray(got["weights"]) == 2.0)


@pytest.mark.heavy
def test_pathk_gaussian_fis_statistically_matches_splat():
    """Gaussian FIS film converges to the gaussian-splat film: means agree
    within sampling noise at moderate spp (different estimators, same
    expectation)."""
    from optix_renderer_tpu.render.mega_render import render_mega
    from optix_renderer_tpu.render.render import render
    from optix_renderer_tpu.scene.presets import make_cornell_box

    scene, config, _ = make_cornell_box(width=16, height=12, spp=1,
                                        integrator="path_mis")
    config = dataclasses.replace(config, max_depth=3, rfilter="gaussian")
    ref = render(scene, config, sample_count=24, mega=False, wavefront=False)
    got = render_mega(scene, config, sample_count=24, interpret=True)
    a = np.asarray(ref["composite"])
    b = np.asarray(got["composite"])
    assert np.mean(a) == pytest.approx(np.mean(b), rel=0.05)
    # per-pixel agreement within Monte-Carlo noise
    assert np.mean(np.abs(a - b) / (np.abs(a) + 0.05)) < 0.35


def _room_with_light(light_nodes, width=20, height=14):
    """Diffuse box room + the given extra light node(s), built via the scene
    API (same path as make_cornell_box)."""
    import tempfile
    from pathlib import Path

    from optix_renderer_tpu.scene.build import build_scene
    from optix_renderer_tpu.scene.parser import SceneNode
    from optix_renderer_tpu.scene.presets import _quad_obj
    from optix_renderer_tpu.core import transform as tf

    tmp = Path(tempfile.mkdtemp(prefix="optix_tpu_scene_"))
    root = SceneNode(tag="scene", type="scene", origin=str(tmp))
    root.children.append(SceneNode(tag="integrator", type="path_mis"))
    cam = SceneNode(tag="camera", type="perspective")
    cam.props.set("width", width)
    cam.props.set("height", height)
    cam.props.set("fov", 40.0)
    cam.props.set("toWorld", tf.lookat([0, 1.0, 4.3], [0, 1.0, 0], [0, 1, 0]))
    root.children.append(cam)
    quads = {
        "floor": [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)],
        "back": [(-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)],
    }
    for name, verts in quads.items():
        fname = _quad_obj(tmp, name, verts)
        sh = SceneNode(tag="shape", type="obj", origin=str(tmp))
        sh.props.set("filename", fname)
        sh.children.append(SceneNode(tag="bsdf", type="diffuse"))
        root.children.append(sh)
    for n in light_nodes:
        root.children.append(n)
    return build_scene(root)


@pytest.mark.heavy
@pytest.mark.parametrize("kind", ["spot", "directional"])
def test_pathk_spot_directional_match_xla(kind):
    """Spot/directional NEE in the kernel ≡ the XLA emitter path (box filter
    → identical streams → near-bit-exact films)."""
    from optix_renderer_tpu.render.mega_render import render_mega
    from optix_renderer_tpu.render.render import render
    from optix_renderer_tpu.scene.parser import SceneNode
    from optix_renderer_tpu.ops.pallas import pathk

    em = SceneNode(tag="emitter", type=kind)
    if kind == "spot":
        em.props.set("position", np.array([0.0, 1.8, 1.0], np.float32))
        em.props.set("direction", np.array([0.0, -1.0, -0.5], np.float32))
        em.props.set("power", np.array([60.0, 50.0, 40.0], np.float32))
        em.props.set("falloffstart", 15.0)
        em.props.set("totalwidth", 30.0)
    else:
        em.props.set("direction", np.array([-0.3, -1.0, -0.4], np.float32))
        em.props.set("radiance", np.array([40.0, 36.0, 30.0], np.float32))
        em.props.set("angle", 5.0)

    scene, config, _ = _room_with_light([em])
    config = dataclasses.replace(config, max_depth=3, rfilter="box")
    assert pathk.pathk_eligible(scene, config), "kernel must cover this scene"

    ref = render(scene, config, sample_count=4, mega=False, wavefront=False)
    got = render_mega(scene, config, sample_count=4, interpret=True)
    a = np.asarray(ref["composite"])
    b = np.asarray(got["composite"])
    assert a.max() > 0.005, "light must illuminate the room"
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.mean(a) == pytest.approx(np.mean(b), rel=0.1)


def test_disney_component_matches_xla():
    """disney_eval_c ≡ ops/disney.disney_eval on random directions/params."""
    from optix_renderer_tpu.ops import disney as disney_ops

    rng_ = np.random.default_rng(11)
    n = 512
    wi = rng_.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wi[:, 2] = np.abs(wi[:, 2])
    wo = rng_.normal(size=(n, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo[:, 2] = np.abs(wo[:, 2])
    params = rng_.random((n, 10)).astype(np.float32)
    base = rng_.random((n, 3)).astype(np.float32) * 0.9 + 0.05

    ref = disney_ops.disney_eval(jnp.asarray(params), jnp.asarray(base),
                                 jnp.asarray(wi), jnp.asarray(wo))

    P = {
        "btype": _to_sl(jnp.full((n,), 4.0)),
        "albedo": tuple(_to_sl(jnp.asarray(base[:, c])) for c in range(3)),
        "disney": tuple(_to_sl(jnp.asarray(params[:, k])) for k in range(10)),
    }
    wi_c = tuple(_to_sl(jnp.asarray(wi[:, c])) for c in range(3))
    wo_c = tuple(_to_sl(jnp.asarray(wo[:, c])) for c in range(3))
    got = mega.disney_eval_c(P, wi_c, wo_c)

    def flat(x):
        return np.asarray(x).reshape(-1)[:n]

    got3 = np.stack([flat(got[0]), flat(got[1]), flat(got[2])], -1)
    np.testing.assert_allclose(got3, np.asarray(ref), rtol=2e-3, atol=2e-4)


@pytest.mark.heavy
def test_pathk_disney_matches_xla():
    """Disney-material Cornell through the kernel ≡ XLA path (box filter)."""
    from optix_renderer_tpu.render.mega_render import render_mega
    from optix_renderer_tpu.render.render import render
    from optix_renderer_tpu.scene.parser import SceneNode
    from optix_renderer_tpu.ops.pallas import pathk

    em = SceneNode(tag="emitter", type="point")
    em.props.set("position", np.array([0.0, 1.8, 1.0], np.float32))
    em.props.set("power", np.array([80.0, 70.0, 60.0], np.float32))
    scene, config, _ = _room_with_light([em])
    # swap the floor bsdf to disney via the table (API-level edit)
    import jax.numpy as jnp2

    bs = scene.bsdfs
    scene = scene._replace(bsdfs=bs._replace(
        type=bs.type.at[0].set(4),
        disney=bs.disney.at[0].set(
            jnp2.asarray([0.3, 0.2, 0.6, 0.4, 0.1, 0.2, 0.5, 0.3, 0.4, 0.7])
        ),
    ))
    config = dataclasses.replace(config, max_depth=3, rfilter="box")
    assert pathk.pathk_eligible(scene, config)

    ref = render(scene, config, sample_count=4, mega=False, wavefront=False)
    got = render_mega(scene, config, sample_count=4, interpret=True)
    a = np.asarray(ref["composite"])
    b = np.asarray(got["composite"])
    rel = np.abs(a - b) / (np.abs(a) + 1e-3)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.mean(a) == pytest.approx(np.mean(b), rel=0.1)
