"""Image-based environment map: sampling/eval/pdf consistency + HDR I/O.

Validation model follows the reference's statistical-test strategy
(src/utils/chi2test.cpp for sample↔pdf agreement; warptest for warps):
the envmap sampler must agree with its own pdf, and the importance-sampled
integral must match the quadrature sum over the lat-long grid.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.core import dpdf as dpdf_mod
from optix_renderer_tpu.ops import envmap as envmap_mod
from optix_renderer_tpu.utils import imageio as iio


def _random_env(h=16, w=32, seed=0, euler=(0.0, 0.0, 0.0)):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0.05, 3.0, (h, w, 3)).astype(np.float32)
    env, pick = envmap_mod.build_tables(img, np.ones(3), euler, flip_v=False)
    return img, env, pick


def test_pmf_normalized_and_positive():
    _, env, pick = _random_env()
    assert np.isclose(float(jnp.sum(pick.pmf)), 1.0, atol=1e-5)
    assert float(jnp.min(pick.pmf)) > 0.0


def test_sample_pdf_consistency():
    """pdf_dir(sample_dir(u)) must equal the pdf returned by sample_dir."""
    _, env, pick = _random_env(euler=(30.0, 45.0, 10.0))
    n = 4096
    rng = np.random.default_rng(1)
    u2 = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    d, pdf, val = envmap_mod.sample_dir(env, pick, u2)
    # directions are unit
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    pdf2 = envmap_mod.pdf_dir(env, pick, d)
    # jittered directions can land on a neighbouring row/col at pixel edges
    # due to float roundtrip; demand exact match for ≥99% and no NaNs
    match = np.isclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
    assert match.mean() > 0.99
    # value returned is the map radiance at the sampled texel
    val2 = envmap_mod.eval_dir(env, d)
    match_v = np.isclose(np.asarray(val), np.asarray(val2), rtol=1e-4).all(axis=-1)
    assert match_v.mean() > 0.99


def test_importance_sampled_integral_matches_quadrature():
    """E[L(ω)/p(ω)] over importance samples = ∫L dω = Σ texel·ω_pixel."""
    img, env, pick = _random_env(h=12, w=24, seed=3)
    h, w = img.shape[:2]
    theta_edges = np.linspace(0, np.pi, h + 1)
    omega_row = (2 * np.pi / w) * (np.cos(theta_edges[:-1]) - np.cos(theta_edges[1:]))
    exact = (img * omega_row[:, None, None]).sum(axis=(0, 1))

    n = 200_000
    rng = np.random.default_rng(7)
    u2 = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    d, pdf, val = envmap_mod.sample_dir(env, pick, u2)
    est = np.asarray(val / pdf[..., None]).mean(axis=0)
    assert np.allclose(est, exact, rtol=2e-2), (est, exact)


def test_chi2_sample_histogram_vs_pdf():
    """χ² sample-vs-pdf on the sphere — the chi2test.cpp:131-270 mechanism
    applied to the (rotated) image envmap sampler."""
    from optix_renderer_tpu.utils.hypothesis import chi2_sphere_test

    _, env, pick = _random_env(h=8, w=16, seed=5, euler=(20.0, 60.0, 0.0))
    ok, msg = chi2_sphere_test(
        lambda u: envmap_mod.sample_dir(env, pick, jnp.asarray(u))[0],
        lambda d: envmap_mod.pdf_dir(env, pick, jnp.asarray(d)),
        n_samples=200_000,
        theta_res=8,
        phi_res=16,
    )
    assert ok, msg


def test_constant_envmap_uniform_sphere():
    env = envmap_mod.constant_tables([2.0, 3.0, 4.0])
    pick = dpdf_mod.build(jnp.ones(1))
    u2 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1000, 2)), jnp.float32)
    d, pdf, val = envmap_mod.sample_dir(env, pick, u2)
    assert np.allclose(np.asarray(pdf), 1.0 / (4 * np.pi))
    assert np.allclose(np.asarray(val), [2.0, 3.0, 4.0])
    assert np.allclose(
        np.asarray(envmap_mod.pdf_dir(env, pick, d)), 1.0 / (4 * np.pi)
    )


def test_rotation_roundtrip():
    """eval(sample(u)) with a rotated map equals the sampled texel value."""
    _, env, pick = _random_env(euler=(180.0, 180.0, 0.0), seed=9)
    u2 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2000, 2)), jnp.float32)
    d, pdf, val = envmap_mod.sample_dir(env, pick, u2)
    val2 = envmap_mod.eval_dir(env, d)
    match = np.isclose(np.asarray(val), np.asarray(val2), rtol=1e-4).all(axis=-1)
    assert match.mean() > 0.99


def _write_hdr_rgbe(path, img):
    """Minimal flat (non-RLE) Radiance writer for round-trip testing."""
    h, w = img.shape[:2]
    maxc = img.max(axis=-1)
    e = np.zeros((h, w), np.int32)
    nz = maxc > 1e-32
    e[nz] = np.floor(np.log2(maxc[nz])).astype(np.int32) + 1
    scale = np.exp2(-e.astype(np.float32) + 8)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(np.rint(img * scale[..., None]), 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.uniform(0.0, 50.0, (7, 9, 3)).astype(np.float32)
    p = tmp_path / "t.hdr"
    _write_hdr_rgbe(p, img)
    back = iio.read_hdr(p)
    assert back.shape == (7, 9, 3)
    # shared-exponent quantization: error ≤ half a mantissa step = 2^e/512
    # per pixel, with 2^e ≤ 2·max-channel
    step = img.max(axis=-1, keepdims=True) / 256.0
    assert np.all(np.abs(back - img) <= step + 1e-4)


def test_hdr_rle_decoding(tmp_path):
    """New-style RLE scanlines (runs + literals) decode correctly."""
    w, h = 16, 2
    img_row = np.zeros((w, 4), np.uint8)
    img_row[:, 0] = 100  # constant R → run
    img_row[:, 1] = np.arange(w)  # varying G → literals
    img_row[:, 2] = 7
    img_row[:, 3] = 128  # exponent: 2^0
    payload = bytearray()
    for _ in range(h):
        payload += bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF])
        payload += bytes([128 + w, 100])  # R: run of 16 × 100
        payload += bytes([w]) + bytes(np.arange(w, dtype=np.uint8))  # G literal
        payload += bytes([128 + w, 7])  # B run
        payload += bytes([128 + w, 128])  # E run
    p = tmp_path / "rle.hdr"
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\n\n" + f"-Y {h} +X {w}\n".encode() + bytes(payload))
    img = iio.read_hdr(p)
    assert img.shape == (h, w, 3)
    expect_r = 100 / 256.0
    assert np.allclose(img[..., 0], expect_r)
    assert np.allclose(img[0, :, 1], np.arange(w) / 256.0)


def test_scene_envmap_nee_matches_bruteforce():
    """Direct illumination of a diffuse plane under an image envmap:
    EMS estimate == uniform-sphere brute force (integration parity)."""
    img, env, pick = _random_env(h=8, w=16, seed=13)
    n = 100_000
    rng = np.random.default_rng(17)
    u2 = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    normal = np.array([0.0, 0.0, 1.0])

    # importance-sampled estimate of ∫ L(ω) max(cosθ,0) dω
    d, pdf, val = envmap_mod.sample_dir(env, pick, u2)
    cos = np.maximum(np.asarray(d) @ normal, 0.0)
    est_is = (np.asarray(val) * (cos / np.asarray(pdf))[:, None]).mean(axis=0)

    # uniform-sphere brute force on the same map
    z = rng.uniform(-1, 1, n)
    t = rng.uniform(0, 2 * np.pi, n)
    rr = np.sqrt(1 - z * z)
    du = np.stack([rr * np.cos(t), rr * np.sin(t), z], -1).astype(np.float32)
    lu = np.asarray(envmap_mod.eval_dir(env, jnp.asarray(du)))
    est_bf = (lu * np.maximum(du @ normal, 0)[:, None]).mean(axis=0) * 4 * np.pi

    assert np.allclose(est_is, est_bf, rtol=5e-2), (est_is, est_bf)
