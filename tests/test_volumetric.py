"""Volumetric path-tracing tests: Beer–Lambert absorption, scattering energy.

The analytic analog of the reference's volume validation scenes
(scenes/project/volume/*.xml validated against Blender Cycles).
"""

import dataclasses

import numpy as np
import pytest

from optix_renderer_tpu.scene.presets import make_absorbing_sphere
from optix_renderer_tpu.render.render import render


def test_transmittance_exact():
    """Analytic exp(−μt·d) (homogmedium.cpp:69-73) — exact, no MC noise."""
    import jax.numpy as jnp

    from optix_renderer_tpu.ops import medium as M
    from optix_renderer_tpu.scene.data import Media, MediumType, PhaseType

    media = Media(
        type=jnp.array([MediumType.HOMOG]),
        sigma_a=jnp.array([[0.5, 1.0, 2.0]]),
        sigma_s=jnp.array([[0.25, 0.0, 0.1]]),
        phase_type=jnp.array([PhaseType.ISO]),
        phase_g=jnp.array([0.0]),
        emitter=jnp.array([-1]),
        vol_id=jnp.array([-1]),
        density_scale=jnp.ones(1),
        temperature_scale=jnp.zeros(1),
        vol_density=jnp.zeros((0, 1, 1, 1)),
        vol_temperature=jnp.zeros((0, 1, 1, 1)),
        vol_dims=jnp.zeros((0, 3), jnp.int32),
        vol_bbox_min=jnp.zeros((0, 3)),
        vol_bbox_max=jnp.zeros((0, 3)),
        vol_majorant=jnp.zeros(0),
    )
    tr = M.transmittance(media, jnp.array([0]), jnp.array([2.0]))
    np.testing.assert_allclose(
        np.asarray(tr[0]), np.exp(-np.array([0.75, 1.0, 2.1]) * 2.0), rtol=1e-5
    )
    # vacuum / no medium
    tr0 = M.transmittance(media, jnp.array([-1]), jnp.array([5.0]))
    np.testing.assert_allclose(np.asarray(tr0[0]), 1.0)
    # free-path weights are unbiased for the surface branch in expectation:
    # vacuum lane always surface with weight 1
    is_m, wm, ws = M.free_path_weights(
        media, jnp.array([-1]), jnp.array([np.inf]), jnp.array([3.0])
    )
    assert not bool(is_m[0])
    np.testing.assert_allclose(np.asarray(ws[0]), 1.0)


@pytest.mark.parametrize("integ", ["path_vol_mats", "path_vol_mis"])
def test_beer_lambert_absorption(integ):
    """Center pixel through an absorbing sphere = exp(−σa·2r)·L."""
    sigma_a, radius = 0.5, 1.0
    scene, config, _ = make_absorbing_sphere(
        sigma_a=sigma_a, radius=radius, width=48, height=48, integrator=integ
    )
    config = dataclasses.replace(config, max_depth=6)
    out = render(scene, config, sample_count=48)
    img = out["composite"]
    h, w, _ = img.shape
    center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2].mean()
    expected = np.exp(-sigma_a * 2 * radius)
    # survival is a Bernoulli estimator: tolerance ≈ 3σ of the patch mean
    assert abs(center - expected) < 0.04, (integ, center, expected)
    # background unattenuated
    assert abs(img[0, 0].mean() - 1.0) < 1e-3


def test_scattering_conserves_energy():
    """Purely scattering medium (albedo 1) in a constant environment must be
    a furnace: every pixel = L (scattering only redistributes)."""
    scene, config, _ = make_absorbing_sphere(
        sigma_a=0.0, radius=1.0, width=32, height=32, integrator="path_vol_mis"
    )
    # make it scattering instead of absorbing
    import jax.numpy as jnp

    scene = scene._replace(
        media=scene.media._replace(
            sigma_a=jnp.zeros_like(scene.media.sigma_a),
            sigma_s=jnp.full_like(scene.media.sigma_s, 1.0),
        )
    )
    config = dataclasses.replace(config, max_depth=16)
    out = render(scene, config, sample_count=16)
    img = out["composite"]
    h, w, _ = img.shape
    center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2].mean()
    # multiple-scattering tail truncated at max_depth → slightly below 1
    assert 0.9 < center < 1.05, center
