"""Adaptive variance-guided sampler (render/adaptive.py vs adaptive.cpp).

W4: the convergence stop and the variance-proportional pixel draw were
previously untested. The reference contract (src/samplers/adaptive.cpp:70-170):
uniform placement for `initialUniform` rounds, then variance-DPDF draws;
stop when the variance map is flat or its (normalized) difference stops
decreasing.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.render.adaptive import _draw_pixels, render_adaptive
from optix_renderer_tpu.scene.presets import make_cornell_box, make_furnace


def test_draw_pixels_follows_variance():
    """The categorical draw concentrates samples on high-variance pixels
    (adaptive.cpp:152-166 DPDF placement)."""
    h, w = 8, 8
    var = np.full((h, w), 1e-6, np.float32)
    var[3, 5] = 1.0  # one hot pixel
    ids = np.asarray(_draw_pixels(jnp.asarray(var), jnp.int32(1), 4096))
    hot = 3 * w + 5
    frac_hot = (ids == hot).mean()
    assert frac_hot > 0.9, f"only {frac_hot:.2%} of draws hit the hot pixel"
    # and a uniform map spreads them out
    ids_u = np.asarray(
        _draw_pixels(jnp.ones((h, w), jnp.float32).ravel().reshape(h, w),
                     jnp.int32(2), 4096)
    )
    assert (ids_u == hot).mean() < 0.1


def test_adaptive_stops_on_converged_scene():
    """Flat-variance stop (adaptive.cpp:96-102): a furnace scene converges to
    a constant image, so the sampler must stop well before the spp budget."""
    scene, config, _ = make_furnace(width=24, height=24, spp=16)
    config = dataclasses.replace(
        config, adaptive=True, adaptive_uniform_rounds=2, max_depth=4,
        sample_count=16,
    )
    out = render_adaptive(scene, config)
    n_pix = 24 * 24
    budget = 16 * n_pix
    assert out["samples_placed"] < budget, (
        f"placed {out['samples_placed']}/{budget} — convergence stop never fired"
    )
    # at least the uniform rounds ran
    assert out["samples_placed"] >= 2 * n_pix


def test_adaptive_matches_uniform_mean():
    """Adaptive weighting must stay unbiased: the furnace scene's mean must
    match the analytic furnace value regardless of where samples land
    (the reference validates adaptively-sampled images against uniform
    ground truth, adaptive.html)."""
    from optix_renderer_tpu.render.render import render

    scene, config, _ = make_furnace(albedo=0.5, radiance=1.0, width=16, height=16, spp=12)
    config = dataclasses.replace(config, max_depth=16, sample_count=12)
    ref = render(scene, config)
    config_a = dataclasses.replace(
        config, adaptive=True, adaptive_uniform_rounds=3
    )
    out = render_adaptive(scene, config_a)
    mean_u = float(np.mean(ref["composite"]))
    mean_a = float(np.mean(out["composite"]))
    assert abs(mean_a - mean_u) < 0.05 * max(mean_u, 1e-6), (mean_a, mean_u)


def test_adaptive_weights_written():
    """Per-pixel weights track where samples actually landed (the film's
    filter-weight channel) so to_bitmap stays an unbiased mean."""
    scene, config, _ = make_cornell_box(width=16, height=12, spp=6)
    config = dataclasses.replace(
        config, adaptive=True, adaptive_uniform_rounds=2, max_depth=3,
        sample_count=6,
    )
    out = render_adaptive(scene, config)
    assert out["weights"].shape == (12, 16)
    assert np.all(out["weights"] > 0.0)
    assert np.isfinite(out["composite"]).all()
