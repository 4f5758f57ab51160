"""Wavefront path regeneration ≡ scan integrators.

The regeneration renderer (render/wavefront.py) reassigns lanes to paths but
keeps per-path arithmetic identical (same sampler streams, same draw order),
so the accumulated film must match the scan renderer up to fp add order —
the same CPU-path-validates-GPU-path strategy the reference uses
(SURVEY.md §4: EDeviceMode::{Cpu,Optix} share scene + sampler semantics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.render.render import render
from optix_renderer_tpu.render.wavefront import render_wavefront
from optix_renderer_tpu.scene.presets import make_cornell_box


@pytest.fixture(scope="module")
def small_cornell():
    scene, config, _ = make_cornell_box(width=48, height=36, spp=4,
                                        integrator="path_mis")
    return scene, config


@pytest.mark.parametrize("integrator", ["path_mis", "path_mats"])
def test_wavefront_matches_scan(small_cornell, integrator):
    import dataclasses

    scene, config = small_cornell
    config = dataclasses.replace(config, integrator=integrator, max_depth=6)
    ref = render(scene, config, sample_count=2, wavefront=False)
    # lane pool smaller than total work → several refill generations
    out = render_wavefront(scene, config, sample_count=2, n_lanes=1024,
                           sync_every=2)
    np.testing.assert_allclose(
        out["composite"], ref["composite"], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(out["albedo"], ref["albedo"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out["normal"], ref["normal"], rtol=2e-4, atol=2e-5)
    assert out["spp_done"] == 2


def test_wavefront_lane_pool_larger_than_work(small_cornell):
    """n_lanes > total work: the pool is clamped and padding lanes stay idle."""
    import dataclasses

    scene, config = small_cornell
    config = dataclasses.replace(config, max_depth=4)
    ref = render(scene, config, sample_count=1, wavefront=False)
    out = render_wavefront(scene, config, sample_count=1, n_lanes=1 << 19)
    np.testing.assert_allclose(
        out["composite"], ref["composite"], rtol=2e-4, atol=2e-5
    )


def test_render_dispatches_to_wavefront(small_cornell, monkeypatch):
    """render(wavefront=True) routes through the regeneration renderer; the
    default stays on the scan path (see render.py dispatch comment)."""
    import dataclasses

    from optix_renderer_tpu.render import render as render_mod
    from optix_renderer_tpu.render import wavefront as wf

    scene, config = small_cornell
    config = dataclasses.replace(config, max_depth=4)
    called = {}
    orig = wf.render_wavefront

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(wf, "render_wavefront", spy)
    render_mod.render(scene, config, sample_count=1, wavefront=True)
    assert called.get("yes")

    # the default is the scan path
    called.clear()
    render_mod.render(scene, config, sample_count=1)
    assert not called
