"""Progressive preview + interrupt + checkpoint/resume (SURVEY §5.3-5.4,
render.cpp:285-301 interrupt contract). Resume must be bit-exact with an
uninterrupted render: sample streams are keyed by (pixel, sample_idx), so
continuing at a round boundary replays the identical remaining rounds.
"""

import dataclasses

import numpy as np
import pytest

from optix_renderer_tpu.render.render import render
from optix_renderer_tpu.scene.presets import make_furnace


@pytest.fixture(scope="module")
def small_scene():
    scene, config, _ = make_furnace(width=16, height=16, spp=8)
    return scene, dataclasses.replace(config, max_depth=3)


def test_checkpoint_resume_bit_exact(small_scene, tmp_path):
    scene, config = small_scene
    full = render(scene, config, sample_count=6)

    ck = str(tmp_path / "acc.npz")
    # render the first 3 rounds, checkpointing every round
    part = render(scene, config, sample_count=3,
                  checkpoint_path=ck, checkpoint_every=1)
    assert part["spp_done"] == 3
    # resume to 6
    resumed = render(scene, config, sample_count=6,
                     checkpoint_path=ck, resume=True)
    assert resumed["spp_done"] == 6
    np.testing.assert_array_equal(resumed["composite"], full["composite"])


def test_interrupt_returns_valid_partial_and_resumes(small_scene, tmp_path):
    scene, config = small_scene
    ck = str(tmp_path / "acc.npz")

    calls = []

    def bomb(layers, spp_done):
        calls.append(spp_done)
        # preview fires at a round boundary — a SIGINT here must checkpoint
        if spp_done == 2:
            raise KeyboardInterrupt

    out = render(scene, config, sample_count=6, preview_every=1,
                 preview_callback=bomb, checkpoint_path=ck, checkpoint_every=100)
    assert out["spp_done"] == 2
    assert calls == [1, 2]
    # the partial film is a valid (lower-spp) image
    assert np.isfinite(out["composite"]).all()
    assert out["composite"].mean() > 0

    resumed = render(scene, config, sample_count=6, checkpoint_path=ck,
                     resume=True)
    full = render(scene, config, sample_count=6)
    np.testing.assert_array_equal(resumed["composite"], full["composite"])


def test_checkpoint_rejects_mismatched_config(small_scene, tmp_path):
    scene, config = small_scene
    ck = str(tmp_path / "acc.npz")
    render(scene, config, sample_count=1, checkpoint_path=ck, checkpoint_every=1)
    bad = dataclasses.replace(config, width=32)
    with pytest.raises(ValueError):
        render(scene, bad, sample_count=2, checkpoint_path=ck, resume=True)


def test_preview_callback_receives_layers(small_scene):
    scene, config = small_scene
    seen = []

    def cb(layers, spp_done):
        seen.append((spp_done, layers["composite"].shape))

    render(scene, config, sample_count=4, preview_every=2, preview_callback=cb)
    assert seen == [(2, (16, 16, 3)), (4, (16, 16, 3))]
