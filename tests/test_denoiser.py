"""Learned denoiser (denoise/learned.py): training converges, checkpoints
round-trip, and the trained net beats the noisy input on held-out noise.

Replaces the OptiX AI denoiser contract (OptixState.denoiser.cpp:15-152):
RGB+albedo+normal in → RGB out on the accumulated HDR frame.
"""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.denoise import learned


def _synthetic_pairs(n=3, hw=32, seed=0):
    """Piecewise-constant 'albedo' images + additive noise: a controlled
    stand-in for renders so the test stays seconds-fast on CPU."""
    rng = np.random.default_rng(seed)
    pairs = []
    for i in range(n):
        albedo = np.repeat(
            np.repeat(rng.random((hw // 8, hw // 8, 3)), 8, 0), 8, 1
        ).astype(np.float32)
        normal = np.tile(np.array([0, 0, 1], np.float32), (hw, hw, 1))
        clean = albedo * 0.8
        noisy = np.clip(
            clean + rng.normal(0, 0.25, clean.shape).astype(np.float32), 0, None
        )
        pairs.append(dict(rgb=noisy, albedo=albedo, normal=normal, clean=clean))
    return pairs


def test_training_reduces_loss_and_beats_noisy(tmp_path):
    pairs = _synthetic_pairs()
    params, losses = learned.train(pairs, steps=150, lr=3e-3, seed=0)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    # held-out noise realization of the same scene statistics
    (test,) = _synthetic_pairs(n=1, seed=99)
    out = learned.apply(
        params,
        jnp.asarray(test["rgb"]),
        jnp.asarray(test["albedo"]),
        jnp.asarray(test["normal"]),
    )
    mse_out = float(np.mean((np.asarray(out) - test["clean"]) ** 2))
    mse_in = float(np.mean((test["rgb"] - test["clean"]) ** 2))
    assert mse_out < mse_in, (mse_out, mse_in)

    # checkpoint round-trip (SURVEY §5.4)
    ck = tmp_path / "denoiser.npz"
    learned.save_checkpoint(str(ck), params)
    params2 = learned.load_checkpoint(str(ck))
    out2 = learned.apply(
        params2,
        jnp.asarray(test["rgb"]),
        jnp.asarray(test["albedo"]),
        jnp.asarray(test["normal"]),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_apply_shapes_and_hdr_safety():
    params = learned.init_params(0)
    rgb = jnp.full((16, 16, 3), 50.0)  # HDR values must not blow up
    alb = jnp.full((16, 16, 3), 0.5)
    nrm = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (16, 16, 1))
    out = learned.apply(params, rgb, alb, nrm)
    assert out.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()
    # batched
    outb = learned.apply(params, rgb[None], alb[None], nrm[None])
    assert outb.shape == (1, 16, 16, 3)
