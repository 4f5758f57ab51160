"""Variance-guided cross-bilateral denoiser.

Batched counterpart of the reference CPU denoiser
(src/denoiser/simple.cpp:29-115, Pham et al.): spatial gaussian × range kernel
exp(−½((‖Ip−Iq‖₁·σ_P)/σ_vr)²), run for `amount` passes; the range kernel is
guided by the normalized per-pixel variance map (render/variance.py). The
row-parallel TBB loops become one vectorized stencil over shifted images.
Defaults match the reference plugin (sigma_d=ε-clamped 0, sigma_vr=0.6,
range=1, amount=1 — simple.cpp:14-24).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("inner_range", "amount"))
def denoise_bilateral(
    rgb: jnp.ndarray,  # [H,W,3] normalized image
    variance: jnp.ndarray,  # [H,W] normalized variance map
    sigma_d: float = 1.0,
    sigma_vr: float = 0.6,
    inner_range: int = 1,
    amount: int = 1,
) -> jnp.ndarray:
    h, w, _ = rgb.shape
    img = rgb
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]

    for _ in range(amount):
        num = jnp.zeros_like(img)
        den = jnp.zeros((h, w), img.dtype)
        for dy in range(-inner_range, inner_range + 1):
            for dx in range(-inner_range, inner_range + 1):
                shifted = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
                valid = (
                    (yy - dy >= 0) & (yy - dy < h) & (xx - dx >= 0) & (xx - dx < w)
                ).astype(img.dtype)
                g = jnp.exp(-(dy * dy + dx * dx) / (2.0 * sigma_d * sigma_d))
                c_diff = jnp.sum(jnp.abs(img - shifted), axis=-1)
                f = jnp.exp(-0.5 * ((c_diff * variance) / sigma_vr) ** 2)
                wgt = g * f * valid
                num = num + shifted * wgt[..., None]
                den = den + wgt
        img = num / jnp.maximum(den, 1e-12)[..., None]
    return img
