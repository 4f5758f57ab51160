"""Per-pixel variance estimation from the accumulated film.

Counterpart of `computeVarianceFromImage` (src/utils/common.cpp:339-399,
declared common.h:289): 3×3 local variance of luminance with out-of-image
neighbors excluded, then the reference's peculiar 1 + 0.254·minmax
normalization. Drives the adaptive sampler (adaptive.cpp) and the bilateral
denoiser (denoiser/simple.cpp), and is written as `<scene>_variance.exr`
(render.cpp:390-415).
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_renderer_tpu.core.math import EPSILON, luminance


def _shift2d(x: jnp.ndarray, dy: int, dx: int):
    """Shift with validity mask (out-of-bounds neighbors excluded, not clamped
    — common.cpp:353-356 `continue`s on clamped indices)."""
    h, w = x.shape
    rolled = jnp.roll(jnp.roll(x, dy, axis=0), dx, axis=1)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    valid = (
        (yy - dy >= 0) & (yy - dy < h) & (xx - dx >= 0) & (xx - dx < w)
    )
    return rolled, valid.astype(x.dtype)


def local_variance(lum: jnp.ndarray) -> jnp.ndarray:
    """3×3 masked local variance of a luminance image [H,W]."""
    s = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    cnt = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v, m = _shift2d(lum, dy, dx)
            s = s + v * m
            s2 = s2 + v * v * m
            cnt = cnt + m
    mean = s / cnt
    return jnp.maximum(s2 / cnt - mean * mean, 0.0)


def variance_from_image(film: jnp.ndarray) -> jnp.ndarray:
    """Weighted film [H,W,4] → normalized variance [H,W] (common.cpp:339-399).

    Returns 0 everywhere when flat, else 1 + 0.254·(v−min)/(max−min) — the
    exact normalization the reference feeds its adaptive DPDF.
    """
    w = jnp.maximum(film[..., 3], 1e-9)
    rgb = film[..., :3] / w[..., None]
    lum = jnp.abs(luminance(rgb))
    var = local_variance(lum)
    vmax = jnp.max(var)
    vmin = jnp.min(var)
    flat = (vmax - vmin) < EPSILON
    norm = 1.0 + (var - vmin) / jnp.maximum(vmax - vmin, 1e-20) * 0.254
    return jnp.where(flat, jnp.zeros_like(var), norm)
