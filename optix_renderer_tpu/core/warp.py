"""Sample warping library: square → {disk, sphere, hemisphere, Beckmann, HG, ...}.

Batched, branch-free reimplementation of the function *contracts* of the
reference warp library (`include/nori/warp.h:34-99`, `src/utils/warp.cpp`).
Every warp takes `[..., 2]` (or `[..., 3]`) uniform samples and returns
directions/points with matching batch shape; every warp has a matching pdf.
All are differentiable w.r.t. their continuous parameters (alpha, g, k).

Validated by χ² goodness-of-fit tests in tests/test_warp.py — the same
methodology as the reference's `warptest` / `chi2test` (src/utils/chi2test.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_renderer_tpu.core.math import EPSILON, INV_PI, PI, safe_sqrt


def square_to_uniform_square(s):
    return s


def square_to_uniform_square_pdf(p):
    inside = jnp.all((p >= 0.0) & (p <= 1.0), axis=-1)
    return jnp.where(inside, 1.0, 0.0)


def square_to_uniform_disk(s):
    """Polar mapping (warp.cpp:48-52)."""
    rho = jnp.sqrt(s[..., 0])
    theta = s[..., 1] * 2.0 * PI
    return jnp.stack([rho * jnp.cos(theta), rho * jnp.sin(theta)], axis=-1)


def square_to_uniform_disk_pdf(p):
    return jnp.where(jnp.sum(p * p, axis=-1) <= 1.0, INV_PI, 0.0)


def square_to_uniform_sphere(s):
    """warp.cpp:74-82."""
    z = 2.0 * s[..., 0] - 1.0
    r = safe_sqrt(1.0 - z * z)
    sigma = 2.0 * PI * s[..., 1]
    return jnp.stack([r * jnp.cos(sigma), r * jnp.sin(sigma), z], axis=-1)


def square_to_uniform_sphere_pdf(v):
    on_sphere = jnp.abs(jnp.sum(v * v, axis=-1) - 1.0) < EPSILON
    return jnp.where(on_sphere, 0.25 * INV_PI, 0.0)


def square_to_uniform_sphere_cap(s, cos_theta_max):
    """Uniform on the cap z >= cosThetaMax (warp.cpp:58-66)."""
    z = s[..., 0] * (1.0 - cos_theta_max) + cos_theta_max
    r = safe_sqrt(1.0 - z * z)
    theta = s[..., 1] * 2.0 * PI
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def square_to_uniform_sphere_cap_pdf(v, cos_theta_max):
    """Constant 1/(2π(1-cosθmax)) on the cap (warp.cpp:68-72)."""
    on_sphere = jnp.abs(jnp.sum(v * v, axis=-1) - 1.0) < EPSILON
    on_cap = v[..., 2] > cos_theta_max
    return jnp.where(
        on_sphere & on_cap, 1.0 / (2.0 * PI * (1.0 - cos_theta_max)), 0.0
    )


def square_to_uniform_sphere_volume(s3):
    """Uniform inside the unit ball from a 3D sample (warp.cpp:88-92)."""
    r = jnp.cbrt(s3[..., 2])
    return r[..., None] * square_to_uniform_sphere(s3[..., :2])


def square_to_uniform_sphere_volume_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, 3.0 / (4.0 * PI), 0.0)


def square_to_uniform_hemisphere(s):
    v = square_to_uniform_sphere(s)
    return v.at[..., 2].set(jnp.abs(v[..., 2]))


def square_to_uniform_hemisphere_pdf(v):
    on = (jnp.abs(jnp.sum(v * v, axis=-1) - 1.0) < EPSILON) & (v[..., 2] > 0)
    return jnp.where(on, 0.5 * INV_PI, 0.0)


def square_to_cosine_hemisphere(s):
    """Disk projection (Malley's method, warp.cpp:111-122)."""
    d = square_to_uniform_disk(s)
    z = safe_sqrt(1.0 - jnp.sum(d * d, axis=-1))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    on = (jnp.abs(jnp.sum(v * v, axis=-1) - 1.0) < EPSILON) & (v[..., 2] > 0)
    return jnp.where(on, v[..., 2] * INV_PI, 0.0)


def square_to_beckmann(s, alpha):
    """Beckmann NDF sampling (warp.cpp:131-150)."""
    log_sample = jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-38))
    tan2_theta = -alpha * alpha * log_sample
    phi = s[..., 1] * 2.0 * PI
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2_theta)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def square_to_beckmann_pdf(m, alpha):
    """warp.cpp:152-160."""
    ct = m[..., 2]
    r = jnp.sqrt(m[..., 0] * m[..., 0] + m[..., 1] * m[..., 1])
    tan_theta = r / jnp.where(jnp.abs(ct) > 1e-20, ct, 1e-20)
    on = (jnp.abs(jnp.sum(m * m, axis=-1) - 1.0) < EPSILON) & (ct > 0)
    pdf = jnp.exp(-tan_theta * tan_theta / (alpha * alpha)) / (
        PI * alpha * alpha * jnp.maximum(ct * ct * ct, 1e-20)
    )
    return jnp.where(on, pdf, 0.0)


def square_to_uniform_triangle(s):
    """Barycentric coords uniform over the simplex (warp.cpp:162-166)."""
    su1 = jnp.sqrt(s[..., 0])
    u = 1.0 - su1
    v = s[..., 1] * su1
    return jnp.stack([u, v, 1.0 - u - v], axis=-1)


def square_to_henyey_greenstein(s, g):
    """HG phase sampling (warp.cpp:168-198); isotropic fallback for |g|<eps."""
    g = jnp.asarray(g, jnp.float32)
    safe_g = jnp.where(jnp.abs(g) < EPSILON, 1.0, g)  # avoid /0; masked out below
    factor = (1.0 - g * g) / (1.0 - g + 2.0 * g * s[..., 0])
    cos_aniso = (1.0 + g * g - factor * factor) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * s[..., 0]
    cos_theta = jnp.where(jnp.abs(g) < EPSILON, cos_iso, cos_aniso)
    phi = 2.0 * PI * s[..., 1]
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_henyey_greenstein_pdf(m, g):
    """warp.cpp:200-205."""
    cos_theta = m[..., 2]
    g2 = g * g
    return 0.25 * INV_PI * (1.0 - g2) / jnp.power(
        jnp.maximum(1.0 + g2 - 2.0 * g * cos_theta, 1e-12), 1.5
    )


def square_to_schlick(s, k):
    """Schlick phase sampling.

    NOTE: deliberately deviates from the reference (warp.cpp:207-234), whose
    inverse CDF is inconsistent with its own pdf (for k=0.5, u=0 it yields
    cosθ≈2.9, outside [-1,1]). This is the exact inverse CDF of the claimed pdf
    (warp.cpp:236-241): cosθ = (1/k)(1 - (1-k²)/(1-k+2ku)); verified by the χ²
    test in tests/test_warp.py.
    """
    k = jnp.asarray(k, jnp.float32)
    safe_k = jnp.where(jnp.abs(k) < EPSILON, 1.0, k)
    cos_aniso = (1.0 / safe_k) * (
        1.0 - (1.0 - k * k) / (1.0 - k + 2.0 * k * s[..., 0])
    )
    cos_iso = 1.0 - 2.0 * s[..., 0]
    cos_theta = jnp.where(jnp.abs(k) < EPSILON, cos_iso, cos_aniso)
    phi = 2.0 * PI * s[..., 1]
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_schlick_pdf(m, k):
    """warp.cpp:236-241."""
    factor = 1.0 - k * m[..., 2]
    return 0.25 * INV_PI * (1.0 - k * k) / jnp.maximum(factor * factor, 1e-12)
