"""Disney principled BRDF (batched, local-frame).

Faithful reimplementation of the reference Disney plugin
(src/bsdf/disney.cpp:111-332): Burley diffuse + subsurface approximation,
GTR2 anisotropic specular, sheen, GTR1 clearcoat; cosine-hemisphere sampling
with pdf = cosθo/π and the reference's luminance clamp on eval.

params layout [N,10]: (metallic, subsurface, specular, roughness, specularTint,
anisotropic, sheen, sheenTint, clearcoat, clearcoatGloss) — disney.cpp:32-41.
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_renderer_tpu.core import warp
from optix_renderer_tpu.core.math import EPSILON, INV_PI, PI, luminance, safe_normalize


def _mix(a, b, t):
    return a + (b - a) * t


def _schlick_fresnel(a):
    m = jnp.clip(1.0 - a, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _smith_g_ggx_aniso(ndotv, vdotx, vdoty, ax, ay):
    return 1.0 / jnp.maximum(
        ndotv
        + jnp.sqrt(vdotx * ax * vdotx * ax + vdoty * ay * vdoty * ay + ndotv * ndotv),
        1e-8,
    )


def _smith_g_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / jnp.maximum(ndotv + jnp.sqrt(a + b - a * b), 1e-8)


def _gtr1(ndoth, a):
    a = jnp.clip(a, 1e-4, None)
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    val = (a2 - 1.0) / (PI * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, INV_PI, val)


def _gtr2_aniso(ndoth, hdotx, hdoty, ax, ay):
    denom = PI * ax * ay * ((hdotx / ax) ** 2 + (hdoty / ay) ** 2 + ndoth * ndoth) ** 2
    return 1.0 / jnp.maximum(denom, 1e-12)


def disney_eval(params: jnp.ndarray, base_color: jnp.ndarray, wi, wo) -> jnp.ndarray:
    """f(wi, wo) [N,3]; wi=L, wo=V in the reference's convention (disney.cpp:115)."""
    metallic = params[..., 0]
    subsurface = params[..., 1]
    specular = params[..., 2]
    roughness = params[..., 3]
    specular_tint = params[..., 4]
    anisotropic = params[..., 5]
    sheen = params[..., 6]
    sheen_tint = params[..., 7]
    clearcoat = params[..., 8]
    clearcoat_gloss = params[..., 9]

    L, V = wi, wo
    ndotl = L[..., 2]
    ndotv = V[..., 2]
    valid = (ndotl >= EPSILON) & (ndotv >= EPSILON)

    H = safe_normalize(L + V)
    ndoth = H[..., 2]
    ldoth = jnp.sum(L * H, axis=-1)

    # mon2lin: pow(c, 2.2) (disney.cpp:291-296)
    cdlin = jnp.power(jnp.maximum(base_color, 1e-6), 2.2)
    cdlum = 0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1] + 0.1 * cdlin[..., 2]
    ctint = jnp.where(
        (cdlum > 0.0)[..., None], cdlin / jnp.maximum(cdlum, 1e-12)[..., None], 1.0
    )
    cspec0 = _mix(
        specular[..., None] * 0.08 * _mix(jnp.ones_like(ctint), ctint, specular_tint[..., None]),
        cdlin,
        metallic[..., None],
    )
    csheen = _mix(jnp.ones_like(ctint), ctint, sheen_tint[..., None])

    fl = _schlick_fresnel(ndotl)
    fv = _schlick_fresnel(ndotv)
    fd90 = 0.5 + 2.0 * ldoth * ldoth * roughness
    fd = _mix(1.0, fd90, fl) * _mix(1.0, fd90, fv)

    fss90 = ldoth * ldoth * roughness
    fss = _mix(1.0, fss90, fl) * _mix(1.0, fss90, fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, 1e-8) - 0.5) + 0.5)

    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    ax = jnp.maximum(0.001, roughness * roughness / aspect)
    ay = jnp.maximum(0.001, roughness * roughness * aspect)
    ds = _gtr2_aniso(ndoth, H[..., 0], H[..., 1], ax, ay)
    fh = _schlick_fresnel(ldoth)
    fs = _mix(cspec0, jnp.ones_like(cspec0), fh[..., None])
    gs = _smith_g_ggx_aniso(ndotl, L[..., 0], L[..., 1], ax, ay)
    gs = gs * _smith_g_ggx_aniso(ndotv, V[..., 0], V[..., 1], ax, ay)

    fsheen = fh[..., None] * sheen[..., None] * csheen

    dr = _gtr1(ndoth, _mix(0.1, 0.001, clearcoat_gloss))
    fr = _mix(0.04, 1.0, fh)
    gr = _smith_g_ggx(ndotl, 0.25) * _smith_g_ggx(ndotv, 0.25)

    final = (
        (INV_PI * _mix(fd, ss, subsurface)[..., None] * cdlin + fsheen)
        * (1.0 - metallic)[..., None]
        + (gs * ds)[..., None] * fs
        + (0.25 * clearcoat * gr * fr * dr)[..., None]
    )
    # reference clamps by luminance (disney.cpp:174-176)
    lum = luminance(final)
    final = jnp.where((lum > 1.0)[..., None], final / jnp.maximum(lum, 1e-12)[..., None], final)
    return jnp.where(valid[..., None], final, 0.0)


def disney_pdf(params: jnp.ndarray, wi, wo) -> jnp.ndarray:
    """cosine-hemisphere pdf (disney.cpp:201-208)."""
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(ok, INV_PI * wo[..., 2], 0.0)


def disney_sample(params: jnp.ndarray, base_color: jnp.ndarray, wi, u2):
    """Cosine sampling (disney.cpp:181-199).

    NOTE: returns the correct estimator weight f·cosθ/pdf = f·π. The reference
    returns bare eval() (its comment claims the cosine cancels, but with
    pdf = cosθ/π the correct weight is f·π) — a ~π energy deficit we fix.
    """
    wo = warp.square_to_cosine_hemisphere(u2)
    f = disney_eval(params, base_color, wi, wo)
    pdf = disney_pdf(params, wi, wo)
    weight = jnp.where(
        ((wi[..., 2] > 0.0) & (pdf >= EPSILON))[..., None], f * PI, 0.0
    )
    return wo, weight, pdf
