"""Participating-media kernel: free-path sampling, transmittance, phase functions.

Batched counterpart of the reference medium plugins (src/media/{vacuum,
homogmedium,heterogmedium}.cpp, interface medium.h:26-90) and phase functions
(src/bsdf/{isophase,anisophase,schlickphase}.cpp, phase.h:26-33).

Estimator note: the reference multiplies throughput by raw transmittance
without dividing by the free-path pdf (homogmedium.cpp:61-73 +
path_vol_mis.cpp:142-144), which is biased. We use the standard unbiased
spectral estimator: distance sampled from a uniformly-chosen channel's
exponential; medium events weighted σ_s·Tr/pdf_t with
pdf_t = mean_c μt_c e^{−μt_c t}; surface events weighted Tr/P_surf with
P_surf = mean_c e^{−μt_c t_s}. Heterogeneous (voxel-grid delta tracking) is
layered on in ops/volume_grid.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from optix_renderer_tpu.core import warp
from optix_renderer_tpu.core.math import INV_FOURPI
from optix_renderer_tpu.scene.data import Media, MediumType, PhaseType


def mu_t(media: Media, med_id: jnp.ndarray) -> jnp.ndarray:
    """Extinction μt = μa + μs per lane [N,3]; 0 for vacuum / id<0."""
    mid = jnp.maximum(med_id, 0)
    mt = media.sigma_a[mid] + media.sigma_s[mid]
    is_real = (med_id >= 0) & (media.type[mid] != MediumType.VACUUM)
    return jnp.where(is_real[..., None], mt, 0.0)


def sample_free_path(
    media: Media, med_id: jnp.ndarray, u_channel: jnp.ndarray, u_dist: jnp.ndarray
) -> jnp.ndarray:
    """Distance to the next tentative medium event (∞ in vacuum).

    Channel-uniform exponential sampling (homogmedium.cpp:61-67 contract).
    """
    mt = mu_t(media, med_id)
    c = jnp.clip((3.0 * u_channel).astype(jnp.int32), 0, 2)
    mt_c = jnp.take_along_axis(mt, c[..., None], axis=-1)[..., 0]
    t = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-38)) / jnp.maximum(mt_c, 1e-20)
    return jnp.where(mt_c < 1e-12, jnp.inf, t)


def transmittance(media: Media, med_id: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """exp(−μt·d) [N,3] (homogmedium.cpp:69-73); 1 in vacuum."""
    d = jnp.minimum(dist, 1e30)
    return jnp.exp(-mu_t(media, med_id) * d[..., None])


def free_path_weights(
    media: Media, med_id: jnp.ndarray, t_medium: jnp.ndarray, t_surface: jnp.ndarray
):
    """Unbiased spectral weights for the two outcomes of free-path sampling.

    Returns (is_medium_event, w_medium [N,3], w_surface [N,3]):
    - is_medium_event: t_medium < t_surface
    - w_medium  = σ_s · exp(−μt t) / mean_c(μt_c e^{−μt_c t})
    - w_surface = exp(−μt t_s) / mean_c(e^{−μt_c t_s})
    Vacuum lanes: surface event with weight 1.
    """
    mid = jnp.maximum(med_id, 0)
    mt = mu_t(media, med_id)
    sigma_s = jnp.where(
        (med_id >= 0)[..., None], media.sigma_s[mid], 0.0
    )
    is_medium = t_medium < t_surface

    tm = jnp.where(jnp.isfinite(t_medium), t_medium, 0.0)
    tr_m = jnp.exp(-mt * tm[..., None])
    pdf_m = jnp.mean(mt * tr_m, axis=-1)
    w_medium = sigma_s * tr_m / jnp.maximum(pdf_m, 1e-20)[..., None]

    ts = jnp.minimum(t_surface, 1e30)
    tr_s = jnp.exp(-mt * ts[..., None])
    p_surf = jnp.mean(tr_s, axis=-1)
    w_surface = tr_s / jnp.maximum(p_surf, 1e-20)[..., None]

    vacuum = jnp.all(mt < 1e-12, axis=-1)
    is_medium = is_medium & (~vacuum)
    w_surface = jnp.where(vacuum[..., None], 1.0, w_surface)
    return is_medium, w_medium, w_surface


# ---------------------------------------------------------------------------
# phase functions (local frame around the incident direction)
# ---------------------------------------------------------------------------


def phase_sample(media: Media, med_id: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Sample the phase function; returns wo in the frame of the incident ray
    (z = propagation direction), matching PhaseQueryRecord conventions."""
    mid = jnp.maximum(med_id, 0)
    ptype = media.phase_type[mid]
    g = media.phase_g[mid]
    wo_iso = warp.square_to_uniform_sphere(u2)
    wo_hg = warp.square_to_henyey_greenstein(u2, g)
    wo_schlick = warp.square_to_schlick(u2, g)
    return jnp.where(
        (ptype == PhaseType.ISO)[..., None],
        wo_iso,
        jnp.where((ptype == PhaseType.HG)[..., None], wo_hg, wo_schlick),
    )


def phase_pdf(media: Media, med_id: jnp.ndarray, wo_local: jnp.ndarray) -> jnp.ndarray:
    mid = jnp.maximum(med_id, 0)
    ptype = media.phase_type[mid]
    g = media.phase_g[mid]
    p_iso = jnp.full(wo_local.shape[:-1], INV_FOURPI)
    p_hg = warp.square_to_henyey_greenstein_pdf(wo_local, g)
    p_schlick = warp.square_to_schlick_pdf(wo_local, g)
    return jnp.where(
        ptype == PhaseType.ISO,
        p_iso,
        jnp.where(ptype == PhaseType.HG, p_hg, p_schlick),
    )


# ---------------------------------------------------------------------------
# unified homogeneous/heterogeneous dispatch (consumed by the vol integrators)
# ---------------------------------------------------------------------------


def sample_interaction(media: Media, med_id, s, ro, rd, t_surface):
    """Free-path sample in the lane's current medium, homog or heterog.

    Returns (sampler, is_medium [N], t_event [N], w_medium [N,3],
    w_surface [N,3], w_emission [N,3]). Homogeneous lanes use the analytic
    channel-uniform estimator above; heterogeneous lanes run delta tracking
    (ops/volume_grid.py) with w_medium = σs/max_c(σt) and w_surface = 1
    (delta tracking *is* the transmittance estimator).

    `w_emission` is the *emission* event weight Tr/pdf_t — the MC estimator
    of ∫Tr(t)·ε(x(t))dt for an emissive field ε, evaluated at the sampled
    event. Homogeneous: e^{−μt t}/pdf_t; heterogeneous: 1/(ρ(x)·max_c σt)
    (the null-collision factors cancel). Multiply by ε(x_event) to get the
    per-event emitted-radiance contribution (path_vol_mis.cpp:146-172 MATS
    medium-emission analog, made unbiased).
    """
    from optix_renderer_tpu.ops import volume_grid as vg
    from optix_renderer_tpu.render import sampler as smp

    s, u_ch = smp.next_1d(s)
    s, u_d = smp.next_1d(s)
    t_med_h = sample_free_path(media, med_id, u_ch, u_d)
    is_med_h, w_m_h, w_s_h = free_path_weights(media, med_id, t_med_h, t_surface)

    mt = mu_t(media, med_id)
    tm = jnp.where(jnp.isfinite(t_med_h), t_med_h, 0.0)
    tr_m = jnp.exp(-mt * tm[..., None])
    pdf_m = jnp.mean(mt * tr_m, axis=-1)
    w_e_h = tr_m / jnp.maximum(pdf_m, 1e-20)[..., None]

    if not vg.has_volumes(media):
        return s, is_med_h, t_med_h, w_m_h, w_s_h, w_e_h

    mid = jnp.maximum(med_id, 0)
    is_het = (med_id >= 0) & (media.type[mid] == MediumType.HETEROG)
    s, t_het, w_score = vg.delta_track(media, med_id, s, ro, rd, t_surface)
    st_max = jnp.max(media.sigma_a[mid] + media.sigma_s[mid], axis=-1)
    w_m_het = media.sigma_s[mid] / jnp.maximum(st_max, 1e-20)[..., None]
    t_het_f = jnp.where(jnp.isfinite(t_het), t_het, 0.0)
    rho = vg.density_at(media, med_id, ro + rd * t_het_f[..., None])
    w_e_het = (
        1.0 / jnp.maximum(rho * st_max, 1e-12)[..., None] * jnp.ones_like(w_m_het)
    )
    # differential delta tracking: w_score == 1 with the free-flight-pdf
    # score gradient attached (volume_grid.delta_track) — scales every
    # outcome of the heterogeneous free-flight decision
    w_m_het = w_m_het * w_score[..., None]
    w_s_het = w_score[..., None] * jnp.ones_like(w_m_het)
    w_e_het = w_e_het * w_score[..., None]

    is_medium = jnp.where(is_het, t_het < t_surface, is_med_h)
    t_event = jnp.where(is_het, t_het, t_med_h)
    w_medium = jnp.where(is_het[..., None], w_m_het, w_m_h)
    w_surface = jnp.where(is_het[..., None], w_s_het, w_s_h)
    w_emission = jnp.where(is_het[..., None], w_e_het, w_e_h)
    return s, is_medium, t_event, w_medium, w_surface, w_emission


def color_from_temperature(v: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Blackbody-style ramp (heterogmedium.cpp:37-44, NanoVDB
    RenderFogVolumeUtils): r=v, g=v², b=v⁴ → scale·(r³, g³, b³)."""
    r = v
    g = r * r
    b = g * g
    rgb = jnp.stack([r**3, g**3, b**3], axis=-1)
    return scale[..., None] * rgb


def event_emission(media: Media, med_id, p: jnp.ndarray) -> jnp.ndarray:
    """Emission field ε(x) [N,3] at a medium-event point.

    Two sources, matching the reference's model:
    - constant volume-emitter radiance is handled by the caller (it needs the
      emitter table + MIS weight);
    - temperature-driven emission for heterogeneous media:
      ε(x) = σa·ρ(x)·colorFromTemperature(T(x), temperatureScale)
      (emission ∝ absorption; the reference computes the ramp inside its
      transmittance walk, heterogmedium.cpp:163-168, but discards the
      accumulator — we integrate it unbiasedly via w_emission instead).
    """
    from optix_renderer_tpu.ops import volume_grid as vg

    if not vg.has_volumes(media):
        return jnp.zeros(p.shape)
    mid = jnp.maximum(med_id, 0)
    scale = media.temperature_scale[mid]
    is_het = (med_id >= 0) & (media.type[mid] == MediumType.HETEROG) & (scale > 0.0)
    temp = vg.temperature_at(media, med_id, p)
    rho = vg.density_at(media, med_id, p)
    eps = media.sigma_a[mid] * rho[..., None] * color_from_temperature(temp, scale)
    return jnp.where(is_het[..., None], eps, 0.0)


def transmittance_est(media: Media, med_id, s, o, d, dist):
    """Transmittance over a segment: analytic for homogeneous lanes,
    ratio tracking for heterogeneous ones. Returns (sampler, Tr [N,3])."""
    from optix_renderer_tpu.ops import volume_grid as vg

    tr = transmittance(media, med_id, dist)
    if not vg.has_volumes(media):
        return s, tr
    mid = jnp.maximum(med_id, 0)
    is_het = (med_id >= 0) & (media.type[mid] == MediumType.HETEROG)
    s, tr_het = vg.ratio_track(media, med_id, s, o, d, dist)
    return s, jnp.where(is_het[..., None], tr_het, tr)
