"""Per-lane functional samplers for ray wavefronts.

Counterpart of the reference samplers (src/samplers/independent.cpp: pcg32
seeded per block; GPU path: tea-hash per pixel/sample, cuda/raygen.cpp:81).
A `Sampler` is a pytree of per-lane pcg32 states; `next_1d/next_2d` advance it
functionally. Seeding follows the GPU scheme — `tea(pixel_index, sample_index)`
— which is stateless, order-independent, and identical under any sharding of
the wavefront (SURVEY.md §7 phase 3 determinism requirement).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from optix_renderer_tpu.core import rng


class Sampler(NamedTuple):
    state: rng.Pcg32State  # batched pcg32


def make_sampler(pixel_idx: jnp.ndarray, sample_idx: jnp.ndarray, seed: int = 0) -> Sampler:
    """Deterministic per-lane sampler from (pixel, sample) ids.

    pcg32 streams: initstate = tea(pixel, sample ^ seed), initseq = pixel —
    distinct streams per lane (pcg32 guarantees independence across seq).
    """
    pix = jnp.asarray(pixel_idx, jnp.uint32)
    smp = jnp.asarray(sample_idx, jnp.uint32)
    h = rng.tea(pix, smp ^ jnp.uint32(seed))
    zeros = jnp.zeros_like(pix)
    state = rng.pcg32_seed(zeros, h, zeros, pix)
    return Sampler(state=state)


def next_1d(s: Sampler) -> tuple[Sampler, jnp.ndarray]:
    state, u = rng.pcg32_next_float(s.state)
    return Sampler(state=state), u


def next_2d(s: Sampler) -> tuple[Sampler, jnp.ndarray]:
    state, u = rng.pcg32_next_2d(s.state)
    return Sampler(state=state), u


def next_3d(s: Sampler) -> tuple[Sampler, jnp.ndarray]:
    """[N,3] uniforms — 2D + 1D (volumelight.cpp:58-60 sample layout)."""
    state, u2 = rng.pcg32_next_2d(s.state)
    state, u1 = rng.pcg32_next_float(state)
    return Sampler(state=state), jnp.concatenate([u2, u1[..., None]], axis=-1)
