"""Render orchestration: sample rounds × pixel chunks → accumulated layers.

Counterpart of the reference render loop (src/utils/render.cpp:232-459):
the outer loop over samples and TBB tile parallelism become jitted wavefront
rounds over pixel chunks; `ImageBlock::put` merges become partial-image sums.
Multi-device execution shards the lane axis (see parallel/shard.py).

Layer order matches ERenderLayer (integrator.h:29-39):
0 = composite, 1 = albedo, 2 = normal.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from optix_renderer_tpu.integrators import get_integrator
from optix_renderer_tpu.ops import camera as camera_ops
from optix_renderer_tpu.render import film
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import RenderConfig, SceneData

# Upper bound on rays in flight per jit call. Large chunks matter: at 2^16
# lanes the per-dispatch latency dominates (116 Mpaths/s measured on v5e);
# at 2^19 a full 800×600 frame is one dispatch per sample round and the scan
# state stays resident (1332 Mpaths/s). Brute-force intersection temporaries
# stay bounded by the tri-chunked sweep (ops/intersect.py _TRI_CHUNK).
MAX_LANES = 1 << 19


def preprocess(scene: SceneData, config: RenderConfig) -> SceneData:
    """Integrator preprocess hook (`Integrator::preprocess`, render.cpp:272):
    the photon mapper builds its photon map here, once per render."""
    if config.integrator == "photonmapper" and scene.photons.pos.shape[0] == 0:
        from optix_renderer_tpu.ops.photon import build_photon_map

        pm = build_photon_map(
            scene,
            photon_count=int(config.iprop("photonCount", 100_000)),
            radius=float(config.iprop("photonRadius", 0.0)),
            max_depth=config.max_depth,
            n_lights=max(config.n_emitters, 1),
            seed=config.seed,
        )
        scene = scene._replace(photons=pm)
    return scene


def _round_layers(scene, config, pixel_ids, sample_idx):
    """One sample for a chunk of pixels → (pos [N,2], layers [3,N,3]).

    Mirrors renderBlock (render.cpp:421-459): per-pixel jitter, camera ray,
    integrator Li.
    """
    px = (pixel_ids % config.width).astype(jnp.float32)
    py = (pixel_ids // config.width).astype(jnp.float32)

    s = smp.make_sampler(pixel_ids.astype(jnp.uint32), sample_idx.astype(jnp.uint32),
                         seed=config.seed)
    s, jitter = smp.next_2d(s)
    s, aperture = smp.next_2d(s)
    pos = jnp.stack([px, py], axis=-1) + jitter

    ray, _w = camera_ops.sample_ray(
        scene.camera, config.width, config.height, pos, aperture
    )
    li = get_integrator(config.integrator)
    L, albedo, normal, s = li(scene, config, ray, s)
    # guard NaN/Inf splats (a dead lane's garbage must not poison the film)
    L = jnp.nan_to_num(L, nan=0.0, posinf=0.0, neginf=0.0)
    return pos, jnp.stack([L, albedo, normal])  # [3,N,3]


@partial(jax.jit, static_argnames=("config",), donate_argnums=())
def render_round(
    scene: SceneData,
    config: RenderConfig,
    pixel_ids: jnp.ndarray,  # [N] int32 linear pixel indices
    sample_idx: jnp.ndarray,  # [] int32 current sample round
) -> jnp.ndarray:
    """One sample round → partial [3,H,W,4] image (kept for tests/API)."""
    pos, layers = _round_layers(scene, config, pixel_ids, sample_idx)
    return film.splat(config.width, config.height, config.rfilter, pos, layers)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def render_round_accumulate(
    acc: jnp.ndarray,  # [3,H,W,4] running accumulator (donated: updated in place)
    scene: SceneData,
    config: RenderConfig,
    pixel_ids: jnp.ndarray,
    sample_idx: jnp.ndarray,
) -> jnp.ndarray:
    """render_round fused with the accumulator add.

    PERFORMANCE-CRITICAL: accumulating eagerly (`acc + render_round(...)`)
    dispatches a full-image add per chunk, which dominates wall clock ~30×
    over the render itself on TPU (measured: 7.2 ms/call vs 0.2 ms fused).
    Donating `acc` makes the update in-place in HBM.
    """
    pos, layers = _round_layers(scene, config, pixel_ids, sample_idx)
    return acc + film.splat(config.width, config.height, config.rfilter, pos, layers)


def render(
    scene: SceneData,
    config: RenderConfig,
    sample_count: int | None = None,
    verbose: bool = False,
) -> dict[str, np.ndarray]:
    """Full render: all sample rounds, pixel-chunked. Returns numpy layers.

    The renderThreadMain analog (render.cpp:232-419) without thread plumbing:
    outer loop = sample rounds, inner loop = pixel chunks (the tile scheduler,
    block.h:142-183 — chunk order is irrelevant since accumulation commutes).
    """
    scene = preprocess(scene, config)
    spp = sample_count if sample_count is not None else config.sample_count
    w, h = config.width, config.height
    n_pix = w * h
    chunk = min(MAX_LANES, n_pix)
    n_chunks = (n_pix + chunk - 1) // chunk
    pad = n_chunks * chunk - n_pix
    # padded pixel ids; padding lanes point at pixel 0 but splat with the same
    # filter weights — avoided by masking them out-of-bounds (id = -1 → x<0)
    ids = np.concatenate([np.arange(n_pix, dtype=np.int32),
                          np.full(pad, -max(w, h) * 4, np.int32)])

    acc = jnp.zeros((3, h, w, 4), jnp.float32)
    t0 = time.time()
    for s_idx in range(spp):
        for c in range(n_chunks):
            pix = jnp.asarray(ids[c * chunk : (c + 1) * chunk])
            acc = render_round_accumulate(acc, scene, config, pix, jnp.int32(s_idx))
        if verbose:
            acc.block_until_ready()
            print(f"  sample {s_idx + 1}/{spp}  ({time.time() - t0:.1f}s)")

    layers = film.to_bitmap(acc)
    layers = np.asarray(layers)
    return {
        "composite": layers[0],
        "albedo": layers[1],
        "normal": layers[2],
        "weights": np.asarray(acc[0, ..., 3]),
    }
