"""Megakernel render loop: whole sample rounds in ONE jit dispatch.

Glue between render.render() and ops/pallas/mega.py. Everything between the
scene pytree and the film accumulator — raygen, strip packing, the fused
bounce-loop kernel, the stencil splat, accumulation over several spp — runs
inside a single jit call, because on this backend the dominant costs are
per-dispatch latency (~6 ms) and jit-output transfer (~170 MB/s): the film
crosses the boundary once per dispatch group instead of once per round
(BASELINE.md backend cost model; the fused-accumulate note in render.py is
the same battle one level up).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from optix_renderer_tpu.ops import camera as camera_ops
from optix_renderer_tpu.ops.pallas import mega
from optix_renderer_tpu.render import sampler as smp
from optix_renderer_tpu.scene.data import RenderConfig, SceneData

BLOCK = mega.S * mega.L  # rays per kernel grid step


def _strip(a, nb):
    """[C, Npad] → [nb, C, S, L] strip layout (g = i·BLOCK + s·L + l)."""
    c = a.shape[0]
    return jnp.transpose(
        a.reshape(c, nb, mega.S, mega.L), (1, 0, 2, 3)
    )


@partial(jax.jit, static_argnames=("config", "n_rounds", "interpret"),
         donate_argnums=(0,))
def mega_rounds(
    acc: jnp.ndarray,  # [3,H,W,4] donated
    tables: dict,  # device tables from build_mega_tables
    camera,  # scene.camera pytree
    config: RenderConfig,
    start_spp: jnp.ndarray,  # [] int32
    n_rounds: int,
    interpret: bool = False,
) -> jnp.ndarray:
    w, h = config.width, config.height
    n_pix = w * h
    nb = (n_pix + BLOCK - 1) // BLOCK
    n_pad = nb * BLOCK
    mis = config.integrator == "path_mis"
    n_lights = max(config.n_emitters, 1)

    lane = jnp.arange(n_pad, dtype=jnp.int32)
    is_pad = lane >= n_pix
    pix = jnp.minimum(lane, n_pix - 1)
    px = (pix % w).astype(jnp.float32)
    py = (pix // w).astype(jnp.float32)

    halo, _window_pad, total_cols = mega.splat_window(n_pad, w, config.rfilter)

    def round_body(k, acc):
        sample_idx = start_spp + k
        s = smp.make_sampler(
            pix.astype(jnp.uint32),
            jnp.broadcast_to(sample_idx.astype(jnp.uint32), pix.shape),
            seed=config.seed,
        )
        s, jitter = smp.next_2d(s)
        s, aperture = smp.next_2d(s)
        pos = jnp.stack([px, py], axis=-1) + jitter
        ray, _w = camera_ops.sample_ray(camera, w, h, pos, aperture)

        rays = jnp.stack([
            ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
            ray.d[:, 0], ray.d[:, 1], ray.d[:, 2],
            ray.mint, jnp.where(jnp.isinf(ray.maxt), mega.BIG, ray.maxt),
        ])  # [8, n_pad]
        st = s.state
        rngs = jnp.stack([st.state_hi, st.state_lo, st.inc_hi, st.inc_lo])

        out = mega.mega_trace(
            _strip(rays, nb),
            _strip(rngs, nb),
            tables,
            mis=mis,
            max_depth=config.max_depth,
            n_lights=n_lights,
            interpret=interpret,
        )  # [12, nb, S, L]
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(nb, 12, -1)
        out = jnp.transpose(out, (1, 0, 2)).reshape(12, n_pad)

        Lrgb = jnp.nan_to_num(out[0:3], nan=0.0, posinf=0.0, neginf=0.0)
        vin = jnp.concatenate([
            Lrgb,
            out[3:9],
            jitter[:, 0][None, :],
            jitter[:, 1][None, :],
            jnp.where(is_pad, -10000.0, px)[None, :],
            jnp.zeros((4, n_pad), jnp.float32),
        ])  # [16, n_pad] (sublane count must be a multiple of 8 for the DMA)
        vin = jnp.pad(vin, ((0, 0), (halo, total_cols - n_pad - halo)))
        vin = vin.at[11, :halo].set(-10000.0)
        vin = vin.at[11, halo + n_pad :].set(-10000.0)
        film_c = mega.splat_stencil(
            vin, n_pad, width=w, rfilter=config.rfilter, interpret=interpret
        )  # [10, n_pad]

        vals = film_c[:9, :n_pix].reshape(3, 3, h, w).transpose(0, 2, 3, 1)
        wch = film_c[9, :n_pix].reshape(h, w)
        contrib = jnp.concatenate(
            [vals, jnp.broadcast_to(wch[None, :, :, None], (3, h, w, 1))],
            axis=-1,
        )
        return acc + contrib

    return jax.lax.fori_loop(0, n_rounds, round_body, acc)


def render_mega(
    scene: SceneData,
    config: RenderConfig,
    sample_count: int | None = None,
    verbose: bool = False,
    preview_every: int = 0,
    preview_callback=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    rounds_per_dispatch: int = 8,
    interpret: bool = False,
) -> dict[str, np.ndarray]:
    """Full render through the megakernel. Same contract as render.render()
    (layers dict, checkpoint/resume at sample-round granularity)."""
    import os
    import time

    from optix_renderer_tpu.render.render import (
        _layers_out,
        _norm_ckpt_path,
        load_checkpoint,
        save_checkpoint,
    )

    spp = sample_count if sample_count is not None else config.sample_count
    tables = mega.build_mega_tables(scene)

    acc = jnp.zeros((3, config.height, config.width, 4), jnp.float32)
    start_spp = 0
    if resume and checkpoint_path and os.path.exists(_norm_ckpt_path(checkpoint_path)):
        acc, start_spp = load_checkpoint(checkpoint_path, config)
        if verbose:
            print(f"  resumed at sample {start_spp} from {checkpoint_path}")

    # dispatch cadence: previews/checkpoints bound the rounds per jit call
    group = rounds_per_dispatch
    if preview_every:
        group = min(group, preview_every)
    if checkpoint_every:
        group = min(group, checkpoint_every)

    t0 = time.time()
    spp_done = start_spp
    try:
        while spp_done < spp:
            n_r = min(group, spp - spp_done)
            acc = mega_rounds(
                acc, tables, scene.camera, config,
                jnp.int32(spp_done), n_r, interpret,
            )
            spp_done += n_r
            if verbose:
                np.asarray(acc[0, 0, 0])  # force completion for honest pacing
                print(f"  sample {spp_done}/{spp}  ({time.time() - t0:.1f}s)")
            if preview_every and preview_callback and spp_done % preview_every == 0:
                preview_callback(_layers_out(acc), spp_done)
            if checkpoint_path and checkpoint_every and spp_done % checkpoint_every == 0:
                save_checkpoint(checkpoint_path, acc, spp_done, config)
    except KeyboardInterrupt:
        if verbose:
            print(f"  interrupted at sample {spp_done}/{spp} — partial film returned")

    if checkpoint_path and spp_done >= spp:
        save_checkpoint(checkpoint_path, acc, spp_done, config)
    out = _layers_out(acc)
    out["spp_done"] = spp_done
    return out
