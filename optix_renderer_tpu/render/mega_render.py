"""Megakernel render loop: the whole render in a handful of dispatches.

Glue between render.render() and ops/pallas/pathk.py. One jit call runs a
full group of samples-per-pixel: the regenerating kernel generates camera
rays, traces, shades and accumulates per-pixel sums entirely on-chip; only
the [16, nb, S, L] accumulator rows cross the jit boundary, once per group.
On this backend the dominant costs are per-dispatch latency (~6 ms) and
jit-output transfer (~170 MB/s) (BASELINE.md backend cost model), so the
group size only matters for checkpoint/preview cadence.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from optix_renderer_tpu.ops.pallas import pathk
from optix_renderer_tpu.scene.data import RenderConfig, SceneData

BLOCK = pathk.BLOCK


@partial(
    jax.jit,
    static_argnames=("config", "n_spp", "t_cnt", "te_cnt", "use_mxu",
                     "use_dof", "n_sph", "n_emitters", "interpret"),
    donate_argnums=(0,),
)
def _pathk_group(
    acc: jnp.ndarray,  # [3,H,W,4] donated
    tables: dict,
    config: RenderConfig,
    spp0: jnp.ndarray,  # [] int32
    n_spp: int,
    t_cnt: int,
    te_cnt: int,
    use_mxu: bool,
    use_dof: bool,
    n_sph: int,
    n_emitters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    w, h = config.width, config.height
    n_pix = w * h
    nb = (n_pix + BLOCK - 1) // BLOCK
    meta = {
        "t_cnt": t_cnt, "te_cnt": te_cnt, "use_mxu": use_mxu,
        "use_dof": use_dof, "n_sph": n_sph, "n_emitters": n_emitters,
    }
    out = pathk.pathk_trace(
        tables, meta, config, n_pix=n_pix, nb=nb, spp0=spp0, n_spp=n_spp,
        interpret=interpret,
    )  # [16, nb, S, L]
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(nb, 16, -1)
    out = jnp.transpose(out, (1, 0, 2)).reshape(16, nb * BLOCK)[:, :n_pix]
    out = jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)

    vals = out[jnp.array([0, 1, 2, 4, 5, 6, 7, 8, 9])]
    vals = vals.reshape(3, 3, h, w).transpose(0, 2, 3, 1)  # [3 layers,H,W,3]
    wch = out[3].reshape(h, w)
    contrib = jnp.concatenate(
        [vals, jnp.broadcast_to(wch[None, :, :, None], (3, h, w, 1))], axis=-1
    )
    return acc + contrib


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
    rounds_per_dispatch: int = 16,
    interpret: bool = False,
) -> dict[str, np.ndarray]:
    """Full render through the regenerating path kernel. Same contract as
    render.render() (layers dict, checkpoint/resume at group granularity)."""
    import os
    import time

    from optix_renderer_tpu.render.render import (
        _layers_out,
        _norm_ckpt_path,
        load_checkpoint,
        save_checkpoint,
    )

    spp = sample_count if sample_count is not None else config.sample_count
    tables, meta = pathk.build_pathk_tables(scene, config)

    acc = jnp.zeros((3, config.height, config.width, 4), jnp.float32)
    start_spp = 0
    if resume and checkpoint_path and os.path.exists(_norm_ckpt_path(checkpoint_path)):
        acc, start_spp = load_checkpoint(checkpoint_path, config)
        if verbose:
            print(f"  resumed at sample {start_spp} from {checkpoint_path}")

    # dispatch cadence: previews/checkpoints bound the samples per jit call
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
            acc = _pathk_group(
                acc, tables, config, jnp.int32(spp_done), n_r,
                meta["t_cnt"], meta["te_cnt"], meta["use_mxu"],
                meta["use_dof"], meta["n_sph"], meta["n_emitters"],
                interpret,
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
