"""Benchmark: Cornell-box path-MIS throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference CPU renderer achieves ≈1.6 Mpaths/s on
its 800×600 Cornell-box path-MIS ground-truth render (1024 spp in ~5 min,
reports/project-report/denoising.html). We measure camera paths per second on
the same workload shape (800×600, path_mis, RR + NEE + MIS) on one chip.
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from optix_renderer_tpu.render.render import render_round
from optix_renderer_tpu.scene.presets import make_cornell_box

BASELINE_MPATHS = 1.6  # reference CPU, BASELINE.md


def main():
    width, height = 800, 600
    scene, config, _ = make_cornell_box(
        width=width, height=height, spp=1, integrator="path_mis"
    )
    config = dataclasses.replace(config, max_depth=16)

    n_pix = width * height
    chunk = 1 << 16
    n_chunks = (n_pix + chunk - 1) // chunk
    pad = n_chunks * chunk - n_pix
    ids_all = jnp.concatenate(
        [
            jnp.arange(n_pix, dtype=jnp.int32),
            jnp.full((pad,), -(1 << 20), jnp.int32),
        ]
    ).reshape(n_chunks, chunk)

    # warmup / compile
    render_round(scene, config, ids_all[0], jnp.int32(0)).block_until_ready()

    spp = 8
    t0 = time.time()
    acc = None
    for s in range(spp):
        for c in range(n_chunks):
            out = render_round(scene, config, ids_all[c], jnp.int32(s))
            acc = out if acc is None else acc + out
    acc.block_until_ready()
    dt = time.time() - t0

    paths = n_pix * spp
    mpaths_per_s = paths / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "cornell_path_mis_throughput",
                "value": round(mpaths_per_s, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(mpaths_per_s / BASELINE_MPATHS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
