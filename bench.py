"""Benchmark suite on the available accelerator.

Prints ONE JSON line with the headline metric (Cornell path-MIS throughput)
and writes the full multi-config table to BENCH_DETAILS.json:

- cornell_path_mis:   800×600 brute-force Cornell (BASELINE.md headline;
                      reference CPU ≈ 1.6 Mpaths/s)
- mesh100k_path_mis:  Cornell with ~100k-triangle tessellated spheres
                      (Morton-cluster Pallas traversal, ops/pallas/cluster.py)
- mesh100k_primary:   device-side primary-ray closest-hit rate through the
                      cluster traversal (Mrays/s, chained-call marginal)
- heterog_path_vol:   the reference flagship heterogeneous-media scene
                      (fluid_data_0050.vdb, path_vol_mats)

All renders go through render.render()'s production dispatch (the
regenerating Pallas megakernel for eligible scenes, ops/pallas/pathk.py;
XLA integrators otherwise). Throughput counts camera paths (pixels × spp)
per second, wall-clock including the film fetch.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: Mosaic/XLA compiles through the axon tunnel cost
# 10-100 s; the cache drops warm-start bench runs to pure execution time
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_MPATHS = 1.6  # reference CPU Cornell path-MIS, BASELINE.md


def _run(scene, config, spp: int) -> float:
    """Render spp samples with the production path; returns Mpaths/s.

    HONEST TIMING: through the axon tunnel `block_until_ready` returns
    without waiting for device execution (measured: 20 chained 8192³ matmuls
    "finish" in 0.9 ms), so every timing loop must end with a host fetch of
    the result. Earlier rounds' published numbers used block_until_ready and
    measured dispatch rate, not render rate.
    """
    from optix_renderer_tpu.render.render import render

    # warmup / compile with a forced fetch — one full dispatch GROUP so the
    # spp-group kernel variant used by the timed render is compiled/cached
    out = render(scene, config, sample_count=min(spp, 16))
    _ = np.asarray(out["composite"]).ravel()[0]

    t0 = time.time()
    out = render(scene, config, sample_count=spp)
    _ = np.asarray(out["composite"]).ravel()[0]  # render() already fetches; belt+braces
    dt = time.time() - t0
    return config.width * config.height * spp / dt / 1e6


def bench_cornell():
    """BASELINE.md headline config: Cornell 800×600 path_mis 512 spp.

    Returns (Mpaths/s, spp/s, Mray_slots/s). Ray slots count the closest-hit
    + shadow sweeps the kernel actually executed (2 per lane-iteration, from
    the kernel's iteration-count diagnostic row) — the TPU analog of Mrays/s;
    live-ray occupancy within a slot varies with regeneration raggedness.
    """
    from optix_renderer_tpu.ops.pallas import pathk
    from optix_renderer_tpu.scene.presets import make_cornell_box

    scene, config, _ = make_cornell_box(width=800, height=600, spp=1,
                                        integrator="path_mis")
    config = dataclasses.replace(config, max_depth=16)
    spp = 512
    mpaths = _run(scene, config, spp=spp)
    spp_per_s = mpaths * 1e6 / (config.width * config.height)

    # ray-slot rate from the kernel's own iteration counter
    tables, meta = pathk.build_pathk_tables(scene, config)
    n_pix = config.width * config.height
    nb = (n_pix + pathk.BLOCK - 1) // pathk.BLOCK
    f = jax.jit(lambda s0: pathk.pathk_trace(
        tables, meta, config, n_pix=n_pix, nb=nb, spp0=s0, n_spp=64))
    out = f(jnp.int32(0))
    _ = float(np.asarray(out[0, 0, 0, 0]))
    t0 = time.time()
    out = f(jnp.int32(1))
    iters = np.asarray(out[10, :, 0, 0]).sum()
    _ = float(np.asarray(out[0, 0, 0, 0]))
    dt = time.time() - t0
    mray_slots = float(iters) * pathk.BLOCK * 2 / dt / 1e6
    return float(mpaths), float(spp_per_s), float(mray_slots)


def bench_mesh100k():
    """100k-tri tessellated Cornell: path render + primary closest-hit.

    The path number is honest single-render wall clock. The primary-ray rate
    is the DEVICE-SIDE marginal: K chained traversals inside one jit, rate
    from (t_K − t_1)/(K−1) — a single call through the axon tunnel carries a
    fixed ~30 ms dispatch+fetch round trip that would otherwise swamp the
    measurement (BASELINE.md round-5 note); the marginal is what a real
    multi-bounce render pays per traversal.
    """
    from functools import partial

    from optix_renderer_tpu.ops import camera as camera_ops
    from optix_renderer_tpu.ops.intersect import intersect
    from optix_renderer_tpu.render import sampler as smp
    from optix_renderer_tpu.scene.presets import make_tessellated_cornell

    scene, config, _ = make_tessellated_cornell(width=400, height=300, spp=1,
                                                integrator="path_mis")
    config = dataclasses.replace(config, max_depth=8)
    mpaths = _run(scene, config, spp=4)

    n = 1 << 17

    @partial(jax.jit, static_argnames=("k",))
    def primaries(scene, ids, salt, k):
        px = (ids % 800).astype(jnp.float32)
        py = (ids // 800).astype(jnp.float32)
        s = smp.make_sampler(ids.astype(jnp.uint32), salt.astype(jnp.uint32))
        s, j2 = smp.next_2d(s)
        pos = jnp.stack([px, py], -1) + j2
        ray, _ = camera_ops.sample_ray(scene.camera, 800, 600, pos, j2)
        acc = jnp.float32(0)
        for i in range(k):
            r = ray._replace(mint=ray.mint + 1e-7 * i)
            hit = intersect(scene.geometry, r)
            acc += hit.t.sum() + hit.prim_id.sum()
        return acc

    ids = jnp.arange(n, dtype=jnp.int32) % (800 * 600)
    times = {}
    for k in (1, 5):
        float(primaries(scene, ids, jnp.uint32(0), k))  # compile + fetch
        t0 = time.time()
        for rep in range(3):
            float(primaries(scene, ids, jnp.uint32(rep), k))  # host fetch
        times[k] = (time.time() - t0) / 3
    mrays = n * 4 / max(times[5] - times[1], 1e-9) / 1e6
    return mpaths, mrays, int(scene.geometry.tri_v0.shape[0])


def bench_sharded_1chip() -> float:
    """Cornell through render_sharded on a 1-device mesh: quantifies the
    shard_map + mesh overhead relative to the unsharded megakernel path
    (the two-device-loop budget split of render.cpp:281,501, degenerate)."""
    from optix_renderer_tpu.parallel.shard import make_mesh, render_sharded
    from optix_renderer_tpu.scene.presets import make_cornell_box

    scene, config, _ = make_cornell_box(width=800, height=600, spp=1,
                                        integrator="path_mis")
    config = dataclasses.replace(config, max_depth=16)
    mesh = make_mesh(n_devices=1)
    spp = 64
    # first call compiles (the shard_map-wrapped kernel misses the
    # persistent cache); time the warm repeat
    out = render_sharded(scene, config, mesh, sample_count=spp)
    _ = np.asarray(out["composite"]).ravel()[0]
    t0 = time.time()
    out = render_sharded(scene, config, mesh, sample_count=spp)
    _ = np.asarray(out["composite"]).ravel()[0]
    return float(config.width * config.height * spp / (time.time() - t0) / 1e6)


def bench_heterog() -> float | None:
    xml = Path("/root/reference/scenes/project/volume/cbox_heterog.xml")
    if not xml.exists():
        return None
    from optix_renderer_tpu.scene.build import load_scene

    scene, config, _ = load_scene(xml)
    config = dataclasses.replace(config, width=400, height=300, max_depth=8)
    return _run(scene, config, spp=1)


def main():
    results = {}
    cornell, spp_s, mray_slots = bench_cornell()
    results["cornell_path_mis"] = {
        "value": round(cornell, 2), "unit": "Mpaths/s", "spp": 512,
        "spp_per_s": round(spp_s, 2),
        "mray_slots_per_s": round(mray_slots, 1),
    }
    mesh_mpaths, mesh_mrays, n_tris = bench_mesh100k()
    results["mesh100k_path_mis"] = {
        "value": round(mesh_mpaths, 2), "unit": "Mpaths/s", "tris": n_tris,
    }
    results["mesh100k_primary"] = {"value": round(mesh_mrays, 1), "unit": "Mrays/s"}
    results["cornell_sharded_1chip"] = {
        "value": round(bench_sharded_1chip(), 2), "unit": "Mpaths/s", "spp": 64,
    }
    het = bench_heterog()
    if het is not None:
        results["heterog_path_vol"] = {"value": round(het, 2), "unit": "Mpaths/s"}
    results["device"] = str(jax.devices()[0])

    Path("BENCH_DETAILS.json").write_text(json.dumps(results, indent=1))
    print(
        json.dumps(
            {
                "metric": "cornell_path_mis_throughput",
                "value": round(cornell, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(cornell / BASELINE_MPATHS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
