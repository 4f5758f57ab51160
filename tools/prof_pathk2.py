"""Pathk diagnostics: iteration counts + ablation timings on real TPU."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from optix_renderer_tpu.ops.pallas import pathk
from optix_renderer_tpu.scene.presets import make_cornell_box

scene, config0, _ = make_cornell_box(width=800, height=600, spp=1,
                                     integrator="path_mis")


def bench(integrator, max_depth, spp):
    config = dataclasses.replace(config0, max_depth=max_depth,
                                 integrator=integrator)
    tables, meta = pathk.build_pathk_tables(scene, config)
    n_pix = config.width * config.height
    nb = (n_pix + pathk.BLOCK - 1) // pathk.BLOCK

    f = jax.jit(lambda s0: pathk.pathk_trace(
        tables, meta, config, n_pix=n_pix, nb=nb, spp0=s0, n_spp=spp))
    out = f(jnp.int32(0))
    _ = float(np.asarray(out[0, 0, 0, 0]))
    t0 = time.time()
    out = f(jnp.int32(0))
    iters = np.asarray(out[10, :, 0, 0])
    _ = float(np.asarray(out[0, 0, 0, 0]))
    dt = time.time() - t0
    tot_iters = iters.sum()
    print(f"{integrator:10s} d={max_depth:2d} spp={spp:2d}: {dt:7.2f}s "
          f"{n_pix*spp/dt/1e6:7.2f} Mpaths/s  iters mean={iters.mean():6.1f} "
          f"max={iters.max():5.0f}  us/block-iter={dt/tot_iters*1e6:7.1f}")


bench("path_mats", 16, 16)
bench("path_mis", 16, 16)
bench("path_mis", 4, 4)

# stability check: rerun each config thrice
bench("path_mats", 16, 16)
bench("path_mis", 16, 16)
bench("path_mis", 16, 16)
