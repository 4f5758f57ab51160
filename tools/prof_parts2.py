"""Marginal per-iteration costs: vary N_IT, subtract fixed overhead."""
import time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from optix_renderer_tpu.ops.pallas import pathk, mega

S, L = mega.S, mega.L
NB = 32

def make(n_it, mode):
    def kern(x_ref, tri_ref, out_ref):
        a = x_ref[0, 0]
        def body(c):
            it, acc = c
            if mode == "empty":
                acc = acc + 1.0
            elif mode == "reduce":
                acc = acc + jnp.max(acc) * 1e-12 + 1.0
            elif mode == "madd100":
                x = acc
                for _ in range(100):
                    x = x * 1.000001 + 0.5
                acc = acc + x * 1e-12
            elif mode == "isect":
                o = (acc, acc + 1, acc + 2)
                d = (acc * 0 + 0.3, acc * 0 + 0.5, acc * 0 - 0.8)
                t, u, v, hit, A, occ = pathk._isect_vpu(
                    tri_ref, 14, o, d, acc * 0, acc * 0 + 1e9, o, d, acc * 0 + 5.0)
                acc = acc + t * 1e-12 + A["kdr"] * 1e-12
            return (it + 1, acc)
        it, acc = jax.lax.while_loop(lambda c: c[0] < n_it, body,
                                     (jnp.int32(0), a * 0))
        out_ref[0, 0] = acc
        for c in range(1, 8):
            out_ref[c, 0] = acc
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, NB, S, L), jnp.float32),
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, 8, S, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, pathk.TR_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 1, S, L), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda a, t: f(a, t))

x = jnp.ones((NB, 8, S, L), jnp.float32)
tri = jnp.ones((16, pathk.TR_COLS), jnp.float32) * 0.3

for mode in ("empty", "reduce", "madd100", "isect"):
    times = {}
    for n_it in (64, 1024):
        f = make(n_it, mode)
        out = f(x, tri); _ = float(np.asarray(out[0,0,0,0]))
        t0 = time.time(); reps = 3
        for _ in range(reps):
            out = f(x, tri); _ = float(np.asarray(out[0,0,0,0]))
        times[n_it] = (time.time() - t0) / reps
    marg = (times[1024] - times[64]) / (1024 - 64) / NB * 1e6
    print(f"{mode:10s}: t64={times[64]*1e3:7.1f}ms t1024={times[1024]*1e3:7.1f}ms "
          f"marginal={marg:7.3f} us/block-iter")
