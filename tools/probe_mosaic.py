"""Probe Mosaic primitives needed by the cluster traversal kernel."""
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

C, CS, W = 16, 64, 1024


def kern(hbm_ref, sel_ref, out_ref, flags_v, flags_s, buf, sem, sem2):
    # 1. dynamic sublane store into VMEM scratch
    def cull(c, _):
        val = jnp.full((1, 8), 1.0, jnp.float32) * (c % 2)
        flags_v[pl.ds(c, 1), :] = val
        return 0

    jax.lax.fori_loop(0, C, cull, 0)
    # 2. VMEM -> SMEM DMA
    cp = pltpu.make_async_copy(flags_v, flags_s, sem2)
    cp.start()
    cp.wait()

    # 3. visit loop: scalar-read SMEM flag, lax.cond with dynamic-index DMA
    def visit(c, acc):
        flag = flags_s[c, 0] > 0.5

        def hit(acc):
            cp = pltpu.make_async_copy(hbm_ref.at[sel_ref[c]], buf, sem)
            cp.start()
            cp.wait()
            return acc + jnp.sum(buf[:], axis=0, keepdims=True)

        def miss(acc):
            return acc

        return jax.lax.cond(flag, hit, miss, acc)

    acc = jax.lax.fori_loop(0, C, visit, jnp.zeros((1, W), jnp.float32))
    out_ref[0:1, :] = acc
    for r in range(1, 8):
        out_ref[r : r + 1, :] = acc


x = jnp.arange(C * CS * W, dtype=jnp.float32).reshape(C, CS, W) * 1e-6
sel = jnp.asarray(np.arange(C)[::-1].copy(), jnp.int32)

f = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((C, 8), jnp.float32),
        pltpu.SMEM((C, 8), jnp.float32),
        pltpu.VMEM((CS, W), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ],
)
out = f(x, sel)
got = np.asarray(out)[0]

# reference: clusters with c%2==1, selected id = C-1-c
ref = np.zeros(W, np.float32)
xn = np.asarray(x)
for c in range(C):
    if c % 2 == 1:
        ref += xn[C - 1 - c].sum(axis=0)
print("max err:", np.abs(got - ref).max(), "ref scale:", np.abs(ref).max())
print("PROBE OK" if np.abs(got - ref).max() < 1e-3 * max(1, np.abs(ref).max()) else "PROBE MISMATCH")
