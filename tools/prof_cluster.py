"""Benchmark cluster traversal on the real TPU: 100k-tri primary rays."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from optix_renderer_tpu.scene.presets import make_tessellated_cornell
from optix_renderer_tpu.ops import camera as camera_ops
from optix_renderer_tpu.ops.intersect import intersect
from optix_renderer_tpu.render import sampler as smp

t0 = time.time()
scene, config, _ = make_tessellated_cornell(width=400, height=300, spp=1,
                                            integrator="path_mis")
print(f"scene build: {time.time()-t0:.1f}s  tris={scene.geometry.tri_v0.shape[0]}"
      f"  clusters={None if scene.geometry.clusters is None else scene.geometry.clusters.coeffs.shape}")

n = 1 << 17


def primaries(scene, ids, salt):
    px = (ids % 800).astype(jnp.float32)
    py = (ids // 800).astype(jnp.float32)
    s = smp.make_sampler(ids.astype(jnp.uint32), salt * jnp.ones((), jnp.uint32))
    s, j2 = smp.next_2d(s)
    pos = jnp.stack([px, py], -1) + j2
    ray, _ = camera_ops.sample_ray(scene.camera, 800, 600, pos, j2)
    hit = intersect(scene.geometry, ray)
    return hit.t.sum() + hit.prim_id.sum(), hit


jf = jax.jit(lambda sc, ids, salt: primaries(sc, ids, salt)[0])
ids = jnp.arange(n, dtype=jnp.int32) % (800 * 600)
t0 = time.time()
print("first:", float(jf(scene, ids, jnp.uint32(0))), f"(compile {time.time()-t0:.1f}s)")
reps = 5
t0 = time.time()
vals = [jf(scene, ids, jnp.uint32(i)) for i in range(reps)]
_ = [float(v) for v in vals]
dt = time.time() - t0
print(f"primary closest-hit: {n*reps/dt/1e6:.1f} Mrays/s")

# incoherent (random) rays — the bounce-ray regime
rng = np.random.default_rng(0)
o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
o[:, 1] += 1.0
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
from optix_renderer_tpu.core.math import Ray
ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
          mint=jnp.full(n, 1e-4, jnp.float32), maxt=jnp.full(n, 1e9, jnp.float32))
jf2 = jax.jit(lambda sc, r: intersect(sc.geometry, r).t.sum())
print("incoh first:", float(jf2(scene, ray)))
t0 = time.time()
vals = [jf2(scene, Ray(o=ray.o, d=ray.d, mint=ray.mint * (1 + 1e-6 * i), maxt=ray.maxt))
        for i in range(3)]
_ = [float(v) for v in vals]
dt = time.time() - t0
print(f"incoherent closest-hit: {n*3/dt/1e6:.1f} Mrays/s")

# shadow/any-hit
jf3 = jax.jit(lambda sc, r: intersect(sc.geometry, r, any_hit=True).prim_kind.sum())
print("anyhit first:", float(jf3(scene, ray)))
t0 = time.time()
vals = [jf3(scene, Ray(o=ray.o, d=ray.d, mint=ray.mint * (1 + 1e-6 * i), maxt=ray.maxt))
        for i in range(3)]
_ = [float(v) for v in vals]
print(f"incoherent any-hit: {n*3/(time.time()-t0)/1e6:.1f} Mrays/s")

# diagnostics: worklist sizes + swept counts per block
from optix_renderer_tpu.ops.pallas import cluster as cl_mod
ids2 = jnp.arange(1 << 16, dtype=jnp.int32) % (800 * 600)
s2 = smp.make_sampler(ids2.astype(jnp.uint32), jnp.zeros((), jnp.uint32))
s2, j22 = smp.next_2d(s2)
pos2 = jnp.stack([(ids2 % 800).astype(jnp.float32), (ids2 // 800).astype(jnp.float32)], -1) + j22
ray2, _ = camera_ops.sample_ray(scene.camera, 800, 600, pos2, j22)
f_raw = jax.jit(lambda o, d, mi, ma: cl_mod.cluster_raw(o, d, mi, ma, scene.geometry.clusters))
t_, u_, v_, i_ = f_raw(ray2.o, ray2.d, ray2.mint, jnp.full(1 << 16, 1e9))
out = np.asarray(jnp.stack([t_, i_]))
# recover diagnostics via direct pallas out? cluster_raw slices them away; call once more at block level
o = ray2.o; import numpy as np
nwork = np.asarray(f_raw(ray2.o, ray2.d, ray2.mint, jnp.full(1 << 16, 1e9))[0])  # warm
dbg = jax.jit(lambda o, d, mi, ma: cl_mod.cluster_raw(
    o, d, mi, ma, scene.geometry.clusters, debug=True))
outs = dbg(ray2.o, ray2.d, ray2.mint, jnp.full(1 << 16, 1e9))
nwork = np.asarray(outs[4][:: cl_mod.W]); nswept = np.asarray(outs[5][:: cl_mod.W])
print("primary blocks: n_work mean", nwork.mean(), "max", nwork.max(),
      " swept mean", nswept.mean(), "max", nswept.max())
