import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
for mb in (1, 4, 23, 64):
    n = mb * 250000
    x = jnp.ones((n,), jnp.float32) * 2.0
    _ = np.asarray(x[:8])
    for rep in range(3):
        t0=time.time(); h = np.asarray(x); dt=time.time()-t0
        if rep == 2:
            print(f"{mb:3d}MB fetch: {dt:.3f}s  {mb/dt:.1f} MB/s")
# device_get vs asarray; also jax.device_get on sharded?
x = jnp.ones((23*250000,), jnp.float32)
_ = np.asarray(x[:8])
t0=time.time(); h = jax.device_get(x); print(f"device_get 23MB: {time.time()-t0:.3f}s")
t0=time.time(); h = np.asarray(x.astype(jnp.float16)); print(f"f16 fetch 11.5MB: {time.time()-t0:.3f}s")
