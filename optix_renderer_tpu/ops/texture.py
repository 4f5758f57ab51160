"""Texture evaluation over the tagged-union texture table.

Counterpart of the reference `Texture<T>::eval(uv)` plugins
(src/textures/{consttexture,checkerboard,PNGTexture}.cpp). Batched gather:
`tex_id [N]`, `uv [N,2]` → color `[N,3]`. Branch-free select across types.
"""

from __future__ import annotations

import jax.numpy as jnp

from optix_renderer_tpu.scene.data import Textures, TextureType


def eval_texture(tex: Textures, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Evaluate texture `tex_id` at `uv`; id<0 → white (1,1,1)."""
    tid = jnp.maximum(tex_id, 0)
    ttype = tex.type[tid]
    v1 = tex.value[tid]
    v2 = tex.value2[tid]
    scale = tex.scale_uv[tid]
    shift = tex.shift_uv[tid]

    # checkerboard (checkerboard.cpp: floor((uv-delta)/scale), parity test)
    st = (uv - shift) / jnp.maximum(scale, 1e-20)
    parity = (jnp.floor(st[..., 0]) + jnp.floor(st[..., 1])).astype(jnp.int32) % 2
    checker = jnp.where((parity == 0)[..., None], v1, v2)

    # image (PNGTexture.cpp eval: repeat wrap, bilinear off in reference —
    # nearest lookup; linear-space values)
    iid = jnp.maximum(tex.image_id[tid], 0)
    hw = tex.image_hw[iid]
    u_wrapped = (uv[..., 0] * scale[..., 0]) % 1.0
    v_wrapped = (uv[..., 1] * scale[..., 1]) % 1.0
    x = jnp.clip(
        (u_wrapped * hw[..., 1].astype(jnp.float32)).astype(jnp.int32), 0, hw[..., 1] - 1
    )
    y = jnp.clip(
        (v_wrapped * hw[..., 0].astype(jnp.float32)).astype(jnp.int32), 0, hw[..., 0] - 1
    )
    image = tex.image_data[iid, y, x]

    out = jnp.where(
        (ttype == TextureType.CONST)[..., None],
        v1,
        jnp.where((ttype == TextureType.CHECKER)[..., None], checker, image),
    )
    return jnp.where(tex_id[..., None] < 0, jnp.ones_like(out), out)
