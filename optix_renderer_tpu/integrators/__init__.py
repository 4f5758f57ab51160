"""Integrator registry: name → wavefront Li function.

The analog of the reference's `NORI_REGISTER_CLASS(..., "path_mis")` plugin
registry (object.h:229-291) restricted to integrators (src/integrators/).
Every integrator has the signature

    li(scene: SceneData, config: RenderConfig, ray: Ray, sampler: Sampler)
        -> (L [N,3], albedo [N,3], normal [N,3], sampler)

— the batched counterpart of `Integrator::Li(scene, sampler, ray, &albedo,
&normal)` (integrator.h:70).
"""

from optix_renderer_tpu.integrators import path as _path
from optix_renderer_tpu.integrators import pmap as _pmap
from optix_renderer_tpu.integrators import simple as _simple
from optix_renderer_tpu.integrators import volpath as _volpath

REGISTRY = {
    "photonmapper": _pmap.li_photonmapper,
    "normals": _simple.li_normals,
    "av": _simple.li_av,
    "direct": _simple.li_direct,
    "direct_ems": _simple.li_direct_ems,
    "direct_mats": _simple.li_direct_mats,
    "direct_mis": _simple.li_direct_mis,
    "preview": _simple.li_preview,
    "envmaptester": _simple.li_envmaptester,
    "path_mats": _path.li_path_mats,
    "path_mis": _path.li_path_mis,
    "path_vol_mats": _volpath.li_path_vol_mats,
    "path_vol_mis": _volpath.li_path_vol_mis,
}


def get_integrator(name: str):
    if name not in REGISTRY:
        raise KeyError(
            f"unknown integrator '{name}'; available: {sorted(REGISTRY)}"
        )
    return REGISTRY[name]
