"""Volumetric path tracers (path_vol_mats / path_vol_mis).

Counterparts of src/integrators/{path_vol_mats.cpp, path_vol_mis.cpp}:
free-path sampling in participating media, phase-function sampling,
transmittance-accumulating shadow rays. Implemented in this module once the
media kernels (ops/medium) land; registered now so scene configs parse.
"""

from __future__ import annotations


def li_path_vol_mats(scene, config, ray, sampler):
    from optix_renderer_tpu.integrators.volpath import li_vol

    return li_vol(scene, config, ray, sampler, use_mis=False)


def li_path_vol_mis(scene, config, ray, sampler):
    from optix_renderer_tpu.integrators.volpath import li_vol

    return li_vol(scene, config, ray, sampler, use_mis=True)
