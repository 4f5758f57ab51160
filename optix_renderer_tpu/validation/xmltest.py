"""Executable `<test type="ttest"|"chi2test">` XML scenes.

Semantics match the reference executables:
- ttest BSDF mode (ttest.cpp:147-189): per BSDF × incidence angle, draw
  sampleCount importance samples, t-test the mean sample luminance (the
  `sample()` return value fr·cos/pdf) against the analytic reference.
- ttest scene mode (ttest.cpp:191-239): per <scene> child, shoot sampleCount
  random camera rays, t-test the mean Li luminance against the reference.
- chi2test (chi2test.cpp:131-270): per BSDF, `testCount` runs with random wi;
  histogram wo over a cosθ×φ contingency table; expected counts from
  numerically integrating pdf(); pooled χ² with Šidák battery correction.

Batched: the reference's per-sample loops become one vectorized draw.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.utils import hypothesis as hyp

_LUM = np.array([0.212671, 0.715160, 0.072169])  # color.h getLuminance


@dataclass
class TestReport:
    passed: int
    total: int
    messages: list

    @property
    def ok(self) -> bool:
        return self.passed == self.total and self.total > 0


def _floats(s: str) -> list[float]:
    return [float(x) for x in re.split(r"[\s,;]+", s.strip()) if x]


def run_xml_test(path_or_node, verbose: bool = True, sample_scale: float = 1.0) -> TestReport:
    """Load and execute a <test> XML (the reference runs these on scene load,
    ttest.cpp:81-95 cloneAndInit → execute). `sample_scale` shrinks sample
    counts for fast CI tiers."""
    from optix_renderer_tpu.scene.parser import SceneNode, load_from_xml

    node = (
        path_or_node
        if isinstance(path_or_node, SceneNode)
        else load_from_xml(path_or_node)
    )
    if node.tag != "test":
        raise ValueError(f"not a <test> scene (root <{node.tag}>)")
    if node.type == "ttest":
        report = _run_ttest(node, sample_scale)
    elif node.type == "chi2test":
        report = _run_chi2test(node, sample_scale)
    else:
        raise ValueError(f"unknown test type '{node.type}'")
    if verbose:
        for m in report.messages:
            print(m)
        print(f"Passed {report.passed}/{report.total} tests.")
    return report


# ---------------------------------------------------------------------------
# ttest
# ---------------------------------------------------------------------------


def _run_ttest(node, sample_scale: float) -> TestReport:
    p = node.props
    significance = p.get_float("significanceLevel", 0.01)
    angles = _floats(p.get_string("angles", ""))
    references = _floats(p.get_string("references", ""))
    sample_count = max(16, int(p.get_integer("sampleCount", 100_000) * sample_scale))

    bsdf_nodes = node.children_of("bsdf")
    scene_nodes = node.children_of("scene")
    msgs, passed, total = [], 0, 0

    if bsdf_nodes:
        if scene_nodes:
            raise ValueError("cannot test BSDFs and scenes at the same time")
        if len(references) != len(angles) * len(bsdf_nodes):
            raise ValueError("mismatched angles/references counts")
        from optix_renderer_tpu.ops import bsdf as bsdf_ops
        from optix_renderer_tpu.scene.build import build_bsdf_table

        bsdfs, textures = build_bsdf_table(bsdf_nodes, node.origin)
        rng = np.random.default_rng(0)
        ctr = 0
        for bi in range(len(bsdf_nodes)):
            for angle in angles:
                reference = references[ctr]
                ctr += 1
                total += 1
                th = np.radians(angle)
                wi = jnp.broadcast_to(
                    jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32),
                    (sample_count, 3),
                )
                u2 = jnp.asarray(rng.random((sample_count, 2)), jnp.float32)
                ids = jnp.full(sample_count, bi, jnp.int32)
                uv = jnp.zeros((sample_count, 2))
                bs = bsdf_ops.sample_bsdf(bsdfs, textures, ids, wi, uv, u2)
                lum = np.asarray(bs.weight, np.float64) @ _LUM
                mean = float(lum.mean())
                var = float(lum.var(ddof=1))
                ok, msg = hyp.students_t_test(
                    mean, var, sample_count, reference, significance,
                    num_tests=len(references),
                )
                passed += ok
                msgs.append(
                    f"[{'PASS' if ok else 'FAIL'}] ttest bsdf#{bi} angle={angle}: {msg}"
                )
    else:
        if len(references) != len(scene_nodes):
            raise ValueError("mismatched scenes/references counts")
        from optix_renderer_tpu.core.math import Ray
        from optix_renderer_tpu.integrators import get_integrator
        from optix_renderer_tpu.ops import camera as cam_ops
        from optix_renderer_tpu.render import sampler as smp
        from optix_renderer_tpu.scene.build import build_scene

        import dataclasses

        for si, sn in enumerate(scene_nodes):
            total += 1
            if not sn.origin:
                sn.origin = node.origin
            scene, config, _ = build_scene(sn)
            # the reference's path loop is unbounded with RR (ttest compares
            # against analytic series like 1/(1−a)); a 16-deep scan truncates
            # a=0.8 furnaces by a^16/(1−a) ≈ 3% — use a deep masked scan
            config = dataclasses.replace(config, max_depth=max(config.max_depth, 64))
            li = get_integrator(config.integrator)
            n = sample_count
            rng = np.random.default_rng(si)
            pix = jnp.asarray(
                rng.random((n, 2)) * np.array([config.width, config.height]),
                jnp.float32,
            )
            ap = jnp.asarray(rng.random((n, 2)), jnp.float32)
            ray, weight = cam_ops.sample_ray(
                scene.camera, config.width, config.height, pix, ap
            )
            s = smp.make_sampler(jnp.arange(n), jnp.full(n, si, jnp.int32))
            L, _, _, _ = li(scene, config, ray, s)
            lum = np.asarray(L * weight, np.float64) @ _LUM
            mean = float(lum.mean())
            var = float(lum.var(ddof=1))
            ok, msg = hyp.students_t_test(
                mean, var, n, references[si], significance,
                num_tests=len(references),
            )
            passed += ok
            msgs.append(f"[{'PASS' if ok else 'FAIL'}] ttest scene#{si}: {msg}")

    return TestReport(passed, total, msgs)


# ---------------------------------------------------------------------------
# chi2test
# ---------------------------------------------------------------------------


def _gl_cell_integrals(
    pdf_fn, res: int, phi_res: int, order: int = 32, splits: int = 2
) -> np.ndarray:
    """∫ pdf d(cosθ)dφ per (cosθ, φ) cell via tensor Gauss–Legendre.

    `pdf_fn(dirs [..,3]) -> [..]` solid-angle density. Each cell is split
    `splits×splits` ways with an `order`-point GL rule per axis.
    """
    x, w = np.polynomial.legendre.leggauss(order)
    # nodes/weights for one axis subdivided into res*splits equal intervals
    def axis_nodes(lo, hi, n_int):
        edges = np.linspace(lo, hi, n_int + 1)
        half = 0.5 * (edges[1:] - edges[:-1])  # [n_int]
        mid = 0.5 * (edges[1:] + edges[:-1])
        nodes = mid[:, None] + half[:, None] * x[None, :]  # [n_int, order]
        weights = half[:, None] * w[None, :]
        return nodes.ravel(), weights.ravel()

    ct_n, ct_w = axis_nodes(-1.0, 1.0, res * splits)
    ph_n, ph_w = axis_nodes(0.0, 2 * np.pi, phi_res * splits)
    cc, pp = np.meshgrid(ct_n, ph_n, indexing="ij")
    ww = np.outer(ct_w, ph_w)
    ss = np.sqrt(np.maximum(1.0 - cc * cc, 0.0))
    dirs = np.stack([ss * np.cos(pp), ss * np.sin(pp), cc], axis=-1)
    vals = pdf_fn(dirs) * ww
    k = splits * order
    return vals.reshape(res, k, phi_res, k).sum(axis=(1, 3))


def _run_chi2test(node, sample_scale: float) -> TestReport:
    p = node.props
    significance = p.get_float("significanceLevel", 0.01)
    res = p.get_integer("resolution", 10)
    phi_res = 2 * res
    min_exp = p.get_integer("minExpFrequency", 5)
    test_count = p.get_integer("testCount", 5)
    sample_count = p.get_integer("sampleCount", -1)
    if sample_count < 0:
        sample_count = res * phi_res * 5000  # chi2test.cpp:73-74
    sample_count = max(1024, int(sample_count * sample_scale))

    from optix_renderer_tpu.ops import bsdf as bsdf_ops
    from optix_renderer_tpu.scene.build import build_bsdf_table

    bsdf_nodes = node.children_of("bsdf")
    bsdfs, textures = build_bsdf_table(bsdf_nodes, node.origin)
    num_tests = test_count * len(bsdf_nodes)

    rng = np.random.default_rng(0)
    msgs, passed, total = [], 0, 0
    for bi in range(len(bsdf_nodes)):
        for _ in range(test_count):
            total += 1
            # random incident direction (chi2test.cpp:151-155)
            ct = rng.random()
            st = np.sqrt(max(0.0, 1.0 - ct * ct))
            ph = 2.0 * np.pi * rng.random()
            wi = np.array([np.cos(ph) * st, np.sin(ph) * st, ct], np.float32)

            # observed: histogram of wo over (cosθ, φ) cells
            u2 = jnp.asarray(rng.random((sample_count, 2)), jnp.float32)
            ids = jnp.full(sample_count, bi, jnp.int32)
            uv = jnp.zeros((sample_count, 2))
            wib = jnp.broadcast_to(jnp.asarray(wi), (sample_count, 3))
            bs = bsdf_ops.sample_bsdf(bsdfs, textures, ids, wib, uv, u2)
            wo = np.asarray(bs.wo, np.float64)
            w = np.asarray(bs.weight, np.float64)
            valid = (np.abs(w) > 0).any(axis=-1)
            wo = wo[valid]
            ci = np.clip(
                np.floor((wo[:, 2] * 0.5 + 0.5) * res).astype(int), 0, res - 1
            )
            sphi = np.arctan2(wo[:, 1], wo[:, 0]) / (2 * np.pi)
            sphi = np.where(sphi < 0, sphi + 1.0, sphi)
            pi_ = np.clip(np.floor(sphi * phi_res).astype(int), 0, phi_res - 1)
            observed = np.zeros((res, phi_res))
            np.add.at(observed, (ci, pi_), 1.0)

            # expected: per-cell tensor Gauss–Legendre integral of pdf over
            # (cosθ, φ) — the adaptiveSimpson2D analog (chi2test.cpp:186-213).
            # Midpoint rules under-integrate peaked specular lobes by several
            # percent even at 64× subdivision; GL-32 with a 2×2 split is
            # accurate to <0.1% on an α=0.1 Beckmann lobe (validated).
            def pdf_fn(dirs):
                m = dirs.reshape(-1, 3).astype(np.float32)
                return np.asarray(
                    bsdf_ops.pdf_bsdf(
                        bsdfs,
                        textures,
                        jnp.full(m.shape[0], bi, jnp.int32),
                        jnp.broadcast_to(jnp.asarray(wi), (m.shape[0], 3)),
                        jnp.asarray(m),
                        jnp.zeros((m.shape[0], 2)),
                    ),
                    np.float64,
                ).reshape(dirs.shape[:-1])

            expected = (
                _gl_cell_integrals(pdf_fn, res, phi_res) * sample_count
            )

            ok, msg = hyp.chi2_merge_and_test(
                observed,
                expected,
                sample_count,
                min_exp_frequency=min_exp,
                significance=significance,
                num_tests=num_tests,
            )
            passed += ok
            msgs.append(f"[{'PASS' if ok else 'FAIL'}] chi2 bsdf#{bi}: {msg}")

    return TestReport(passed, total, msgs)
