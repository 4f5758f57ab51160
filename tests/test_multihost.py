"""Multi-host (multi-process) execution: 2-process CPU-backend rehearsal.

Validates the jax.distributed path (parallel/multihost.py) without TPU pods:
two OS processes × 4 virtual CPU devices each form one 8-device global mesh
over gloo collectives (the DCN stand-in). The rendered film must match the
single-process render — lanes are seeded by (pixel_id, sample_idx) alone, so
host count cannot change the image (SURVEY §2.8 item 3 contract; the
reference's CPU/GPU cooperative split with weighted composite,
render.cpp:281,501,725-747).
"""

import dataclasses
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mh_result(tmp_path_factory):
    """Run the 2-process worker once; reuse artifacts across tests."""
    out = str(tmp_path_factory.mktemp("mh") / "mh.npz")
    port = _free_port()
    env = dict(os.environ)
    # children must NOT inherit the test session's forced single-process
    # platform flags; mh_worker sets its own
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "optix_renderer_tpu.parallel.mh_worker",
                "--coordinator",
                f"localhost:{port}",
                "--num-processes",
                "2",
                "--process-id",
                str(i),
                "--local-devices",
                "4",
                "--out",
                out,
                "--scaling",
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    return out


@pytest.mark.heavy
def test_two_process_render_matches_single_process(mh_result):
    with np.load(mh_result) as z:
        comp_mh = z["composite"]
        assert int(z["n_processes"]) == 2
        assert int(z["n_devices"]) == 8
        assert bool(z["grad_finite"])
        assert np.isfinite(float(z["loss"]))

    # single-process reference on this test session's virtual 8-device CPU
    from optix_renderer_tpu.render.render import render
    from optix_renderer_tpu.scene.presets import make_cornell_box

    scene, config, _ = make_cornell_box(
        width=16, height=12, spp=4, integrator="path_mis"
    )
    config = dataclasses.replace(config, max_depth=3)
    ref = render(scene, config)["composite"]

    assert comp_mh.shape == ref.shape
    # identical sample streams; only the psum reduction order differs
    np.testing.assert_allclose(comp_mh, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.heavy
def test_scaling_harness_output(mh_result):
    import json

    with open(mh_result + ".scaling.json") as f:
        s = json.load(f)
    assert s["n_devices"] == 8 and s["n_processes"] == 2
    assert s["paths_per_s_full"] > 0 and s["paths_per_s_1dev"] > 0
    # efficiency on oversubscribed virtual CPU devices is not meaningful as a
    # perf number — just assert the harness computes a sane ratio
    assert 0.0 < s["scaling_efficiency"] < 8.0
