"""Native C++ LBVH builder ≡ the numpy reference build (ops/bvh.py).

The layout contract (DFS preorder, escape links, LEAF_SIZE-padded prim
permutation) must match bit-for-bit so either builder can feed the same
traversal kernel.
"""

import numpy as np
import pytest

from optix_renderer_tpu.ops.bvh import LEAF_SIZE, build_lbvh_numpy


def _tris(n, seed):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    return v0, v1, v2


@pytest.mark.parametrize("n", [5, 64, 1000, 4097])
def test_native_matches_numpy(n):
    from optix_renderer_tpu.native import lbvh as native

    v0, v1, v2 = _tris(n, seed=n)
    out = native.build(v0, v1, v2, LEAF_SIZE)
    if out is None:
        pytest.skip("native toolchain unavailable")
    ref = build_lbvh_numpy(v0, v1, v2, LEAF_SIZE)
    for a, b, name in zip(out, ref, ["node_min", "node_max", "skip", "first", "prim"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_native_build_speed_1m():
    """VERDICT round-1 item 9: < 2 s build at 1M tris."""
    import time

    from optix_renderer_tpu.native import lbvh as native

    v0, v1, v2 = _tris(1_000_000, seed=0)
    out = native.build(v0, v1, v2, LEAF_SIZE)  # warm (includes compile)
    if out is None:
        pytest.skip("native toolchain unavailable")
    t0 = time.perf_counter()
    native.build(v0, v1, v2, LEAF_SIZE)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native 1M-tri build took {dt:.2f}s"
