"""Bit-exactness tests for the pcg32 and tea/lcg generators.

The JAX limb-arithmetic pcg32 must match a pure-Python integer model of the
reference `ext/pcg32/pcg32.h` bit for bit — this is the foundation of the
"same seeds → same image" validation strategy (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import rng

M64 = (1 << 64) - 1
PCG32_MULT_INT = 0x5851F42D4C957F2D


class PyPcg32:
    """Pure-Python integer model of ext/pcg32/pcg32.h."""

    def __init__(self, initstate=0x853C49E6748FEA9B, initseq=0xDA3E39CB94B95BDB):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & M64
        self._step()
        self.state = (self.state + initstate) & M64
        self._step()

    def _step(self):
        self.state = (self.state * PCG32_MULT_INT + self.inc) & M64

    def next_uint(self):
        old = self.state
        self._step()
        xorshifted = ((old >> 18) ^ old) >> 27 & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def next_float(self):
        bits = (self.next_uint() >> 9) | 0x3F800000
        return np.frombuffer(np.uint32(bits).tobytes(), np.float32)[0] - 1.0


def _split64(x):
    return (x >> 32) & 0xFFFFFFFF, x & 0xFFFFFFFF


def test_pcg32_default_seed_bit_exact():
    py = PyPcg32()
    s = rng.pcg32_seed(*rng.PCG32_DEFAULT_STATE, *rng.PCG32_DEFAULT_STREAM)
    for _ in range(100):
        s, out = rng.pcg32_next_uint(s)
        assert int(out) == py.next_uint()


def test_pcg32_custom_seeds_bit_exact():
    for initstate, initseq in [(0, 0), (1, 1), (12345678901234567, 987654321), (M64, M64)]:
        py = PyPcg32(initstate & M64, initseq & M64)
        s = rng.pcg32_seed(*_split64(initstate & M64), *_split64(initseq & M64))
        for _ in range(20):
            s, out = rng.pcg32_next_uint(s)
            assert int(out) == py.next_uint(), (initstate, initseq)


def test_pcg32_float_bit_exact():
    py = PyPcg32()
    s = rng.pcg32_seed(*rng.PCG32_DEFAULT_STATE, *rng.PCG32_DEFAULT_STREAM)
    for _ in range(50):
        s, f = rng.pcg32_next_float(s)
        assert float(f) == py.next_float()


def test_pcg32_batched_matches_scalar():
    seeds = np.arange(16, dtype=np.uint32)
    s = rng.pcg32_seed(
        jnp.zeros(16, jnp.uint32), jnp.asarray(seeds),
        jnp.zeros(16, jnp.uint32), jnp.asarray(seeds),
    )
    s, batch_out = rng.pcg32_next_uint(s)
    for i in range(16):
        py = PyPcg32(int(seeds[i]), int(seeds[i]))
        assert int(batch_out[i]) == py.next_uint()


def test_float01_range():
    s = rng.pcg32_seed(
        jnp.zeros(1024, jnp.uint32),
        jnp.arange(1024, dtype=jnp.uint32),
        jnp.zeros(1024, jnp.uint32),
        jnp.arange(1024, dtype=jnp.uint32),
    )
    for _ in range(4):
        s, f = rng.pcg32_next_float(s)
        assert float(jnp.min(f)) >= 0.0 and float(jnp.max(f)) < 1.0


def test_tea_matches_reference_model():
    """tea<4> reference model from cuda/sutil/random.h:34-47."""

    def tea_py(v0, v1, N=4):
        M32 = 0xFFFFFFFF
        s0 = 0
        for _ in range(N):
            s0 = (s0 + 0x9E3779B9) & M32
            v0 = (v0 + ((((v1 << 4) & M32) + 0xA341316C) ^ ((v1 + s0) & M32) ^ ((v1 >> 5) + 0xC8013EA4))) & M32
            v1 = (v1 + ((((v0 << 4) & M32) + 0xAD90777D) ^ ((v0 + s0) & M32) ^ ((v0 >> 5) + 0x7E95761E))) & M32
        return v0

    for a, b in [(0, 0), (1, 2), (123456, 789), (0xFFFFFFFF, 0xDEADBEEF)]:
        assert int(rng.tea(a, b)) == tea_py(a, b)


def test_lcg_float_range_and_determinism():
    state = rng.tea(jnp.arange(256, dtype=jnp.uint32), jnp.uint32(7))
    vals = []
    for _ in range(8):
        state, u = rng.lcg_next_float(state)
        vals.append(np.asarray(u))
    v = np.stack(vals)
    assert v.min() >= 0.0 and v.max() < 1.0
    # deterministic across calls
    state2 = rng.tea(jnp.arange(256, dtype=jnp.uint32), jnp.uint32(7))
    state2, u2 = rng.lcg_next_float(state2)
    np.testing.assert_array_equal(np.asarray(u2), v[0])
