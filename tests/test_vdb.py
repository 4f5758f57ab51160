"""OpenVDB reader validation against the reference's own fluid asset.

Ground truth comes from the file itself: OpenVDB embeds `file_voxel_count`
and `file_bbox_min/max` metadata per grid (written by the tool that produced
the sim), so the decoder is checked against counts it does not compute.
Mirrors the role of NvdbVolume.vdb.cpp:9-58 (the reference's .vdb ingestion).
"""

import struct

import numpy as np
import pytest

from optix_renderer_tpu.scene import vdb as V
from optix_renderer_tpu.scene.volume_io import load_volume

FLUID = "/root/reference/scenes/project/volume/fluid_data_0050.vdb"


def _grid_metadata(path, wanted):
    """Independent minimal parse of per-grid metadata maps (no tree decode)."""
    buf = open(path, "rb").read()
    r = V._R(buf)
    assert r.i64() == V._MAGIC
    version = r.u32()
    r.u32(), r.u32(), r.u8(), r.bytes_(36)
    V._skip_metamap(r)
    out = {}
    for _ in range(r.u32()):
        name = r.string().split("\x1e")[0]
        r.string()
        r.string()
        gp, _bp, ep = r.i64(), r.i64(), r.i64()
        r.pos = ep
        if name not in wanted:
            continue
        g = V._R(buf, gp)
        if version >= V._VER_NODE_MASK_COMPRESSION:
            g.u32()
        meta = {}
        for _ in range(g.u32()):
            k, _t = g.string(), g.string()
            meta[k] = g.bytes_(g.u32())
        out[name] = meta
    return out


@pytest.fixture(scope="module")
def fluid_grids():
    return V.read_vdb(FLUID)


def test_active_voxel_count_matches_file_metadata(fluid_grids):
    meta = _grid_metadata(FLUID, ("density", "temperature"))
    for name in ("density", "temperature"):
        expect = struct.unpack("<q", meta[name]["file_voxel_count"])[0]
        assert fluid_grids[name].active_count == expect, name


def test_bbox_matches_file_metadata(fluid_grids):
    meta = _grid_metadata(FLUID, ("density",))
    bmin = np.array(struct.unpack("<iii", meta["density"]["file_bbox_min"]))
    bmax = np.array(struct.unpack("<iii", meta["density"]["file_bbox_max"]))
    g = fluid_grids["density"]
    # dense extents are leaf-aligned supersets of the active bbox
    lo_idx = g.bbox_min_world / g.voxel_size
    hi_idx = g.bbox_max_world / g.voxel_size
    assert np.all(lo_idx <= bmin) and np.all(hi_idx >= bmax + 1)
    assert np.all(lo_idx > bmin - 8) and np.all(hi_idx < bmax + 9)


def test_density_values_plausible(fluid_grids):
    d = fluid_grids["density"].values
    assert d.dtype == np.float32
    assert d.min() >= 0.0
    assert 0.5 < d.max() < 2.0  # fog density ~[0,1]
    assert (d > 0).sum() > 1000  # a real fluid, not an empty grid
    t = fluid_grids["temperature"].values
    assert t.shape == d.shape
    assert 0.0 <= t.min() and t.max() <= 1.5


def test_velocity_grid_skipped(fluid_grids):
    # vec3 grids are not in `wanted` and must not be decoded
    assert set(fluid_grids) == {"density", "temperature"}


def test_load_volume_vdb_path(tmp_path, monkeypatch):
    """scene/volume_io.py .vdb path end-to-end, including the .npz cache.

    The conversion cache lives under ORT_CACHE_DIR (default
    ~/.cache/optix_renderer_tpu/vdb), never beside the source — scene trees
    may be read-only checkouts (volume_io._load_vdb_cached)."""
    import os
    import shutil

    monkeypatch.setenv("ORT_CACHE_DIR", str(tmp_path / "cache"))
    local = tmp_path / "fluid.vdb"
    shutil.copy(FLUID, local)
    v1 = load_volume(local)
    assert v1.temperature is not None
    assert v1.density.shape == v1.temperature.shape
    # cache file lands in the user cache dir, keyed by source path
    cached = list((tmp_path / "cache" / "vdb").glob("fluid-*.npz"))
    assert len(cached) == 1
    # nothing written beside the source
    assert list(tmp_path.glob("*.npz")) == []
    v2 = load_volume(local)  # cache hit
    assert np.array_equal(v1.density, v2.density)
    # mtime invalidation: touching the source forces a re-read
    os.utime(local, ns=(1, 1))
    v3 = load_volume(local)
    assert np.array_equal(v1.density, v3.density)


def test_lz4_block_roundtrip_overlapping_matches():
    """LZ4 decode incl. overlapping matches (RLE-style), vs a hand encoding."""
    # literals "abcd", then match offset=2 len=8 → "abcd" + "cdcdcdcd"
    src = bytes([0x44]) + b"abcd" + bytes([2, 0])
    # token 0x44: litlen 4, matchlen 0+4 → need matchlen 8 → token low=4
    src = bytes([0x44 | 0x04]) + b"abcd" + bytes([2, 0])
    out = V._lz4_block_decompress(src, 12)
    assert out == b"abcd" + b"cdcdcdcd"


def test_blosc_memcpy_chunk():
    payload = bytes(range(64))
    hdr = bytes([2, 1, 0x2, 1]) + struct.pack("<III", 64, 64, 16 + 64)
    assert V._blosc_decompress(hdr + payload) == payload
