"""bench.py is the driver contract: one JSON line on stdout. Smoke-test it
in-process at a tiny size on the CPU backend so a broken import or schema
change never reaches the driver run."""

import json
import sys
from unittest import mock

import bench


def _run(argv):
    with mock.patch.object(sys, "argv", ["bench.py"] + argv):
        return bench.main()


def test_bench_headline_contract(capsys):
    assert _run(["--headline-only", "--size", "64"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["metric"] == "dxt1_encode_throughput"
    assert line["unit"] == "Mpixels/s/chip"
    assert isinstance(line["value"], (int, float)) and line["value"] > 0
    assert isinstance(line["vs_baseline"], (int, float))
    assert "extras" not in line


def test_bench_extras_assemble(monkeypatch):
    """Every extras entry must run end-to-end at a tiny size on CPU — a
    broken extra otherwise only surfaces in the driver's on-chip run."""
    for fn, kwargs in [
        (bench.bench_dxt5_encode, dict(h=64, w=64)),
        (bench.bench_etc1_encode, dict(h=64, w=64)),
        (bench.bench_pvrtc_encode, dict(h=64, w=64)),
        (bench.bench_pvrtc4_encode, dict(h=64, w=64)),
        (bench.bench_pvrtc_hq_encode, dict(h=64, w=64)),
        (bench.bench_dxt1_hq_encode, dict(h=64, w=64)),
        (bench.bench_etc1_hq_encode, dict(h=64, w=64)),
        (bench.bench_transcode, dict(h=64, w=64, interpret=True)),
        (bench.bench_dxt1_decode, dict(h=64, w=64)),
        (bench.bench_etc1_decode, dict(h=64, w=64)),
        (bench.bench_mipmap_chain, dict(size=64, interpret=True)),
        (bench.bench_etc1_mipmap_chain, dict(size=64, interpret=True)),
        (bench.bench_pipeline, dict(n_textures=4, size=32)),
    ]:
        v = fn(**kwargs)
        assert isinstance(v, float) and v > 0, fn.__name__


def test_bench_fleet_assembles(monkeypatch):
    """bench_pipeline_fleet with a micro fleet distribution."""
    monkeypatch.setattr(bench, "_FLEET_DIST", ((16, 2), (32, 1)))
    v = bench.bench_pipeline_fleet()
    assert isinstance(v, float) and v > 0
