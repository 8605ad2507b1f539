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
