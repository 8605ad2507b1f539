"""Multi-host (DCN) pipeline dryrun: 2 jax.distributed processes on the
CPU backend encode disjoint partitions of one fleet; their union is
byte-identical to a single-process run (texcomp/dist/multihost.py)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from texcomp.dist._multihost_worker import demo_fleet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # fresh procs must not re-tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


def test_two_process_fleet_parity(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"out_{p}.npz") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "texcomp.dist._multihost_worker",
             str(p), "2", str(port), outs[p]],
            env=_worker_env(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    shards = [dict(np.load(o)) for o in outs]
    names0 = set(shards[0])
    names1 = set(shards[1])
    assert not (names0 & names1), "partitions overlap"

    # Round-robin by global index, per multihost.partition.
    fleet = demo_fleet()
    assert names0 == {a.name for i, a in enumerate(fleet) if i % 2 == 0}
    assert names1 == {a.name for i, a in enumerate(fleet) if i % 2 == 1}

    # Union is byte-identical to a single-process (non-distributed) run.
    from texcomp.dist.pipeline import AssetPipeline

    single = AssetPipeline(batch_size=4).run(fleet)
    merged = {**shards[0], **shards[1]}
    assert set(merged) == set(single)
    for name, payload in merged.items():
        np.testing.assert_array_equal(
            payload, np.asarray(single[name].get_data()), err_msg=name)
