"""Multi-host (DCN) pipeline dryrun: 2 jax.distributed processes on the
CPU backend encode disjoint partitions of one fleet; their union is
byte-identical to a single-process run (texcomp/dist/multihost.py)."""

import os

import numpy as np

from texcomp.dist._multihost_worker import (demo_fleet,
                                            launch_two_process_demo)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_fleet_parity(tmp_path):
    outs = [str(tmp_path / f"out_{p}.npz") for p in range(2)]
    shards = launch_two_process_demo(outs, REPO)
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
