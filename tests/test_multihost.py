"""Multi-host (DCN) pipeline dryrun: 2 jax.distributed processes on the
CPU backend encode disjoint partitions of one fleet; their union is
byte-identical to a single-process run (texcomp/dist/multihost.py)."""

import os

import numpy as np

from texcomp.dist._multihost_worker import (demo_fleet,
                                            launch_two_process_demo,
                                            pod_fleet, quality_batch)

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


def test_two_process_pod_fleet(tmp_path):
    """Production-dose dryrun: 208 assets at 64^2-256^2 (mixed codecs,
    a quarter of the DXTC assets BGR/BGRA) with mipmaps=True across 2
    processes x 4 virtual devices. Checks (a) disjoint partitions,
    (b) union byte parity with a single-process run INCLUDING every mip
    entry, and (c) the DCN cross-host PSNR equals the single-process
    quality_report (sums, not PSNR averaging — multihost.fleet_quality)."""
    outs = [str(tmp_path / f"pod_{p}.npz") for p in range(2)]
    shards = launch_two_process_demo(outs, REPO, timeout=1800.0,
                                     fleet="pod", mipmaps=True)
    psnrs = [float(s.pop("__psnr_dxt1__")) for s in shards]
    assert psnrs[0] == psnrs[1], "hosts disagree on the global PSNR"

    names0, names1 = set(shards[0]), set(shards[1])
    assert not (names0 & names1), "partitions overlap"
    assert any(n.endswith("_mip1") for n in names0), "no mip entries"

    from texcomp.dist.pipeline import AssetPipeline, quality_report

    fleet = pod_fleet()
    single = AssetPipeline(batch_size=64).run(fleet, mipmaps=True)
    merged = {**shards[0], **shards[1]}
    assert set(merged) == set(single)
    for name, payload in merged.items():
        np.testing.assert_array_equal(
            payload, np.asarray(single[name].get_data()), err_msg=name)

    ref_psnr = quality_report(AssetPipeline(), quality_batch(), "dxt1")
    assert abs(psnrs[0] - ref_psnr) < 1e-3
