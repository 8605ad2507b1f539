"""Subprocess worker for the 2-process CPU multihost dryrun.

Run as ``python -m texcomp.dist._multihost_worker <pid> <nproc> <port>
<outfile>``: joins a localhost jax.distributed cluster on the CPU
backend, encodes its round-robin partition of the shared demo fleet, and
dumps name -> payload to ``outfile`` (.npz). Used by
tests/test_multihost.py and ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import sys

import numpy as np


def demo_fleet(seed: int = 7):
    """Deterministic small mixed fleet shared by every process."""
    from texcomp.dist.pipeline import TextureAsset

    rng = np.random.default_rng(seed)
    assets = []
    for size in (16, 32):
        for codec, ch in (("dxt1", 3), ("etc1", 3), ("dxt5", 4),
                          ("pvrtc", 4)):
            for i in range(3):
                img = rng.integers(0, 256, (size, size, ch), dtype=np.uint8)
                assets.append(TextureAsset(f"{codec}_{size}_{i}", img,
                                           codec))
    return assets


def pod_fleet(seed: int = 11):
    """O(200) mixed fleet at 64^2-256^2 — the production-dose multihost
    dryrun: every pipeline codec, size-skewed like BASELINE config 5,
    and a quarter of the DXTC assets in swapped BGR/BGRA formats so the
    format routing crosses the process boundary too."""
    from texcomp.api.container import Format
    from texcomp.dist.pipeline import TextureAsset

    rng = np.random.default_rng(seed)
    swapped = {"dxt1": Format.BGR, "dxt5": Format.BGRA}
    assets = []
    for size, per in ((64, 36), (128, 12), (256, 4)):
        for codec, ch in (("dxt1", 3), ("etc1", 3), ("dxt5", 4),
                          ("pvrtc", 4)):
            for i in range(per):
                img = rng.integers(0, 256, (size, size, ch), dtype=np.uint8)
                fmt = (swapped[codec]
                       if codec in swapped and i % 4 == 3 else None)
                assets.append(TextureAsset(f"{codec}_{size}_{i}", img,
                                           codec, format=fmt))
    return assets  # 208 assets, ~2.4 Mpix level-0


def quality_batch(seed: int = 13, n: int = 24):
    """Deterministic global image batch for the cross-host PSNR metric
    (multihost.fleet_quality); identical on every process."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 64, 64, 3), dtype=np.uint8)


def launch_two_process_demo(out_paths, repo: str,
                            timeout: float = 600.0,
                            fleet: str = "demo",
                            mipmaps: bool = False):
    """Spawn the 2-process jax.distributed demo (this module as the
    worker entry) on a free localhost port and return the two loaded
    shard dicts. The single launch harness for both the pytest parity
    test and the driver dryrun; always kills stragglers on the way out
    (a worker stuck on a distributed barrier otherwise outlives a
    communicate() timeout)."""
    import os
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # fresh procs must not re-tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [env.get("PYTHONPATH", ""), repo] if p)

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "texcomp.dist._multihost_worker",
             str(p), "2", str(port), str(out_paths[p]), fleet,
             str(int(mipmaps))],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for p in range(2)
    ]
    try:
        logs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(
                f"multihost worker failed (rc={p.returncode}):\n"
                f"{log[-2000:]}")
    return [dict(np.load(o)) for o in out_paths]


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]
    fleet = sys.argv[5] if len(sys.argv) > 5 else "demo"
    mipmaps = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False

    import jax

    jax.config.update("jax_platforms", "cpu")
    from texcomp.dist import multihost

    multihost.initialize(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    assets = pod_fleet() if fleet == "pod" else demo_fleet()
    results = multihost.run_fleet(
        assets, mipmaps=mipmaps, batch_size=64 if fleet == "pod" else 4)
    out = {name: np.asarray(ci.get_data())
           for name, ci in results.items()}
    if fleet == "pod":
        # Cross-host quality metric: per-host (sse, count) sums cross
        # DCN once; every process must report the SAME global PSNR.
        out["__psnr_dxt1__"] = np.asarray(
            multihost.fleet_quality(quality_batch(), "dxt1"))
    np.savez(outfile, **out)


if __name__ == "__main__":
    main()
