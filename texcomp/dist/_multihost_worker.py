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


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from texcomp.dist import multihost

    multihost.initialize(f"localhost:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc
    results = multihost.run_fleet(demo_fleet(), batch_size=4)
    np.savez(outfile, **{name: np.asarray(ci.get_data())
                         for name, ci in results.items()})


if __name__ == "__main__":
    main()
