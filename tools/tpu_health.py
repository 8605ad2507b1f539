"""Quick TPU health probe: times a fixed DXT1 encode workload and compares
against the known-good rate. Exits 0 (healthy), 1 (degraded), 2 (dead).

The axon-tunneled chip is pool-shared; sessions sometimes land in a state
where every dispatch runs ~60x slow (observed 2026-08-19: the same batched
PVRTC cell measured 37 ms and then >400 s within one hour). Perf A/Bs are
meaningless in that state — probe first.

    python tools/tpu_health.py [--threshold-mpix 3000]
"""

from __future__ import annotations

import argparse
import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    p = argparse.ArgumentParser()
    # Known-good: ~9 Gpix/s for the 1024^2 x8 dxt1 cell; 3 Gpix/s is far
    # below any healthy reading but far above the degraded ~0.15 Gpix/s.
    p.add_argument("--threshold-mpix", type=float, default=3000.0)
    args = p.parse_args()

    devs: list = []
    t = threading.Thread(target=lambda: devs.extend(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout=120)
    if not devs or devs[0].platform == "cpu":
        print("DEAD: no TPU device")
        return 2

    from texcomp.dist.pipeline import _batch_encode
    from texcomp.utils.profiling import time_op

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 256, (8, 1024, 1024, 3),
                                       dtype=np.uint8))

    def op(x):
        return _batch_encode(x, "dxt1", 2).astype(jnp.uint32).sum()[None]

    dt = time_op(op, imgs, iters=12, reps=3)
    mpix = 8 * 1024 * 1024 / dt / 1e6
    status = "HEALTHY" if mpix >= args.threshold_mpix else "DEGRADED"
    print(f"{status}: dxt1 1024^2x8 {dt*1e3:.2f} ms = {mpix:.0f} Mpix/s "
          f"(threshold {args.threshold_mpix:.0f})")
    return 0 if mpix >= args.threshold_mpix else 1


if __name__ == "__main__":
    raise SystemExit(main())
