"""Extended differential-fuzz campaigns beyond the in-suite trial counts.

The suite runs 200 differential + 100 decode-payload + 8 HQ-never-worse
trials on every pytest invocation (tests/test_fuzz.py); this tool reuses
those exact trial bodies with fresh seed offsets for long parity hunts on
idle hardware:

    python tools/fuzz_campaign.py differential 200 1200
    python tools/fuzz_campaign.py decode 100 600
    python tools/fuzz_campaign.py hq 8 58
    python tools/fuzz_campaign.py pvrtc 56 556

Any assertion failure is a real byte-parity (or never-worse) bug.
Campaign log for the record: differential [200, 1200) + decode [100, 600)
+ hq [8, 58) all passed (2026-08-18, CPU backend); pvrtc [56, 556)
(500 trials: 2bpp oracle parity + fast-path cross-check + 4bpp
invariants) passed (2026-08-19, CPU backend).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["differential", "decode", "hq", "pvrtc"])
    p.add_argument("start", type=int)
    p.add_argument("stop", type=int)
    args = p.parse_args()

    from tests import test_fuzz

    oracle = None
    if args.kind in ("differential", "decode", "pvrtc"):
        from oracle import Oracle

        oracle = Oracle.create()
        if oracle is None:
            print("reference oracle unavailable", file=sys.stderr)
            return 2

    fn = {
        "differential":
            lambda t: test_fuzz.test_fuzz_differential(t, oracle),
        "decode":
            lambda t: test_fuzz.test_fuzz_decode_arbitrary_payloads(t, oracle),
        "hq": test_fuzz.test_fuzz_hq_never_worse,
        "pvrtc":
            lambda t: test_fuzz.test_fuzz_pvrtc_differential(t, oracle),
    }[args.kind]

    t0 = time.time()
    n = args.stop - args.start
    for i, t in enumerate(range(args.start, args.stop), start=1):
        try:
            fn(t)
        except Exception as e:
            print(f"TRIAL {t} FAILED: {e!r}", flush=True)
            raise
        if i % 100 == 0 or i == n:
            print(f"{i}/{n} ok, {time.time() - t0:.0f}s", flush=True)
    print(f"ALL {n} {args.kind} TRIALS PASSED in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
