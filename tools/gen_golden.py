"""Generate tests/golden/expected.json from the C++ reference oracle.

Run from the repo root with the reference available:
    python tools/gen_golden.py
Every golden case is encoded with the REFERENCE implementation; the JSON
stores SHA256 digests of the expected bytes, so tests/test_golden.py can
verify bit-exactness without the reference present.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np  # noqa: E402

from golden_vectors import CASES, digest, golden_image  # noqa: E402
from oracle import Oracle  # noqa: E402


def main() -> int:
    o = Oracle.create()
    if o is None:
        print("reference oracle unavailable", file=sys.stderr)
        return 1

    out = {}
    for case in CASES:
        name = case["name"]
        kind = case["kind"]
        codec = case["codec"]
        fmt = case["fmt"]
        strat = case["strategy"]
        entry = {}
        if kind == "solid":
            color = np.array(case["color"], dtype=np.uint8)
            data, ch, cw = o.create_solid(codec, fmt, case["h"], case["w"],
                                          color, strategy=strat)
            entry["out"] = digest(data)
        else:
            img = golden_image(case["seed"], case["h"], case["w"],
                               case["comps"])
            h, w = case["h"], case["w"]
            enc, ch, cw = o.compress(codec, fmt, h, w, 0, img.tobytes(),
                                     strategy=strat)
            if kind == "encode":
                entry["out"] = digest(enc)
                if codec != "pvrtc":  # the reference cannot decode PVRTC
                    dec = o.decompress(codec, fmt, h, w, ch, cw, 0, enc,
                                       case["comps"], strategy=strat)
                    entry["decoded"] = digest(dec)
            elif kind == "downsample":
                r = o.downsample(codec, fmt, h, w, ch, cw, 0, enc,
                                 strategy=strat)
                entry["out"] = digest(r[0])
            elif kind == "pad":
                r = o.pad(codec, fmt, h, w, ch, cw, 0, enc, case["ph"],
                          case["pw"], strategy=strat)
                entry["out"] = digest(r[0])
            elif kind == "compress_and_pad":
                r, _, _ = o.compress_and_pad(codec, fmt, h, w, case["ph"],
                                             case["pw"], 0, img.tobytes(),
                                             strategy=strat)
                entry["out"] = digest(r)
            elif kind == "subimage":
                r = o.copy_subimage(codec, fmt, h, w, ch, cw, 0, enc,
                                    case["r0"], case["c0"], case["sh"],
                                    case["sw"], strategy=strat)
                entry["out"] = digest(r[0])
            elif kind == "transcode":
                r = o.transcode_dxt1_to_etc1(enc)
                entry["out"] = digest(r)
            else:
                raise ValueError(kind)
        out[name] = entry

    path = Path(__file__).resolve().parent.parent / "tests" / "golden"
    path.mkdir(exist_ok=True)
    (path / "expected.json").write_text(json.dumps(out, indent=1))
    print(f"wrote {len(out)} golden digests to {path / 'expected.json'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
