"""On-TPU byte-parity smoke: every codec path, compiled for real (Mosaic),
byte-compared against the CPU ground truth (VERDICT r4 #4).

The test suite forces CPU and verifies Pallas kernels in interpret mode;
this tool closes the interpret-vs-Mosaic gap by running every encode path
on the accelerator backend at small sizes, fetching the bytes once, and
comparing with the jnp reference kernels evaluated on CPU in-process
(the jnp kernels are oracle-verified against the C++ reference).

    python tools/tpu_parity_smoke.py [--out docs/tpu_parity_smoke.json]

Emits ONE JSON line: {"ok": bool, "backend": ..., "paths": {name: "ok" |
"MISMATCH(<blocks>)" | "ERROR: ..."}, "date": ...}. Bounded runtime
(~64^2-256^2 inputs), tunnel-safe (single D2H per path).
"""

from __future__ import annotations

import argparse
import datetime
import json
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# --cpu-dump runs in a subprocess on the CPU backend: backend dispatch
# (texcomp.ops.use_pallas) is per-process, so the CPU ground truth and the
# Mosaic run can't share one process. Must precede any backend touch.
if "--cpu-dump" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _img(rng, h, w, c):
    a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    # Solid and near-solid regions exercise const/LUT paths.
    a[:16, :16] = a[0, 0]
    a[16:32, :16] = (a[16:32, :16] // 16) * 16
    return a


def _run(fn, *args):
    out = fn(*tuple(jnp.asarray(a) for a in args))
    return np.asarray(out)


def _paths():
    """name -> (builder of (fn, args)) pairs; fn maps device arrays to a
    byte array. Built lazily so one import failure doesn't kill the run."""
    from texcomp.blocks import image_to_blocks
    from texcomp.codecs import etc as etc_c
    from texcomp.codecs import dxt_hq
    from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device
    from texcomp.codecs.pvrtc_hq import encode_pvrtc_2bpp_hq_device
    from texcomp.ops import (dxt1_decode_image_op, dxt1_encode_image_op,
                             dxt5_encode_image_op, etc1_decode_image_op,
                             etc1_encode_image_op, pvrtc_encode_image_op)
    from texcomp.ops.mipmap import mipmap_chain, num_chain_levels
    from texcomp.dist.pipeline import _batch_encode

    rng = np.random.default_rng(42)
    rgb = _img(rng, 256, 256, 3)
    rgba = _img(rng, 256, 256, 4)
    blocks3 = np.asarray(image_to_blocks(jnp.asarray(rgb)))
    d1_data = None  # filled by dxt1_encode on each backend

    paths = {}
    paths["dxt1_encode"] = (dxt1_encode_image_op, (rgb,))
    paths["dxt5_encode"] = (dxt5_encode_image_op, (rgba,))
    paths["etc1_encode"] = (etc1_encode_image_op, (rgb,))
    paths["pvrtc_encode"] = (pvrtc_encode_image_op, (rgba,))
    paths["pvrtc4_encode"] = (encode_pvrtc_4bpp_device, (rgba,))
    paths["pvrtc_hq"] = (encode_pvrtc_2bpp_hq_device, (rgba,))
    paths["dxt1_hq"] = (
        lambda im: dxt_hq.encode_dxt1_hq_blocks(image_to_blocks(im)), (rgb,))
    paths["dxt5_hq"] = (
        lambda im: dxt_hq.encode_dxt5_hq_blocks(
            image_to_blocks(im),
            jnp.zeros(((im.shape[0] // 4) * (im.shape[1] // 4),), bool)),
        (rgba,))
    paths["etc1_hq"] = (
        lambda im: etc_c.encode_etc1_hq_blocks(image_to_blocks(im)), (rgb,))
    # Round-5 packed-word image-level HQ entries (must equal the
    # blocks-level results bit-for-bit on every backend).
    paths["dxt1_hq_image"] = (dxt_hq.encode_dxt1_hq_image, (rgb,))
    paths["etc1_hq_image"] = (etc_c.encode_etc1_hq_image, (rgb,))

    # Decode + transcode + mipmaps run on a fixed DXT1/ETC1 payload.
    from texcomp.codecs import dxt as dxt_c
    d1_data = np.asarray(
        dxt_c.encode_dxt1_blocks(jnp.asarray(blocks3)))
    e1_data = np.asarray(
        etc_c.encode_etc1_blocks(jnp.asarray(blocks3), 2))
    # The decode ops return backend-specific layouts ((N, 16, C) pixel
    # blocks on CPU, (H, W, 4) RGBX on TPU — ops/__init__.py:58-78);
    # canonicalize both to an (H, W, 3) RGB image before comparing.
    from texcomp.blocks import scatter_blocks

    def _canon_decode(op, d):
        out = jnp.asarray(op(d, 256, 256))
        if out.ndim == 3 and out.shape[1] == 16:  # (N, 16, C) blocks
            out = scatter_blocks(out[..., :3], height=256, width=256)
        return out[..., :3].reshape(-1)

    paths["dxt1_decode"] = (
        lambda d: _canon_decode(dxt1_decode_image_op, d), (d1_data,))
    paths["etc1_decode"] = (
        lambda d: _canon_decode(etc1_decode_image_op, d), (e1_data,))

    def transcode(d):
        from texcomp import ops as _ops

        if _ops.use_pallas():
            from texcomp.ops import dxt_pallas, etc_pallas

            words = dxt_pallas.blocks_to_words(d, 2)
            return etc_pallas.etc1_words_to_blocks(
                etc_pallas.transcode_dxt1_to_etc1_packed(words))
        from texcomp.api.transcode import transcode_dxt1_to_etc1_blocks

        return transcode_dxt1_to_etc1_blocks(d)

    paths["transcode"] = (transcode, (d1_data,))

    def mips(codec, data):
        from texcomp.ops import use_pallas

        levels = num_chain_levels(256, 256)
        outs = mipmap_chain(data, height=256, width=256, codec=codec,
                            levels=levels, interpret=not use_pallas())
        return jnp.concatenate([o.reshape(-1) for o in outs])

    paths["dxt1_mipmap"] = (lambda d: mips("dxt1", d), (d1_data,))
    paths["etc1_mipmap"] = (lambda d: mips("etc1", d), (e1_data,))

    # Batched fleet fold (the grid-mosaic path) per codec.
    stack3 = np.stack([_img(rng, 64, 64, 3) for _ in range(16)])
    stack4 = np.stack([_img(rng, 64, 64, 4) for _ in range(16)])
    for codec, arr in (("dxt1", stack3), ("etc1", stack3),
                       ("dxt5", stack4), ("pvrtc", stack4)):
        paths[f"fleet_{codec}"] = (
            lambda x, codec=codec: _batch_encode(x, codec, 2), (arr,))
        # quality="high" fleet route (round-5 packed-words path).
        paths[f"fleet_hq_{codec}"] = (
            lambda x, codec=codec: _batch_encode(x, codec, 2,
                                                 quality="high"), (arr,))
    return paths


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None,
                   help="also append the JSON line to this file")
    p.add_argument("--cpu-dump", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.cpu_dump:
        dump = {}
        for name, (fn, fargs) in _paths().items():
            dump[name] = _run(fn, *fargs)
            print(f"  cpu {name:16s} ok", file=sys.stderr, flush=True)
        np.savez(args.cpu_dump, **dump)
        return 0

    backend = jax.devices()[0].platform
    if backend == "cpu":
        print(json.dumps({"ok": False, "backend": "cpu",
                          "paths": {}, "error": "no accelerator"}))
        return 2

    with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
        subprocess.run(
            [sys.executable, __file__, "--cpu-dump", tf.name], check=True)
        want = dict(np.load(tf.name))

    results = {}
    ok = True
    for name, (fn, fargs) in _paths().items():
        try:
            got = _run(fn, *fargs)
            if np.array_equal(want[name], got):
                results[name] = "ok"
            else:
                bad = int((want[name].reshape(got.shape)
                           != got).any(axis=-1).sum())
                results[name] = f"MISMATCH({bad})"
                ok = False
        except Exception as e:  # noqa: BLE001 — fault isolation per path
            results[name] = f"ERROR: {type(e).__name__}: {e}"[:200]
            ok = False
        print(f"  {name:16s} {results[name]}", file=sys.stderr, flush=True)

    line = json.dumps({
        "ok": ok,
        "backend": backend,
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "paths": results,
    })
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
