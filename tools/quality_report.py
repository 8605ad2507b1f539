"""Natural-image quality harness: writes QUALITY.md.

Measures round-trip PSNR on real photographs for every codec, in both
quality modes, and verifies the two claims behind the README numbers:

  1. reference mode produces byte-identical payloads to the C++ oracle
     (so its PSNR *is* the reference's PSNR, by construction);
  2. HQ mode is never worse per block and clearly better on natural
     content.

Images: public photos bundled with installed packages (sklearn's
china.jpg / flower.jpg, matplotlib's grace_hopper.jpg) — stand-ins for
the Kodak set (no network in this environment), same photographic
statistics. Run: python tools/quality_report.py [--out QUALITY.md]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # deterministic, oracle-comparable


def load_images() -> dict[str, np.ndarray]:
    """Natural photos from installed packages, cropped to multiples of 4."""
    from PIL import Image

    out = {}
    try:
        import sklearn.datasets as skd

        base = Path(skd.__file__).parent / "images"
        for name in ("china", "flower"):
            img = np.asarray(Image.open(base / f"{name}.jpg"))
            out[name] = img
    except Exception:
        pass
    try:
        import matplotlib

        p = (Path(matplotlib.__file__).parent / "mpl-data" / "sample_data"
             / "grace_hopper.jpg")
        out["grace_hopper"] = np.asarray(Image.open(p))
    except Exception:
        pass
    for name, img in list(out.items()):
        h, w = (img.shape[0] // 4) * 4, (img.shape[1] // 4) * 4
        out[name] = np.ascontiguousarray(img[:h, :w])
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def roundtrip(img: np.ndarray, codec: str, quality: str) -> tuple[np.ndarray, bytes]:
    from texcomp import (CompressedImage, DxtcCompressor, EtcCompressor,
                         Format, Pvrtc4bppCompressor, PvrtcCompressor)

    h, w, c = img.shape
    if codec in ("dxt5", "pvrtc", "pvrtc4") and c == 3:
        img = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], -1)
        c = 4
    fmt = Format.RGB if c == 3 else Format.RGBA
    comp = {"dxt1": lambda: DxtcCompressor(quality=quality),
            "dxt5": lambda: DxtcCompressor(quality=quality),
            "etc1": lambda: EtcCompressor(quality=quality),
            "pvrtc": lambda: PvrtcCompressor(quality=quality),
            "pvrtc4": lambda: Pvrtc4bppCompressor(quality=quality)}[codec]()
    ci = CompressedImage()
    if not comp.compress(fmt, h, w, 0, img.tobytes(), ci):
        raise RuntimeError(f"{codec} compress failed for {h}x{w}")
    buf = bytearray()
    ok = comp.decompress(ci, buf)
    if not ok and codec == "pvrtc":
        ok = comp.decompress_extension(ci, buf)
    if not ok:
        raise RuntimeError(f"{codec} decompress failed")
    dec = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, c)
    return dec[..., :3], bytes(ci.get_data())


def alpha_psnr(img: np.ndarray, quality: str) -> float:
    """DXT5 alpha-channel PSNR with a deterministic synthetic alpha plane
    (smooth gradient + noise — typical soft-mask statistics; the photos
    themselves have no alpha)."""
    from texcomp import CompressedImage, DxtcCompressor, Format

    h, w = img.shape[:2]
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:h, 0:w]
    alpha = np.clip(
        255 * (0.6 * xx / w + 0.4 * yy / h) + rng.normal(0, 18, (h, w)),
        0, 255).astype(np.uint8)
    rgba = np.concatenate([img[..., :3], alpha[..., None]], -1)
    comp = DxtcCompressor(quality=quality)
    ci = CompressedImage()
    if not comp.compress(Format.RGBA, h, w, 0, rgba.tobytes(), ci):
        raise RuntimeError("dxt5 compress failed")
    buf = bytearray()
    if not comp.decompress(ci, buf):
        raise RuntimeError("dxt5 decompress failed")
    dec = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    return psnr(dec[..., 3], alpha)


def oracle_bytes(img: np.ndarray, codec: str):
    """Reference C++ payload for parity verification (None if unavailable)."""
    try:
        from oracle import Oracle

        o = Oracle.create()
        if o is None:
            return None
        h, w, c = img.shape
        if codec == "dxt5" and c == 3:
            img = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], -1)
        name = {"dxt1": "dxtc", "dxt5": "dxtc", "etc1": "etc"}[codec]
        fmt = 0 if img.shape[2] == 3 else 2
        payload, _, _ = o.compress(name, fmt, h, w, 0, img.tobytes())
        return bytes(payload)
    except Exception:
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "QUALITY.md"))
    args = ap.parse_args()

    images = load_images()
    if not images:
        print("no natural images found", file=sys.stderr)
        return 1

    rows = []
    parity_checks = 0
    parity_fails = 0
    for name, img in sorted(images.items()):
        row = {"image": f"{name} ({img.shape[0]}x{img.shape[1]})"}
        for codec in ("dxt1", "dxt5", "etc1"):  # pvrtc: square crops below
            dec_ref, payload = roundtrip(img, codec, "reference")
            row[f"{codec}_ref"] = psnr(dec_ref, img[..., :3])
            if codec in ("dxt1", "dxt5"):
                ob = oracle_bytes(img, codec)
                if ob is not None:
                    parity_checks += 1
                    if ob != payload:
                        parity_fails += 1
            dec_hq, _ = roundtrip(img, codec, "high")
            row[f"{codec}_hq"] = psnr(dec_hq, img[..., :3])
        rows.append(row)
        print(row)
    parity_ok = parity_checks > 0 and parity_fails == 0

    alpha_rows = []
    for name, img in sorted(images.items()):
        ar = alpha_psnr(img, "reference")
        ah = alpha_psnr(img, "high")
        alpha_rows.append((f"{name} ({img.shape[0]}x{img.shape[1]})", ar, ah))
        print(alpha_rows[-1])

    # square-power-of-two crops for PVRTC (it rejects other sizes)
    pv_rows = []
    pv4_rows = []
    for name, img in sorted(images.items()):
        s = 1 << (min(img.shape[0], img.shape[1]).bit_length() - 1)
        crop = img[:s, :s]
        dec, _ = roundtrip(crop, "pvrtc", "reference")
        dec_hq, _ = roundtrip(crop, "pvrtc", "high")
        pv_rows.append((f"{name} ({s}x{s} crop)", psnr(dec, crop[..., :3]),
                        psnr(dec_hq, crop[..., :3])))
        print(pv_rows[-1])
        dec4, _ = roundtrip(crop, "pvrtc4", "reference")
        dec4_hq, _ = roundtrip(crop, "pvrtc4", "high")
        pv4_rows.append((f"{name} ({s}x{s} crop)", psnr(dec4, crop[..., :3]),
                         psnr(dec4_hq, crop[..., :3])))
        print(pv4_rows[-1])

    # DXT1 -> ETC1 transcode: heuristic (reference) vs HQ re-encode.
    tc_rows = []
    for name, img in sorted(images.items()):
        import jax.numpy as jnp

        from texcomp.api import transcode as tc
        from texcomp.codecs import dxt as dxtc
        from texcomp.codecs import etc as etcc

        h, w = (img.shape[0] // 4) * 4, (img.shape[1] // 4) * 4
        crop = img[:h, :w, :3]
        b = crop.reshape(h // 4, 4, w // 4, 4, 3).transpose(0, 2, 1, 3, 4)
        rgb = jnp.asarray(b.reshape(-1, 16, 3), jnp.int32)
        d1 = dxtc.encode_dxt1_blocks(rgb)
        dec = lambda e: np.asarray(etcc.decode_etc1_blocks(e), np.float64)
        ref_tc = dec(tc.transcode_dxt1_to_etc1_blocks(d1))
        hq_tc = dec(tc.transcode_dxt1_to_etc1_blocks_hq(d1))
        src = np.asarray(rgb, np.float64)
        p = lambda d: 10 * np.log10(
            255.0**2 / max(np.mean((d - src) ** 2), 1e-12))
        tc_rows.append((f"{name} ({h}x{w})", p(ref_tc), p(hq_tc)))
        print(tc_rows[-1])

    lines = [
        "# QUALITY — natural-image PSNR report",
        "",
        "Generated by `python tools/quality_report.py` (CPU backend, so every",
        "number is reproducible and oracle-comparable). Images are public",
        "photographs bundled with installed packages — Kodak-set stand-ins",
        "(this environment has no network); same 8-bit photographic",
        "statistics.",
        "",
        "**Reference-mode parity**: "
        + (f"payload bytes **verified byte-identical** to the C++ oracle "
           f"({parity_checks} image/codec comparisons) — reference-mode "
           f"PSNR *is* the reference library's PSNR."
           if parity_ok else
           ("NOT VERIFIED in this run (oracle unavailable — regenerate "
            "where /root/reference and g++ exist)."
            if parity_checks == 0 else
            f"MISMATCH DETECTED on {parity_fails}/{parity_checks} "
            "comparisons — investigate before trusting these numbers.")),
        "",
        "## DXT1 / DXT5 / ETC1 (full images)",
        "",
        "| image | DXT1 ref | DXT1 HQ | gain | DXT5 ref | DXT5 HQ | gain "
        "| ETC1 ref | ETC1 HQ | gain |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        d1g = r["dxt1_hq"] - r["dxt1_ref"]
        d5g = r["dxt5_hq"] - r["dxt5_ref"]
        eg = r["etc1_hq"] - r["etc1_ref"]
        lines.append(
            f"| {r['image']} | {r['dxt1_ref']:.2f} | {r['dxt1_hq']:.2f} | "
            f"**+{d1g:.2f}** | {r['dxt5_ref']:.2f} | {r['dxt5_hq']:.2f} | "
            f"**+{d5g:.2f}** | {r['etc1_ref']:.2f} | {r['etc1_hq']:.2f} | "
            f"+{eg:.2f} |"
        )
    lines += [
        "",
        "PSNR in dB over RGB channels. HQ mode (quality=\"high\") is the",
        "PCA + least-squares extension; per-block never-worse vs reference is",
        "enforced in-kernel and tested (tests/test_dxt_hq.py).",
        "",
        "## DXT5 alpha channel (synthetic smooth alpha over the photos)",
        "",
        "| image | alpha ref | alpha HQ | gain |",
        "|---|---|---|---|",
    ] + [f"| {n} | {p:.2f} | {q:.2f} | **+{q - p:.2f}** |"
         for n, p, q in alpha_rows] + [
        "",
        "Alpha-plane PSNR with a deterministic gradient+noise alpha (the",
        "photos have none). HQ refits both alpha ramp schemes by least",
        "squares from extreme, interior-extreme (explicit scheme) and",
        "shrunk-spread (interp scheme) seeds, then searches a ±3 joint",
        "endpoint neighborhood twice with re-centering; per-block",
        "never-worse vs the reference's",
        "extreme-based endpoints.",
        "",
        "## PVRTC 2BPP (square power-of-two crops)",
        "",
        "| image | ref | HQ | gain |",
        "|---|---|---|---|",
    ] + [f"| {n} | {p:.2f} | {q:.2f} | **+{q - p:.2f}** |"
         for n, p, q in pv_rows] + [
        "",
        "PVRTC HQ (quality=\"high\") is the alternating least-squares",
        "extension (codecs/pvrtc_hq.py) with an image-level never-worse",
        "best-of vs the reference encoder (tests/test_pvrtc_hq.py).",
        "",
        "## PVRTC 4BPP (extension codec, same crops)",
        "",
        "| image | default | HQ | gain |",
        "|---|---|---|---|",
    ] + [f"| {n} | {p:.2f} | {q:.2f} | **+{q - p:.2f}** |"
         for n, p, q in pv4_rows] + [
        "",
        "## DXT1 -> ETC1 transcode (vs the original photo)",
        "",
        "| image | heuristic (reference) | HQ re-encode | gain |",
        "|---|---|---|---|",
    ] + [f"| {n} | {p:.2f} | {q:.2f} | **+{q - p:.2f}** |"
         for n, p, q in tc_rows] + [
        "",
        "transcode_dxt1_to_etc1(..., quality=\"high\") re-encodes the",
        "decoded DXT1 pixels with the full HQ ETC1 search instead of the",
        "reference's heuristic; never-worse per block vs the heuristic",
        "(tests/test_etc.py::test_transcode_hq_never_worse).",
        ""]

    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}; parity checks={parity_checks} "
          f"fails={parity_fails}")
    return 0 if parity_ok else 1


if __name__ == "__main__":
    sys.exit(main())
