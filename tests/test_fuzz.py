"""Randomized differential testing vs the C++ oracle.

Each trial draws a random size/format/padding, compresses, decompresses,
and applies a random compressed-domain operation — asserting byte parity
at every step. This is the Kodak-style quality criterion in its strongest
form: identical bytes imply identical PSNR, so encode quality == reference
by construction.
"""

import numpy as np
import pytest

from texcomp import (
    CompressedImage,
    CompressionStrategy,
    DxtcCompressor,
    EtcCompressor,
    Format,
)
from tests.conftest import make_test_image

_FMT_COMPONENTS = {Format.RGB: 3, Format.BGR: 3, Format.RGBA: 4,
                   Format.BGRA: 4}


@pytest.mark.parametrize("trial", range(200))
def test_fuzz_differential(trial, oracle):
    rng = np.random.default_rng(10_000 + trial)
    use_etc = trial % 3 == 2
    if use_etc:
        fmt = Format.RGB
        strategy = int(rng.integers(0, 4))
        comp = EtcCompressor(CompressionStrategy(strategy))
        name = "etc"
    else:
        fmt = Format(int(rng.integers(0, 4)))
        strategy = 2
        comp = DxtcCompressor()
        name = "dxtc"
    comps = _FMT_COMPONENTS[fmt]

    if trial % 4 == 3:  # every 4th trial: large, to 256 (stress buckets,
        h = int(rng.integers(64, 257))  # host packing, partial edge rows)
        w = int(rng.integers(64, 257))
    else:
        h = int(rng.integers(1, 66))
        w = int(rng.integers(1, 66))
    padding = int(rng.integers(0, 9)) if rng.random() < 0.3 else 0

    kind = ["mixed", "solid"][int(rng.random() < 0.25)]
    img = make_test_image(rng, h, w, comps, kind=kind)
    buf = np.zeros(h * (w * comps + padding), dtype=np.uint8)
    rows = buf.reshape(h, w * comps + padding)
    rows[:, : w * comps] = img.reshape(h, -1)

    # Compress parity — alternating owned and external (caller-provided
    # buffer) output storage, mirroring compressed_image.h:84-134.
    ref, ch, cw = oracle.compress(name, fmt, h, w, padding, buf.tobytes(),
                                  strategy=strategy)
    use_external = rng.random() < 0.25
    if use_external:
        ext = np.zeros(comp.compute_compressed_data_size(fmt, h, w),
                       dtype=np.uint8)
        ci = CompressedImage(external_data=ext)
    else:
        ci = CompressedImage()
    assert comp.compress(fmt, h, w, padding, buf.tobytes(), ci)
    assert ci.owns_data() == (not use_external)
    np.testing.assert_array_equal(ci.get_data(), ref,
                                  err_msg=f"compress {name} {fmt} {h}x{w}")
    if use_external:  # compress really wrote through the caller's buffer
        np.testing.assert_array_equal(ext[:ci.get_data_size()], ref)

    # duplicate(): deep copy with owned storage regardless of source mode
    # (compressed_image.h:112-122); fuzz the copy, then use it downstream.
    if rng.random() < 0.25:
        dup = CompressedImage()
        dup.duplicate(ci)
        assert dup.owns_data()
        np.testing.assert_array_equal(dup.get_data(), ci.get_data())
        md, ms = dup.get_metadata(), ci.get_metadata()
        assert (md.format, md.uncompressed_height, md.uncompressed_width,
                md.compressed_height, md.compressed_width) == (
            ms.format, ms.uncompressed_height, ms.uncompressed_width,
            ms.compressed_height, ms.compressed_width)
        ci = dup

    # Decompress parity (padding == 0 only: the reference's padded-output
    # path overflows its own buffer; see helper4x4.image_array_to_buffer).
    if padding == 0:
        refdec = oracle.decompress(name, fmt, h, w, ch, cw, 0, ref, comps,
                                   strategy=strategy)
        out = bytearray()
        assert comp.decompress(ci, out)
        assert bytes(out) == refdec.tobytes(), f"decompress {name} {h}x{w}"

    # One random compressed-domain op.
    op = int(rng.integers(0, 4))
    if op == 0:  # pad
        ph = h + int(rng.integers(0, 20))
        pw = w + int(rng.integers(0, 20))
        mine = CompressedImage()
        got = comp.pad(ci, ph, pw, mine)
        refp = oracle.pad(name, fmt, h, w, ch, cw, padding, ref, ph, pw,
                          strategy=strategy)
        assert got == (refp is not None)
        if got:
            np.testing.assert_array_equal(mine.get_data(), refp[0],
                                          err_msg=f"pad {ph}x{pw}")
    elif op == 1:  # downsample
        mine = CompressedImage()
        got = comp.downsample(ci, mine)
        refd = oracle.downsample(name, fmt, h, w, ch, cw, padding, ref,
                                 strategy=strategy)
        assert got == (refd is not None), f"downsample accept {h}x{w}"
        if got:
            np.testing.assert_array_equal(mine.get_data(), refd[0],
                                          err_msg=f"downsample {h}x{w}")
    elif op == 2:  # copy_subimage with 4-aligned random region
        nbr = (ch // 4) if ch else 0
        nbc = (cw // 4) if cw else 0
        if nbr and nbc:
            r0 = 4 * int(rng.integers(0, nbr))
            c0 = 4 * int(rng.integers(0, nbc))
            sh = 4 * int(rng.integers(1, nbr - r0 // 4 + 1))
            sw = 4 * int(rng.integers(1, nbc - c0 // 4 + 1))
            mine = CompressedImage()
            got = comp.copy_subimage(ci, r0, c0, sh, sw, mine)
            refs = oracle.copy_subimage(name, fmt, h, w, ch, cw, padding,
                                        ref, r0, c0, sh, sw,
                                        strategy=strategy)
            assert got == (refs is not None)
            if got:
                np.testing.assert_array_equal(mine.get_data(), refs[0])
    else:  # compress_and_pad
        ph = h + int(rng.integers(0, 12))
        pw = w + int(rng.integers(0, 12))
        mine = CompressedImage()
        assert comp.compress_and_pad(fmt, h, w, ph, pw, padding,
                                     buf.tobytes(), mine)
        refc, _, _ = oracle.compress_and_pad(name, fmt, h, w, ph, pw,
                                             padding, buf.tobytes(),
                                             strategy=strategy)
        np.testing.assert_array_equal(mine.get_data(), refc,
                                      err_msg=f"compress_and_pad {ph}x{pw}")


_PVRTC_KINDS = ["noise", "gradient", "solid", "zero-rgb", "zero-channel",
                "alpha0", "alpha255"]


def _pvrtc_fuzz_image(rng, size, kind):
    """Content classes aimed at the PVRTC scan-order quirks: zero-rgb makes
    every color axis (lightness, r, g, b) all-zero, hitting the
    all-zero-axis -> global-pixel-0 rule (pvrtc_compressor.cc:266-301);
    solid/alpha extremes hit the early-exit modulation search
    (pvrtc_compressor.cc:148-166)."""
    if kind == "noise":
        return rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
    if kind == "solid":
        return np.broadcast_to(
            rng.integers(0, 256, (1, 1, 4), dtype=np.uint8),
            (size, size, 4)).copy()
    img = make_test_image(rng, size, size, 4)
    if kind == "zero-rgb":
        img[..., :3] = 0
    elif kind == "zero-channel":
        img[..., int(rng.integers(0, 4))] = 0
    elif kind == "alpha0":
        img[..., 3] = 0
    elif kind == "alpha255":
        img[..., 3] = 255
    return img


@pytest.mark.parametrize("trial", range(56))
def test_fuzz_pvrtc_differential(trial, oracle):
    """PVRTC randomized differential fuzz (random pow2 sizes, quirk-aimed
    content): 2bpp byte parity vs the C++ oracle, fast-path (ops.pvrtc_fast
    XLA pipeline) vs ground-truth cross-check, and 4bpp extension
    invariants (valid payload, decode round-trip, batched == single)."""
    from texcomp import Pvrtc4bppCompressor, PvrtcCompressor

    rng = np.random.default_rng(42_000 + trial)
    if trial % 28 == 27:
        size = 512
    elif trial % 7 == 6:
        size = 256
    else:
        size = int(2 ** rng.integers(3, 8))  # 8..128
    kind = _PVRTC_KINDS[trial % len(_PVRTC_KINDS)]
    img = _pvrtc_fuzz_image(rng, size, kind)

    # 2bpp vs the oracle (byte parity implies identical PSNR).
    ref, _, _ = oracle.compress("pvrtc", Format.RGBA, size, size, 0,
                                img.tobytes())
    comp = PvrtcCompressor()
    ci = CompressedImage()
    assert comp.compress(Format.RGBA, size, size, 0, img.tobytes(), ci)
    assert comp.is_valid_compressed_image(ci)
    np.testing.assert_array_equal(
        ci.get_data(), ref, err_msg=f"pvrtc 2bpp {size}^2 {kind}")

    # Fast-pipeline cross-check (different code path from the API's
    # ground-truth encoder even on CPU: barrier-staged packed words vs
    # the plane-form model).
    if size <= 64:
        import jax.numpy as jnp

        from texcomp.ops.pvrtc_fast import encode_pvrtc_2bpp_fast

        fast = np.asarray(
            encode_pvrtc_2bpp_fast(jnp.asarray(img))).reshape(-1)
        np.testing.assert_array_equal(
            fast, ref, err_msg=f"pvrtc fast {size}^2 {kind}")

    # 4bpp extension: no reference referent; fuzz the invariants.
    comp4 = Pvrtc4bppCompressor()
    ci4 = CompressedImage()
    assert comp4.compress(Format.RGBA, size, size, 0, img.tobytes(), ci4)
    assert comp4.is_valid_compressed_image(ci4)
    out = bytearray()
    assert comp4.decompress(ci4, out)
    dec = np.frombuffer(bytes(out), np.uint8).reshape(size, size, 4)
    if kind == "solid":
        # 5-bit endpoints replicate exactly for solid blocks' high bits;
        # bound the reconstruction instead of asserting exactness.
        err = np.abs(dec.astype(np.int32) - img.astype(np.int32))
        assert err.max() <= 16, f"4bpp solid err {err.max()}"
    if size <= 64:
        import jax
        import jax.numpy as jnp

        from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device

        single = np.asarray(encode_pvrtc_4bpp_device(jnp.asarray(img)))
        np.testing.assert_array_equal(
            single.reshape(-1), np.asarray(ci4.get_data()),
            err_msg="4bpp single vs API")
        batched = np.asarray(jax.vmap(encode_pvrtc_4bpp_device)(
            jnp.stack([jnp.asarray(img)] * 2)))
        np.testing.assert_array_equal(batched[0], single,
                                      err_msg="4bpp vmap vs single")
        np.testing.assert_array_equal(batched[1], single)


@pytest.mark.parametrize("trial", range(24))
def test_fuzz_decode_arbitrary_payloads(trial, oracle):
    """Decode parity on RANDOM payload bytes (not encoder output): the
    reference decodes arbitrary block words, and several decode quirks
    (Extend5Bit's replicated-bit masking for out-of-range ETC differential
    sums, DXT1's c0 == c1 degenerate palette) only trigger on payloads a
    conforming encoder never emits."""
    rng = np.random.default_rng(77_000 + trial)
    use_etc = trial % 2 == 1
    fmt = (Format.RGB if use_etc
           else [Format.RGB, Format.RGBA][(trial // 2) % 2])
    comps = _FMT_COMPONENTS[fmt]
    hi = 129 if trial % 4 >= 2 else 40
    h = int(rng.integers(1, hi))
    w = int(rng.integers(1, hi))
    ch, cw = 4 * ((h + 3) // 4), 4 * ((w + 3) // 4)
    block_bytes = 8 if (use_etc or comps == 3) else 16
    payload = rng.integers(
        0, 256, (ch // 4) * (cw // 4) * block_bytes, dtype=np.uint8)

    comp = EtcCompressor() if use_etc else DxtcCompressor()
    name = "etc" if use_etc else "dxtc"
    ci = CompressedImage()
    from texcomp.api.container import Metadata

    ci.create_owned_data(
        Metadata(fmt, name, h, w, ch, cw, 0), payload.size)
    ci.get_mutable_data()[:] = payload

    out = bytearray()
    assert comp.decompress(ci, out)
    ref = oracle.decompress(name, fmt, h, w, ch, cw, 0, payload, comps)
    np.testing.assert_array_equal(
        np.frombuffer(bytes(out), np.uint8), ref,
        err_msg=f"{name} {h}x{w} random payload")


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_hq_never_worse(trial):
    """HQ extension fuzz: for random content and sizes, every HQ encoder
    produces a valid standard payload whose decoded error is <= the
    reference/default encoder's."""
    from texcomp import Pvrtc4bppCompressor, PvrtcCompressor

    rng = np.random.default_rng(77_000 + trial)
    kind = ["mixed", "solid"][int(rng.random() < 0.3)]

    def sse(comp, ci, img):
        buf = bytearray()
        ok = comp.decompress(ci, buf)
        if not ok:
            ok = comp.decompress_extension(ci, buf)
        assert ok
        dec = np.frombuffer(bytes(buf), np.uint8).reshape(img.shape)
        d = dec.astype(np.float64) - img.astype(np.float64)
        return float((d * d).sum())

    # DXT1 / DXT5 (arbitrary sizes) and ETC1.
    for codec, fmt, comps in (("dxtc3", Format.RGB, 3),
                              ("dxtc4", Format.RGBA, 4),
                              ("etc", Format.RGB, 3)):
        h = int(rng.integers(4, 41)) // 4 * 4 or 4
        w = int(rng.integers(4, 41)) // 4 * 4 or 4
        img = make_test_image(rng, h, w, comps, kind=kind)
        errs = {}
        for q in ("reference", "high"):
            comp = (EtcCompressor(quality=q) if codec == "etc"
                    else DxtcCompressor(quality=q))
            ci = CompressedImage()
            assert comp.compress(fmt, h, w, 0, img.tobytes(), ci)
            assert comp.is_valid_compressed_image(ci)
            errs[q] = sse(comp, ci, img)
        assert errs["high"] <= errs["reference"], (codec, h, w, kind)

    # PVRTC 2bpp / 4bpp (square power-of-two; fixed sizes bound recompiles).
    size = [8, 16, 32][trial % 3]
    img = make_test_image(rng, size, size, 4, kind=kind)
    for cls in (PvrtcCompressor, Pvrtc4bppCompressor):
        errs = {}
        for q in ("reference", "high"):
            comp = cls(quality=q)
            ci = CompressedImage()
            assert comp.compress(Format.RGBA, size, size, 0, img.tobytes(),
                                 ci)
            assert comp.is_valid_compressed_image(ci)
            errs[q] = sse(comp, ci, img)
        assert errs["high"] <= errs["reference"], (cls.__name__, size, kind)
