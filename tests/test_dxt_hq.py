"""High-quality DXT mode (EXTENSION): must never lose to the reference
encoder and should clearly beat it on natural content."""

import numpy as np
import pytest

from texcomp import CompressedImage, DxtcCompressor, Format
from texcomp.codecs import dxt as dxt_ref
from texcomp.codecs import dxt_hq
from tests.conftest import make_test_image


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255**2 / max(mse, 1e-9))


def _natural_image(rng, h, w, c):
    """Smooth chroma-varying content where luminance-only metrics fail."""
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    img = np.zeros((h, w, c))
    img[..., 0] = 128 + 90 * np.sin(xx / 9) + 20 * np.cos(yy / 5)
    img[..., 1] = 128 + 90 * np.sin(yy / 7 + 1)
    img[..., 2] = 128 + 90 * np.sin((xx - yy) / 11 + 2)
    img += rng.normal(0, 6, (h, w, c))
    if c == 4:
        img[..., 3] = np.clip(128 + 120 * np.sin(xx / 13), 0, 255)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_hq_blocks_never_worse_than_reference(rng):
    import jax.numpy as jnp

    rgb = rng.integers(0, 256, (500, 16, 3)).astype(np.int32)
    rgb[5:10] = rgb[5:6, 0:1]  # solid blocks: const-color path should win

    hq = np.asarray(dxt_hq.encode_dxt1_hq_blocks(jnp.asarray(rgb)))
    ref = np.asarray(dxt_ref.encode_dxt1_blocks(jnp.asarray(rgb)))

    dec_hq = np.asarray(dxt_ref.decode_dxt1_blocks(jnp.asarray(hq)))
    dec_ref = np.asarray(dxt_ref.decode_dxt1_blocks(jnp.asarray(ref)))
    err_hq = np.sum((dec_hq - rgb) ** 2, axis=(1, 2))
    err_ref = np.sum((dec_ref - rgb) ** 2, axis=(1, 2))
    assert np.all(err_hq <= err_ref), (
        f"hq worse on {np.sum(err_hq > err_ref)} blocks"
    )
    # strictly better somewhere on random content
    assert np.sum(err_hq < err_ref) > 100


@pytest.mark.parametrize("fmt", [Format.RGB, Format.RGBA])
def test_hq_api_beats_reference_psnr(fmt, rng):
    c = 3 if fmt == Format.RGB else 4
    h = w = 64
    img = _natural_image(rng, h, w, c)

    def roundtrip(quality):
        comp = DxtcCompressor(quality=quality)
        ci = CompressedImage()
        assert comp.compress(fmt, h, w, 0, img.tobytes(), ci)
        buf = bytearray()
        assert comp.decompress(ci, buf)
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, c)

    p_ref = _psnr(roundtrip("reference")[..., :3], img[..., :3])
    p_hq = _psnr(roundtrip("high")[..., :3], img[..., :3])
    assert p_hq > p_ref + 1.0, (p_ref, p_hq)


@pytest.mark.parametrize(
    "fmt", [Format.RGB, Format.BGR, Format.RGBA, Format.BGRA])
def test_hq_never_worse_all_formats(fmt, rng):
    """Per-block HQ error <= reference error for ALL four formats,
    including the red/blue-swapped ones (dxtc_compressor.cc:288,295,333)."""
    c = 3 if fmt in (Format.RGB, Format.BGR) else 4
    h = w = 48
    img = _natural_image(rng, h, w, c)

    def roundtrip(quality):
        comp = DxtcCompressor(quality=quality)
        ci = CompressedImage()
        assert comp.compress(fmt, h, w, 0, img.tobytes(), ci)
        buf = bytearray()
        assert comp.decompress(ci, buf)
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, c)

    def block_errors(dec):
        d = (dec.astype(int) - img.astype(int)) ** 2
        return d.reshape(h // 4, 4, w // 4, 4, c).sum(axis=(1, 3, 4))

    err_ref = block_errors(roundtrip("reference"))
    err_hq = block_errors(roundtrip("high"))
    assert np.all(err_hq <= err_ref), (
        f"hq worse on {np.sum(err_hq > err_ref)} blocks for {fmt.name}")
    assert np.sum(err_hq < err_ref) > 10  # strictly better somewhere


def test_hq_payloads_are_standard_dxt(rng):
    """HQ output must decode under the ordinary decoder and validate."""
    h = w = 32
    img = make_test_image(rng, h, w, 4)
    comp = DxtcCompressor(quality="high")
    ci = CompressedImage()
    assert comp.compress(Format.RGBA, h, w, 0, img.tobytes(), ci)
    assert DxtcCompressor().is_valid_compressed_image(ci)
    buf = bytearray()
    assert DxtcCompressor().decompress(ci, buf)
    # HQ alpha decodes at least as well as the reference scheme
    ref = CompressedImage()
    assert DxtcCompressor().compress(Format.RGBA, h, w, 0, img.tobytes(), ref)
    rbuf = bytearray()
    assert DxtcCompressor().decompress(ref, rbuf)
    hq_dec = np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    ref_dec = np.frombuffer(bytes(rbuf), np.uint8).reshape(h, w, 4)
    hq_aerr = np.sum((hq_dec[..., 3].astype(int) - img[..., 3]) ** 2)
    ref_aerr = np.sum((ref_dec[..., 3].astype(int) - img[..., 3]) ** 2)
    assert hq_aerr <= ref_aerr


def test_quality_arg_validation():
    with pytest.raises(ValueError):
        DxtcCompressor(quality="ultra")


def test_hq_alpha_never_worse(rng):
    """HQ DXT5 alpha endpoints never lose to the reference scheme."""
    import jax.numpy as jnp

    rgba = rng.integers(0, 256, (400, 16, 4)).astype(np.int32)
    rgba[50:100, :, 3] = (np.arange(16)[None, :] * 15
                          + rng.integers(0, 40, (50, 1))).clip(0, 255)
    rgba[100:110, :, 3] = 0
    rgba[110:120, :, 3] = 255
    outside = np.zeros(400, bool)

    ref = np.asarray(dxt_ref.encode_dxt5_blocks(jnp.asarray(rgba),
                                                jnp.asarray(outside)))
    hq = np.asarray(dxt_hq.encode_dxt5_hq_blocks(jnp.asarray(rgba),
                                                 jnp.asarray(outside)))
    dref = np.asarray(dxt_ref.decode_dxt5_blocks(jnp.asarray(ref)))[:, :, 3]
    dhq = np.asarray(dxt_ref.decode_dxt5_blocks(jnp.asarray(hq)))[:, :, 3]
    a = rgba[:, :, 3]
    eref = np.sum((dref - a) ** 2, axis=1)
    ehq = np.sum((dhq - a) ** 2, axis=1)
    assert np.all(ehq <= eref)
    assert np.sum(ehq < eref) > 100


def test_cluster_fit_closed_form_matches_explicit_ls(rng):
    """The precomputed per-partition inverse (alpha, beta, delta) and the
    quadratic score in _cluster_tables must agree with an explicit
    least-squares solve of the same partition's assignment."""
    import jax.numpy as jnp

    rgb = rng.integers(0, 256, (64, 16, 3)).astype(np.int32)
    rgb_f = jnp.asarray(rgb, jnp.float32)
    _, _, t = dxt_hq._pca_project(rgb_f)
    order = np.asarray(jnp.argsort(-t, axis=1))
    sel = dxt_hq._CF_SEL  # (17, P)
    npart = sel.shape[1]
    # Recover each kept partition's (c1, c2, c3) from the selection matrix.
    picks = rng.integers(0, npart, 12)
    cuts = [np.repeat(np.arange(17), sel[:, p].astype(int)) for p in picks]

    for pi, cut in zip(picks, cuts):
        c1, c2, c3 = int(cut[0]), int(cut[1]), int(cut[2])
        # Codes of the axis-sorted pixels: ramp order w0 = 1, 2/3, 1/3, 0
        # corresponds to palette codes 0, 2, 3, 1.
        ramp_codes = np.array([0, 2, 3, 1])
        counts = [c1, c2 - c1, c3 - c2, 16 - c3]
        sorted_codes = np.repeat(ramp_codes, counts)
        codes = np.zeros((64, 16), np.int64)
        np.put_along_axis(codes, order, sorted_codes[None, :], axis=1)

        e0, e1 = dxt_hq._least_squares_endpoints(rgb_f, jnp.asarray(codes))
        # Closed-form path: prefix sums of the sorted pixels.
        sp = np.take_along_axis(rgb, order[:, :, None], axis=1).astype(np.float64)
        p = np.concatenate([np.zeros((64, 1, 3)), np.cumsum(sp, axis=1)], 1)
        u = p[:, c1] + p[:, c2] + p[:, c3]
        pt = p[:, 16]
        b0, b1 = u / 3.0, pt - u / 3.0
        al, be, de = (dxt_hq._CF_ALPHA[pi], dxt_hq._CF_BETA[pi],
                      dxt_hq._CF_DELTA[pi])
        x0 = np.clip(al * b0 + be * b1, 0.0, 255.0)
        x1 = np.clip(be * b0 + de * b1, 0.0, 255.0)
        got0 = np.stack([np.asarray(v) for v in e0], -1)
        got1 = np.stack([np.asarray(v) for v in e1], -1)
        # Every kept partition has det >= ~1/81, far above the iterative
        # path's 1e-6 fallback threshold, so no degenerate-block exclusion
        # is needed.
        np.testing.assert_allclose(got0, x0, atol=2e-2)
        np.testing.assert_allclose(got1, x1, atol=2e-2)
        # Score formula == x . b (error = sum px^2 - x . b at the optimum).
        score = (dxt_hq._CF_QUU[pi] * u * u + dxt_hq._CF_QUT[pi] * u * pt
                 + dxt_hq._CF_QTT[pi] * pt * pt).sum(-1)
        unclipped0 = al * b0 + be * b1
        unclipped1 = be * b0 + de * b1
        xb = (unclipped0 * b0 + unclipped1 * b1).sum(-1)
        np.testing.assert_allclose(score, xb, rtol=1e-5)


def test_hq_alpha_exploits_explicit_scheme_on_bimodal(rng):
    """Blocks mixing near-0/near-255 pixels with an interior cluster are
    where the explicit scheme's free 0/255 entries win; the interior-seed
    family must find them (reference extremes-ramp does not)."""
    import jax.numpy as jnp
    from texcomp.codecs import dxt_hq

    n = 512
    a = np.zeros((n, 16), np.int32)
    kinds = rng.integers(0, 3, (n, 16))
    a[kinds == 0] = rng.integers(0, 12, (kinds == 0).sum())
    a[kinds == 1] = rng.integers(244, 256, (kinds == 1).sum())
    a[kinds == 2] = rng.integers(90, 166, (kinds == 2).sum())
    aj = jnp.asarray(a)

    ref_a0 = jnp.max(aj, axis=1)
    ref_a1 = jnp.min(aj, axis=1)
    ref_codes, ref_err = dxt_hq._alpha_assign(aj, ref_a0, ref_a1)
    a0, a1, codes = dxt_hq._hq_alpha(aj, ref_a0, ref_a1,
                                     (ref_codes, ref_err))
    ramp = dxt_hq._alpha_decode_ramp(a0, a1)
    vals = jnp.take_along_axis(ramp, codes, axis=1)
    hq_err = np.asarray(jnp.sum((vals - aj) ** 2, axis=-1), np.float64)
    re = np.asarray(ref_err, np.float64)

    assert np.all(hq_err <= re + 1e-3)
    # The explicit scheme must actually be chosen for a solid share of
    # these blocks...
    assert float(np.mean(np.asarray(a0 <= a1))) > 0.3
    # ...and the aggregate win must be large (catches seed-family
    # regressions; measured +3.7 dB / 81% explicit share here vs the
    # extremes ramp).
    psnr_hq = 10 * np.log10(255.0**2 / (hq_err.sum() / (n * 16)))
    psnr_ref = 10 * np.log10(255.0**2 / (re.sum() / (n * 16)))
    assert psnr_hq - psnr_ref > 3.0


def test_cluster_fit_chunked_matches_single_chunk(rng, monkeypatch):
    """The lax.map chunking that bounds cluster-fit memory at large N must
    preserve per-block results. Bitwise candidate equality does NOT hold:
    fusing the score pipeline inside lax.map changes f32 summation order,
    which flips top-k picks between near-tied partitions (measured 6/3000
    blocks, <=1.3% relative error change — either pick is a legitimate
    near-optimum). An indexing/padding bug, by contrast, scrambles whole
    chunks; so assert the per-block best exactly-scored candidate error is
    identical for >=99% of blocks and within 5% everywhere."""
    import jax.numpy as jnp
    from texcomp.codecs import dxt_hq

    n = 3000  # not a chunk multiple: exercises the padded tail
    rgb_f = jnp.asarray(rng.integers(0, 256, (n, 16, 3)), jnp.float32)

    def best_err(cands):
        best = None
        for c0, c1 in cands:
            _, err = dxt_hq._assign_codes(rgb_f, c0, c1)
            best = err if best is None else jnp.minimum(best, err)
        return np.asarray(best, np.float64)

    es = best_err(dxt_hq._cluster_fit_candidates(rgb_f))
    monkeypatch.setattr(dxt_hq, "_CLUSTER_CHUNK", 1024)  # force 3 chunks
    ec = best_err(dxt_hq._cluster_fit_candidates(rgb_f))

    diff = np.abs(es - ec)
    assert np.mean(diff == 0) >= 0.99, f"{(diff > 0).sum()} blocks differ"
    rel = diff / np.maximum(np.minimum(es, ec), 1.0)
    assert np.max(rel) < 0.05, f"max relative error diff {rel.max()}"


def test_hq_image_entries_match_blocks_route(rng):
    """encode_dxt{1,5}_hq_image (packed-word block extraction) is
    byte-identical to encode_*_hq_blocks(image_to_blocks(im)) — the image
    entries only restructure the transpose, never the search."""
    import jax.numpy as jnp

    from texcomp.blocks import image_to_blocks

    img3 = _natural_image(rng, 64, 48, 3)
    img4 = _natural_image(rng, 48, 64, 4)

    want1 = np.asarray(dxt_hq.encode_dxt1_hq_blocks(
        image_to_blocks(jnp.asarray(img3))))
    got1 = np.asarray(dxt_hq.encode_dxt1_hq_image(jnp.asarray(img3)))
    np.testing.assert_array_equal(want1, got1)

    blocks4 = image_to_blocks(jnp.asarray(img4))
    outside = jnp.zeros((blocks4.shape[0],), bool)
    want5 = np.asarray(dxt_hq.encode_dxt5_hq_blocks(blocks4, outside))
    got5 = np.asarray(dxt_hq.encode_dxt5_hq_image(jnp.asarray(img4)))
    np.testing.assert_array_equal(want5, got5)

    # BGR/BGRA sources: raw swapped image + flag == pre-swapped blocks
    # + flag (the packed route swaps at pack time).
    bgr = img3[:, :, ::-1].copy()
    want1b = np.asarray(dxt_hq.encode_dxt1_hq_blocks(
        image_to_blocks(jnp.asarray(img3)), swap_red_and_blue=True))
    got1b = np.asarray(dxt_hq.encode_dxt1_hq_image(
        jnp.asarray(bgr), swap_red_and_blue=True))
    np.testing.assert_array_equal(want1b, got1b)
