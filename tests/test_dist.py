"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Key invariant: shard-invariance — the same bytes come out regardless of the
mesh layout (SURVEY.md section 4, point 4)."""

import jax
import numpy as np
import pytest

from texcomp.dist.mesh import make_mesh, training_step_multichip
from texcomp.dist.pipeline import AssetPipeline, TextureAsset, quality_report
from tests.conftest import make_test_image


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"requires {n} devices; have {len(jax.devices())}")


def test_virtual_mesh_available():
    _need_devices(8)


@pytest.mark.parametrize("ndev", [1, 2, 3, 5, 8])
def test_training_step_multichip(ndev):
    _need_devices(ndev)
    training_step_multichip(ndev)


def test_training_step_degrades_to_available_devices():
    """Asking for more devices than exist runs on what's available
    instead of crashing (VERDICT r1 item 2)."""
    training_step_multichip(2 * len(jax.devices()))


def test_make_mesh_rejects_oversubscription():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(len(jax.devices()) + 1, data=len(jax.devices()) + 1)
    with pytest.raises(ValueError, match="positive"):
        make_mesh(4, data=0, block=1)


@pytest.mark.parametrize("codec", ["dxt1", "dxt5", "etc1"])
def test_pipeline_shard_invariance(codec, rng):
    """Same bytes on a 1-device and an 8-device mesh."""
    from jax.sharding import Mesh

    _need_devices(8)
    c = 3 if codec in ("dxt1", "etc1") else 4
    images = np.stack([make_test_image(rng, 16, 16, c) for _ in range(10)])

    p1 = AssetPipeline(Mesh(np.array(jax.devices()[:1]), ("data",)))
    p8 = AssetPipeline(Mesh(np.array(jax.devices()[:8]), ("data",)))
    out1 = p1.encode_group(images, codec)
    out8 = p8.encode_group(images, codec)
    np.testing.assert_array_equal(out1, out8)


def test_pipeline_mixed_assets_oracle_parity(rng, oracle):
    """The sharded pipeline produces the same bytes as the reference for a
    mixed fleet (mini config-5)."""
    from texcomp.api.container import Format

    _need_devices(8)
    assets = []
    specs = [("dxt1", 16, 3), ("dxt5", 16, 4), ("etc1", 16, 3),
             ("pvrtc", 16, 4), ("dxt1", 32, 3), ("dxt5", 8, 4)]
    for i, (codec, size, c) in enumerate(specs * 3):
        assets.append(TextureAsset(
            name=f"tex{i}_{codec}_{size}",
            image=make_test_image(rng, size, size, c),
            codec=codec,
        ))

    from jax.sharding import Mesh

    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:8]), ("data",)))
    results = pipeline.run(assets)
    assert len(results) == len(assets)

    fmt_of = {"dxt1": Format.RGB, "dxt5": Format.RGBA, "etc1": Format.RGB,
              "pvrtc": Format.RGBA}
    name_of = {"dxt1": "dxtc", "dxt5": "dxtc", "etc1": "etc",
               "pvrtc": "pvrtc"}
    for a in assets:
        h, w = a.image.shape[0], a.image.shape[1]
        ref, _, _ = oracle.compress(name_of[a.codec], fmt_of[a.codec], h, w,
                                    0, a.image.tobytes(), strategy=a.strategy)
        got = results[a.name].get_data()
        np.testing.assert_array_equal(got, ref, err_msg=a.name)


def test_pipeline_mixed_formats_oracle_parity(rng, oracle):
    """BGR/BGRA assets route through the fleet with byte parity vs the
    per-asset reference calls, incl. the const-path double-swap quirk
    (dxtc_compressor.cc:360) and mipmap metadata formats (VERDICT r3 #7)."""
    from jax.sharding import Mesh

    from texcomp.api.container import Format

    _need_devices(8)
    specs = [("dxt1", Format.RGB, 3), ("dxt1", Format.BGR, 3),
             ("dxt5", Format.RGBA, 4), ("dxt5", Format.BGRA, 4),
             ("etc1", Format.RGB, 3), ("pvrtc", Format.RGBA, 4)]
    assets = []
    for i, (codec, fmt, c) in enumerate(specs * 3):
        # Solid every 3rd asset: the BGR double-swap quirk lives in the
        # const-color path, which random content rarely hits at 16^2.
        kind = "solid" if i % 3 == 2 else "mixed"
        assets.append(TextureAsset(
            name=f"tex{i}_{codec}_{fmt.name}",
            image=make_test_image(rng, 16, 16, c, kind=kind),
            codec=codec, format=fmt))

    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:8]), ("data",)))
    results = pipeline.run(assets, mipmaps=True)

    name_of = {"dxt1": "dxtc", "dxt5": "dxtc", "etc1": "etc",
               "pvrtc": "pvrtc"}
    for a in assets:
        h, w = a.image.shape[0], a.image.shape[1]
        ref, _, _ = oracle.compress(name_of[a.codec], a.format, h, w,
                                    0, a.image.tobytes(),
                                    strategy=a.strategy)
        got = results[a.name].get_data()
        np.testing.assert_array_equal(got, ref, err_msg=a.name)
        assert results[a.name].get_metadata().format == a.format
        if a.codec != "pvrtc":
            # Mip levels: bytes equal the reference's repeated Downsample
            # (swap-free re-encode) and metadata keeps the source format.
            cur, uh, uw, ch, cw = ref, h, w, h, w
            lvl = 1
            while f"{a.name}_mip{lvl}" in results:
                refd = oracle.downsample(name_of[a.codec], a.format, uh, uw,
                                         ch, cw, 0, cur,
                                         strategy=a.strategy)
                assert refd is not None, f"{a.name} mip{lvl}"
                mip = results[f"{a.name}_mip{lvl}"]
                np.testing.assert_array_equal(
                    mip.get_data(), refd[0],
                    err_msg=f"{a.name} mip{lvl}")
                assert mip.get_metadata().format == a.format
                cur, ch, cw = refd[0], refd[1], refd[2]
                uh, uw = max(uh // 2, 1), max(uw // 2, 1)
                lvl += 1


def test_pipeline_rejects_invalid_format(rng):
    """Format/codec mismatches fail loudly, mirroring supports_format."""
    from texcomp.api.container import Format

    p = AssetPipeline()
    img = make_test_image(rng, 8, 8, 3)
    with pytest.raises(ValueError, match="cannot encode"):
        p.encode_group(np.stack([img]), "etc1", fmt=Format.BGR)
    with pytest.raises(ValueError, match="cannot encode"):
        p.encode_group(np.stack([make_test_image(rng, 8, 8, 4)]), "pvrtc",
                       fmt=Format.BGRA)
    # Format.RGB is IntEnum value 0 (falsy): an explicit-but-invalid
    # format on an asset must reach the validation, not silently coerce
    # to the codec default (round-4 advisor finding).
    bad = TextureAsset("bad", make_test_image(rng, 8, 8, 4), "dxt5",
                       format=Format.RGB)
    with pytest.raises(ValueError, match="cannot encode"):
        p.run([bad])


def test_quality_report_runs(rng):
    from jax.sharding import Mesh

    _need_devices(4)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:4]), ("data",)))
    images = np.stack([make_test_image(rng, 16, 16, 3, kind="solid")
                       for _ in range(8)])
    psnr = quality_report(pipeline, images, "dxt1")
    assert psnr > 25  # solid textures encode near-losslessly


def test_atlas_sharded_matches_single_device(rng):
    """Block-row sharding of one big atlas: same bytes on 1 vs 8 devices."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.dist.mesh import dxt1_encode_atlas_sharded

    _need_devices(8)
    img = make_test_image(rng, 64, 32, 3)
    m1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out1 = np.asarray(dxt1_encode_atlas_sharded(jnp.asarray(img), m1))
    out8 = np.asarray(dxt1_encode_atlas_sharded(jnp.asarray(img), m8))
    np.testing.assert_array_equal(out1, out8)

    # and equals the plain codec result
    from texcomp.codecs import dxt

    blocks = (img.astype(np.int32).reshape(16, 4, 8, 4, 3)
              .transpose(0, 2, 1, 3, 4).reshape(-1, 16, 3))
    ref = np.asarray(dxt.encode_dxt1_blocks(jnp.asarray(blocks)))
    np.testing.assert_array_equal(out1, ref)


@pytest.mark.parametrize("codec", ["pvrtc", "pvrtc4"])
def test_quality_report_pvrtc(codec, rng):
    """quality_report covers the PVRTC codecs (extension decoders)."""
    from jax.sharding import Mesh

    _need_devices(4)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:4]), ("data",)))
    images = np.stack([make_test_image(rng, 16, 16, 4, kind="solid")
                       for _ in range(8)])
    psnr = quality_report(pipeline, images, codec)
    assert np.isfinite(psnr) and psnr > 15


def test_atlas_sharded_1024(rng):
    """Realistic-scale atlas: a 1024^2 image sharded over 8 devices
    byte-equals the single-device encode (VERDICT r1 item 9)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.dist.mesh import dxt1_encode_atlas_sharded

    _need_devices(8)
    img = make_test_image(rng, 1024, 1024, 3)
    m1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out1 = np.asarray(dxt1_encode_atlas_sharded(jnp.asarray(img), m1))
    out8 = np.asarray(dxt1_encode_atlas_sharded(jnp.asarray(img), m8))
    np.testing.assert_array_equal(out1, out8)
    assert out1.shape == (256 * 256, 8)


@pytest.mark.parametrize("codec,c,bs", [("dxt5", 4, 16), ("etc1", 3, 8)])
def test_atlas_sharded_all_codecs(codec, c, bs, rng):
    """encode_atlas_sharded covers dxt5/etc1 too: sharded bytes equal the
    single-device encode."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.dist.mesh import encode_atlas_sharded

    _need_devices(8)
    img = make_test_image(rng, 128, 64, c)
    m1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out1 = np.asarray(encode_atlas_sharded(jnp.asarray(img), m1, codec))
    out8 = np.asarray(encode_atlas_sharded(jnp.asarray(img), m8, codec))
    np.testing.assert_array_equal(out1, out8)
    assert out1.shape == (32 * 16, bs)


def test_step_data_block_mesh_1024(rng):
    """The full sharded step on a ("data", "block") 4x2 mesh with 1024^2
    images: encode bytes byte-equal the unsharded encode and the PSNR
    psum matches the numpy PSNR."""
    import jax.numpy as jnp
    from texcomp.codecs import dxt
    from texcomp.dist.mesh import _step, make_mesh

    _need_devices(8)
    mesh = make_mesh(8, data=4, block=2)
    images = np.stack([make_test_image(rng, 1024, 1024, 3)
                       for _ in range(4)])
    with mesh:
        encoded, psnr = _step(jnp.asarray(images), mesh)
        encoded = np.asarray(encoded)

    from texcomp.blocks import image_to_blocks

    blocks = jax.vmap(image_to_blocks)(jnp.asarray(images))
    ref = np.asarray(jax.vmap(dxt.encode_dxt1_blocks)(blocks))
    np.testing.assert_array_equal(encoded, ref)

    dec = np.asarray(jax.vmap(dxt.decode_dxt1_blocks)(jnp.asarray(ref)))
    mse = np.mean((dec - np.asarray(blocks).astype(np.float64)) ** 2)
    expect = 10 * np.log10(255.0**2 / mse)
    assert abs(float(psnr) - expect) < 0.05


def test_pipeline_thousand_assets(rng):
    """O(1k) mixed small assets through the sharded pipeline (the config-5
    shape at test scale): every asset comes back valid and decodable."""
    from jax.sharding import Mesh

    from texcomp import DxtcCompressor, EtcCompressor

    _need_devices(8)
    specs = [("dxt1", 16, 3), ("dxt5", 16, 4), ("etc1", 16, 3),
             ("dxt1", 32, 3)]
    assets = [
        TextureAsset(f"a{i}", make_test_image(rng, s, s, c), codec)
        for i, (codec, s, c) in enumerate(specs * 250)
    ]
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:8]), ("data",)),
                             batch_size=128)
    results = pipeline.run(assets)
    assert len(results) == 1000
    dxtc, etcc = DxtcCompressor(), EtcCompressor()
    for i in (0, 1, 2, 499, 999):  # spot-check validity + decode
        a = assets[i]
        ci = results[a.name]
        comp = etcc if a.codec == "etc1" else dxtc
        assert comp.is_valid_compressed_image(ci)
        buf = bytearray()
        assert comp.decompress(ci, buf)


def test_pipeline_with_mipmaps(rng):
    """run(mipmaps=True) attaches full chains for the 4x4-block codecs,
    byte-identical to repeated downsample; PVRTC assets get none (the
    reference cannot downsample PVRTC)."""
    from jax.sharding import Mesh

    from texcomp import CompressedImage, DxtcCompressor, EtcCompressor

    _need_devices(4)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:4]), ("data",)))
    assets = [
        TextureAsset("d", make_test_image(rng, 32, 32, 3), "dxt1"),
        TextureAsset("e", make_test_image(rng, 16, 16, 3), "etc1"),
        TextureAsset("p", make_test_image(rng, 16, 16, 4), "pvrtc"),
    ]
    results = pipeline.run(assets, mipmaps=True)
    assert "d_mip1" in results and "d_mip5" in results  # 32 -> 1x1
    assert "e_mip4" in results and "e_mip5" not in results  # 16 -> 1x1
    assert not any(k.startswith("p_mip") for k in results)

    # chain levels equal repeated API downsample
    for name, comp in (("d", DxtcCompressor()), ("e", EtcCompressor())):
        cur = results[name]
        lvl = 1
        while f"{name}_mip{lvl}" in results:
            nxt = CompressedImage()
            assert comp.downsample(cur, nxt)
            np.testing.assert_array_equal(
                np.asarray(results[f"{name}_mip{lvl}"].get_data()),
                np.asarray(nxt.get_data()), err_msg=f"{name} mip{lvl}")
            cur = nxt
            lvl += 1


def test_pipeline_pvrtc4(rng):
    from jax.sharding import Mesh

    from texcomp import Pvrtc4bppCompressor

    _need_devices(4)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:4]), ("data",)))
    imgs = np.stack([make_test_image(rng, 16, 16, 4) for _ in range(6)])
    out = pipeline.encode_group(imgs, "pvrtc4")
    assert out.shape == (6, 16, 8)  # 16 blocks of 8 bytes for 16x16

    assets = [TextureAsset(f"t{i}", imgs[i], "pvrtc4") for i in range(6)]
    results = pipeline.run(assets)
    c = Pvrtc4bppCompressor()
    for i in range(6):
        ci = results[f"t{i}"]
        assert c.is_valid_compressed_image(ci)
        buf = bytearray()
        assert c.decompress(ci, buf)


def test_pipeline_hq_quality(rng):
    """quality='high' assets route through the HQ encoders in the sharded
    pipeline and match the single-image API encoders byte-for-byte."""
    from jax.sharding import Mesh

    from texcomp import (CompressedImage, DxtcCompressor, Format,
                         PvrtcCompressor)

    _need_devices(2)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:2]), ("data",)))

    imgs3 = np.stack([make_test_image(rng, 16, 16, 3) for _ in range(4)])
    imgs4 = np.stack([make_test_image(rng, 16, 16, 4) for _ in range(4)])
    imgs4[..., 3] = 255
    assets = (
        [TextureAsset(f"d{i}", imgs3[i], "dxt1", quality="high")
         for i in range(4)]
        + [TextureAsset(f"p{i}", imgs4[i], "pvrtc", quality="high")
           for i in range(4)]
    )
    results = pipeline.run(assets)

    dxtc_hq = DxtcCompressor(quality="high")
    pv_hq = PvrtcCompressor(quality="high")
    for i in range(4):
        ci = CompressedImage()
        assert dxtc_hq.compress(Format.RGB, 16, 16, 0, imgs3[i].tobytes(), ci)
        np.testing.assert_array_equal(
            np.asarray(results[f"d{i}"].get_data()),
            np.asarray(ci.get_data()), err_msg=f"d{i}")

        ci = CompressedImage()
        assert pv_hq.compress(Format.RGBA, 16, 16, 0, imgs4[i].tobytes(), ci)
        np.testing.assert_array_equal(
            np.asarray(results[f"p{i}"].get_data()),
            np.asarray(ci.get_data()), err_msg=f"p{i}")


def test_pipeline_fleet_mixed_quality_parity(rng):
    """One pipeline.run over a MIXED fleet — every codec, reference and
    high quality interleaved (the bench_pipeline_fleet_hq shape) — must
    match the single-asset API byte-for-byte for every asset."""
    from jax.sharding import Mesh

    from texcomp import (CompressedImage, DxtcCompressor, EtcCompressor,
                         Format, PvrtcCompressor)

    _need_devices(2)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:2]), ("data",)))

    codecs = {
        "dxt1": (3, Format.RGB, lambda q: DxtcCompressor(quality=q)),
        "dxt5": (4, Format.RGBA, lambda q: DxtcCompressor(quality=q)),
        "etc1": (3, Format.RGB, lambda q: EtcCompressor(quality=q)),
        "pvrtc": (4, Format.RGBA, lambda q: PvrtcCompressor(quality=q)),
    }
    assets, imgs = [], {}
    for codec, (ch, _fmt, _mk) in codecs.items():
        for q in ("reference", "high"):
            for i in range(2):
                name = f"{codec}_{q}_{i}"
                img = make_test_image(rng, 16, 16, ch)
                imgs[name] = img
                assets.append(TextureAsset(name, img, codec, quality=q))
    results = pipeline.run(assets)

    for codec, (ch, fmt, mk) in codecs.items():
        for q in ("reference", "high"):
            comp = mk(q)
            for i in range(2):
                name = f"{codec}_{q}_{i}"
                ci = CompressedImage()
                assert comp.compress(fmt, 16, 16, 0,
                                     imgs[name].tobytes(), ci)
                np.testing.assert_array_equal(
                    np.asarray(results[name].get_data()),
                    np.asarray(ci.get_data()), err_msg=name)


def test_pvrtc_atlas_sharded_matches_single_device(rng):
    """PVRTC block-row sharding: the upscale/mode-decision halo exchanges
    (ppermute over "data") reproduce the single-device wrap exactly."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.dist.mesh import pvrtc_encode_atlas_sharded
    from texcomp.ops.pvrtc_fast import encode_pvrtc_2bpp_fast

    _need_devices(8)
    img = make_test_image(rng, 128, 128, 4)
    img = img.copy()
    img[0:8] = 0          # all-zero region spanning the first shard
    img[60:68] = img[4:12]  # correlated rows across a shard boundary
    j = jnp.asarray(img)

    ref = np.asarray(encode_pvrtc_2bpp_fast(j))
    m1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out1 = np.asarray(pvrtc_encode_atlas_sharded(j, m1))
    out8 = np.asarray(pvrtc_encode_atlas_sharded(j, m8))
    np.testing.assert_array_equal(out1, ref)
    np.testing.assert_array_equal(out8, ref)

    with pytest.raises(ValueError):
        pvrtc_encode_atlas_sharded(jnp.asarray(img[:, :64]), m8)  # not square


def test_pipeline_mipmaps_respect_quality(rng):
    """mip chains for quality='high' assets use the HQ compressors (same
    bytes as DxtcCompressor(quality='high').downsample_chain)."""
    from jax.sharding import Mesh

    from texcomp import DxtcCompressor

    _need_devices(2)
    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:2]), ("data",)))
    img = make_test_image(rng, 16, 16, 3)
    assets = [TextureAsset("h", img, "dxt1", quality="high")]
    results = pipeline.run(assets, mipmaps=True)

    chain = DxtcCompressor(quality="high").downsample_chain(results["h"])
    for lvl, mip in enumerate(chain, start=1):
        np.testing.assert_array_equal(
            np.asarray(results[f"h_mip{lvl}"].get_data()),
            np.asarray(mip.get_data()), err_msg=f"mip{lvl}")


def test_pvrtc_atlas_sharded_two_axis_mesh(rng):
    """The halo exchanges also compose with a (data, block) mesh — the
    'block' axis is simply replicated for this op."""
    import jax.numpy as jnp

    from texcomp.dist.mesh import make_mesh, pvrtc_encode_atlas_sharded
    from texcomp.ops.pvrtc_fast import encode_pvrtc_2bpp_fast

    _need_devices(8)
    img = jnp.asarray(make_test_image(rng, 128, 128, 4))
    ref = np.asarray(encode_pvrtc_2bpp_fast(img))
    mesh = make_mesh(8, data=4, block=2)
    out = np.asarray(pvrtc_encode_atlas_sharded(img, mesh))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc_atlas_sharded_one_row_per_shard(rng):
    """Edge case: each shard holds exactly ONE block row, so both upscale
    y-neighbors come entirely from the halo exchanges."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.dist.mesh import pvrtc_encode_atlas_sharded
    from texcomp.ops.pvrtc_fast import encode_pvrtc_2bpp_fast

    _need_devices(8)
    img = jnp.asarray(make_test_image(rng, 32, 32, 4))
    ref = np.asarray(encode_pvrtc_2bpp_fast(img))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = np.asarray(pvrtc_encode_atlas_sharded(img, m8))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc4_atlas_sharded(rng):
    """4bpp extension atlas: block rows sharded with A/B halo exchanges,
    byte-identical to the single-device encoder (dist/mesh.py)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device
    from texcomp.dist.mesh import pvrtc4_encode_atlas_sharded

    _need_devices(8)
    img = jnp.asarray(make_test_image(rng, 128, 128, 4))
    ref = np.asarray(encode_pvrtc_4bpp_device(img))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = np.asarray(pvrtc4_encode_atlas_sharded(img, mesh))
    np.testing.assert_array_equal(out, ref)


def test_pvrtc4_atlas_sharded_one_row_per_shard(rng):
    """Edge case: one 4x4 block row per shard — both upscale y-neighbors
    come entirely from the halos."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device
    from texcomp.dist.mesh import pvrtc4_encode_atlas_sharded

    _need_devices(8)
    img = jnp.asarray(make_test_image(rng, 32, 32, 4))
    ref = np.asarray(encode_pvrtc_4bpp_device(img))
    m8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = np.asarray(pvrtc4_encode_atlas_sharded(img, m8))
    np.testing.assert_array_equal(out, ref)


def test_pipeline_inflight_window_invariance(rng):
    """run()'s bounded async-dispatch window must not change results: the
    tightest window (2), a mid window, and one larger than the whole
    fleet produce byte-identical payloads in the same result keys."""
    from jax.sharding import Mesh

    _need_devices(4)
    assets = []
    for i, (codec, size) in enumerate(
            [("dxt1", 16), ("dxt5", 16), ("etc1", 16), ("dxt1", 32),
             ("pvrtc", 16)] * 4):
        c = 4 if codec in ("dxt5", "pvrtc") else 3
        assets.append(TextureAsset(f"w{i}_{codec}_{size}",
                                   make_test_image(rng, size, size, c),
                                   codec))

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    outs = []
    for window in (2, 3, 99):
        res = AssetPipeline(mesh, batch_size=4,
                            max_inflight=window).run(assets)
        assert set(res) == {a.name for a in assets}
        outs.append({k: bytes(v.get_data()) for k, v in res.items()})
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.parametrize("codec,ch,b,hw", [
    ("dxt1", 3, 12, 256), ("dxt5", 4, 6, 512), ("etc1", 3, 48, 64),
    ("dxt1", 3, 7, 32), ("dxt5", 4, 12, 16),
])
def test_folded_encode_mosaic_parity(codec, ch, b, hw, rng):
    """The grid-mosaic batched encode (_folded_encode: one pack + one
    words-kernel call + uint32 order fix) is byte-identical per image to
    the per-image jnp ground truth, including true (gr>1, gc>1) grids,
    const-color blocks, and BGR/BGRA swaps. Interpret mode runs the SAME
    Pallas kernels the TPU path uses."""
    import jax.numpy as jnp

    from texcomp.blocks import image_to_blocks
    from texcomp.codecs import dxt, etc
    from texcomp.dist.pipeline import _folded_encode, _mosaic_cols

    imgs = np.stack([make_test_image(rng, hw, hw, ch) for _ in range(b)])
    imgs[0, :8] = 77  # solid region -> const-color LUT path
    gc = _mosaic_cols(b, hw)
    assert b % gc == 0
    for swap in (False, True) if codec != "etc1" else (False,):
        out = np.asarray(_folded_encode(jnp.asarray(imgs), codec, 2, swap,
                                        interpret=True))
        if ch == 4:
            # The packed-u32-words input form (the fleet upload path) is
            # byte-identical, including the word-level BGRA swap.
            w32 = jnp.asarray(imgs.view(np.uint32).reshape(imgs.shape[:3]))
            out_w = np.asarray(_folded_encode(w32, codec, 2, swap,
                                              interpret=True))
            np.testing.assert_array_equal(out_w, out)
        for i in range(0, b, max(1, b // 4)):
            blk = image_to_blocks(jnp.asarray(imgs[i]))
            if swap:
                blk = jnp.concatenate([blk[..., 2::-1], blk[..., 3:]], -1)
            if codec == "dxt1":
                ref = dxt.encode_dxt1_blocks(blk, swap_red_and_blue=swap)
            elif codec == "dxt5":
                outside = jnp.zeros((blk.shape[0],), dtype=bool)
                ref = dxt.encode_dxt5_blocks(blk, outside,
                                             swap_red_and_blue=swap)
            else:
                ref = etc.encode_etc1_blocks(blk, 2)
            np.testing.assert_array_equal(out[i], np.asarray(ref))
