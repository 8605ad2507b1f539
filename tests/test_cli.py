"""CLI smoke tests (in-process main(), no subprocess/jax re-init)."""

import numpy as np

from texcomp.__main__ import main
from tests.conftest import make_test_image


def test_cli_roundtrip(rng, tmp_path, capsys):
    img = make_test_image(rng, 16, 24, 3)
    np.save(tmp_path / "img.npy", img)
    archive = str(tmp_path / "a.txc")

    assert main(["encode", "--codec", "dxt1", "--input",
                 str(tmp_path / "img.npy"), "--archive", archive]) == 0
    assert main(["info", "--archive", archive]) == 0
    out = capsys.readouterr().out
    assert "img: dxtc RGB 16x24" in out

    assert main(["decode", "--archive", archive, "--name", "img",
                 "--output", str(tmp_path / "dec.npy")]) == 0
    dec = np.load(tmp_path / "dec.npy")
    assert dec.shape == (16, 24, 3)

    assert main(["transcode-dxt1-etc1", "--archive", archive,
                 "--name", "img"]) == 0
    assert main(["decode", "--archive", archive, "--name", "img",
                 "--output", str(tmp_path / "dec2.npy")]) == 0


def test_cli_transcode_rejects_dxt5_and_missing_name(rng, tmp_path, capsys):
    """A DXT5 entry also carries compressor_name 'dxtc'; transcoding it
    would reinterpret 16-byte blocks as DXT1 and destroy the texture."""
    img = make_test_image(rng, 16, 16, 4)
    np.save(tmp_path / "img.npy", img)
    archive = str(tmp_path / "a.txc")
    assert main(["encode", "--codec", "dxt5", "--input",
                 str(tmp_path / "img.npy"), "--archive", archive]) == 0

    assert main(["transcode-dxt1-etc1", "--archive", archive,
                 "--name", "img"]) == 1
    assert "DXT1" in capsys.readouterr().err
    assert main(["transcode-dxt1-etc1", "--archive", archive,
                 "--name", "nope"]) == 1
    assert "not in archive" in capsys.readouterr().err
    # the archive entry is untouched and still decodes
    assert main(["decode", "--archive", archive, "--name", "img",
                 "--output", str(tmp_path / "dec.npy")]) == 0


def test_cli_decode_strips_row_padding(rng, tmp_path):
    """Entries encoded with padding_bytes_per_row decode to clean (H, W, C)."""
    from texcomp import CompressedImage, DxtcCompressor, Format
    from texcomp.utils import save_archive

    img = make_test_image(rng, 8, 12, 3)
    pad = 5
    padded = np.concatenate(
        [img.reshape(8, -1),
         np.zeros((8, pad), np.uint8)], axis=1)
    ci = CompressedImage()
    assert DxtcCompressor().compress(
        Format.RGB, 8, 12, pad, padded.tobytes(), ci)
    assert ci.get_metadata().padding_bytes_per_row == pad
    save_archive(str(tmp_path / "p.txc"), {"img": ci})

    assert main(["decode", "--archive", str(tmp_path / "p.txc"),
                 "--name", "img",
                 "--output", str(tmp_path / "dec.npy")]) == 0
    dec = np.load(tmp_path / "dec.npy")
    assert dec.shape == (8, 12, 3)

    # Same pixels encoded without padding decode to the same image.
    ci0 = CompressedImage()
    assert DxtcCompressor().compress(Format.RGB, 8, 12, 0, img.tobytes(), ci0)
    save_archive(str(tmp_path / "p0.txc"), {"img": ci0})
    assert main(["decode", "--archive", str(tmp_path / "p0.txc"),
                 "--name", "img",
                 "--output", str(tmp_path / "dec0.npy")]) == 0
    np.testing.assert_array_equal(dec, np.load(tmp_path / "dec0.npy"))


def test_cli_mipmap(rng, tmp_path, capsys):
    img = make_test_image(rng, 32, 16, 3)
    np.save(tmp_path / "img.npy", img)
    archive = str(tmp_path / "m.txc")
    assert main(["encode", "--codec", "dxt1", "--input",
                 str(tmp_path / "img.npy"), "--archive", archive]) == 0
    assert main(["mipmap", "--archive", archive, "--name", "img",
                 "--levels", "3"]) == 0
    assert main(["info", "--archive", archive]) == 0
    out = capsys.readouterr().out
    for lvl, size in ((1, "16x8"), (2, "8x4"), (3, "4x2")):
        assert f"img_mip{lvl}: dxtc RGB {size}" in out
    assert main(["decode", "--archive", archive, "--name", "img_mip2",
                 "--output", str(tmp_path / "m2.npy")]) == 0
    assert np.load(tmp_path / "m2.npy").shape == (8, 4, 3)
    assert main(["mipmap", "--archive", archive, "--name", "zz"]) == 1


def test_cli_rejects_bad_input(rng, tmp_path):
    img = make_test_image(rng, 16, 16, 4)
    np.save(tmp_path / "img4.npy", img)
    assert main(["encode", "--codec", "dxt1", "--input",
                 str(tmp_path / "img4.npy"),
                 "--archive", str(tmp_path / "b.txc")]) == 1
    # non-power-of-two pvrtc rejected by the compressor
    img = make_test_image(rng, 12, 12, 4)
    np.save(tmp_path / "img12.npy", img)
    assert main(["encode", "--codec", "pvrtc", "--input",
                 str(tmp_path / "img12.npy"),
                 "--archive", str(tmp_path / "b.txc")]) == 1


def test_cli_transcode_quality_high(rng, tmp_path):
    """transcode-dxt1-etc1 --quality high: HQ re-encode, still decodable,
    and never worse than the reference transcode vs the DXT1 pixels."""
    import jax.numpy as jnp

    from texcomp.codecs import dxt as dxt_codec
    from texcomp.codecs import etc as etc_codec
    from texcomp.utils import load_archive

    img = make_test_image(rng, 24, 20, 3)
    np.save(tmp_path / "img.npy", img)
    a_ref = str(tmp_path / "ref.txc")
    a_hq = str(tmp_path / "hq.txc")
    for a in (a_ref, a_hq):
        assert main(["encode", "--codec", "dxt1", "--input",
                     str(tmp_path / "img.npy"), "--archive", a]) == 0
    dxt_blocks = load_archive(a_ref)["img"].get_data().reshape(-1, 8).copy()

    assert main(["transcode-dxt1-etc1", "--archive", a_ref,
                 "--name", "img"]) == 0
    assert main(["transcode-dxt1-etc1", "--archive", a_hq,
                 "--name", "img", "--quality", "high"]) == 0

    pixels = np.asarray(dxt_codec.decode_dxt1_blocks(jnp.asarray(dxt_blocks)))
    err = {}
    for a in (a_ref, a_hq):
        blocks = load_archive(a)["img"].get_data().reshape(-1, 8)
        dec = np.asarray(etc_codec.decode_etc1_blocks(jnp.asarray(blocks)))
        err[a] = np.sum((dec - pixels) ** 2)
    assert err[a_hq] <= err[a_ref]
    assert main(["decode", "--archive", a_hq, "--name", "img",
                 "--output", str(tmp_path / "dec.npy")]) == 0
