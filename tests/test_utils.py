"""Archive serialization + profiling utils."""

import numpy as np

from texcomp import CompressedImage, DxtcCompressor, EtcCompressor, Format
from texcomp.utils import load_archive, save_archive
from tests.conftest import make_test_image


def test_archive_roundtrip(rng, tmp_path):
    dc = DxtcCompressor()
    ec = EtcCompressor()
    images = {}
    img = make_test_image(rng, 20, 24, 3)
    ci = CompressedImage()
    assert dc.compress(Format.RGB, 20, 24, 0, img.tobytes(), ci)
    images["a/dxt1"] = ci
    img4 = make_test_image(rng, 16, 16, 4)
    ci4 = CompressedImage()
    assert dc.compress(Format.RGBA, 16, 16, 0, img4.tobytes(), ci4)
    images["b/dxt5"] = ci4
    cie = CompressedImage()
    assert ec.compress(Format.RGB, 12, 8, 0,
                       make_test_image(rng, 12, 8, 3).tobytes(), cie)
    images["c/etc"] = cie

    path = tmp_path / "textures.txc"
    save_archive(str(path), images)
    loaded = load_archive(str(path))
    assert set(loaded) == set(images)
    for name in images:
        np.testing.assert_array_equal(
            loaded[name].get_data(), images[name].get_data(), err_msg=name
        )
        a = loaded[name].get_metadata()
        b = images[name].get_metadata()
        assert (a.format, a.compressor_name, a.uncompressed_height,
                a.uncompressed_width, a.compressed_height,
                a.compressed_width, a.padding_bytes_per_row) == (
            b.format, b.compressor_name, b.uncompressed_height,
            b.uncompressed_width, b.compressed_height, b.compressed_width,
            b.padding_bytes_per_row)
    # loaded archives decode
    buf = bytearray()
    assert dc.decompress(loaded["a/dxt1"], buf)
    assert len(buf) == 20 * 24 * 3


def test_throughput_runs(rng):
    import jax.numpy as jnp

    from texcomp.utils import throughput

    x = jnp.asarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    mpix = throughput(lambda v: v.astype(jnp.int32) * 2,
                      x, pixels=64 * 64, iters=2, reps=1)
    assert mpix > 0
