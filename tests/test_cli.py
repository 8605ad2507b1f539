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
