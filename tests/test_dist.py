"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Key invariant: shard-invariance — the same bytes come out regardless of the
mesh layout (SURVEY.md section 4, point 4)."""

import jax
import numpy as np
import pytest

from texcomp.dist.mesh import make_mesh, training_step_multichip
from texcomp.dist.pipeline import AssetPipeline, TextureAsset, quality_report
from tests.conftest import make_test_image


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_training_step_multichip(ndev):
    training_step_multichip(ndev)


@pytest.mark.parametrize("codec", ["dxt1", "dxt5", "etc1"])
def test_pipeline_shard_invariance(codec, rng):
    """Same bytes on a 1-device and an 8-device mesh."""
    from jax.sharding import Mesh

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


def test_quality_report_runs(rng):
    from jax.sharding import Mesh

    pipeline = AssetPipeline(Mesh(np.array(jax.devices()[:4]), ("data",)))
    images = np.stack([make_test_image(rng, 16, 16, 3, kind="solid")
                       for _ in range(8)])
    psnr = quality_report(pipeline, images, "dxt1")
    assert psnr > 25  # solid textures encode near-losslessly
