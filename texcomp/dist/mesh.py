"""Device-mesh sharding for batched texture compression.

Parallelism axes (the codec analog of dp/tp; see SURVEY.md section 2 — the
reference has no parallel referent, so these are designed TPU-first):

  * "data": shards a batch of images across chips. No communication on the
    encode path; ICI collectives (psum) only aggregate quality metrics.
  * "block": shards the block axis of a single huge atlas across chips —
    blocks are independent in every codec here, so this is a pure split
    (PVRTC's low-res A/B images are replicated; they are 1/32 of the image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from texcomp.blocks import image_to_blocks as _image_to_blocks
from texcomp.codecs import dxt


def make_mesh(n_devices: int | None = None, data: int | None = None,
              block: int = 1) -> Mesh:
    """Build a (data, block) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if data is None:
        data = n_devices // block
    if data < 1 or block < 1:
        raise ValueError(
            f"mesh axes must be positive, got data={data} block={block}")
    if data * block > len(devices):
        raise ValueError(
            f"mesh needs {data}x{block}={data * block} devices but only "
            f"{len(devices)} are available")
    dev = np.array(devices[: data * block]).reshape(data, block)
    return Mesh(dev, axis_names=("data", "block"))


def dxt1_encode_batch(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, N, 8) uint8 DXT1 payloads."""
    blocks = jax.vmap(_image_to_blocks)(images)
    return jax.vmap(lambda b: dxt.encode_dxt1_blocks(b))(blocks)


def dxt1_pipeline_sharded(images: jax.Array, mesh: Mesh) -> jax.Array:
    """Encode a batch of images data-parallel over the mesh."""
    in_s = NamedSharding(mesh, P("data"))
    out_s = NamedSharding(mesh, P("data"))
    fn = jax.jit(dxt1_encode_batch, in_shardings=in_s, out_shardings=out_s)
    return fn(images)


@partial(jax.jit, static_argnames=("mesh",))
def _step(images, mesh):
    """One full sharded pipeline step: encode + decode + quality metric.

    Images are sharded over "data"; each image's block axis is additionally
    sharded over "block" (blocks are independent). The PSNR reduction is the
    only cross-chip communication (a psum-style mean over the full batch).
    """
    spec_img = NamedSharding(mesh, P("data"))
    images = jax.lax.with_sharding_constraint(images, spec_img)

    blocks = jax.vmap(_image_to_blocks)(images)  # (B, N, 16, 3)
    blocks = jax.lax.with_sharding_constraint(
        blocks, NamedSharding(mesh, P("data", "block"))
    )
    encoded = jax.vmap(lambda b: dxt.encode_dxt1_blocks(b))(blocks)
    decoded = jax.vmap(lambda d: dxt.decode_dxt1_blocks(d))(encoded)

    err = (decoded - blocks).astype(jnp.float32)
    mse = jnp.mean(err * err)  # global mean -> all-reduce over the mesh
    psnr = 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-9))
    return encoded, psnr


def encode_atlas_sharded(image: jax.Array, mesh: Mesh, codec: str = "dxt1",
                         strategy: int = 2) -> jax.Array:
    """Encode ONE giant atlas with its block rows sharded across chips.

    (H, W, C) uint8, H a multiple of 4 * mesh devices -> (N, block_bytes)
    uint8 in row-major block order. Blocks are independent in every
    4x4-block codec (dxt1 | dxt5 | etc1), so each device encodes its
    horizontal strip with zero communication; results concatenate along
    the block axis. This is the single-image analog of data parallelism —
    use it when one texture is too large (or too latency-critical) for one
    chip. (PVRTC needs halo exchanges for its wrap-around neighborhoods —
    see :func:`pvrtc_encode_atlas_sharded`.)
    """
    from texcomp.ops import (dxt1_encode_image_op, dxt5_encode_image_op,
                             etc1_encode_image_op)

    ndata = int(mesh.shape["data"])  # rows split over "data" only
    h = image.shape[0]
    if h % (4 * ndata) != 0:
        raise ValueError(
            f"atlas rows ({h}) must split into 4-row multiples across "
            f"{ndata} 'data' shards (need a multiple of {4 * ndata})")
    ops = {
        "dxt1": dxt1_encode_image_op,
        "dxt5": dxt5_encode_image_op,
        "etc1": lambda img: etc1_encode_image_op(img, strategy),
    }
    if codec not in ops:
        raise ValueError(f"unsupported atlas codec {codec!r}")
    local = ops[codec]

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=P("data"), out_specs=P("data"),
            check_vma=False,  # pallas_call outputs carry no VMA metadata
        )
    )
    return fn(image)


def dxt1_encode_atlas_sharded(image: jax.Array, mesh: Mesh) -> jax.Array:
    """DXT1 wrapper around :func:`encode_atlas_sharded`."""
    return encode_atlas_sharded(image, mesh, "dxt1")


def pvrtc_encode_atlas_sharded(image: jax.Array, mesh: Mesh) -> jax.Array:
    """Encode ONE PVRTC 2BPP texture with its block rows sharded across
    chips. (S, S, 4) uint8, S square power-of-two with S/4 block rows
    splitting evenly over the mesh's "data" axis -> (NB, 8) uint8 Z-order
    records, byte-identical to the single-device encoder.

    Unlike the 4x4 codecs (zero communication), PVRTC's bilinear upscale
    and mode decision read one-block-row neighborhoods with image wrap
    (pvrtc_compressor.cc:216-233, :417-429), so each shard runs exactly
    three ppermute halo exchanges with its mesh neighbors over ICI: the
    packed A+B last rows (upscale top wrap), the packed A+B first rows
    (upscale bottom wrap), and the first modulation row group (vertical
    neighbor counts). The Z-order output permutation is applied to the
    gathered row-major words."""
    from texcomp.ops import pvrtc_fast as pf

    ndata = int(mesh.shape["data"])
    h, w = int(image.shape[0]), int(image.shape[1])
    if h != w or h < 8 or h & (h - 1) or image.shape[2] != 4:
        raise ValueError(
            "PVRTC atlas must be square power-of-two RGBA with side >= 8 "
            f"(one 8x4 block), got {image.shape}")
    nby = h // pf.BLOCK_H
    if nby % ndata != 0:
        raise ValueError(
            f"atlas block rows ({nby}) must split evenly over "
            f"{ndata} 'data' shards")
    pixel00 = image[0, 0, :]  # replicated global quirk pixel

    def local(img_local, p00):
        p = [p00[c].astype(jnp.int32).reshape(1, 1) for c in range(4)]
        return pf._encode_rowmajor_words(img_local, p, axis_name="data")

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data"), P()), out_specs=P(None, "data"),
            check_vma=False,
        )
    )
    words = fn(image, pixel00)
    # The Z-order finisher runs jitted too (static grid dims): eager
    # dispatch of its ~15 ops on the gathered (2, NB) array costs real
    # latency through the tunnel, and the single-device encoder runs it
    # under jit.
    return pf.zorder_payload_jit(words, nby, w // pf.BLOCK_W)


def pvrtc4_encode_atlas_sharded(image: jax.Array, mesh: Mesh) -> jax.Array:
    """Encode ONE PVRTC 4bpp texture (EXTENSION codec) with its block rows
    sharded across chips: (S, S, 4) uint8, S square power-of-two with S/4
    block rows splitting evenly over the mesh's "data" axis -> (NB, 8)
    uint8 Z-order records, byte-identical to the single-device encoder.

    Same halo pattern as :func:`pvrtc_encode_atlas_sharded` minus the
    modulation-row exchange (4bpp has no block mode decision): two
    ppermutes carry the packed A+B first/last low-res rows for the
    upscale's y-wrap (codecs/pvrtc4._upscale4)."""
    from texcomp.codecs import pvrtc4
    from texcomp.ops import pvrtc_fast as pf

    ndata = int(mesh.shape["data"])
    h, w = int(image.shape[0]), int(image.shape[1])
    if h != w or h < 4 or h & (h - 1) or image.shape[2] != 4:
        raise ValueError(
            "PVRTC 4bpp atlas must be square power-of-two RGBA with side "
            f">= 4, got {image.shape}")
    nb = h // pvrtc4.BLOCK
    if nb % ndata != 0:
        raise ValueError(
            f"atlas block rows ({nb}) must split evenly over "
            f"{ndata} 'data' shards")
    # The packed global quirk pixel (0, 0), replicated (extracting it from
    # the uint8 image on device would materialize the lane-padded tensor).
    pixel00 = jax.lax.bitcast_convert_type(
        image[0, 0, :].reshape(1, 1, 4), jnp.uint32)

    def local(img_local, p00):
        return pvrtc4._encode_rowmajor_words4(img_local, p00,
                                              axis_name="data")

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data"), P()), out_specs=P(None, "data"),
            check_vma=False,
        )
    )
    words = fn(image, pixel00)
    return pf.zorder_payload_jit(words, nb, nb)


def training_step_multichip(n_devices: int) -> None:
    """Dry-run entry: build an n-device mesh, jit the full sharded step, and
    execute one step on tiny shapes. Used by __graft_entry__.dryrun_multichip
    to validate the multi-chip path compiles + runs on a virtual mesh.

    Degrades to the largest usable mesh: if fewer than n_devices devices are
    available the step runs over all of them instead of failing."""
    n_devices = max(1, min(n_devices, len(jax.devices())))
    block = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_devices, data=n_devices // block, block=block)
    b = max(1, n_devices // block)
    images = jnp.arange(b * 16 * 16 * 3, dtype=jnp.int32).astype(jnp.uint8)
    images = images.reshape(b, 16, 16, 3)
    with mesh:
        encoded, psnr = _step(images, mesh)
        jax.block_until_ready((encoded, psnr))
    if encoded.shape != (b, 16, 8):
        raise RuntimeError(
            f"sharded step produced shape {encoded.shape}, "
            f"expected {(b, 16, 8)}")
