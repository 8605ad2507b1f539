"""Batched asset pipeline: encode fleets of textures across a device mesh.

The TPU-native answer to BASELINE config 5 ("10k mixed DXT/ETC/PVRTC
textures, sharded over a v5e pod"). The reference processes one image per
call on one CPU thread; here:

  * assets are grouped by (codec, shape) so each group is one batched
    device computation (bucketing bounds jit recompiles);
  * each group's batch axis is sharded over the mesh "data" axis with
    jax.shard_map — encoding is embarrassingly parallel, so the only
    collective is the optional quality-metric psum;
  * within a shard, the whole sub-batch feeds ONE Pallas kernel call by
    folding (B, 16, N) packed-pixel planes into (16, B*N) lanes.

Works identically on a single chip (mesh of 1) and on a virtual CPU mesh
(jnp fallback kernels), which is how the multi-chip path is tested.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from texcomp.api.container import (CompressedImage, Format, Metadata,
                                   needs_red_and_blue_swapped)
from texcomp.blocks import image_to_blocks, num_blocks

_BLOCK_BYTES = {"dxt1": 8, "dxt5": 16, "etc1": 8, "pvrtc": 8, "pvrtc4": 8}
_FORMATS = {"dxt1": Format.RGB, "dxt5": Format.RGBA, "etc1": Format.RGB,
            "pvrtc": Format.RGBA, "pvrtc4": Format.RGBA}
# Formats each codec accepts, matching the per-codec supports_format rules
# (DXTC all four, dxtc_compressor.cc:707-710; ETC RGB-only,
# etc_compressor.cc:713-717; PVRTC RGBA-only, pvrtc_compressor.cc:611-613).
_VALID_FORMATS = {"dxt1": (Format.RGB, Format.BGR),
                  "dxt5": (Format.RGBA, Format.BGRA),
                  "etc1": (Format.RGB,),
                  "pvrtc": (Format.RGBA,), "pvrtc4": (Format.RGBA,)}
_NAMES = {"dxt1": "dxtc", "dxt5": "dxtc", "etc1": "etc", "pvrtc": "pvrtc",
          "pvrtc4": "pvrtc4"}


@dataclass
class TextureAsset:
    """One texture to encode. Image is (H, W, C) uint8 with H, W multiples
    of 4 (PVRTC additionally requires square power-of-two).

    ``format`` defaults to the codec's canonical format (RGB/RGBA); pass
    Format.BGR / Format.BGRA for swapped-channel sources — byte semantics
    match the per-asset API calls (compressed_image.h:202-204)."""

    name: str
    image: np.ndarray
    codec: str  # dxt1 | dxt5 | etc1 | pvrtc | pvrtc4
    strategy: int = 2  # ETC1 only
    quality: str = "reference"  # "high" -> the HQ extension encoders
    format: Format | None = None  # None -> _FORMATS[codec]


def _batch_encode_hq(images: jax.Array, codec: str,
                     swap: bool = False) -> jax.Array:
    """quality="high" fleet path: the HQ extension encoders, batched.
    Payloads stay standard; every encoder is never-worse vs reference.

    images: (B, H, W, C) uint8, or (B, H, W) uint32 packed RGBA words.
    Block extraction runs on packed u32 words (pack + one 32-bit
    transpose per image, then blocks_from_packed_words) — byte-identical
    to the vmap(image_to_blocks) route but without the generic 5-D int32
    transpose XLA lowers it to (tools/profile_etc_hq_scale.py); the
    packed words also feed the Pallas reference/search kernels directly.
    The block HQ encoders are purely per-block, so flattening the batch
    is byte-identical to a vmap and feeds the device ONE big batch."""
    from texcomp import ops as _ops
    from texcomp.blocks import blocks_from_packed_words
    from texcomp.codecs import dxt_hq, etc
    from texcomp.codecs.pvrtc_hq import (encode_pvrtc_2bpp_hq_device,
                                         encode_pvrtc_4bpp_hq_device)
    from texcomp.ops import dxt_pallas

    words_in = images.ndim == 3
    if codec in ("pvrtc", "pvrtc4"):
        if words_in:
            images = jax.lax.bitcast_convert_type(images, jnp.uint8)
        if codec == "pvrtc":
            return jax.vmap(encode_pvrtc_2bpp_hq_device)(images)
        return jax.vmap(encode_pvrtc_4bpp_hq_device)(images)

    b = images.shape[0]
    n = (images.shape[1] // 4) * (images.shape[2] // 4)
    if words_in:  # packed RGBA words; swap means the bytes are BGRA
        m = _swap_rb_words(images) if swap else images
        wpi = jax.vmap(dxt_pallas._block_transpose_u32)(m)  # (B, 16, N)
    elif codec == "dxt5":
        wpi = jax.vmap(
            lambda im: dxt_pallas.pack_rgba_image(im, swap=swap))(images)
    else:
        wpi = jax.vmap(
            lambda im: dxt_pallas.pack_rgb_image(im, swap=swap))(images)
    words = wpi.transpose(1, 0, 2).reshape(16, b * n)
    flat = blocks_from_packed_words(words, 4 if codec == "dxt5" else 3)
    if codec == "dxt1":
        out = dxt_hq._encode_dxt1_hq(flat, swap, pixel_words=words)
    elif codec == "dxt5":
        outside = jnp.zeros((b * n,), dtype=bool)
        out = dxt_hq._encode_dxt5_hq(flat, outside, swap,
                                     pixel_words=words)
    elif _ops.use_pallas():
        out = etc._encode_etc1_hq_blocks_pallas(flat, pixel_words=words)
    else:
        out = etc._encode_etc1_hq_blocks_xla(flat)
    return out.reshape(b, n, -1)


def _mosaic_cols(b: int, w: int) -> int:
    """Images per mosaic row when batch-folding for the pack transpose.

    Folding the batch into the image Y axis alone (one B*H-tall column)
    makes the pack's major-dims transpose pathologically slow at small
    widths (~4.2 ms of a 5.2 ms dxt1 256^2 x384 cell, vs ~0.5 ms for the
    same pixels as one wide image — the transpose cost scales with the
    tall row count, not bytes). Folding as a (gr, gc) image GRID keeps
    one pack call but restores a wide aspect; the lane-order fix then
    runs on the (wpb, B*N) uint32 OUTPUT words (8-16x fewer bytes than
    the input). gc = widest divisor of b with gc*w <= 2048. Measured on
    v5e (dxt1 cells, tall -> mosaic): 64^2 x1024 0.63 -> 0.46 ms, 128^2
    x768 1.33 -> 1.08, 256^2 x384 5.58 -> 2.37; at w >= 512 the tall
    pack is already wide enough and the mosaic's input grid transpose
    only adds cost (512^2 x192: 5.37 -> 7.47 ms), so it stays tall."""
    if w >= 512 or b == 1:
        return 1
    gc = max(1, min(b, 2048 // w))
    while b % gc:
        gc -= 1
    return gc


def _swap_rb_words(px: jax.Array) -> jax.Array:
    """Byte-swap lanes 0<->2 of packed pixel words: BGRA bytes -> the
    standard RGBA word (what pack_rgba_image(swap=True) builds from u8
    planes), 3 word ops instead of 8 u8-plane ops."""
    return ((px & jnp.uint32(0xFF00FF00))
            | ((px & jnp.uint32(0xFF)) << 16)
            | ((px >> 16) & jnp.uint32(0xFF)))


def _folded_encode(images: jax.Array, codec: str, strategy: int,
                   swap: bool, interpret: bool = False) -> jax.Array:
    """Grid-mosaic batched encode for the 4x4 block codecs:
    (B, H, W, C) uint8 — or, for 4-channel sources, (B, H, W) uint32
    packed pixel words — -> (B, N, block_bytes) uint8, byte-identical per
    image to the per-image API encode. ONE pack transpose + ONE kernel
    call for the whole batch; block words come back as uint32 so every
    layout move runs at 32 bit. The words form skips the device-side
    u8 -> u32 bitcast relayout (~4 ms / 134 Mpix — see
    ops/pvrtc_fast._to_block_words) and runs the mosaic fold at 32 bit."""
    from texcomp.ops import dxt_pallas, etc_pallas

    words_in = images.ndim == 3  # (B, H, W) uint32 packed RGBA
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    n = (h // 4) * (w // 4)
    gc = _mosaic_cols(b, w)
    gr = b // gc
    if words_in:
        if gc > 1:
            m = images.reshape(gr, gc, h, w).transpose(0, 2, 1, 3)
            m = m.reshape(gr * h, gc * w)
        else:
            m = images.reshape(b * h, w)
        if swap:
            m = _swap_rb_words(m)
        words = dxt_pallas._block_transpose_u32(m)
    elif gc > 1:
        ch = images.shape[3]
        m = images.reshape(gr, gc, h, w, ch).transpose(0, 2, 1, 3, 4)
        m = m.reshape(gr * h, gc * w, ch)
    else:
        m = images.reshape(b * h, w, images.shape[3])
    if not words_in:
        if codec == "dxt5":
            words = dxt_pallas.pack_rgba_image(m, swap=swap)
        else:
            words = dxt_pallas.pack_rgb_image(m, swap=swap)
    if codec == "dxt1":
        wv = dxt_pallas.encode_dxt1_words(
            words, swap=swap, interpret=interpret)  # (2, B*N)
    elif codec == "dxt5":
        flag = jnp.zeros((1, b * n), dtype=jnp.uint32)
        wv = dxt_pallas.encode_dxt5_words(
            jnp.concatenate([words, flag], axis=0), swap=swap,
            interpret=interpret)  # (4, B*N)
    else:
        wv = etc_pallas.encode_etc1_words(
            words, strategy, interpret=interpret)  # (2, B*N)
    wpb = wv.shape[0]
    if gc > 1:
        # Mosaic block-row-major -> per-image row-major, on uint32 words.
        wv = wv.reshape(wpb, gr, h // 4, gc, w // 4).transpose(
            0, 1, 3, 2, 4)
    return jax.lax.bitcast_convert_type(
        wv.reshape(wpb, b, n).transpose(1, 2, 0), jnp.uint8
    ).reshape(b, n, 4 * wpb)


def _batch_encode(images: jax.Array, codec: str, strategy: int,
                  quality: str = "reference",
                  swap: bool = False) -> jax.Array:
    """(B, H, W, C) uint8 — or (B, H, W) uint32 packed 4-channel pixel
    words — -> (B, num_blocks, block_bytes) uint8.

    ``swap``: input channels are BGR/BGRA; bytes match the per-asset API
    with the swapped format, including the const-path double-swap quirk
    (dxtc_compressor.cc:360)."""
    from texcomp.ops import use_pallas

    words_in = images.ndim == 3
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    n = (h // 4) * (w // 4)

    if quality == "high":
        return _batch_encode_hq(images, codec, swap)

    if codec == "pvrtc":
        # Lane-folded batch encode: vmap over the whole pipeline was
        # 2-4x slower per pixel on the fleet distribution (PERF.md r4).
        from texcomp.ops.pvrtc_fast import (encode_pvrtc_2bpp_batched,
                                            encode_pvrtc_2bpp_batched_words)

        if words_in:
            return encode_pvrtc_2bpp_batched_words(images)
        return encode_pvrtc_2bpp_batched(images)
    if codec == "pvrtc4":
        from texcomp.codecs.pvrtc4 import encode_pvrtc_4bpp_device

        if words_in:
            images = jax.lax.bitcast_convert_type(images, jnp.uint8)
        return jax.vmap(encode_pvrtc_4bpp_device)(images)

    if use_pallas():
        return _folded_encode(images, codec, strategy, swap)

    # CPU fallback: jnp reference kernels.
    from texcomp.codecs import dxt, etc

    if words_in:
        images = jax.lax.bitcast_convert_type(images, jnp.uint8)
    blocks = jax.vmap(image_to_blocks)(images)
    if swap:
        blocks = jnp.concatenate(
            [blocks[..., 2::-1], blocks[..., 3:]], axis=-1)
    if codec == "dxt1":
        return jax.vmap(lambda blk: dxt.encode_dxt1_blocks(
            blk, swap_red_and_blue=swap))(blocks)
    if codec == "dxt5":
        outside = jnp.zeros((n,), dtype=bool)
        return jax.vmap(lambda blk: dxt.encode_dxt5_blocks(
            blk, outside, swap_red_and_blue=swap))(blocks)
    return jax.vmap(
        lambda blk: etc.encode_etc1_blocks(blk, strategy))(blocks)


def _tail_can_downsample(h: int, w: int) -> bool:
    """Whether one more Downsample succeeds at uncompressed (h, w) —
    the acceptance rules of compressor4x4_helper.h:281-284 (even block
    counts unless single-block) and :344-350 (3-pixel dims fail)."""
    if max(h, w) <= 1:
        return False
    nbr, nbc = num_blocks(h), num_blocks(w)
    if (nbr > 1 and nbr % 2 != 0) or (nbc > 1 and nbc % 2 != 0):
        return False
    if nbr == 1 and nbc == 1 and (h == 3 or w == 3):
        return False
    return True


@partial(jax.jit, static_argnames=("codec", "strategy", "h", "w"))
def _tail_step_batched(payloads: jax.Array, *, codec: str, strategy: int,
                       h: int, w: int) -> jax.Array:
    """One Downsample level for a whole same-shape batch: (B, N, bb)
    payloads at uncompressed (h, w) -> (B, N', bb) at ((h+1)//2,
    (w+1)//2). Bit-identical to helper4x4.downsample per asset (decode
    and encode are per-block, so the batch flattens into the block axis;
    the average/replicate/tile steps mirror compressor4x4_helper.h:
    296-311 sequential reads, :344-388 single-block replication,
    :357-387 + :610-636 quadrant tiling, swap-free re-encode :602-607)."""
    from texcomp.codecs import dxt, etc

    b = payloads.shape[0]
    nbr, nbc = num_blocks(h), num_blocks(w)
    flat = payloads.reshape(b * nbr * nbc, payloads.shape[-1])
    if codec == "dxt1":
        px = dxt.decode_dxt1_blocks(flat)
    elif codec == "dxt5":
        px = dxt.decode_dxt5_blocks(flat)
    else:
        px = etc.decode_etc1_blocks(flat)
    c = px.shape[-1]
    img = (px.reshape(b, nbr, nbc, 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, nbr * 4, nbc * 4, c).astype(jnp.int32))
    if nbr == 1 and nbc == 1:
        # 1-/2-pixel dims replicate before averaging (:344-388).
        if w == 1:
            img = jnp.tile(img[:, :, 0:1], (1, 1, 4, 1))
        elif w == 2:
            img = jnp.tile(img[:, :, 0:2], (1, 1, 2, 1))
        if h == 1:
            img = jnp.tile(img[:, 0:1, :], (1, 4, 1, 1))
        elif h == 2:
            img = jnp.tile(img[:, 0:2, :], (1, 2, 1, 1))
    h2, w2 = img.shape[1] // 2, img.shape[2] // 2
    # Truncating 2x2 average of NONNEG pixels: >> 2 == // 4
    # (color_util.h:335-380; no idiv, see CLAUDE.md playbook).
    avg = img.reshape(b, h2, 2, w2, 2, c).sum(axis=(2, 4)) >> 2
    # Tile where a grid dimension had one block (the downsampled 2x2 is
    # stored at two positions, compressor4x4_helper.h:610-636).
    if avg.shape[2] < 4:
        avg = jnp.tile(avg, (1, 1, 4 // avg.shape[2], 1))
    if avg.shape[1] < 4:
        avg = jnp.tile(avg, (1, 4 // avg.shape[1], 1, 1))
    gh, gw = avg.shape[1], avg.shape[2]
    dblocks = (avg.reshape(b, gh // 4, 4, gw // 4, 4, c)
               .transpose(0, 1, 3, 2, 4, 5).reshape(-1, 16, c))
    if codec == "dxt1":
        out = dxt.encode_dxt1_blocks(dblocks)
    elif codec == "dxt5":
        out = dxt.encode_dxt5_blocks(
            dblocks, jnp.zeros((dblocks.shape[0],), dtype=bool))
    else:
        out = etc.encode_etc1_blocks(dblocks, strategy)
    return out.reshape(b, (gh // 4) * (gw // 4), out.shape[-1])


class AssetPipeline:
    """Mesh-sharded batch encoder for mixed texture assets."""

    def __init__(self, mesh: Mesh | None = None, batch_size: int = 64,
                 max_inflight: int = 4):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("data",))
        self.mesh = mesh
        self.ndev = int(np.prod(mesh.devices.shape))
        self.batch_size = max(batch_size, self.ndev)
        # Async-dispatch window for run(): how many batches may be
        # in flight (device input + output + host staging alive) before
        # the oldest result is fetched. Bounds peak memory at
        # O(max_inflight x batch) instead of O(fleet); >= 2 keeps the
        # device busy while the host stacks the next batch.
        self.max_inflight = max(2, max_inflight)
        self._jitted = {}

    def _sharded_encode(self, codec: str, strategy: int,
                        quality: str = "reference", swap: bool = False):
        key = (codec, strategy, quality, swap)
        if key not in self._jitted:
            mesh = self.mesh

            def fn(images):
                local = partial(_batch_encode, codec=codec, strategy=strategy,
                                quality=quality, swap=swap)
                # check_vma=False: pallas_call outputs carry no varying-mesh
                # -axes metadata, which trips the default check on TPU.
                return jax.shard_map(
                    local, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                    check_vma=False,
                )(images)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def encode_group_async(self, images: np.ndarray, codec: str,
                           strategy: int = 2,
                           quality: str = "reference",
                           fmt: Format | None = None) -> jax.Array:
        """Dispatch one same-shape batch encode and return the DEVICE
        result (JAX async dispatch: returns immediately, letting the host
        pack the next group while the device works). The batch is padded
        to a multiple of the mesh size; slice [:B] after fetching."""
        fmt = _FORMATS[codec] if fmt is None else fmt
        if fmt not in _VALID_FORMATS[codec]:
            raise ValueError(f"{codec} cannot encode {fmt!r}")
        b = images.shape[0]
        pad = (-b) % self.ndev
        if pad:
            images = np.concatenate([images, images[:1].repeat(pad, 0)], 0)
        if (images.ndim == 4 and images.shape[-1] == 4
                and images.dtype == np.uint8):
            # Upload 4-channel sources as packed u32 pixel words (a free
            # host view): the device-side u8 -> u32 bitcast is a tiled-
            # layout relayout costing ~4 ms / 134 Mpix
            # (tools/profile_pvrtc_input_layout.py); the word form also
            # runs the mosaic fold and any channel swap at 32 bit.
            images = np.ascontiguousarray(images).view(np.uint32).reshape(
                images.shape[:3])
        return self._sharded_encode(
            codec, strategy, quality,
            swap=needs_red_and_blue_swapped(fmt))(jnp.asarray(images))

    def encode_group(self, images: np.ndarray, codec: str,
                     strategy: int = 2,
                     quality: str = "reference",
                     fmt: Format | None = None) -> np.ndarray:
        """Encode a same-shape batch: (B, H, W, C) -> (B, nblocks, bytes).

        The batch is padded to a multiple of the mesh size; each device
        encodes its shard with one fused kernel call.
        """
        out = self.encode_group_async(images, codec, strategy, quality, fmt)
        return np.asarray(out)[: images.shape[0]]

    def run(self, assets: Sequence[TextureAsset],
            mipmaps: bool = False) -> dict[str, CompressedImage]:
        """Encode a mixed asset fleet. Returns name -> CompressedImage.

        With ``mipmaps=True``, every dxt1/dxt5/etc1 asset additionally gets
        its full mip chain as ``<name>_mip1..N`` entries (produced with the
        fused device chain where the backend allows — see
        DxtcCompressor.downsample_chain; PVRTC has no downsample, like the
        reference, pvrtc_compressor.cc:669-705)."""
        groups: dict[tuple, list[int]] = {}
        for i, a in enumerate(assets):
            fmt = a.format if getattr(a, "format", None) is not None \
                else _FORMATS[a.codec]
            key = (a.codec, a.strategy, getattr(a, "quality", "reference"),
                   fmt, a.image.shape)
            groups.setdefault(key, []).append(i)

        # Windowed async dispatch: batch k+1..k+max_inflight are stacked
        # and enqueued while batch k's result is fetched (JAX async
        # dispatch overlaps device encode with host packing), so fleet
        # wall time approaches max(compute, transfer, host packing) while
        # peak memory stays O(window), not O(fleet) — an unbounded window
        # holds every batch's device input/output and host staging alive
        # at once (the 10k-asset fleet is ~5 GB of inputs alone).
        results: dict[str, CompressedImage] = {}
        pending: deque[tuple[list[int], str, Format, jax.Array]] = deque()

        def collect_one() -> None:
            chunk, codec, fmt, out = pending.popleft()
            encoded = np.asarray(out)
            for j, i in enumerate(chunk):
                a = assets[i]
                h, w = a.image.shape[0], a.image.shape[1]
                ci = CompressedImage()
                if codec in ("pvrtc", "pvrtc4"):
                    md = Metadata(fmt, _NAMES[codec], h, w, h, w, 0)
                else:
                    md = Metadata(
                        fmt, _NAMES[codec], h, w,
                        4 * num_blocks(h), 4 * num_blocks(w), 0,
                    )
                payload = encoded[j].reshape(-1)
                ci.create_owned_data(md, payload.size)
                ci.get_mutable_data()[:] = payload
                results[a.name] = ci

        for (codec, strategy, quality, fmt, shape), idxs in groups.items():
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start : start + self.batch_size]
                batch = np.stack([assets[i].image for i in chunk])
                pending.append((chunk, codec, fmt, self.encode_group_async(
                    batch, codec, strategy, quality, fmt)))
                if len(pending) >= self.max_inflight:
                    collect_one()
        while pending:
            collect_one()

        if mipmaps:
            self._run_mipmaps(assets, results)
        return results

    def chain_group(self, payloads: np.ndarray, codec: str, strategy: int,
                    height: int, width: int, levels: int) -> list[np.ndarray]:
        """One sharded device program computes the fused mip chains of a
        whole same-shape batch: (B, N, block_bytes) level-0 payloads ->
        [(B, N1, bb), ...] per level.

        The batch folds into the image Y axis: a (B*H, W) tall image's
        block grid is exactly the concatenation of the per-image grids in
        batch order, and the 2x2 averages never cross image boundaries
        (H % 8 == 0 for every fused level) — so ONE mipmap_chain program
        per (shape, codec) group replaces per-asset dispatch."""
        from texcomp.ops import use_pallas
        from texcomp.ops.mipmap import mipmap_chain

        b = payloads.shape[0]
        pad = (-b) % self.ndev
        if pad:
            payloads = np.concatenate(
                [payloads, payloads[:1].repeat(pad, 0)], 0)
        key = ("chain", codec, strategy, height, width, levels,
               payloads.shape[0])
        if key not in self._jitted:
            mesh = self.mesh
            interpret = not use_pallas()

            def local(p):
                bb = p.shape[0]
                data = p.reshape(bb * p.shape[1], p.shape[2])
                outs = mipmap_chain(
                    data, height=bb * height, width=width, codec=codec,
                    levels=levels, strategy=strategy, interpret=interpret)
                return tuple(o.reshape(bb, -1, o.shape[-1]) for o in outs)

            self._jitted[key] = jax.jit(lambda p: jax.shard_map(
                local, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                check_vma=False)(p))
        outs = self._jitted[key](jnp.asarray(payloads))
        return [np.asarray(o)[:b] for o in outs]

    def _batched_tail(self, chunk: Sequence[TextureAsset], codec: str,
                      strategy: int, payloads: np.ndarray, h: int, w: int,
                      results: dict[str, CompressedImage],
                      start_lvl: int) -> None:
        """Attach the ragged mip tail for a same-shape chunk: one batched
        device program per level (bit-identical to per-asset Downsample —
        see _tail_step_batched) instead of a per-asset Python loop."""
        cur = jnp.asarray(np.ascontiguousarray(payloads))
        lvl = start_lvl
        lh, lw = h, w
        while _tail_can_downsample(lh, lw):
            cur = _tail_step_batched(cur, codec=codec, strategy=strategy,
                                     h=lh, w=lw)
            arr = np.asarray(cur)
            lh, lw = (lh + 1) // 2, (lw + 1) // 2
            for j, a in enumerate(chunk):
                fmt = (a.format if getattr(a, "format", None) is not None
                       else _FORMATS[codec])
                md = Metadata(fmt, _NAMES[codec], lh, lw,
                              4 * num_blocks(lh), 4 * num_blocks(lw), 0)
                ci = CompressedImage()
                ci.create_owned_data(md, arr[j].size)
                ci.get_mutable_data()[:] = arr[j].reshape(-1)
                results[f"{a.name}_mip{lvl}"] = ci
            lvl += 1

    def _run_mipmaps(self, assets: Sequence[TextureAsset],
                     results: dict[str, CompressedImage]) -> None:
        from texcomp.api.dxtc import DxtcCompressor
        from texcomp.api.etc import EtcCompressor
        from texcomp.ops.mipmap import num_chain_levels

        chainers: dict[tuple, object] = {}

        def chainer_for(codec, strategy, quality):
            key = (codec, strategy, quality)
            if key not in chainers:
                chainers[key] = (
                    EtcCompressor(strategy, quality=quality)
                    if codec == "etc1" else DxtcCompressor(quality=quality))
            return chainers[key]

        # Group assets by (codec, strategy, shape): one batched chain
        # program per group (see chain_group) for the fused prefix, then
        # ONE batched per-level program per group for the ragged tail
        # (_tail_step_batched) — zero per-asset device dispatches. Only
        # quality="high" assets keep the per-asset path (their chain is a
        # per-level never-worse re-encode through the API compressors).
        # Swapped formats group together: downsample decodes AND
        # re-encodes swap-free regardless of source format
        # (compressor4x4_helper.h:602-607), so chain bytes are
        # format-independent; only the metadata format differs.
        fused_groups: dict[tuple, list[TextureAsset]] = {}
        ref_tail_groups: dict[tuple, list[TextureAsset]] = {}
        tail_only: list[TextureAsset] = []
        for a in assets:
            if a.codec in ("pvrtc", "pvrtc4"):
                continue
            quality = getattr(a, "quality", "reference")
            h, w = a.image.shape[0], a.image.shape[1]
            if quality != "reference":
                tail_only.append(a)
            elif num_chain_levels(h, w) > 0:
                fused_groups.setdefault(
                    (a.codec, a.strategy, h, w), []).append(a)
            else:
                ref_tail_groups.setdefault(
                    (a.codec, a.strategy, h, w), []).append(a)

        for (codec, strategy, h, w), group in fused_groups.items():
            levels = num_chain_levels(h, w)
            nblk = num_blocks(h) * num_blocks(w)
            for start in range(0, len(group), self.batch_size):
                chunk = group[start : start + self.batch_size]
                payloads = np.stack([
                    np.asarray(results[a.name].get_data())
                    .reshape(nblk, -1) for a in chunk])
                outs = self.chain_group(payloads, codec, strategy, h, w,
                                        levels)
                for j, a in enumerate(chunk):
                    lh, lw = h, w
                    fmt = (a.format if getattr(a, "format", None) is not None
                       else _FORMATS[codec])
                    for lvl in range(levels):
                        lh //= 2
                        lw //= 2
                        md = Metadata(
                            fmt, _NAMES[codec], lh, lw,
                            4 * num_blocks(lh), 4 * num_blocks(lw), 0)
                        payload = outs[lvl][j].reshape(-1)
                        ci = CompressedImage()
                        ci.create_owned_data(md, payload.size)
                        ci.get_mutable_data()[:] = payload
                        results[f"{a.name}_mip{lvl + 1}"] = ci
                # Ragged tail below the fused prefix: one batched
                # per-level program for the whole chunk.
                self._batched_tail(chunk, codec, strategy, outs[-1],
                                   h >> levels, w >> levels, results,
                                   start_lvl=levels + 1)

        for (codec, strategy, h, w), group in ref_tail_groups.items():
            nblk = num_blocks(h) * num_blocks(w)
            for start in range(0, len(group), self.batch_size):
                chunk = group[start : start + self.batch_size]
                payloads = np.stack([
                    np.asarray(results[a.name].get_data())
                    .reshape(nblk, -1) for a in chunk])
                self._batched_tail(chunk, codec, strategy, payloads, h, w,
                                   results, start_lvl=1)

        for a in tail_only:
            quality = getattr(a, "quality", "reference")
            comp = chainer_for(a.codec, a.strategy, quality)
            for lvl, mip in enumerate(
                    comp.downsample_chain(results[a.name]), start=1):
                results[f"{a.name}_mip{lvl}"] = mip


def quality_sums(pipeline: AssetPipeline, images: np.ndarray,
                 codec: str = "dxt1") -> tuple[float, float]:
    """Encode + decode a batch and return (sum of squared error, element
    count) — the raw sufficient statistics behind the PSNR report, with
    the per-shard reduction running as a cross-mesh psum (the pipeline's
    only collective). Exposed separately so a multi-host caller
    (dist/multihost.fleet_quality) can combine hosts' sums over DCN
    before the final log — a mean of per-host PSNRs would be wrong.
    Supports every pipeline codec: dxt1 | dxt5 | etc1 | pvrtc | pvrtc4
    (the PVRTC decoders are extensions — the reference cannot decode
    PVRTC, pvrtc_compressor.cc:669-705)."""
    from texcomp.codecs import dxt, etc

    mesh = pipeline.mesh

    def step(imgs, weights):
        def local(x, wts):
            h, w = x.shape[1], x.shape[2]
            enc = _batch_encode(x, codec, 2)
            if codec in ("pvrtc", "pvrtc4"):
                from texcomp.codecs.pvrtc import decode_pvrtc_2bpp_device
                from texcomp.codecs.pvrtc4 import decode_pvrtc_4bpp_device

                dec_fn = (decode_pvrtc_2bpp_device if codec == "pvrtc"
                          else decode_pvrtc_4bpp_device)
                dec = jax.vmap(
                    lambda d: dec_fn(d, height=h, width=w))(enc)
                err = (dec.astype(jnp.int32) - x.astype(jnp.int32))
            else:
                if codec == "dxt1":
                    dec = jax.vmap(lambda d: dxt.decode_dxt1_blocks(d))(enc)
                elif codec == "dxt5":
                    dec = jax.vmap(lambda d: dxt.decode_dxt5_blocks(d))(enc)
                else:
                    dec = jax.vmap(lambda d: etc.decode_etc1_blocks(d))(enc)
                blocks = jax.vmap(image_to_blocks)(x)
                err = dec - blocks
            err = err.astype(jnp.float32)
            # Per-image sums weighted so batch-padding duplicates don't
            # bias the mean, then one global psum (the only collective).
            se = jnp.sum(err * err, axis=(1, 2, 3)) * wts
            cnt = wts * jnp.float32(err[0].size)
            se = jax.lax.psum(jnp.sum(se), "data")
            cnt = jax.lax.psum(jnp.sum(cnt), "data")
            return se, cnt

        return jax.shard_map(local, mesh=mesh,
                             in_specs=(P("data"), P("data")),
                             out_specs=(P(), P()), check_vma=False)(
                                 imgs, weights)

    b = images.shape[0]
    pad = (-b) % pipeline.ndev
    weights = np.ones(b + pad, dtype=np.float32)
    if pad:
        images = np.concatenate([images, images[:1].repeat(pad, 0)], 0)
        weights[b:] = 0.0
    se, cnt = jax.jit(step)(jnp.asarray(images), jnp.asarray(weights))
    return float(se), float(cnt)


def psnr_from_sums(se: float, cnt: float) -> float:
    """PSNR (dB) from (sum squared error, element count) sums."""
    mse = se / max(cnt, 1.0)
    return float(10.0 * np.log10(255.0**2 / max(mse, 1e-9)))


def quality_report(pipeline: AssetPipeline, images: np.ndarray,
                   codec: str = "dxt1") -> float:
    """Encode + decode a batch and return the mean PSNR (dB); see
    quality_sums for the reduction structure."""
    return psnr_from_sums(*quality_sums(pipeline, images, codec))
