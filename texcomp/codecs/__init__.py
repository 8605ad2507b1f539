"""Codec kernels: pure encode/decode functions over a batch axis of blocks.

Each codec provides ``encode_*_blocks`` / ``decode_*_blocks`` pairs that map
(N, 16, C) int32 pixel batches to/from packed byte payloads, jit-compiled
over the block-batch axis N. These are the TPU-native equivalents of the
reference's per-block functors (dxtc_compressor.cc:563-592,
etc_compressor.cc:625-643, pvrtc_compressor.cc:586-597).
"""
