"""Public API: Compressor interface, concrete codecs, CompressedImage.

Mirrors image_compression/public/ (compressor.h:48-138,
compressed_image.h:32-185) with identical semantics: bool-return error
model, owned vs external storage, and the same metadata fields.
"""
