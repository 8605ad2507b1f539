// C-API wrapper around the reference C++ library (google/image-compression),
// used ONLY as a differential-testing oracle. Built against the read-only
// reference checkout (path passed at build time via -I); no reference source
// is vendored into this repository. Tests that need the oracle skip
// gracefully when it cannot be built.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "image_compression/public/compressed_image.h"
#include "image_compression/public/compressor.h"
#include "image_compression/public/dxtc_compressor.h"
#include "image_compression/public/etc_compressor.h"
#include "image_compression/public/pvrtc_compressor.h"
#include "image_compression/public/dxtc_to_etc_transcoder.h"

using namespace image_codec_compression;

namespace {

Compressor* MakeCompressor(const char* name, int strategy) {
  std::string n(name);
  if (n == "dxtc") return new DxtcCompressor();
  if (n == "etc") {
    EtcCompressor* c = new EtcCompressor();
    c->SetCompressionStrategy(
        static_cast<EtcCompressor::CompressionStrategy>(strategy));
    return c;
  }
  if (n == "pvrtc") return new PvrtcCompressor();
  return nullptr;
}

CompressedImage::Format ToFormat(int f) {
  return static_cast<CompressedImage::Format>(f);
}

// Copies a produced CompressedImage into caller storage. Returns data size.
int ExportImage(const CompressedImage& image, uint8_t* out, uint32_t capacity,
                uint32_t* out_ch, uint32_t* out_cw) {
  size_t size = image.GetDataSize();
  if (size > capacity) return -1;
  std::memcpy(out, image.GetData(), size);
  if (out_ch) *out_ch = image.GetMetadata().compressed_height;
  if (out_cw) *out_cw = image.GetMetadata().compressed_width;
  return static_cast<int>(size);
}

// Builds a CompressedImage holding a copy of caller data + metadata.
void ImportImage(const char* name, int format, uint32_t uh, uint32_t uw,
                 uint32_t ch, uint32_t cw, uint32_t padding,
                 const uint8_t* data, uint32_t data_size,
                 CompressedImage* image) {
  CompressedImage::Metadata md(ToFormat(format), name, uh, uw, ch, cw,
                               padding);
  image->CreateOwnedData(md, data_size);
  std::memcpy(image->GetMutableData(), data, data_size);
}

}  // namespace

extern "C" {

int orc_compressed_size(const char* name, int strategy, int format,
                        uint32_t h, uint32_t w) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  int r = static_cast<int>(
      c->ComputeCompressedDataSize(ToFormat(format), h, w));
  delete c;
  return r;
}

int orc_compress(const char* name, int strategy, int format, uint32_t h,
                 uint32_t w, uint32_t padding, const uint8_t* buffer,
                 uint8_t* out, uint32_t capacity, uint32_t* out_ch,
                 uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  bool ok = c->Compress(ToFormat(format), h, w, padding, buffer, &image);
  int r = ok ? ExportImage(image, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_compress_and_pad(const char* name, int strategy, int format,
                         uint32_t h, uint32_t w, uint32_t ph, uint32_t pw,
                         uint32_t padding, const uint8_t* buffer, uint8_t* out,
                         uint32_t capacity, uint32_t* out_ch,
                         uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  bool ok = c->CompressAndPad(ToFormat(format), h, w, ph, pw, padding, buffer,
                              &image);
  int r = ok ? ExportImage(image, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_decompress(const char* name, int strategy, int format, uint32_t uh,
                   uint32_t uw, uint32_t ch, uint32_t cw, uint32_t padding,
                   const uint8_t* data, uint32_t data_size, uint8_t* out,
                   uint32_t capacity) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  ImportImage(name, format, uh, uw, ch, cw, padding, data, data_size, &image);
  std::vector<uint8_t> buf;
  bool ok = c->Decompress(image, &buf);
  delete c;
  if (!ok) return -2;
  if (buf.size() > capacity) return -3;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<int>(buf.size());
}

int orc_downsample(const char* name, int strategy, int format, uint32_t uh,
                   uint32_t uw, uint32_t ch, uint32_t cw, uint32_t padding,
                   const uint8_t* data, uint32_t data_size, uint8_t* out,
                   uint32_t capacity, uint32_t* out_ch, uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  ImportImage(name, format, uh, uw, ch, cw, padding, data, data_size, &image);
  CompressedImage down;
  bool ok = c->Downsample(image, &down);
  int r = ok ? ExportImage(down, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_pad(const char* name, int strategy, int format, uint32_t uh,
            uint32_t uw, uint32_t ch, uint32_t cw, uint32_t padding,
            const uint8_t* data, uint32_t data_size, uint32_t ph, uint32_t pw,
            uint8_t* out, uint32_t capacity, uint32_t* out_ch,
            uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  ImportImage(name, format, uh, uw, ch, cw, padding, data, data_size, &image);
  CompressedImage padded;
  bool ok = c->Pad(image, ph, pw, &padded);
  int r = ok ? ExportImage(padded, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_create_solid(const char* name, int strategy, int format, uint32_t h,
                     uint32_t w, const uint8_t* color, uint8_t* out,
                     uint32_t capacity, uint32_t* out_ch, uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  bool ok = c->CreateSolidImage(ToFormat(format), h, w, color, &image);
  int r = ok ? ExportImage(image, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_copy_subimage(const char* name, int strategy, int format, uint32_t uh,
                      uint32_t uw, uint32_t ch, uint32_t cw, uint32_t padding,
                      const uint8_t* data, uint32_t data_size,
                      uint32_t start_row, uint32_t start_col, uint32_t h,
                      uint32_t w, uint8_t* out, uint32_t capacity,
                      uint32_t* out_ch, uint32_t* out_cw) {
  Compressor* c = MakeCompressor(name, strategy);
  if (!c) return -1;
  CompressedImage image;
  ImportImage(name, format, uh, uw, ch, cw, padding, data, data_size, &image);
  CompressedImage sub;
  bool ok = c->CopySubimage(image, start_row, start_col, h, w, &sub);
  int r = ok ? ExportImage(sub, out, capacity, out_ch, out_cw) : -2;
  delete c;
  return r;
}

int orc_transcode_dxt1_to_etc1(uint8_t* data, uint32_t data_size) {
  CompressedImage image(data_size, data);
  CompressedImage::Metadata md(CompressedImage::kRGB, "dxtc", 4, 4, 4, 4, 0);
  image.SetMetadata(md);
  TranscodeDxt1ToEtc1(&image);
  return 0;
}

}  // extern "C"
