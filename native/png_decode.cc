// Native PNG decoder for the batch loader's hot path.
//
// The host image loader is the measured end-to-end bottleneck on the
// single-core bench host (PIL decode + array copies ~7.5 ms per 512x512
// RGB frame; see pipeline/loader.py). This decoder handles the formats
// microscopy batches actually use — 8-bit grayscale / RGB / RGBA,
// non-interlaced — with one zlib inflate pass, in-place unfiltering, and
// zero extra copies into the caller's numpy buffer. Anything else
// (palette, 16-bit, interlaced, tRNS) returns UNSUPPORTED and the Python
// side falls back to PIL.
//
// The reference loaded images per-image with cv2.imread on the host
// (reference pipeline.py:206-210); this is the TPU build's batched
// equivalent of that native decode layer.
//
// API (ctypes, see yolo_sam_inference_tpu/io/png_native.py):
//   png_probe(buf, len, &w, &h, &out_channels) -> 0 | error
//     out_channels: 1 (gray) or 3 (RGB / RGBA-with-dropped-alpha)
//   png_decode8(buf, len, out, collapse) -> 0 | 1 | error
//     out must hold w*h*out_channels bytes.
//     collapse!=0 and RGB source: if every pixel has R==G==B, the first
//     w*h bytes of out receive the single channel and 1 is returned.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <zlib.h>

#ifdef USE_LIBDEFLATE
// libdeflate's whole-buffer inflate runs ~2x zlib's streaming inflate and
// inflate dominates the decode (measured 5.2 of 6.9 ms per 512x512 RGB
// frame on the 1-vCPU bench host). The binding builds with
// -DUSE_LIBDEFLATE -ldeflate when the library is present and falls back
// to this file's zlib path otherwise (io/png_native.py).
#include <libdeflate.h>
#endif

namespace {

constexpr int kOk = 0;
constexpr int kCollapsed = 1;
constexpr int kErrBadSignature = -1;
constexpr int kErrTruncated = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrInflate = -4;
constexpr int kErrBadFilter = -5;
constexpr int kErrNoMem = -6;

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct Header {
  uint32_t w = 0, h = 0;
  int src_channels = 0;  // bytes per pixel in the PNG scanlines
  int out_channels = 0;  // bytes per pixel we emit (alpha dropped)
};

// Parse the signature + IHDR and scan chunks; rejects unsupported forms.
int parse_header(const uint8_t* buf, int64_t len, Header* hdr) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 + 25 || std::memcmp(buf, kSig, 8) != 0) return kErrBadSignature;
  const uint8_t* p = buf + 8;
  const uint8_t* end = buf + len;
  if (end - p < 8 || be32(p) != 13 || std::memcmp(p + 4, "IHDR", 4) != 0)
    return kErrUnsupported;
  const uint8_t* d = p + 8;
  hdr->w = be32(d);
  hdr->h = be32(d + 4);
  int bit_depth = d[8], color_type = d[9];
  int compression = d[10], filter = d[11], interlace = d[12];
  if (hdr->w == 0 || hdr->h == 0 || hdr->w > (1u << 24) || hdr->h > (1u << 24))
    return kErrUnsupported;
  if (bit_depth != 8 || compression != 0 || filter != 0 || interlace != 0)
    return kErrUnsupported;
  switch (color_type) {
    case 0: hdr->src_channels = 1; hdr->out_channels = 1; break;  // gray
    case 2: hdr->src_channels = 3; hdr->out_channels = 3; break;  // RGB
    case 6: hdr->src_channels = 4; hdr->out_channels = 3; break;  // RGBA
    default: return kErrUnsupported;  // palette (3), gray+alpha (4)
  }
  // scan chunks: reject tRNS (transparency semantics we don't implement)
  p += 8 + 13 + 4;
  while (end - p >= 8) {
    uint32_t clen = be32(p);
    if (clen > uint32_t(end - p)) return kErrTruncated;
    if (std::memcmp(p + 4, "tRNS", 4) == 0) return kErrUnsupported;
    if (std::memcmp(p + 4, "IEND", 4) == 0) return kOk;
    p += 8 + int64_t(clen) + 4;
  }
  return kOk;  // no IEND is tolerated; IDAT inflation will catch truncation
}

inline uint8_t paeth(int a, int b, int c) {
  int pa = std::abs(b - c);        // |p - a| with p = a + b - c
  int pb = std::abs(a - c);
  int pc = std::abs(a + b - 2 * c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Inflate all IDAT chunks into raw (h * (1 + rowbytes)) filtered scanlines.
int inflate_idat(const uint8_t* buf, int64_t len, uint8_t* raw,
                 size_t raw_size) {
#ifdef USE_LIBDEFLATE
  {
    // PNG's IDAT chunks carry ONE zlib stream; libdeflate needs it
    // contiguous, so gather the payload extents (zero-copy for the
    // common single-chunk case) and decompress in one shot.
    std::vector<std::pair<const uint8_t*, uint32_t>> parts;
    size_t total = 0;
    const uint8_t* p = buf + 8 + 25;
    const uint8_t* end = buf + len;
    while (end - p >= 8) {
      uint32_t clen = be32(p);
      if (clen > uint32_t(end - p - 8)) break;
      if (std::memcmp(p + 4, "IEND", 4) == 0) break;
      if (std::memcmp(p + 4, "IDAT", 4) == 0) {
        parts.emplace_back(p + 8, clen);
        total += clen;
      }
      p += 8 + int64_t(clen) + 4;
    }
    static thread_local struct libdeflate_decompressor* dec =
        libdeflate_alloc_decompressor();
    if (!parts.empty() && dec != nullptr) {
      const uint8_t* src = parts[0].first;
      std::vector<uint8_t> scratch;
      if (parts.size() > 1) {
        scratch.resize(total);
        size_t off = 0;
        for (const auto& pr : parts) {
          std::memcpy(scratch.data() + off, pr.first, pr.second);
          off += pr.second;
        }
        src = scratch.data();
      }
      size_t actual = 0;
      if (libdeflate_zlib_decompress(dec, src, total, raw, raw_size,
                                     &actual) == LIBDEFLATE_SUCCESS &&
          actual == raw_size) {
        return kOk;
      }
      // any mismatch: fall through to the streaming zlib path below
    }
  }
#endif
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return kErrInflate;
  zs.next_out = raw;
  zs.avail_out = uInt(raw_size);
  const uint8_t* p = buf + 8 + 25;  // past signature + IHDR
  const uint8_t* end = buf + len;
  int zret = Z_OK;
  while (end - p >= 8 && zret != Z_STREAM_END && zs.avail_out > 0) {
    uint32_t clen = be32(p);
    if (clen > uint32_t(end - p - 8)) break;
    if (std::memcmp(p + 4, "IEND", 4) == 0) break;
    if (std::memcmp(p + 4, "IDAT", 4) == 0) {
      zs.next_in = const_cast<uint8_t*>(p + 8);
      zs.avail_in = clen;
      zret = inflate(&zs, Z_NO_FLUSH);
      if (zret != Z_OK && zret != Z_STREAM_END) {
        inflateEnd(&zs);
        return kErrInflate;
      }
    }
    p += 8 + int64_t(clen) + 4;
  }
  bool complete = (zs.avail_out == 0);
  inflateEnd(&zs);
  return complete ? kOk : kErrTruncated;
}

}  // namespace

extern "C" {

int png_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h,
              int32_t* channels) {
  Header hdr;
  int rc = parse_header(buf, len, &hdr);
  if (rc != kOk) return rc;
  *w = int32_t(hdr.w);
  *h = int32_t(hdr.h);
  *channels = hdr.out_channels;
  return kOk;
}

int png_decode8(const uint8_t* buf, int64_t len, uint8_t* out, int collapse) {
  Header hdr;
  int rc = parse_header(buf, len, &hdr);
  if (rc != kOk) return rc;
  const size_t w = hdr.w, h = hdr.h;
  const int sch = hdr.src_channels, och = hdr.out_channels;
  const size_t rowbytes = w * size_t(sch);
  const size_t raw_size = h * (rowbytes + 1);

  uint8_t* raw = static_cast<uint8_t*>(std::malloc(raw_size));
  if (!raw) return kErrNoMem;
  rc = inflate_idat(buf, len, raw, raw_size);
  if (rc != kOk) {
    std::free(raw);
    return rc;
  }

  // Unfilter in place (filter byte prefixes each scanline), then emit.
  bool all_eq = true;
  const uint8_t* prev = nullptr;  // previous RECONSTRUCTED row
  for (size_t y = 0; y < h; ++y) {
    uint8_t* line = raw + y * (rowbytes + 1);
    int ftype = line[0];
    uint8_t* cur = line + 1;
    switch (ftype) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t i = sch; i < rowbytes; ++i) cur[i] += cur[i - sch];
        break;
      case 2:  // Up
        if (prev)
          for (size_t i = 0; i < rowbytes; ++i) cur[i] += prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < rowbytes; ++i) {
          int a = i >= size_t(sch) ? cur[i - sch] : 0;
          int b = prev ? prev[i] : 0;
          cur[i] += uint8_t((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < rowbytes; ++i) {
          int a = i >= size_t(sch) ? cur[i - sch] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= size_t(sch)) ? prev[i - sch] : 0;
          cur[i] += paeth(a, b, c);
        }
        break;
      default:
        std::free(raw);
        return kErrBadFilter;
    }
    prev = cur;

    uint8_t* dst = out + y * w * size_t(och);
    if (sch == och) {
      std::memcpy(dst, cur, rowbytes);
      if (collapse && och == 3) {
        for (size_t x = 0; x < w; ++x) {
          const uint8_t* px = cur + x * 3;
          if (px[0] != px[1] || px[0] != px[2]) { all_eq = false; break; }
        }
        if (!all_eq) collapse = 0;  // stop checking further rows
      }
    } else {  // RGBA -> RGB (drop alpha)
      for (size_t x = 0; x < w; ++x) {
        const uint8_t* px = cur + x * 4;
        dst[x * 3] = px[0];
        dst[x * 3 + 1] = px[1];
        dst[x * 3 + 2] = px[2];
        if (collapse && (px[0] != px[1] || px[0] != px[2])) {
          all_eq = false;
          collapse = 0;
        }
      }
    }
  }
  std::free(raw);

  if (och == 3 && all_eq && collapse) {
    // forward in-place compaction is safe: src index 3*i >= dst index i
    const size_t n = w * h;
    for (size_t i = 0; i < n; ++i) out[i] = out[i * 3];
    return kCollapsed;
  }
  return kOk;
}

}  // extern "C"
