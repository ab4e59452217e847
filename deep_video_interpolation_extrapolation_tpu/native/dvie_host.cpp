// Native host-side data-pipeline core (C++/libpng).
//
// The training input pipeline's per-sample hot path is pure host work:
// PNG decode, horizontal flip, crop, [-1,1] normalization, and 20-class
// one-hot expansion of the seg-id map (reference folder.py:151-216 does
// this through PIL + numpy; the one-hot alone materializes
// H*W*20 float32 — ~40 MB/frame at 1024x512).  This module fuses the
// whole chain into one single-pass C kernel per frame so the bytes are
// touched once, no intermediate uint8/float arrays are allocated, and
// the work runs GIL-free under the Loader's thread pool (ctypes releases
// the GIL for the duration of the call).
//
// Scope is deliberately narrow: only the exact formats the datasets use
// (8-bit RGB `_leftImg8bit.png`, 8-bit gray `_gtFine_myseg_id.png`,
// non-interlaced) are handled natively; anything else returns a nonzero
// code and the Python caller falls back to the PIL path.  Within that
// scope the output is BIT-IDENTICAL to the PIL/numpy pipeline: the
// normalizations are evaluated through 256-entry lookup tables built
// with the same single-precision op order numpy uses
// ((v/255)*2-1, folder.py:169; (v/255-0.5)/0.5, folder.py:248-249).
//
// Return codes: 0 ok; 1 decode error / not a PNG; 2 unsupported format
// (caller falls back); 3 seg id >= n_classes (numpy's np.eye would
// raise IndexError — surfaced, never masked); 4 crop out of bounds.

#include <png.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t off;
};

// quiet handlers: decode failures are expected control flow here (the
// caller falls back to PIL), so nothing may be printed to stderr
void quiet_error_fn(png_structp png, png_const_charp) {
  png_longjmp(png, 1);
}
void quiet_warning_fn(png_structp, png_const_charp) {}

void mem_read_fn(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->off + n > r->size) {
    png_error(png, "dvie: read past end of buffer");
    return;
  }
  std::memcpy(out, r->data + r->off, n);
  r->off += n;
}

struct MemWriter {
  uint8_t* data;
  size_t cap;
  size_t off;
  bool overflow;
};

void mem_write_fn(png_structp png, png_bytep src, png_size_t n) {
  MemWriter* w = static_cast<MemWriter*>(png_get_io_ptr(png));
  if (w->off + n > w->cap) {
    w->overflow = true;
    png_error(png, "dvie: write past end of buffer");
    return;
  }
  std::memcpy(w->data + w->off, src, n);
  w->off += n;
}

void mem_flush_fn(png_structp) {}

// Images past this bound (pixels) are declined rather than allocated:
// a hostile IHDR can declare up to 1e6 x 1e6, and the PIL fallback
// applies its own decompression-bomb guard anyway.
constexpr uint64_t kMaxPixels = 64ull * 1024 * 1024;  // 64 MPix

// setjmp body: every object mutated after setjmp lives in the CALLER's
// frame (px, rows are references) or is trivially destructible (r), so
// a png_longjmp cannot unwind through indeterminate C++ autos.
// ``y_limit``: decode only rows [0, y_limit) and stop — PNG rows are a
// sequential zlib stream with per-row filters, so rows ABOVE a crop must
// be inflated anyway, but everything BELOW its last row can be skipped
// (at the 128-row crops from 512-row frames this skips ~44% of the
// inflate work on average).  0 = full image.  Partial reads skip
// png_read_end (it only parses trailing chunks).
int decode_with_rows(const uint8_t* buf, size_t len, int want,
                     std::vector<uint8_t>& px, std::vector<png_bytep>& rows,
                     uint32_t* oh, uint32_t* ow, uint32_t y_limit = 0) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, quiet_error_fn,
                             quiet_warning_fn);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  MemReader r{buf, len, 0};
  png_set_read_fn(png, &r, mem_read_fn);
  png_read_info(png, info);
  const uint32_t w = png_get_image_width(png, info);
  const uint32_t h = png_get_image_height(png, info);
  const int ct = png_get_color_type(png, info);
  const int bd = png_get_bit_depth(png, info);
  const int il = png_get_interlace_type(png, info);
  const int want_ct = (want == 3) ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY;
  if (ct != want_ct || bd != 8 || il != PNG_INTERLACE_NONE || h == 0 ||
      w == 0 || static_cast<uint64_t>(h) * w > kMaxPixels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  png_read_update_info(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(w) * want) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  const uint32_t y_lim = (y_limit == 0 || y_limit > h) ? h : y_limit;
  px.resize(static_cast<size_t>(y_lim) * rowbytes);
  rows.resize(y_lim);
  for (uint32_t y = 0; y < y_lim; ++y) rows[y] = px.data() + y * rowbytes;
  if (y_lim == h) {
    png_read_image(png, rows.data());
    png_read_end(png, nullptr);
  } else {
    for (uint32_t y = 0; y < y_lim; ++y)
      png_read_row(png, rows[y], nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  *oh = h;
  *ow = w;
  return 0;
}

// Decode an 8-bit, non-interlaced PNG with exactly `want` channels
// (3 = RGB, 1 = gray).  No pixel transforms: staying inside the formats
// PIL's convert("RGB")/convert("L") maps identically keeps the native
// path bit-exact; everything else is punted to Python (code 2).
int decode_exact(const uint8_t* buf, size_t len, int want,
                 std::vector<uint8_t>& px, uint32_t* oh, uint32_t* ow,
                 uint32_t y_limit = 0) {
  std::vector<png_bytep> rows;  // owned outside the setjmp frame
  return decode_with_rows(buf, len, want, px, rows, oh, ow, y_limit);
}

inline int check_crop(uint32_t H, uint32_t W, int32_t y0, int32_t x0,
                      int32_t ch, int32_t cw) {
  if (y0 < 0 || x0 < 0 || ch <= 0 || cw <= 0) return 4;
  if (static_cast<uint32_t>(y0 + ch) > H || static_cast<uint32_t>(x0 + cw) > W)
    return 4;
  return 0;
}

}  // namespace

extern "C" {

// Header-only peek: dims + format, no pixel decode.  Lets the Python
// side compute crop parameters (correlated_crop_params needs H, W) and
// decide native-vs-fallback before any heavy work.
int dvie_png_info(const uint8_t* buf, size_t len, int32_t* h, int32_t* w,
                  int32_t* color_type, int32_t* bit_depth,
                  int32_t* interlace) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, quiet_error_fn,
                             quiet_warning_fn);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  MemReader r{buf, len, 0};
  png_set_read_fn(png, &r, mem_read_fn);
  png_read_info(png, info);
  *h = static_cast<int32_t>(png_get_image_height(png, info));
  *w = static_cast<int32_t>(png_get_image_width(png, info));
  *color_type = png_get_color_type(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  *interlace = png_get_interlace_type(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Fused decode -> flip -> crop -> normalize.  out: float32 [ch, cw, 3].
// The flip mirrors the FULL image before the crop is taken, matching the
// Python order (img[:, ::-1] then [y0:y0+ch, x0:x0+cw], folder.py:145,167).
// mode 0: (v/255)*2-1 (ClipDataset); mode 1: (v/255-0.5)/0.5 (Triplet).
int dvie_decode_rgb_norm(const uint8_t* buf, size_t len, float* out,
                         int32_t y0, int32_t x0, int32_t ch, int32_t cw,
                         int32_t flip, int32_t mode) try {
  std::vector<uint8_t> px;
  uint32_t H = 0, W = 0;
  // crop-bounded: rows past y0+ch never inflate (the crop is validated
  // after the header is known; a bad crop just decoded a prefix)
  const uint32_t y_lim =
      (y0 >= 0 && ch > 0) ? static_cast<uint32_t>(y0) + ch : 0;
  int rc = decode_exact(buf, len, 3, px, &H, &W, y_lim);
  if (rc) return rc;
  rc = check_crop(H, W, y0, x0, ch, cw);
  if (rc) return rc;

  float lut[256];
  for (int v = 0; v < 256; ++v) {
    const float f = static_cast<float>(v) / 255.0f;
    lut[v] = (mode == 1) ? (f - 0.5f) / 0.5f : f * 2.0f - 1.0f;
  }

  for (int32_t y = 0; y < ch; ++y) {
    const uint8_t* srow = px.data() + static_cast<size_t>(y0 + y) * W * 3;
    float* dst = out + static_cast<size_t>(y) * cw * 3;
    if (!flip) {
      const uint8_t* s = srow + static_cast<size_t>(x0) * 3;
      const int32_t n = cw * 3;
      for (int32_t i = 0; i < n; ++i) dst[i] = lut[s[i]];
    } else {
      // flipped source column for output x is W-1-(x0+x); channel order
      // is untouched (the flip is horizontal only)
      for (int32_t x = 0; x < cw; ++x) {
        const uint8_t* s =
            srow + static_cast<size_t>(W - 1 - (x0 + x)) * 3;
        dst[x * 3 + 0] = lut[s[0]];
        dst[x * 3 + 1] = lut[s[1]];
        dst[x * 3 + 2] = lut[s[2]];
      }
    }
  }
  return 0;
} catch (...) {
  // no exception may escape into the ctypes caller (std::terminate);
  // bad_alloc etc. degrade to the ordinary decode-failed fallback
  return 1;
}

// Fused decode -> flip -> crop -> one-hot.  out: float32 [ch, cw, n];
// equivalent to np.eye(n, dtype=f32)[seg] on the cropped gray ids
// (folder.py:170) but written as memset + single scatter store per pixel
// instead of an n-wide gather row copy per pixel.
int dvie_decode_seg_onehot(const uint8_t* buf, size_t len, float* out,
                           int32_t y0, int32_t x0, int32_t ch, int32_t cw,
                           int32_t flip, int32_t n_classes) try {
  if (n_classes <= 0 || n_classes > 4096) return 4;
  std::vector<uint8_t> px;
  uint32_t H = 0, W = 0;
  const uint32_t y_lim =
      (y0 >= 0 && ch > 0) ? static_cast<uint32_t>(y0) + ch : 0;
  int rc = decode_exact(buf, len, 1, px, &H, &W, y_lim);
  if (rc) return rc;
  rc = check_crop(H, W, y0, x0, ch, cw);
  if (rc) return rc;

  // validate ids BEFORE writing: a partial buffer on error would differ
  // from numpy semantics (np.eye raises and leaves nothing behind)
  for (int32_t y = 0; y < ch; ++y) {
    const uint8_t* srow = px.data() + static_cast<size_t>(y0 + y) * W;
    for (int32_t x = 0; x < cw; ++x) {
      const uint8_t id =
          flip ? srow[W - 1 - (x0 + x)] : srow[x0 + x];
      if (id >= n_classes) return 3;
    }
  }

  std::memset(out, 0,
              static_cast<size_t>(ch) * cw * n_classes * sizeof(float));
  for (int32_t y = 0; y < ch; ++y) {
    const uint8_t* srow = px.data() + static_cast<size_t>(y0 + y) * W;
    float* drow = out + static_cast<size_t>(y) * cw * n_classes;
    for (int32_t x = 0; x < cw; ++x) {
      const uint8_t id =
          flip ? srow[W - 1 - (x0 + x)] : srow[x0 + x];
      drow[static_cast<size_t>(x) * n_classes + id] = 1.0f;
    }
  }
  return 0;
} catch (...) {
  return 1;
}

// Raw 8-bit decode (RGB or gray), for tooling that wants the pixels
// without normalization (tools/video_tools.py consumers).  out must be
// h*w*channels bytes as reported by dvie_png_info.
int dvie_decode_u8(const uint8_t* buf, size_t len, uint8_t* out,
                   int32_t channels) try {
  if (channels != 1 && channels != 3) return 4;
  std::vector<uint8_t> px;
  uint32_t H = 0, W = 0;
  int rc = decode_exact(buf, len, channels, px, &H, &W);
  if (rc) return rc;
  std::memcpy(out, px.data(), px.size());
  return 0;
} catch (...) {
  return 1;
}

// PNG encode to a caller-provided buffer (8-bit RGB or gray, no
// interlace).  The cycgen product writes thousands of full-res PNGs per
// run (train/runner.py:569-585); PIL's default zlib level 6 spends most
// of the wall clock in deflate, so `level` is explicit (1 = Z_BEST_SPEED
// is the product default — PNG stays lossless, only the byte stream
// differs).  Returns bytes written, or -1 (error) / -2 (out buffer too
// small: caller sizes it raw + raw/64 + 4096).
int64_t dvie_encode_png(const uint8_t* pixels, int32_t h, int32_t w,
                        int32_t channels, int32_t level, uint8_t* out,
                        int64_t out_cap) try {
  if ((channels != 1 && channels != 3) || h <= 0 || w <= 0 ||
      static_cast<uint64_t>(h) * w > kMaxPixels)
    return -1;
  png_structp png = png_create_write_struct(
      PNG_LIBPNG_VER_STRING, nullptr, quiet_error_fn, quiet_warning_fn);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    return -1;
  }
  MemWriter mw{out, static_cast<size_t>(out_cap), 0, false};
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    return mw.overflow ? -2 : -1;
  }
  png_set_write_fn(png, &mw, mem_write_fn, mem_flush_fn);
  png_set_compression_level(png, level < 0 ? 1 : (level > 9 ? 9 : level));
  // single SUB filter: skips libpng's per-row try-all-filters heuristic
  // (~2x encode time on RGB for a few % of size on natural images)
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_IHDR(png, info, w, h, 8,
               channels == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  const size_t rowbytes = static_cast<size_t>(w) * channels;
  for (int32_t y = 0; y < h; ++y)
    png_write_row(png, const_cast<png_bytep>(pixels + y * rowbytes));
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  return static_cast<int64_t>(mw.off);
} catch (...) {
  return -1;
}

int dvie_host_abi_version() { return 1; }

}  // extern "C"
