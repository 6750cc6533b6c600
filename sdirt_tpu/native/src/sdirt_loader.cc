// sdirt-tpu native data loader: threaded, streaming image decode + resize.
//
// The training input pipeline decodes RGB-D samples (PNG/JPEG) and resizes
// them (bicubic for RGB, nearest for depth — the reference's interpolation
// contract, dataset.py:36-43). This library decodes a whole batch on real
// pthreads with zero Python involvement and writes float32 CHW directly into
// a caller-provided buffer.
//
// Design: ROW-STREAMING FUSION. Each decoded scanline is horizontally
// resized immediately (precomputed 4-tap Catmull-Rom), so the full-
// resolution image is never materialized — working set is the source row +
// [src_h, out_w] intermediate planes. The vertical pass then reduces
// [src_h, out_w] -> [out_h, out_w] over contiguous rows.
//
// C ABI (ctypes-friendly):
//   sdirt_decode_resize(path, out, th, tw, channels, interp)
//     returns -1 on failure, 0 for 8-bit sources, 1 for 16-bit PNGs
//   sdirt_load_batch(paths, n, out, th, tw, channels, interp, n_threads,
//                    bit16 /* optional [n] out: 0/1 per file, may be null */)
// interp: 0 = nearest, 1 = bicubic (a=-0.75, cv2 INTER_CUBIC's kernel).
// Outputs raw sample values as float (8-bit: 0..255, 16-bit PNG: 0..65535);
// normalization stays with the caller (datasets divide by 255/25.5/1000
// themselves), which is why the bit depth is reported back.

#include <csetjmp>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

inline float cubic_w(float x) {
  // cv2 INTER_CUBIC kernel (a = -0.75)
  const float a = -0.75f;
  x = std::fabs(x);
  if (x <= 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct CubicTaps {
  std::vector<int> idx;    // [n][4] clamped source indices
  std::vector<float> w;    // [n][4] normalized weights
};

CubicTaps make_taps(int n_out, int n_src) {
  CubicTaps t;
  t.idx.resize((size_t)n_out * 4);
  t.w.resize((size_t)n_out * 4);
  const float s = (float)n_src / n_out;
  for (int o = 0; o < n_out; o++) {
    float f = (o + 0.5f) * s - 0.5f;   // half-pixel mapping (cv2 convention)
    int i0 = (int)std::floor(f);
    float d = f - i0;
    float wsum = 0.0f;
    for (int j = 0; j < 4; j++) {
      int si = i0 - 1 + j;
      si = si < 0 ? 0 : (si >= n_src ? n_src - 1 : si);
      float wgt = cubic_w((j - 1) - d);
      t.idx[o * 4 + j] = si;
      t.w[o * 4 + j] = wgt;
      wsum += wgt;
    }
    for (int j = 0; j < 4; j++) t.w[o * 4 + j] /= wsum;
  }
  return t;
}

std::vector<int> make_nearest(int n_out, int n_src) {
  // cv2 INTER_NEAREST: floor of the non-centered source index
  std::vector<int> idx(n_out);
  const float s = (float)n_src / n_out;
  for (int o = 0; o < n_out; o++) {
    int i = (int)(o * s);
    idx[o] = i >= n_src ? n_src - 1 : i;
  }
  return idx;
}

// Streaming resizer: feed source rows (interleaved uint8/uint16), collects
// horizontally-resized float rows, finishes with a vertical pass.
struct StreamResizer {
  int sw, sh, sc, tw, th, out_c, interp;
  CubicTaps tx;
  std::vector<int> nx;
  std::vector<float> hrows;   // [out_c, sh, tw]
  float* out;                 // [out_c, th, tw]

  void init(int sw_, int sh_, int sc_, int tw_, int th_, int out_c_,
            int interp_, float* out_) {
    sw = sw_; sh = sh_; sc = sc_; tw = tw_; th = th_; out_c = out_c_;
    interp = interp_; out = out_;
    if (interp == 1)
      tx = make_taps(tw, sw);
    else
      nx = make_nearest(tw, sw);
    hrows.resize((size_t)out_c * sh * tw);
  }

  template <typename T>
  void feed_row(int y, const T* row) {
    for (int ch = 0; ch < out_c; ch++) {
      int c = ch < sc ? ch : 0;  // gray -> replicate
      float* dst = hrows.data() + ((size_t)ch * sh + y) * tw;
      if (interp == 1) {
        const int* id = tx.idx.data();
        const float* wt = tx.w.data();
        for (int ox = 0; ox < tw; ox++, id += 4, wt += 4) {
          dst[ox] = wt[0] * (float)row[(size_t)id[0] * sc + c] +
                    wt[1] * (float)row[(size_t)id[1] * sc + c] +
                    wt[2] * (float)row[(size_t)id[2] * sc + c] +
                    wt[3] * (float)row[(size_t)id[3] * sc + c];
        }
      } else {
        for (int ox = 0; ox < tw; ox++)
          dst[ox] = (float)row[(size_t)nx[ox] * sc + c];
      }
    }
  }

  void finish() {
    if (interp == 1) {
      CubicTaps ty = make_taps(th, sh);
      for (int ch = 0; ch < out_c; ch++) {
        const float* plane = hrows.data() + (size_t)ch * sh * tw;
        for (int oy = 0; oy < th; oy++) {
          const int* id = ty.idx.data() + oy * 4;
          const float* wt = ty.w.data() + oy * 4;
          const float *r0 = plane + (size_t)id[0] * tw,
                      *r1 = plane + (size_t)id[1] * tw,
                      *r2 = plane + (size_t)id[2] * tw,
                      *r3 = plane + (size_t)id[3] * tw;
          float* dst = out + ((size_t)ch * th + oy) * tw;
          for (int ox = 0; ox < tw; ox++)
            dst[ox] = wt[0] * r0[ox] + wt[1] * r1[ox] + wt[2] * r2[ox] +
                      wt[3] * r3[ox];
        }
      }
    } else {
      std::vector<int> ny = make_nearest(th, sh);
      for (int ch = 0; ch < out_c; ch++) {
        const float* plane = hrows.data() + (size_t)ch * sh * tw;
        for (int oy = 0; oy < th; oy++)
          std::memcpy(out + ((size_t)ch * th + oy) * tw,
                      plane + (size_t)ny[oy] * tw, sizeof(float) * tw);
      }
    }
  }
};

// Returns -1 on failure, 0 for 8-bit, 1 for 16-bit sources.
int decode_png(FILE* f, StreamResizer* rs, int th, int tw, int out_c,
               int interp, float* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type, interlace;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, &interlace, nullptr,
               nullptr);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);
  // Adam7 rows arrive out of order; libpng de-interlaces only when the
  // whole image is read per pass.
  int passes = (interlace == PNG_INTERLACE_NONE)
                   ? 1
                   : png_set_interlace_handling(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  rs->init((int)w, (int)h, channels, tw, th, out_c, interp, out);

  if (passes == 1) {
    // streaming path: one scanline in flight
    std::vector<uint8_t> row(rowbytes);
    for (png_uint_32 y = 0; y < h; y++) {
      png_read_row(png, row.data(), nullptr);
      if (bit_depth == 16)
        rs->feed_row((int)y, reinterpret_cast<const uint16_t*>(row.data()));
      else
        rs->feed_row((int)y, row.data());
    }
  } else {
    // interlaced fallback: materialize the full image (rare files only)
    std::vector<uint8_t> img((size_t)rowbytes * h);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; y++) rows[y] = img.data() + rowbytes * y;
    for (int p = 0; p < passes; p++)
      png_read_rows(png, rows.data(), nullptr, h);
    for (png_uint_32 y = 0; y < h; y++) {
      if (bit_depth == 16)
        rs->feed_row((int)y, reinterpret_cast<const uint16_t*>(rows[y]));
      else
        rs->feed_row((int)y, rows[y]);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  rs->finish();
  return bit_depth == 16 ? 1 : 0;
}

struct JpegErrorMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  // The default error_exit calls exit(): fatal inside a data-loader thread.
  // Unwind back to decode_jpeg so a corrupt file reports failure instead.
  longjmp(reinterpret_cast<JpegErrorMgr*>(cinfo->err)->jb, 1);
}

int decode_jpeg(FILE* f, StreamResizer* rs, int th, int tw, int out_c,
                int interp, float* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      c = cinfo.output_components;
  rs->init(w, h, c, tw, th, out_c, interp, out);
  std::vector<uint8_t> row((size_t)w * c);
  uint8_t* rp = row.data();
  for (int y = 0; y < h; y++) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    rs->feed_row(y, row.data());
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  rs->finish();
  return 0;
}

}  // namespace

extern "C" {

int sdirt_decode_resize(const char* path, float* out, int th, int tw,
                        int channels, int interp) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return -1;
  }
  rewind(f);
  StreamResizer rs;
  int rc = -1;
  if (magic[0] == 0x89 && magic[1] == 'P')
    rc = decode_png(f, &rs, th, tw, channels, interp, out);
  else if (magic[0] == 0xFF && magic[1] == 0xD8)
    rc = decode_jpeg(f, &rs, th, tw, channels, interp, out);
  fclose(f);
  return rc;
}

int sdirt_load_batch(const char** paths, int n, float* out, int th, int tw,
                     int channels, int interp, int n_threads, int* bit16) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failed(0);
  size_t stride = (size_t)channels * th * tw;
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = sdirt_decode_resize(paths[i], out + stride * i, th, tw,
                                   channels, interp);
      if (bit16) bit16[i] = rc == 1 ? 1 : 0;
      if (rc < 0) failed.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  for (int t = 0; t < nt; t++) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failed.load() == 0 ? 0 : -(int)failed.load();
}

}  // extern "C"
