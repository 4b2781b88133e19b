// Native I/O backend for libdwt_tpu: fast PGM / ASCII-MAT / LIBSVM codecs.
//
// TPU-native counterpart of the reference's host-side I/O layer
// (/root/reference/src/libdwt.c:19246 PGM save, :24430 MAT save,
// :24810 MAT load, :25361 LIBSVM save; formats: PGM P2/P5, MAT = CSV
// with ',' delimiters and '\n' row terminators).  The hot paths here
// are text parse/format loops, which are far faster in C++ than in
// Python; the Python layer (libdwt_tpu.utils.io) falls back to numpy
// when this library is not built.
//
// Exported with C linkage for ctypes.  All functions return 0 on
// success, negative on failure.  Two-phase read API: *_probe fills the
// dimensions, *_read fills a caller-allocated buffer.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Text {
  std::vector<char> buf;  // len content bytes + one NUL terminator
  size_t len = 0;
  size_t pos = 0;
  bool load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    if (n < 0) {  // non-seekable (FIFO, ...): no size, cannot slurp
      std::fclose(f);
      return false;
    }
    std::fseek(f, 0, SEEK_SET);
    len = static_cast<size_t>(n);
    // NUL terminator: strtol/strtof parse straight out of the buffer
    // and must never scan past the content
    buf.resize(len + 1);
    buf[len] = '\0';
    size_t rd = n ? std::fread(buf.data(), 1, len, f) : 0;
    std::fclose(f);
    return rd == len;
  }
  void skip_ws_comments() {
    while (pos < len) {
      if (std::isspace(static_cast<unsigned char>(buf[pos]))) {
        ++pos;
      } else if (buf[pos] == '#') {
        while (pos < len && buf[pos] != '\n') ++pos;
      } else {
        break;
      }
    }
  }
  bool read_int(long* out) {
    skip_ws_comments();
    char* end = nullptr;
    *out = std::strtol(buf.data() + pos, &end, 10);
    if (end == buf.data() + pos) return false;
    pos = static_cast<size_t>(end - buf.data());
    return true;
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- PGM

// Probe a PGM (P2 or P5): fills width, height, maxval.
int ldt_pgm_probe(const char* path, int64_t* w, int64_t* h, int64_t* maxval) {
  Text t;
  if (!t.load(path)) return -1;
  if (t.len < 2 || t.buf[0] != 'P') return -2;
  char kind = t.buf[1];
  if (kind != '2' && kind != '5') return -2;
  t.pos = 2;
  long W, H, M;
  if (!t.read_int(&W) || !t.read_int(&H) || !t.read_int(&M)) return -3;
  *w = W;
  *h = H;
  *maxval = M;
  return 0;
}

// Read pixel data into out[w*h] as float32 (raw sample values).
int ldt_pgm_read(const char* path, float* out, int64_t w, int64_t h) {
  Text t;
  if (!t.load(path)) return -1;
  if (t.len < 2 || t.buf[0] != 'P') return -2;
  char kind = t.buf[1];
  t.pos = 2;
  long W, H, M;
  if (!t.read_int(&W) || !t.read_int(&H) || !t.read_int(&M)) return -3;
  if (W != w || H != h) return -4;
  int64_t n = w * h;
  if (kind == '2') {
    for (int64_t i = 0; i < n; ++i) {
      long v;
      if (!t.read_int(&v)) return -5;
      out[i] = static_cast<float>(v);
    }
  } else if (kind == '5') {
    if (t.pos >= t.len) return -5;  // header ends at EOF
    ++t.pos;  // single whitespace after maxval
    if (M < 256) {
      if (t.len - t.pos < static_cast<size_t>(n)) return -5;
      const unsigned char* p =
          reinterpret_cast<const unsigned char*>(t.buf.data() + t.pos);
      for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(p[i]);
    } else {  // 16-bit big-endian
      if (t.len - t.pos < static_cast<size_t>(2 * n)) return -5;
      const unsigned char* p =
          reinterpret_cast<const unsigned char*>(t.buf.data() + t.pos);
      for (int64_t i = 0; i < n; ++i)
        out[i] = static_cast<float>((p[2 * i] << 8) | p[2 * i + 1]);
    }
  } else {
    return -2;
  }
  return 0;
}

// Write a P2 (ASCII) PGM from float32 data clamped to [0, maxval] —
// matching dwt_util_save_to_pgm_s (/root/reference/src/libdwt.c:19794):
// header "P2\n<w> <h>\n<maxval>\n", one value per line, value =
// TRUNCATED maxval*px (C float->int conversion), NaN -> 0, clamped.
int ldt_pgm_write_p2(const char* path, const float* data, int64_t w, int64_t h,
                     int64_t maxval) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::fprintf(f, "P2\n%lld %lld\n%lld\n", static_cast<long long>(w),
               static_cast<long long>(h), static_cast<long long>(maxval));
  std::vector<char> out;
  out.reserve(static_cast<size_t>(w * h) * 5);
  char tmp[32];
  for (int64_t i = 0; i < w * h; ++i) {
    double v = data[i];
    long lv = v != v ? 0 : static_cast<long>(v * static_cast<double>(maxval));
    if (lv < 0) lv = 0;
    if (lv > maxval) lv = maxval;
    int len = std::snprintf(tmp, sizeof tmp, "%ld\n", lv);
    if (len < 0 || static_cast<size_t>(len) >= sizeof tmp) {
      std::fclose(f);
      return -2;
    }
    out.insert(out.end(), tmp, tmp + len);
  }
  std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return 0;
}

// Write a P5 (binary, 8-bit) PGM from already-quantized bytes.
int ldt_pgm_write_p5(const char* path, const uint8_t* data, int64_t w,
                     int64_t h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "P5\n%lld %lld\n255\n", static_cast<long long>(w),
               static_cast<long long>(h));
  std::fwrite(data, 1, static_cast<size_t>(w * h), f);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------- MAT (CSV)

// Probe: count rows and columns of an ASCII MAT (CSV) file.
int ldt_mat_probe(const char* path, int64_t* rows, int64_t* cols) {
  Text t;
  if (!t.load(path)) return -1;
  // count VALUES per row (robust to trailing separators/spaces and
  // matching what ldt_mat_read's separator-skipping parser consumes)
  int64_t r = 0, c = 0, c0 = -1;
  int64_t values = 0;
  bool in_value = false;
  for (size_t i = 0; i < t.len; ++i) {
    char ch = t.buf[i];
    if (ch == '\n' || ch == '\r') {
      if (values) {
        if (c0 < 0) c0 = values;
        if (values != c0) return -2;
        ++r;
      }
      values = 0;
      in_value = false;
    } else if (ch == ',' || ch == ';' ||
               std::isspace(static_cast<unsigned char>(ch))) {
      in_value = false;
    } else {
      if (!in_value) ++values;
      in_value = true;
    }
  }
  if (values) {  // last line without newline
    if (c0 < 0) c0 = values;
    if (values != c0) return -2;
    ++r;
  }
  c = c0 < 0 ? 0 : c0;
  *rows = r;
  *cols = c;
  return 0;
}

// Read MAT values row-major into out[rows*cols].
int ldt_mat_read(const char* path, float* out, int64_t rows, int64_t cols) {
  Text t;
  if (!t.load(path)) return -1;
  char* p = t.buf.data();
  char* endbuf = p + t.len;
  int64_t n = rows * cols;
  for (int64_t i = 0; i < n; ++i) {
    while (p < endbuf &&
           (std::isspace(static_cast<unsigned char>(*p)) || *p == ',' ||
            *p == ';'))
      ++p;
    char* end = nullptr;
    float v = std::strtof(p, &end);
    if (end == p) return -2;
    out[i] = v;
    p = end;
  }
  return 0;
}

// Write MAT: "%f" with ',' delimiters and '\n' rows — byte-compatible
// with dwt_util_save_to_mat_s (/root/reference/src/libdwt.c:24430-24473).
int ldt_mat_write(const char* path, const float* data, int64_t rows,
                  int64_t cols) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::vector<char> out;
  out.reserve(static_cast<size_t>(rows * cols) * 10);
  char tmp[48];
  for (int64_t y = 0; y < rows; ++y) {
    for (int64_t x = 0; x < cols; ++x) {
      int len = std::snprintf(tmp, sizeof tmp, "%f", data[y * cols + x]);
      out.insert(out.end(), tmp, tmp + len);
      out.push_back(x + 1 != cols ? ',' : '\n');
    }
  }
  std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------- LIBSVM

// Write labelled feature vectors in LIBSVM format:
// "<label> 1:<v1> 2:<v2> ...\n" (dwt_util_save_to_svm_s,
// /root/reference/src/libdwt.c:25361).
int ldt_svm_write(const char* path, const float* labels, const float* features,
                  int64_t n, int64_t dim) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::vector<char> out;
  char tmp[64];
  for (int64_t i = 0; i < n; ++i) {
    int len = std::snprintf(tmp, sizeof tmp, "%g", labels[i]);
    out.insert(out.end(), tmp, tmp + len);
    for (int64_t j = 0; j < dim; ++j) {
      len = std::snprintf(tmp, sizeof tmp, " %lld:%g",
                          static_cast<long long>(j + 1),
                          features[i * dim + j]);
      out.insert(out.end(), tmp, tmp + len);
    }
    out.push_back('\n');
  }
  std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
