// Minimal OpenEXR scanline decoder (native data-plane component).
//
// Replaces the reference's third-party pyroexr C++ dependency
// (/root/reference/realtime_style_transfer/dataloaders/hdrScreenshots.py:7,18)
// with first-party code sized for the Unreal G-buffer use case:
//   * single-part scanline images, INCREASING_Y or DECREASING_Y line order
//   * compressions: NONE, RLE, ZIPS, ZIP (zlib)  [PIZ/B44/DWA -> clear error]
//   * pixel types: HALF, FLOAT, UINT (all converted to float32)
//
// C API (ctypes-friendly), two-call protocol:
//   exr_read_info(path, &w, &h, &nchan, names_buf, names_cap) -> 0 / error code
//   exr_read(path, out_planar_f32)   // out has shape (nchan, h, w), channel order
//                                    // = file (alphabetical) order
//   exr_last_error() -> const char* message for the calling thread
//
// Build: make -C native   (g++ -O2 -shared -fPIC, links zlib)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

thread_local std::string g_error;

int fail(const std::string& msg) {
  g_error = msg;
  return -1;
}

struct Channel {
  std::string name;
  int32_t pixel_type;  // 0=UINT, 1=HALF, 2=FLOAT
  size_t byte_size() const { return pixel_type == 1 ? 2 : 4; }
};

struct ExrHeader {
  std::vector<Channel> channels;
  uint8_t compression = 0;
  int32_t xmin = 0, ymin = 0, xmax = 0, ymax = 0;
  uint8_t line_order = 0;  // 0 increasing, 1 decreasing
  size_t data_start = 0;   // file offset of the scanline offset table
  int width() const { return xmax - xmin + 1; }
  int height() const { return ymax - ymin + 1; }
};

class Reader {
 public:
  explicit Reader(const std::vector<uint8_t>& buf) : buf_(buf) {}
  bool ok() const { return pos_ <= buf_.size() && !failed_; }
  size_t pos() const { return pos_; }
  void seek(size_t p) { pos_ = p; }

  template <typename T>
  T read() {
    T v{};
    if (pos_ + sizeof(T) > buf_.size()) {
      failed_ = true;
      return v;
    }
    std::memcpy(&v, buf_.data() + pos_, sizeof(T));
    pos_ += sizeof(T);
    return v;
  }

  std::string read_cstring(size_t max_len = 256) {
    std::string s;
    while (pos_ < buf_.size() && s.size() < max_len) {
      char c = static_cast<char>(buf_[pos_++]);
      if (c == '\0') return s;
      s.push_back(c);
    }
    failed_ = true;
    return s;
  }

  const uint8_t* raw(size_t n) {
    if (pos_ + n > buf_.size()) {
      failed_ = true;
      return nullptr;
    }
    const uint8_t* p = buf_.data() + pos_;
    pos_ += n;
    return p;
  }

 private:
  const std::vector<uint8_t>& buf_;
  size_t pos_ = 0;
  bool failed_ = false;
};

float half_to_float(uint16_t h) {
  uint32_t sign = (h >> 15) & 1u;
  uint32_t exp = (h >> 10) & 0x1fu;
  uint32_t mant = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign << 31;
    } else {  // subnormal half -> normalized float
      exp = 127 - 15 + 1;
      while ((mant & 0x400u) == 0) {
        mant <<= 1;
        --exp;
      }
      mant &= 0x3ffu;
      bits = (sign << 31) | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = (sign << 31) | 0x7f800000u | (mant << 13);  // inf / nan
  } else {
    bits = (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(static_cast<size_t>(size));
  size_t got = std::fread(out->data(), 1, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

int parse_header(Reader& r, ExrHeader* hdr) {
  uint32_t magic = r.read<uint32_t>();
  if (magic != 20000630u) return fail("not an EXR file (bad magic)");
  uint32_t version = r.read<uint32_t>();
  uint8_t ver = version & 0xffu;
  uint32_t flags = version >> 8;
  if (ver != 2) return fail("unsupported EXR version " + std::to_string(ver));
  if (flags & 0x02) return fail("tiled EXR not supported");
  if (flags & 0x10) return fail("multi-part EXR not supported");
  if (flags & 0x08) return fail("deep EXR not supported");

  bool have_channels = false, have_compression = false, have_window = false;
  while (true) {
    std::string name = r.read_cstring();
    if (!r.ok()) return fail("truncated header");
    if (name.empty()) break;  // end of header
    std::string type = r.read_cstring();
    int32_t size = r.read<int32_t>();
    if (!r.ok() || size < 0) return fail("bad attribute " + name);
    size_t value_end = r.pos() + static_cast<size_t>(size);

    if (name == "channels" && type == "chlist") {
      while (true) {
        std::string cname = r.read_cstring();
        if (!r.ok()) return fail("truncated chlist");
        if (cname.empty()) break;
        Channel c;
        c.name = cname;
        c.pixel_type = r.read<int32_t>();
        r.read<uint32_t>();  // pLinear + reserved
        int32_t xs = r.read<int32_t>();
        int32_t ys = r.read<int32_t>();
        if (xs != 1 || ys != 1)
          return fail("subsampled channels not supported (" + cname + ")");
        if (c.pixel_type < 0 || c.pixel_type > 2)
          return fail("bad pixel type in channel " + cname);
        hdr->channels.push_back(c);
      }
      have_channels = true;
    } else if (name == "compression" && type == "compression") {
      hdr->compression = r.read<uint8_t>();
      have_compression = true;
    } else if (name == "dataWindow" && type == "box2i") {
      hdr->xmin = r.read<int32_t>();
      hdr->ymin = r.read<int32_t>();
      hdr->xmax = r.read<int32_t>();
      hdr->ymax = r.read<int32_t>();
      have_window = true;
    } else if (name == "lineOrder" && type == "lineOrder") {
      hdr->line_order = r.read<uint8_t>();
    }
    r.seek(value_end);  // skip whatever else the attribute carried
  }
  if (!have_channels || !have_compression || !have_window)
    return fail("missing required EXR header attribute");
  if (hdr->width() <= 0 || hdr->height() <= 0) return fail("empty data window");
  if (hdr->line_order > 1) return fail("random lineOrder not supported");
  hdr->data_start = r.pos();
  return 0;
}

int lines_per_block(uint8_t compression) {
  switch (compression) {
    case 0:  // NONE
    case 1:  // RLE
    case 2:  // ZIPS
      return 1;
    case 3:  // ZIP
      return 16;
    default:
      return -1;  // PIZ(4)/PXR24(5)/B44(6)/B44A(7)/DWAA(8)/DWAB(9) unsupported
  }
}

// EXR zlib/rle post-decode: undo the delta predictor, then de-interleave.
void exr_reorder(std::vector<uint8_t>& data) {
  // predictor
  for (size_t i = 1; i < data.size(); ++i) {
    data[i] = static_cast<uint8_t>(
        static_cast<int>(data[i - 1]) + static_cast<int>(data[i]) - 128);
  }
  // de-interleave: first half -> even positions, second half -> odd
  std::vector<uint8_t> out(data.size());
  size_t half = (data.size() + 1) / 2;
  const uint8_t* s1 = data.data();
  const uint8_t* s2 = data.data() + half;
  for (size_t i = 0; i < data.size(); ++i) {
    out[i] = (i % 2 == 0) ? s1[i / 2] : s2[i / 2];
  }
  data.swap(out);
}

int rle_decode(const uint8_t* src, size_t src_len, std::vector<uint8_t>* dst) {
  size_t i = 0;
  while (i < src_len) {
    int8_t count = static_cast<int8_t>(src[i++]);
    if (count < 0) {
      size_t n = static_cast<size_t>(-count);
      if (i + n > src_len) return fail("RLE literal overrun");
      dst->insert(dst->end(), src + i, src + i + n);
      i += n;
    } else {
      if (i >= src_len) return fail("RLE run overrun");
      dst->insert(dst->end(), static_cast<size_t>(count) + 1, src[i++]);
    }
  }
  return 0;
}

int decode_block(const ExrHeader& hdr, const uint8_t* data, size_t comp_size,
                 size_t raw_size, std::vector<uint8_t>* out) {
  out->clear();
  if (comp_size == raw_size || hdr.compression == 0) {
    // Stored uncompressed (writers fall back when compression doesn't help).
    out->assign(data, data + comp_size);
    return 0;
  }
  if (hdr.compression == 1) {  // RLE
    out->reserve(raw_size);
    if (rle_decode(data, comp_size, out) != 0) return -1;
    if (out->size() != raw_size) return fail("RLE size mismatch");
    exr_reorder(*out);
    return 0;
  }
  // ZIPS / ZIP
  out->resize(raw_size);
  uLongf dest_len = raw_size;
  int rc = uncompress(out->data(), &dest_len, data, comp_size);
  if (rc != Z_OK || dest_len != raw_size)
    return fail("zlib inflate failed (rc=" + std::to_string(rc) + ")");
  exr_reorder(*out);
  return 0;
}

int load(const char* path, ExrHeader* hdr, float* out /* may be null */) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return fail(std::string("cannot read ") + path);
  Reader r(buf);
  if (parse_header(r, hdr) != 0) return -1;
  if (out == nullptr) return 0;  // info-only call

  int lpb = lines_per_block(hdr->compression);
  if (lpb < 0)
    return fail("unsupported compression code " +
                std::to_string(hdr->compression) +
                " (only NONE/RLE/ZIPS/ZIP)");

  const int width = hdr->width(), height = hdr->height();
  const int nchan = static_cast<int>(hdr->channels.size());
  const int num_blocks = (height + lpb - 1) / lpb;

  // Scanline offset table (uint64 per block).
  r.seek(hdr->data_start);
  std::vector<uint64_t> offsets(num_blocks);
  for (int b = 0; b < num_blocks; ++b) offsets[b] = r.read<uint64_t>();
  if (!r.ok()) return fail("truncated offset table");

  size_t bytes_per_scanline = 0;
  for (const auto& c : hdr->channels) bytes_per_scanline += c.byte_size() * width;

  std::vector<uint8_t> block;
  for (int b = 0; b < num_blocks; ++b) {
    r.seek(offsets[b]);
    int32_t y_start = r.read<int32_t>();
    int32_t comp_size = r.read<int32_t>();
    if (!r.ok() || comp_size < 0) return fail("truncated chunk header");
    const uint8_t* data = r.raw(static_cast<size_t>(comp_size));
    if (!data) return fail("truncated chunk data");

    int block_y0 = y_start - hdr->ymin;
    int lines = std::min(lpb, height - block_y0);
    if (block_y0 < 0 || lines <= 0) return fail("chunk y out of range");
    size_t raw_size = bytes_per_scanline * static_cast<size_t>(lines);
    if (decode_block(*hdr, data, static_cast<size_t>(comp_size), raw_size,
                     &block) != 0)
      return -1;
    if (block.size() != raw_size) return fail("decoded block size mismatch");

    // Block layout: per scanline, per channel (header order), width values.
    const uint8_t* p = block.data();
    for (int line = 0; line < lines; ++line) {
      int y = block_y0 + line;
      if (hdr->line_order == 1) y = height - 1 - y;  // DECREASING_Y
      for (int c = 0; c < nchan; ++c) {
        const Channel& ch = hdr->channels[c];
        float* dst = out + (static_cast<size_t>(c) * height + y) * width;
        switch (ch.pixel_type) {
          case 1:  // HALF
            for (int x = 0; x < width; ++x) {
              uint16_t v;
              std::memcpy(&v, p + 2 * x, 2);
              dst[x] = half_to_float(v);
            }
            break;
          case 2:  // FLOAT
            std::memcpy(dst, p, sizeof(float) * width);
            break;
          case 0:  // UINT
            for (int x = 0; x < width; ++x) {
              uint32_t v;
              std::memcpy(&v, p + 4 * x, 4);
              dst[x] = static_cast<float>(v);
            }
            break;
        }
        p += ch.byte_size() * width;
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

const char* exr_last_error() { return g_error.c_str(); }

// names_buf receives '\n'-joined channel names (file order). Returns 0 on ok.
int exr_read_info(const char* path, int* width, int* height, int* num_channels,
                  char* names_buf, int names_cap) {
  ExrHeader hdr;
  if (load(path, &hdr, nullptr) != 0) return -1;
  *width = hdr.width();
  *height = hdr.height();
  *num_channels = static_cast<int>(hdr.channels.size());
  std::string names;
  for (size_t i = 0; i < hdr.channels.size(); ++i) {
    if (i) names.push_back('\n');
    names += hdr.channels[i].name;
  }
  if (static_cast<int>(names.size()) + 1 > names_cap)
    return fail("names buffer too small");
  std::memcpy(names_buf, names.c_str(), names.size() + 1);
  return 0;
}

// out must hold num_channels * height * width float32 (planar, file order).
int exr_read(const char* path, float* out) {
  ExrHeader hdr;
  return load(path, &hdr, out);
}

}  // extern "C"
