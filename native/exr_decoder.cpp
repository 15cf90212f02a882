// Minimal OpenEXR scanline decoder (native data-plane component).
//
// Replaces the reference's third-party pyroexr C++ dependency
// (/root/reference/realtime_style_transfer/dataloaders/hdrScreenshots.py:7,18)
// with first-party code sized for the Unreal G-buffer use case:
//   * single-part scanline images, INCREASING_Y or DECREASING_Y line order
//   * compressions: NONE, RLE, ZIPS, ZIP (zlib), PIZ (wavelet + Huffman)
//     [PXR24/B44/DWA -> clear error]
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
    case 4:  // PIZ
      return 32;
    default:
      return -1;  // PXR24(5)/B44(6)/B44A(7)/DWAA(8)/DWAB(9) unsupported
  }
}

// ---------------------------------------------------------------------------
// PIZ decompression (wavelet + Huffman), per the OpenEXR 2.0 format spec.
// Implements the spec'd bitstream exactly: bitmap-indexed LUT, canonical
// Huffman with the 6-bit packed length table and the iM run-length
// pseudo-symbol, and the 2D modulo/14-bit wavelet.  The matching first-party
// *encoder* lives in realtime_style_transfer_tpu/data/exr.py (fixture
// generation + round-trip tests).
// ---------------------------------------------------------------------------

constexpr int kBitmapSize = 8192;            // 65536 values / 8 bits
constexpr int kUshortRange = 1 << 16;
constexpr int kHufEncSize = kUshortRange + 1;  // data symbols + RLE pseudo
constexpr int kHufDecBits = 14;
constexpr int kHufDecSize = 1 << kHufDecBits;
constexpr int kHufDecMask = kHufDecSize - 1;
constexpr int kShortZerocodeRun = 59;
constexpr int kLongZerocodeRun = 63;
constexpr int kShortestLongRun = 2 + kLongZerocodeRun - kShortZerocodeRun;

inline int huf_length(uint64_t code) { return static_cast<int>(code & 63); }
inline uint64_t huf_code(uint64_t code) { return code >> 6; }

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t c = 0;
  int lc = 0;
  uint64_t get_bits(int n) {
    while (lc < n) {
      c = (c << 8) | (p < end ? *p++ : 0);
      lc += 8;
    }
    lc -= n;
    return (c >> lc) & ((1ULL << n) - 1);
  }
};

// 6-bit-packed canonical code-length table -> per-symbol (code<<6)|length.
// *consumed reports the bytes the bit reader advanced over: the bitstream
// begins at the next byte (the reference reader ignores the stored
// tableLength field and does exactly this).
int huf_unpack_enc_table(const uint8_t* table, size_t table_len, int im,
                         int iM, std::vector<uint64_t>* hcode,
                         size_t* consumed) {
  hcode->assign(kHufEncSize, 0);
  BitReader br{table, table + table_len};
  for (; im <= iM; im++) {
    uint64_t l = (*hcode)[im] = br.get_bits(6);
    if (l == kLongZerocodeRun) {
      int zerun = static_cast<int>(br.get_bits(8)) + kShortestLongRun;
      if (im + zerun > iM + 1) return fail("PIZ: bad long zero run");
      while (zerun--) (*hcode)[im++] = 0;
      im--;
    } else if (l >= kShortZerocodeRun) {
      int zerun = static_cast<int>(l) - kShortZerocodeRun + 2;
      if (im + zerun > iM + 1) return fail("PIZ: bad short zero run");
      while (zerun--) (*hcode)[im++] = 0;
      im--;
    }
  }
  if (br.p > br.end) return fail("PIZ: truncated code table");
  *consumed = static_cast<size_t>(br.p - table);
  // canonical code assignment (lengths -> numerically increasing codes)
  uint64_t n[59] = {0};
  for (int i = 0; i < kHufEncSize; ++i) n[(*hcode)[i] & 63] += 1;
  uint64_t c = 0;
  for (int i = 58; i > 0; --i) {
    uint64_t nc = (c + n[i]) >> 1;
    n[i] = c;
    c = nc;
  }
  for (int i = 0; i < kHufEncSize; ++i) {
    int l = static_cast<int>((*hcode)[i]);
    if (l > 0) (*hcode)[i] = static_cast<uint64_t>(l) | (n[l]++ << 6);
  }
  return 0;
}

struct HufDecSlot {
  int len = 0;              // code length if a short (<= kHufDecBits) code
  int lit = 0;              // symbol for short codes
  std::vector<int> longs;   // candidate symbols for long codes
};

int huf_build_dec_table(const std::vector<uint64_t>& hcode, int im, int iM,
                        std::vector<HufDecSlot>* hdecod) {
  hdecod->assign(kHufDecSize, HufDecSlot{});
  for (; im <= iM; im++) {
    uint64_t c = huf_code(hcode[im]);
    int l = huf_length(hcode[im]);
    if (l == 0) continue;
    if (c >> l) return fail("PIZ: invalid table entry");
    if (l > kHufDecBits) {
      HufDecSlot& pl = (*hdecod)[c >> (l - kHufDecBits)];
      if (pl.len) return fail("PIZ: invalid table entry (long under short)");
      pl.longs.push_back(im);
    } else {
      HufDecSlot* pl = hdecod->data() + (c << (kHufDecBits - l));
      for (uint64_t i = 1ULL << (kHufDecBits - l); i > 0; i--, pl++) {
        if (pl->len || !pl->longs.empty())
          return fail("PIZ: invalid table entry (overlap)");
        pl->len = l;
        pl->lit = im;
      }
    }
  }
  return 0;
}

// Emit one decoded symbol; symbol == rlc repeats the previous output.
inline int huf_emit(int symbol, int rlc, uint64_t& c, int& lc,
                    const uint8_t*& in, const uint8_t* ie, uint16_t*& out,
                    uint16_t* outb, uint16_t* oe) {
  if (symbol == rlc) {
    if (lc < 8) {
      if (in >= ie) return fail("PIZ: truncated run length");
      c = (c << 8) | *in++;
      lc += 8;
    }
    lc -= 8;
    int cs = static_cast<int>((c >> lc) & 0xff);
    if (out + cs > oe) return fail("PIZ: run overrun");
    if (out == outb) return fail("PIZ: run with no previous symbol");
    uint16_t s = out[-1];
    while (cs-- > 0) *out++ = s;
  } else if (out < oe) {
    *out++ = static_cast<uint16_t>(symbol);
  } else {
    return fail("PIZ: output overrun");
  }
  return 0;
}

int huf_decode(const std::vector<uint64_t>& hcode,
               const std::vector<HufDecSlot>& hdecod, const uint8_t* in,
               int64_t ni_bits, int rlc, size_t n_out, uint16_t* out) {
  uint64_t c = 0;
  int lc = 0;
  uint16_t* outb = out;
  uint16_t* oe = out + n_out;
  const uint8_t* ie = in + (ni_bits + 7) / 8;

  while (in < ie) {
    c = (c << 8) | *in++;
    lc += 8;
    while (lc >= kHufDecBits) {
      const HufDecSlot& pl = hdecod[(c >> (lc - kHufDecBits)) & kHufDecMask];
      if (pl.len) {
        lc -= pl.len;
        if (huf_emit(pl.lit, rlc, c, lc, in, ie, out, outb, oe) != 0)
          return -1;
      } else {
        if (pl.longs.empty()) return fail("PIZ: invalid code");
        size_t j = 0;
        for (; j < pl.longs.size(); j++) {
          int l = huf_length(hcode[pl.longs[j]]);
          while (lc < l && in < ie) {
            c = (c << 8) | *in++;
            lc += 8;
          }
          if (lc >= l &&
              huf_code(hcode[pl.longs[j]]) ==
                  ((c >> (lc - l)) & ((1ULL << l) - 1))) {
            lc -= l;
            if (huf_emit(pl.longs[j], rlc, c, lc, in, ie, out, outb, oe) != 0)
              return -1;
            break;
          }
        }
        if (j == pl.longs.size()) return fail("PIZ: unmatched long code");
      }
    }
  }

  int i = static_cast<int>((8 - ni_bits) & 7);
  c >>= i;
  lc -= i;
  while (lc > 0) {
    const HufDecSlot& pl = hdecod[(c << (kHufDecBits - lc)) & kHufDecMask];
    if (!pl.len) return fail("PIZ: invalid trailing code");
    lc -= pl.len;
    if (huf_emit(pl.lit, rlc, c, lc, in, ie, out, outb, oe) != 0) return -1;
  }

  if (out - outb != static_cast<ptrdiff_t>(n_out))
    return fail("PIZ: decoded symbol count mismatch");
  return 0;
}

int huf_uncompress(const uint8_t* data, size_t n, uint16_t* raw,
                   size_t n_raw) {
  if (n == 0) return n_raw == 0 ? 0 : fail("PIZ: empty huf data");
  if (n < 20) return fail("PIZ: truncated huf header");
  uint32_t im, iM, nbits;
  std::memcpy(&im, data, 4);
  std::memcpy(&iM, data + 4, 4);
  std::memcpy(&nbits, data + 12, 4);  // data+8 = packed table length (unused)
  if (im >= kHufEncSize || iM >= kHufEncSize || im > iM)
    return fail("PIZ: bad huf symbol range");
  const uint8_t* table = data + 20;
  std::vector<uint64_t> hcode;
  size_t table_consumed = 0;
  if (huf_unpack_enc_table(table, n - 20, static_cast<int>(im),
                           static_cast<int>(iM), &hcode,
                           &table_consumed) != 0)
    return -1;
  const uint8_t* bits = table + table_consumed;
  if (nbits > 8 * (n - 20 - table_consumed))
    return fail("PIZ: bitstream overruns chunk");
  std::vector<HufDecSlot> hdecod;
  if (huf_build_dec_table(hcode, static_cast<int>(im), static_cast<int>(iM),
                          &hdecod) != 0)
    return -1;
  return huf_decode(hcode, hdecod, bits, nbits, static_cast<int>(iM), n_raw,
                    raw);
}

inline void wdec14(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  int16_t ls = static_cast<int16_t>(l);
  int16_t hs = static_cast<int16_t>(h);
  int hi = hs;
  int ai = ls + (hi & 1) + (hi >> 1);
  int16_t as = static_cast<int16_t>(ai);
  int16_t bs = static_cast<int16_t>(ai - hi);
  a = static_cast<uint16_t>(as);
  b = static_cast<uint16_t>(bs);
}

inline void wdec16(uint16_t l, uint16_t h, uint16_t& a, uint16_t& b) {
  constexpr int kMod = (1 << 16) - 1;
  constexpr int kAOff = 1 << 15;
  int m = l;
  int d = h;
  int bb = (m - (d >> 1)) & kMod;
  int aa = (d + bb - kAOff) & kMod;
  b = static_cast<uint16_t>(bb);
  a = static_cast<uint16_t>(aa);
}

void wav2_decode(uint16_t* in, int nx, int ox, int ny, int oy, uint16_t mx) {
  bool w14 = mx < (1 << 14);
  int n = (nx > ny) ? ny : nx;
  int p = 1;
  while (p <= n) p <<= 1;
  p >>= 1;
  int p2 = p;
  p >>= 1;

  while (p >= 1) {
    uint16_t* py = in;
    uint16_t* ey = in + static_cast<ptrdiff_t>(oy) * (ny - p2);
    int oy1 = oy * p, oy2 = oy * p2;
    int ox1 = ox * p, ox2 = ox * p2;
    uint16_t i00, i01, i10, i11;

    for (; py <= ey; py += oy2) {
      uint16_t* px = py;
      uint16_t* ex = py + static_cast<ptrdiff_t>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        uint16_t* p10 = px + oy1;
        uint16_t* p11 = p10 + ox1;
        if (w14) {
          wdec14(*px, *p10, i00, i10);
          wdec14(*p01, *p11, i01, i11);
          wdec14(i00, i01, *px, *p01);
          wdec14(i10, i11, *p10, *p11);
        } else {
          wdec16(*px, *p10, i00, i10);
          wdec16(*p01, *p11, i01, i11);
          wdec16(i00, i01, *px, *p01);
          wdec16(i10, i11, *p10, *p11);
        }
      }
      if (nx & p) {
        uint16_t* p10 = px + oy1;
        if (w14)
          wdec14(*px, *p10, i00, *p10);
        else
          wdec16(*px, *p10, i00, *p10);
        *px = i00;
      }
    }

    if (ny & p) {
      uint16_t* px = py;
      uint16_t* ex = py + static_cast<ptrdiff_t>(ox) * (nx - p2);
      for (; px <= ex; px += ox2) {
        uint16_t* p01 = px + ox1;
        if (w14)
          wdec14(*px, *p01, i00, *p01);
        else
          wdec16(*px, *p01, i00, *p01);
        *px = i00;
      }
    }

    p2 = p;
    p >>= 1;
  }
}

int piz_uncompress(const ExrHeader& hdr, const uint8_t* data, size_t comp_size,
                   int lines, size_t raw_size, std::vector<uint8_t>* out) {
  const int width = hdr.width();
  if (comp_size < 4) return fail("PIZ: truncated chunk");
  uint16_t min_nz, max_nz;
  std::memcpy(&min_nz, data, 2);
  std::memcpy(&max_nz, data + 2, 2);
  size_t pos = 4;
  std::vector<uint8_t> bitmap(kBitmapSize, 0);
  if (max_nz >= kBitmapSize) return fail("PIZ: bitmap range out of bounds");
  if (min_nz <= max_nz) {
    size_t nbytes = static_cast<size_t>(max_nz) - min_nz + 1;
    if (pos + nbytes > comp_size) return fail("PIZ: truncated bitmap");
    std::memcpy(bitmap.data() + min_nz, data + pos, nbytes);
    pos += nbytes;
  }

  // reverse LUT: compressed index -> original value
  std::vector<uint16_t> lut(kUshortRange, 0);
  int k = 0;
  for (int i = 0; i < kUshortRange; ++i)
    if (i == 0 || (bitmap[i >> 3] & (1 << (i & 7))))
      lut[k++] = static_cast<uint16_t>(i);
  uint16_t max_value = static_cast<uint16_t>(k - 1);

  if (pos + 4 > comp_size) return fail("PIZ: truncated huf length");
  int32_t huf_len;
  std::memcpy(&huf_len, data + pos, 4);
  pos += 4;
  if (huf_len < 0 || pos + static_cast<size_t>(huf_len) > comp_size)
    return fail("PIZ: huf data overruns chunk");

  size_t n_ushorts = raw_size / 2;
  std::vector<uint16_t> tmp(n_ushorts);
  if (huf_uncompress(data + pos, static_cast<size_t>(huf_len), tmp.data(),
                     n_ushorts) != 0)
    return -1;

  // per-channel, per-16-bit-component wavelet decode (FLOAT/UINT channels
  // travel as 2 interleaved ushort planes)
  size_t start = 0;
  for (const auto& ch : hdr.channels) {
    int size = static_cast<int>(ch.byte_size() / 2);
    for (int j = 0; j < size; ++j)
      wav2_decode(tmp.data() + start + j, width, size, lines, width * size,
                  max_value);
    start += static_cast<size_t>(width) * lines * size;
  }
  if (start != n_ushorts) return fail("PIZ: channel size mismatch");

  for (size_t i = 0; i < n_ushorts; ++i) tmp[i] = lut[tmp[i]];

  // interleave channel-major planes back to scanline order
  out->resize(raw_size);
  uint8_t* dst = out->data();
  std::vector<size_t> cursor(hdr.channels.size());
  size_t base = 0;
  for (size_t c = 0; c < hdr.channels.size(); ++c) {
    cursor[c] = base;
    base += static_cast<size_t>(width) * lines *
            (hdr.channels[c].byte_size() / 2);
  }
  for (int line = 0; line < lines; ++line) {
    for (size_t c = 0; c < hdr.channels.size(); ++c) {
      size_t n = static_cast<size_t>(width) * (hdr.channels[c].byte_size() / 2);
      std::memcpy(dst, tmp.data() + cursor[c], n * 2);
      dst += n * 2;
      cursor[c] += n;
    }
  }
  return 0;
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
                 size_t raw_size, int lines, std::vector<uint8_t>* out) {
  out->clear();
  if (comp_size == raw_size || hdr.compression == 0) {
    // Stored uncompressed (writers fall back when compression doesn't help).
    out->assign(data, data + comp_size);
    return 0;
  }
  if (hdr.compression == 4)  // PIZ
    return piz_uncompress(hdr, data, comp_size, lines, raw_size, out);
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
                " (only NONE/RLE/ZIPS/ZIP/PIZ); re-encode the file with ZIP "
                "(e.g. 'oiiotool in.exr --compression zip -o out.exr'; "
                "Unreal's EXR dumps default to ZIP)");

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
                     lines, &block) != 0)
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
