// Raw little-endian float32 tensor-buffer interop with the Unreal plugin.
//
// The reference reads these with struct.unpack per file
// (/root/reference/realtime_style_transfer/dataloaders/tensorbuffer.py:8-16);
// here it is a native memcpy path (plus a writer used by the engine-interop
// export tools), exposed through the same shared library as the EXR decoder.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

namespace {
thread_local std::string g_tb_error;
}

extern "C" {

const char* tensorbuffer_last_error() { return g_tb_error.c_str(); }

// Returns the number of float32 elements in the file, or -1.
long tensorbuffer_num_elements(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_tb_error = std::string("cannot open ") + path;
    return -1;
  }
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fclose(f);
  if (bytes < 0 || bytes % 4 != 0) {
    g_tb_error = "file size is not a multiple of 4 bytes";
    return -1;
  }
  return bytes / 4;
}

int tensorbuffer_read(const char* path, float* out, long num_elements) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_tb_error = std::string("cannot open ") + path;
    return -1;
  }
  size_t got = std::fread(out, sizeof(float), num_elements, f);
  std::fclose(f);
  if (got != static_cast<size_t>(num_elements)) {
    g_tb_error = "short read";
    return -1;
  }
  return 0;
}

int tensorbuffer_write(const char* path, const float* data, long num_elements) {
  FILE* f = std::fopen(path, "wb");
  if (!f) {
    g_tb_error = std::string("cannot open for write ") + path;
    return -1;
  }
  size_t put = std::fwrite(data, sizeof(float), num_elements, f);
  std::fclose(f);
  if (put != static_cast<size_t>(num_elements)) {
    g_tb_error = "short write";
    return -1;
  }
  return 0;
}

}  // extern "C"
