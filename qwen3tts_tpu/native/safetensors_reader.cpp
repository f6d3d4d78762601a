// Native checkpoint + audio runtime for the TPU Qwen3-TTS framework.
//
// The reference delegates its native layer to prebuilt MLX Metal kernels
// (SURVEY.md §2.3); our compute path is XLA/Pallas, and this C++ module
// covers the host-side runtime: a zero-copy mmap safetensors reader (model
// load is checkpoint-I/O bound) and a WAV encoder/decoder.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// safetensors layout: u64 header_len | header JSON | tensor data.
// Header JSON: {"name": {"dtype": "F32", "shape": [..], "data_offsets": [a,b]}, ...}

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

extern "C" void st_close(void* handle);

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;
};

struct File {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t data_start = 0;
  std::vector<TensorInfo> tensors;
  std::string error;
};

// --- minimal JSON scanner (sufficient for the safetensors header grammar) ---

struct Scanner {
  const char* p;
  const char* end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    return false;
  }
  char peek() {
    skip_ws();
    return p < end ? *p : '\0';
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { ok = false; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { p++; out.push_back(*p++); }
      else out.push_back(*p++);
    }
    if (p < end) p++;  // closing quote
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    char* next = nullptr;
    long long v = strtoll(p, &next, 10);
    if (next == p) ok = false;
    p = next;
    return (int64_t)v;
  }
  // skip any JSON value (used for __metadata__)
  void skip_value() {
    skip_ws();
    if (p >= end) { ok = false; return; }
    char c = *p;
    if (c == '"') { parse_string(); return; }
    if (c == '{') {
      p++;
      if (consume('}')) return;
      while (ok) {
        parse_string();
        if (!consume(':')) { ok = false; return; }
        skip_value();
        if (consume('}')) return;
        if (!consume(',')) { ok = false; return; }
      }
      return;
    }
    if (c == '[') {
      p++;
      if (consume(']')) return;
      while (ok) {
        skip_value();
        if (consume(']')) return;
        if (!consume(',')) { ok = false; return; }
      }
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
  }
};

bool parse_header(File* f, const char* json, size_t len) {
  Scanner s{json, json + len};
  if (!s.consume('{')) { f->error = "header: expected {"; return false; }
  if (s.consume('}')) return true;
  while (true) {
    TensorInfo t;
    t.name = s.parse_string();
    if (!s.ok || !s.consume(':')) { f->error = "header: bad key"; return false; }
    if (t.name == "__metadata__") {
      s.skip_value();
    } else {
      if (!s.consume('{')) { f->error = "header: expected tensor obj"; return false; }
      while (true) {
        std::string field = s.parse_string();
        if (!s.ok || !s.consume(':')) { f->error = "header: bad field"; return false; }
        if (field == "dtype") {
          t.dtype = s.parse_string();
        } else if (field == "shape") {
          if (!s.consume('[')) { f->error = "header: bad shape"; return false; }
          if (!s.consume(']')) {
            while (true) {
              t.shape.push_back(s.parse_int());
              if (s.consume(']')) break;
              if (!s.consume(',')) { f->error = "header: bad shape list"; return false; }
            }
          }
        } else if (field == "data_offsets") {
          if (!s.consume('[')) { f->error = "header: bad offsets"; return false; }
          t.begin = (uint64_t)s.parse_int();
          if (!s.consume(',')) { f->error = "header: bad offsets"; return false; }
          t.end = (uint64_t)s.parse_int();
          if (!s.consume(']')) { f->error = "header: bad offsets"; return false; }
        } else {
          s.skip_value();
        }
        if (s.consume('}')) break;
        if (!s.consume(',')) { f->error = "header: bad tensor obj"; return false; }
      }
      f->tensors.push_back(std::move(t));
    }
    if (s.consume('}')) break;
    if (!s.consume(',')) { f->error = "header: trailing garbage"; return false; }
  }
  return s.ok;
}

}  // namespace

extern "C" {

// Open + mmap + parse. Returns an opaque handle (nullptr on failure).
void* st_open(const char* path) {
  File* f = new File();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) { close(f->fd); delete f; return nullptr; }
  f->size = (size_t)st.st_size;
  f->base = (uint8_t*)mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (f->base == MAP_FAILED) { close(f->fd); delete f; return nullptr; }
  madvise(f->base, f->size, MADV_SEQUENTIAL);
  uint64_t header_len;
  memcpy(&header_len, f->base, 8);
  if (8 + header_len > f->size) { st_close(f); return nullptr; }
  f->data_start = 8 + header_len;
  if (!parse_header(f, (const char*)f->base + 8, header_len)) {
    fprintf(stderr, "safetensors parse error: %s\n", f->error.c_str());
    // fallthrough: caller sees 0 tensors and can fall back
  }
  return f;
}

int64_t st_num_tensors(void* handle) {
  return (int64_t)((File*)handle)->tensors.size();
}

const char* st_name(void* handle, int64_t i) {
  return ((File*)handle)->tensors[i].name.c_str();
}

const char* st_dtype(void* handle, int64_t i) {
  return ((File*)handle)->tensors[i].dtype.c_str();
}

int64_t st_ndim(void* handle, int64_t i) {
  return (int64_t)((File*)handle)->tensors[i].shape.size();
}

void st_shape(void* handle, int64_t i, int64_t* out) {
  const auto& s = ((File*)handle)->tensors[i].shape;
  for (size_t d = 0; d < s.size(); d++) out[d] = s[d];
}

// Pointer directly into the mapped file (zero copy) + byte length.
const uint8_t* st_data(void* handle, int64_t i, int64_t* nbytes) {
  File* f = (File*)handle;
  const TensorInfo& t = f->tensors[i];
  *nbytes = (int64_t)(t.end - t.begin);
  return f->base + f->data_start + t.begin;
}

void st_close(void* handle) {
  File* f = (File*)handle;
  if (f->base && f->base != MAP_FAILED) munmap(f->base, f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

// --------------------------------------------------------------------------
// WAV codec (16-bit PCM RIFF), float32 mono in [-1, 1]
// --------------------------------------------------------------------------

int wav_write(const char* path, const float* samples, int64_t n, int32_t rate) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  uint32_t data_len = (uint32_t)(n * 2);
  uint32_t riff_len = 36 + data_len;
  uint16_t fmt16[] = {1, 1};                       // PCM, mono
  uint32_t byte_rate = (uint32_t)rate * 2;
  uint16_t tail16[] = {2, 16};                     // block align, bits
  uint32_t fmt_size = 16;
  fwrite("RIFF", 1, 4, fp); fwrite(&riff_len, 4, 1, fp); fwrite("WAVE", 1, 4, fp);
  fwrite("fmt ", 1, 4, fp); fwrite(&fmt_size, 4, 1, fp);
  fwrite(fmt16, 2, 2, fp); fwrite(&rate, 4, 1, fp); fwrite(&byte_rate, 4, 1, fp);
  fwrite(tail16, 2, 2, fp);
  fwrite("data", 1, 4, fp); fwrite(&data_len, 4, 1, fp);
  std::vector<int16_t> buf(4096);
  int64_t done = 0;
  while (done < n) {
    int64_t chunk = std::min<int64_t>(4096, n - done);
    for (int64_t i = 0; i < chunk; i++) {
      float v = samples[done + i];
      if (v > 1.f) v = 1.f;
      if (v < -1.f) v = -1.f;
      buf[i] = (int16_t)(v * 32767.f);
    }
    fwrite(buf.data(), 2, (size_t)chunk, fp);
    done += chunk;
  }
  fclose(fp);
  return 0;
}

// Decode 16-bit PCM RIFF; returns sample count, fills rate. Caller provides
// the output buffer (query size first with out == nullptr).
int64_t wav_read(const char* path, float* out, int64_t capacity, int32_t* rate) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  char magic[4];
  uint32_t riff_len;
  if (fread(magic, 1, 4, fp) != 4 || memcmp(magic, "RIFF", 4) != 0) { fclose(fp); return -1; }
  fread(&riff_len, 4, 1, fp);
  fread(magic, 1, 4, fp);
  if (memcmp(magic, "WAVE", 4) != 0) { fclose(fp); return -1; }
  uint16_t channels = 1, bits = 16, fmt = 1;
  int64_t n = -1;
  while (fread(magic, 1, 4, fp) == 4) {
    uint32_t size;
    if (fread(&size, 4, 1, fp) != 1) break;
    if (memcmp(magic, "fmt ", 4) == 0) {
      uint8_t hdr[16];
      fread(hdr, 1, 16, fp);
      memcpy(&fmt, hdr, 2);
      memcpy(&channels, hdr + 2, 2);
      memcpy(rate, hdr + 4, 4);
      memcpy(&bits, hdr + 14, 2);
      if (size > 16) fseek(fp, size - 16, SEEK_CUR);
    } else if (memcmp(magic, "data", 4) == 0) {
      if (fmt != 1 || bits != 16 || channels == 0) { fclose(fp); return -1; }
      n = (int64_t)size / 2 / channels;
      if (out == nullptr) { fclose(fp); return n; }
      if (n > capacity) n = capacity;
      std::vector<int16_t> buf((size_t)channels * 4096);
      int64_t done = 0;
      while (done < n) {
        int64_t chunk = std::min<int64_t>(4096, n - done);
        if (fread(buf.data(), 2, (size_t)(chunk * channels), fp) !=
            (size_t)(chunk * channels)) break;
        for (int64_t i = 0; i < chunk; i++) {
          int32_t acc = 0;
          for (int c = 0; c < channels; c++) acc += buf[(size_t)(i * channels + c)];
          out[done + i] = (float)acc / channels / 32768.f;
        }
        done += chunk;
      }
      fclose(fp);
      return done;
    } else {
      fseek(fp, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(fp);
  return n;
}

}  // extern "C"
