// Native latent-shard loader: safetensors parsing + padded batch assembly.
//
// TPU-native counterpart of the reference's torch DataLoader worker pool
// for VAE-latent shards (/root/reference/fit/data/in1k_latent_dataset.py:
// 44-69 __getitem__ + DataLoader num_workers). The hot host-side loop —
// open shard, parse the safetensors header, copy the chosen flip variant,
// zero-pad feature/grid/mask to target_len — runs here in C++ with a
// pthread pool, keeping Python entirely out of the per-sample path. Exposed
// through a C ABI consumed via ctypes (fitv2_tpu/data/native_loader.py).
//
// safetensors layout: 8-byte little-endian header length N, then N bytes of
// JSON mapping tensor name -> {"dtype", "shape", "data_offsets":[b,e]},
// then the raw buffer. We parse just that subset with a small scanner (no
// third-party JSON dependency).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <fstream>
#include <unordered_map>

namespace {

struct TensorInfo {
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;
};

// --- minimal JSON scanning for the safetensors header subset ------------

// Skips whitespace, returns next non-ws char index.
size_t SkipWs(const std::string& s, size_t i) {
  while (i < s.size() && (s[i] == ' ' || s[i] == '\n' || s[i] == '\t' ||
                          s[i] == '\r')) {
    ++i;
  }
  return i;
}

// Parses a JSON string starting at s[i] == '"'. Returns value, sets end.
std::string ParseString(const std::string& s, size_t i, size_t* end) {
  std::string out;
  ++i;  // opening quote
  while (i < s.size() && s[i] != '"') {
    if (s[i] == '\\' && i + 1 < s.size()) ++i;
    out.push_back(s[i++]);
  }
  *end = i + 1;
  return out;
}

// Skips a JSON value (string, number, array, object) starting at i.
size_t SkipValue(const std::string& s, size_t i) {
  i = SkipWs(s, i);
  if (s[i] == '"') {
    size_t e;
    ParseString(s, i, &e);
    return e;
  }
  if (s[i] == '[' || s[i] == '{') {
    char open = s[i], close = (open == '[') ? ']' : '}';
    int depth = 0;
    for (; i < s.size(); ++i) {
      if (s[i] == '"') {
        size_t e;
        ParseString(s, i, &e);
        i = e - 1;
      } else if (s[i] == open) {
        ++depth;
      } else if (s[i] == close) {
        if (--depth == 0) return i + 1;
      }
    }
    return i;
  }
  while (i < s.size() && s[i] != ',' && s[i] != '}' && s[i] != ']') ++i;
  return i;
}

std::vector<int64_t> ParseIntArray(const std::string& s, size_t i,
                                   size_t* end) {
  std::vector<int64_t> out;
  ++i;  // '['
  while (i < s.size() && s[i] != ']') {
    i = SkipWs(s, i);
    if (s[i] == ']') break;
    char* next = nullptr;
    out.push_back(std::strtoll(s.c_str() + i, &next, 10));
    i = next - s.c_str();
    i = SkipWs(s, i);
    if (s[i] == ',') ++i;
  }
  *end = i + 1;
  return out;
}

bool ParseHeader(const std::string& json,
                 std::unordered_map<std::string, TensorInfo>* out) {
  size_t i = SkipWs(json, 0);
  if (json[i] != '{') return false;
  ++i;
  while (true) {
    i = SkipWs(json, i);
    if (i >= json.size() || json[i] == '}') break;
    size_t e;
    std::string name = ParseString(json, i, &e);
    i = SkipWs(json, e);
    if (json[i] != ':') return false;
    i = SkipWs(json, i + 1);
    if (name == "__metadata__") {
      i = SkipValue(json, i);
    } else {
      if (json[i] != '{') return false;
      ++i;
      TensorInfo info;
      while (true) {
        i = SkipWs(json, i);
        if (json[i] == '}') {
          ++i;
          break;
        }
        std::string key = ParseString(json, i, &e);
        i = SkipWs(json, e);
        ++i;  // ':'
        i = SkipWs(json, i);
        if (key == "dtype") {
          info.dtype = ParseString(json, i, &e);
          i = e;
        } else if (key == "shape") {
          info.shape = ParseIntArray(json, i, &e);
          i = e;
        } else if (key == "data_offsets") {
          auto offs = ParseIntArray(json, i, &e);
          if (offs.size() == 2) {
            info.begin = offs[0];
            info.end = offs[1];
          }
          i = e;
        } else {
          i = SkipValue(json, i);
        }
        i = SkipWs(json, i);
        if (json[i] == ',') ++i;
      }
      (*out)[name] = info;
    }
    i = SkipWs(json, i);
    if (i < json.size() && json[i] == ',') ++i;
  }
  return true;
}

struct Shard {
  std::unordered_map<std::string, TensorInfo> tensors;
  std::vector<char> data;  // raw tensor buffer (after header)
};

bool LoadShard(const char* path, Shard* shard) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  uint64_t header_len = 0;
  f.read(reinterpret_cast<char*>(&header_len), 8);
  if (!f || header_len == 0 || header_len > (64u << 20)) return false;
  std::string json(header_len, '\0');
  f.read(&json[0], header_len);
  if (!f) return false;
  if (!ParseHeader(json, &shard->tensors)) return false;
  f.seekg(0, std::ios::end);
  uint64_t total = static_cast<uint64_t>(f.tellg());
  uint64_t payload = total - 8 - header_len;
  shard->data.resize(payload);
  f.seekg(8 + header_len, std::ios::beg);
  f.read(shard->data.data(), payload);
  return static_cast<bool>(f);
}

float LoadAsFloat(const char* src, const std::string& dtype, size_t idx) {
  if (dtype == "F32") {
    float v;
    std::memcpy(&v, src + idx * 4, 4);
    return v;
  }
  if (dtype == "F16") {
    uint16_t h;
    std::memcpy(&h, src + idx * 2, 2);
    uint32_t sign = (h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t man = h & 0x3ffu;
    uint32_t bits;
    if (exp == 0) {
      if (man == 0) {
        bits = sign;
      } else {  // subnormal
        exp = 1;
        while (!(man & 0x400u)) {
          man <<= 1;
          --exp;
        }
        man &= 0x3ffu;
        bits = sign | ((exp + 112) << 23) | (man << 13);
      }
    } else if (exp == 31) {
      bits = sign | 0x7f800000u | (man << 13);
    } else {
      bits = sign | ((exp + 112) << 23) | (man << 13);
    }
    float v;
    std::memcpy(&v, &bits, 4);
    return v;
  }
  if (dtype == "BF16") {
    uint16_t h;
    std::memcpy(&h, src + idx * 2, 2);
    uint32_t bits = static_cast<uint32_t>(h) << 16;
    float v;
    std::memcpy(&v, &bits, 4);
    return v;
  }
  if (dtype == "I32") {
    int32_t v;
    std::memcpy(&v, src + idx * 4, 4);
    return static_cast<float>(v);
  }
  if (dtype == "I64") {
    int64_t v;
    std::memcpy(&v, src + idx * 8, 8);
    return static_cast<float>(v);
  }
  return 0.0f;
}

int64_t LoadAsInt(const char* src, const std::string& dtype, size_t idx) {
  if (dtype == "I64") {
    int64_t v;
    std::memcpy(&v, src + idx * 8, 8);
    return v;
  }
  if (dtype == "I32") {
    int32_t v;
    std::memcpy(&v, src + idx * 4, 4);
    return v;
  }
  return static_cast<int64_t>(LoadAsFloat(src, dtype, idx));
}

size_t DtypeSize(const std::string& dtype) {
  if (dtype == "F32" || dtype == "I32") return 4;
  if (dtype == "F16" || dtype == "BF16") return 2;
  if (dtype == "I64" || dtype == "F64") return 8;
  return 0;  // unknown -> every range check fails
}

// True iff reading `count` elements starting at element `first` of tensor
// `info` stays inside both the tensor's recorded extent and the shard
// payload (defends against corrupt/truncated shards; OOB reads otherwise).
bool InRange(const Shard& shard, const TensorInfo& info, uint64_t first,
             uint64_t count) {
  size_t esz = DtypeSize(info.dtype);
  if (esz == 0) return false;
  if (info.begin > info.end || info.end > shard.data.size()) return false;
  uint64_t need = (first + count) * esz;
  return need <= info.end - info.begin;
}

// Assemble one padded sample into the batch slot (reference __getitem__
// semantics: flip pick, (h w c)->(N,c) flatten, zero pad to target_len).
bool AssembleOne(const char* path, int flip, int target_len, int channels,
                 float* feature, int32_t* grid, float* mask, int32_t* label,
                 int32_t* size2) {
  Shard shard;
  if (!LoadShard(path, &shard)) return false;
  auto feat_it = shard.tensors.find("feature");
  auto grid_it = shard.tensors.find("grid");
  auto size_it = shard.tensors.find("size");
  auto label_it = shard.tensors.find("label");
  if (feat_it == shard.tensors.end() || grid_it == shard.tensors.end() ||
      size_it == shard.tensors.end() || label_it == shard.tensors.end()) {
    return false;
  }
  const TensorInfo& fi = feat_it->second;
  if (fi.shape.size() != 4 || fi.shape[3] != channels) return false;
  int64_t h = fi.shape[1], w = fi.shape[2];
  int64_t n = h * w;
  if (n > target_len || n <= 0) return false;
  // the requested flip variant must exist in the (n_flips, h, w, c) stack
  if (fi.shape[0] <= (flip ? 1 : 0)) return false;

  uint64_t flip_offset = (flip ? 1ull : 0ull) * (n * channels);
  if (!InRange(shard, fi, flip_offset, static_cast<uint64_t>(n) * channels))
    return false;
  const char* fsrc = shard.data.data() + fi.begin;
  for (int64_t i = 0; i < n * channels; ++i) {
    feature[i] = LoadAsFloat(fsrc, fi.dtype, flip_offset + i);
  }
  std::memset(feature + n * channels, 0,
              (target_len - n) * channels * sizeof(float));

  const TensorInfo& gi = grid_it->second;
  int64_t gn = gi.shape.size() == 2 ? gi.shape[1] : n;
  // a pre-padded grid longer than target_len would overrun the caller's
  // (2, target_len) buffer — reject rather than clamp (shard is malformed)
  if (gn > target_len || gn < 0) return false;
  if (!InRange(shard, gi, 0, 2ull * gn)) return false;
  const char* gsrc = shard.data.data() + gi.begin;
  for (int64_t a = 0; a < 2; ++a) {
    for (int64_t i = 0; i < gn; ++i) {
      grid[a * target_len + i] =
          static_cast<int32_t>(LoadAsInt(gsrc, gi.dtype, a * gn + i));
    }
    std::memset(grid + a * target_len + gn, 0,
                (target_len - gn) * sizeof(int32_t));
  }

  for (int64_t i = 0; i < target_len; ++i) mask[i] = i < n ? 1.0f : 0.0f;

  const TensorInfo& si = size_it->second;
  if (!InRange(shard, si, 0, 2)) return false;
  const char* ssrc = shard.data.data() + si.begin;
  size2[0] = static_cast<int32_t>(LoadAsInt(ssrc, si.dtype, 0));
  size2[1] = static_cast<int32_t>(LoadAsInt(ssrc, si.dtype, 1));

  const TensorInfo& li = label_it->second;
  if (!InRange(shard, li, 0, 1)) return false;
  *label = static_cast<int32_t>(
      LoadAsInt(shard.data.data() + li.begin, li.dtype, 0));
  return true;
}

}  // namespace

extern "C" {

// Fills a padded batch from `count` shard paths using `num_threads`
// workers. Buffers are caller-allocated:
//   feature: count*target_len*channels f32; grid: count*2*target_len i32;
//   mask: count*target_len f32; label: count i32; size: count*2 i32.
// flips: per-sample 0/1. Returns number of successfully loaded samples.
int ll_load_batch(const char** paths, const int* flips, int count,
                  int target_len, int channels, int num_threads,
                  float* feature, int32_t* grid, float* mask, int32_t* label,
                  int32_t* size2) {
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= count) return;
      bool good = AssembleOne(
          paths[i], flips[i], target_len, channels,
          feature + static_cast<size_t>(i) * target_len * channels,
          grid + static_cast<size_t>(i) * 2 * target_len,
          mask + static_cast<size_t>(i) * target_len, label + i,
          size2 + static_cast<size_t>(i) * 2);
      if (good) ok.fetch_add(1);
    }
  };
  int nt = num_threads < 1 ? 1 : num_threads;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Single-tensor probe used by tests: reads tensor `name` dims into
// shape_out (max 8) and returns ndim, or -1 on failure.
int ll_tensor_ndim(const char* path, const char* name, int64_t* shape_out) {
  Shard shard;
  if (!LoadShard(path, &shard)) return -1;
  auto it = shard.tensors.find(name);
  if (it == shard.tensors.end()) return -1;
  int nd = static_cast<int>(it->second.shape.size());
  for (int i = 0; i < nd && i < 8; ++i) shape_out[i] = it->second.shape[i];
  return nd;
}

}  // extern "C"
