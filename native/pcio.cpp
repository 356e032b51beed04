// pcio: native point-cloud file IO + host-side sampling for the data loader.
//
// The reference framework leans on native code for its input path (open3d's
// C++ pcd/ply readers + torch DataLoader worker processes); this library is
// the TPU framework's equivalent: a small C core doing the byte-level work
// (file parse, fixed-shape sampling) outside the GIL, driven from Python via
// ctypes (imgadapointr_tpu/datasets/native_io.py) with a pure-Python
// fallback.
//
// Exposed C ABI:
//   pcio_read_cloud(path, out, capacity) -> n_points (xyz interleaved f32)
//   pcio_sample(points, n, out, n_out, seed) -> random permutation sample
//       with zero-padding (== datasets.transforms.RandomSamplePoints)
//   pcio_load_batch(paths, batch, out, n_points, seed) -> parallel
//       read+sample of a whole batch into one contiguous buffer
//
// Supported formats: PCD v0.7 (ascii / binary), PLY (ascii /
// binary_little_endian), NPY (float32/float64, (N,3) or (N,>=3) C-order).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Field {
  std::string name;
  char type = 'F';
  int size = 4;
  int count = 1;
};

bool starts_with(const std::string& s, const char* p) {
  return s.rfind(p, 0) == 0;
}

float read_as_float(const char* ptr, char type, int size) {
  if (type == 'F' && size == 4) { float v; std::memcpy(&v, ptr, 4); return v; }
  if (type == 'F' && size == 8) { double v; std::memcpy(&v, ptr, 8); return (float)v; }
  if (type == 'I' && size == 4) { int32_t v; std::memcpy(&v, ptr, 4); return (float)v; }
  if (type == 'U' && size == 4) { uint32_t v; std::memcpy(&v, ptr, 4); return (float)v; }
  if (type == 'U' && size == 1) { return (float)*(const uint8_t*)ptr; }
  if (type == 'I' && size == 2) { int16_t v; std::memcpy(&v, ptr, 2); return (float)v; }
  if (type == 'U' && size == 2) { uint16_t v; std::memcpy(&v, ptr, 2); return (float)v; }
  return 0.0f;
}

int64_t read_pcd(std::ifstream& f, float* out, int64_t capacity) {
  std::string line;
  std::vector<Field> fields;
  int64_t n = 0;
  std::string data_kind;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    for (auto& c : key) c = (char)std::toupper(c);
    if (key == "FIELDS") {
      std::string name;
      while (ss >> name) fields.push_back({name});
    } else if (key == "SIZE") {
      for (auto& fd : fields) ss >> fd.size;
    } else if (key == "TYPE") {
      for (auto& fd : fields) { std::string t; ss >> t; fd.type = t[0]; }
    } else if (key == "COUNT") {
      for (auto& fd : fields) ss >> fd.count;
    } else if (key == "POINTS") {
      ss >> n;
    } else if (key == "WIDTH" && n == 0) {
      ss >> n;
    } else if (key == "DATA") {
      ss >> data_kind;
      break;
    }
  }
  if (fields.empty() || n <= 0) return -1;
  int xi = -1, yi = -1, zi = -1;
  std::vector<int> offsets(fields.size(), 0);
  int stride = 0;
  for (size_t i = 0; i < fields.size(); ++i) {
    offsets[i] = stride;
    stride += fields[i].size * fields[i].count;
    if (fields[i].name == "x") xi = (int)i;
    if (fields[i].name == "y") yi = (int)i;
    if (fields[i].name == "z") zi = (int)i;
  }
  if (xi < 0 || yi < 0 || zi < 0) return -1;
  n = std::min<int64_t>(n, capacity);

  if (data_kind == "ascii") {
    for (int64_t i = 0; i < n; ++i) {
      if (!std::getline(f, line)) return i;
      std::istringstream ss(line);
      std::vector<float> vals(fields.size());
      for (size_t j = 0; j < fields.size(); ++j) ss >> vals[j];
      out[i * 3 + 0] = vals[xi];
      out[i * 3 + 1] = vals[yi];
      out[i * 3 + 2] = vals[zi];
    }
    return n;
  }
  if (data_kind == "binary") {
    std::vector<char> buf((size_t)(stride * n));
    f.read(buf.data(), (std::streamsize)buf.size());
    const int64_t got = f.gcount() / stride;
    const int64_t m = std::min(n, got);
    for (int64_t i = 0; i < m; ++i) {
      const char* row = buf.data() + (size_t)i * stride;
      out[i * 3 + 0] = read_as_float(row + offsets[xi], fields[xi].type, fields[xi].size);
      out[i * 3 + 1] = read_as_float(row + offsets[yi], fields[yi].type, fields[yi].size);
      out[i * 3 + 2] = read_as_float(row + offsets[zi], fields[zi].type, fields[zi].size);
    }
    return m;
  }
  return -1;  // binary_compressed unsupported (PCN ships plain formats)
}

int type_size(const std::string& t) {
  if (t == "float" || t == "float32" || t == "int" || t == "int32" || t == "uint" || t == "uint32") return 4;
  if (t == "double" || t == "float64") return 8;
  if (t == "uchar" || t == "uint8" || t == "char" || t == "int8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  return 4;
}

int64_t read_ply(std::ifstream& f, float* out, int64_t capacity) {
  std::string line;
  std::getline(f, line);  // "ply"
  std::string fmt;
  int64_t n = 0;
  std::vector<std::pair<std::string, std::string>> props;  // (name, type)
  bool in_vertex = false;
  while (std::getline(f, line)) {
    if (starts_with(line, "format")) {
      std::istringstream ss(line);
      std::string k;
      ss >> k >> fmt;
    } else if (starts_with(line, "element vertex")) {
      std::istringstream ss(line);
      std::string a, b;
      ss >> a >> b >> n;
      in_vertex = true;
    } else if (starts_with(line, "element")) {
      in_vertex = false;
    } else if (starts_with(line, "property") && in_vertex) {
      std::istringstream ss(line);
      std::string k, t, name;
      ss >> k >> t >> name;
      props.emplace_back(name, t);
    } else if (starts_with(line, "end_header")) {
      break;
    }
  }
  if (n <= 0 || props.empty()) return -1;
  int xi = -1, yi = -1, zi = -1, stride = 0;
  std::vector<int> offsets(props.size());
  for (size_t i = 0; i < props.size(); ++i) {
    offsets[i] = stride;
    stride += type_size(props[i].second);
    if (props[i].first == "x") xi = (int)i;
    if (props[i].first == "y") yi = (int)i;
    if (props[i].first == "z") zi = (int)i;
  }
  if (xi < 0 || yi < 0 || zi < 0) return -1;
  n = std::min<int64_t>(n, capacity);

  if (fmt == "ascii") {
    for (int64_t i = 0; i < n; ++i) {
      if (!std::getline(f, line)) return i;
      std::istringstream ss(line);
      std::vector<float> vals(props.size());
      for (size_t j = 0; j < props.size(); ++j) ss >> vals[j];
      out[i * 3 + 0] = vals[xi];
      out[i * 3 + 1] = vals[yi];
      out[i * 3 + 2] = vals[zi];
    }
    return n;
  }
  if (fmt == "binary_little_endian") {
    std::vector<char> buf((size_t)stride * n);
    f.read(buf.data(), (std::streamsize)buf.size());
    const int64_t m = std::min<int64_t>(n, f.gcount() / stride);
    auto ts = [&](size_t j) { return type_size(props[j].second); };
    auto tc = [&](size_t j) {
      const std::string& t = props[j].second;
      if (t[0] == 'f' || t[0] == 'd') return 'F';
      if (t[0] == 'u') return 'U';
      return 'I';
    };
    for (int64_t i = 0; i < m; ++i) {
      const char* row = buf.data() + (size_t)i * stride;
      out[i * 3 + 0] = read_as_float(row + offsets[xi], tc(xi), ts(xi));
      out[i * 3 + 1] = read_as_float(row + offsets[yi], tc(yi), ts(yi));
      out[i * 3 + 2] = read_as_float(row + offsets[zi], tc(zi), ts(zi));
    }
    return m;
  }
  return -1;
}

int64_t read_npy(std::ifstream& f, float* out, int64_t capacity) {
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return -1;
  uint8_t ver[2];
  f.read((char*)ver, 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h;
    f.read((char*)&h, 2);
    hlen = h;
  } else {
    f.read((char*)&hlen, 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);
  const bool f8 = header.find("'<f8'") != std::string::npos ||
                  header.find("'float64'") != std::string::npos;
  const bool f4 = header.find("'<f4'") != std::string::npos;
  if (!f4 && !f8) return -1;
  if (header.find("'fortran_order': True") != std::string::npos) return -1;
  // shape: (N, C)
  auto sp = header.find("(");
  auto ep = header.find(")");
  if (sp == std::string::npos || ep == std::string::npos) return -1;
  std::string shape = header.substr(sp + 1, ep - sp - 1);
  int64_t rows = 0, cols = 0;
  std::replace(shape.begin(), shape.end(), ',', ' ');
  std::istringstream ss(shape);
  ss >> rows >> cols;
  if (cols < 3 || rows <= 0) return -1;
  rows = std::min<int64_t>(rows, capacity);
  const int esz = f8 ? 8 : 4;
  std::vector<char> buf((size_t)rows * cols * esz);
  f.read(buf.data(), (std::streamsize)buf.size());
  for (int64_t i = 0; i < rows; ++i) {
    for (int c = 0; c < 3; ++c) {
      const char* p = buf.data() + ((size_t)i * cols + c) * esz;
      out[i * 3 + c] = f8 ? (float)(*(const double*)p) : *(const float*)p;
    }
  }
  return rows;
}

}  // namespace

extern "C" {

// Returns the number of points written (xyz-interleaved f32), or -1 on error.
int64_t pcio_read_cloud(const char* path, float* out, int64_t capacity) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  const std::string p(path);
  auto dot = p.rfind('.');
  std::string ext = dot == std::string::npos ? "" : p.substr(dot);
  for (auto& c : ext) c = (char)std::tolower(c);
  if (ext == ".pcd") return read_pcd(f, out, capacity);
  if (ext == ".ply") return read_ply(f, out, capacity);
  if (ext == ".npy") return read_npy(f, out, capacity);
  return -1;
}

// Random permutation sample of n_out points, zero-padded when n < n_out
// (== datasets.transforms.RandomSamplePoints semantics).
void pcio_sample(const float* points, int64_t n, float* out, int64_t n_out,
                 uint64_t seed) {
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  std::mt19937_64 rng(seed);
  std::shuffle(perm.begin(), perm.end(), rng);
  const int64_t m = std::min(n, n_out);
  for (int64_t i = 0; i < m; ++i) {
    std::memcpy(out + i * 3, points + perm[i] * 3, 3 * sizeof(float));
  }
  for (int64_t i = m; i < n_out; ++i) {
    out[i * 3] = out[i * 3 + 1] = out[i * 3 + 2] = 0.0f;
  }
}

// Parallel batched read+sample: paths[batch] → out (batch, n_points, 3).
// Returns the number of files successfully read.
int64_t pcio_load_batch(const char** paths, int64_t batch, float* out,
                        int64_t n_points, uint64_t seed, int64_t raw_capacity) {
  std::vector<int64_t> ok(batch, 0);
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const int64_t workers = std::min<int64_t>(batch, hw);
  std::vector<std::thread> threads;
  for (int64_t w = 0; w < workers; ++w) {
    threads.emplace_back([&, w]() {
      std::vector<float> raw((size_t)raw_capacity * 3);
      for (int64_t i = w; i < batch; i += workers) {
        int64_t n = pcio_read_cloud(paths[i], raw.data(), raw_capacity);
        if (n <= 0) continue;
        pcio_sample(raw.data(), n, out + (size_t)i * n_points * 3, n_points,
                    seed + (uint64_t)i * 0x9E3779B97F4A7C15ull);
        ok[i] = 1;
      }
    });
  }
  for (auto& t : threads) t.join();
  int64_t total = 0;
  for (auto v : ok) total += v;
  return total;
}

}  // extern "C"
