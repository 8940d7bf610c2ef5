// Native PLY vertex reader for the pose3d_tpu host input pipeline.
//
// Replaces the reference's pymesh2 C++ dependency (used only for
// pymesh.load_mesh(path).vertices, reference auxiliary/dataset.py:130).
// Supports ascii 1.0 and binary_little_endian 1.0 vertex elements whose
// properties include float/double x, y, z.
//
// Exposed via a tiny C ABI consumed through ctypes (pose3d_tpu/data/ply.py).
// Build: make -C native  (produces libply_reader.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Prop {
  int size;      // bytes
  bool is_float; // float32
  bool is_double;
};

int prop_size(const std::string &t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

} // namespace

extern "C" {

// Returns a malloc'd row-major (n, 3) float array; *out_n receives n.
// Returns nullptr on any parse failure (caller falls back to numpy parser).
float *ply_read_vertices(const char *path, long *out_n) {
  *out_n = 0;
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;

  char line[4096];
  if (!std::fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3) != 0) {
    std::fclose(f);
    return nullptr;
  }

  bool binary = false, ascii = false;
  long n_vertices = 0;
  std::vector<Prop> props;
  std::vector<std::string> names;
  std::string current_element;

  while (std::fgets(line, sizeof line, f)) {
    char a[128] = {0}, b[128] = {0}, c[128] = {0};
    long num = 0;
    if (std::sscanf(line, "%127s", a) != 1) continue;
    if (std::strcmp(a, "format") == 0) {
      std::sscanf(line, "%*s %127s", b);
      if (std::strcmp(b, "binary_little_endian") == 0) binary = true;
      else if (std::strcmp(b, "ascii") == 0) ascii = true;
      else { std::fclose(f); return nullptr; }
    } else if (std::strcmp(a, "element") == 0) {
      std::sscanf(line, "%*s %127s %ld", b, &num);
      current_element = b;
      if (current_element == "vertex") n_vertices = num;
    } else if (std::strcmp(a, "property") == 0 && current_element == "vertex") {
      std::sscanf(line, "%*s %127s %127s", b, c);
      if (std::strcmp(b, "list") == 0) { std::fclose(f); return nullptr; }
      Prop p;
      p.size = prop_size(b);
      p.is_float = (std::strcmp(b, "float") == 0 || std::strcmp(b, "float32") == 0);
      p.is_double = (std::strcmp(b, "double") == 0 || std::strcmp(b, "float64") == 0);
      if (p.size < 0) { std::fclose(f); return nullptr; }
      props.push_back(p);
      names.push_back(c);
    } else if (std::strcmp(a, "end_header") == 0) {
      break;
    }
  }

  int xi = -1, yi = -1, zi = -1;
  for (size_t i = 0; i < names.size(); ++i) {
    if (names[i] == "x") xi = (int)i;
    else if (names[i] == "y") yi = (int)i;
    else if (names[i] == "z") zi = (int)i;
  }
  if (n_vertices <= 0 || xi < 0 || yi < 0 || zi < 0 || (!binary && !ascii)) {
    std::fclose(f);
    return nullptr;
  }

  float *out = (float *)std::malloc(sizeof(float) * 3 * (size_t)n_vertices);
  if (!out) { std::fclose(f); return nullptr; }

  if (ascii) {
    std::vector<double> vals(names.size());
    for (long i = 0; i < n_vertices; ++i) {
      for (size_t j = 0; j < names.size(); ++j) {
        if (std::fscanf(f, "%lf", &vals[j]) != 1) {
          std::free(out); std::fclose(f); return nullptr;
        }
      }
      out[3 * i + 0] = (float)vals[xi];
      out[3 * i + 1] = (float)vals[yi];
      out[3 * i + 2] = (float)vals[zi];
    }
  } else {
    long row_size = 0;
    std::vector<long> offsets(props.size());
    for (size_t j = 0; j < props.size(); ++j) {
      offsets[j] = row_size;
      row_size += props[j].size;
    }
    std::vector<unsigned char> rows((size_t)row_size * (size_t)n_vertices);
    if (std::fread(rows.data(), 1, rows.size(), f) != rows.size()) {
      std::free(out); std::fclose(f); return nullptr;
    }
    auto read_val = [&](long row, int prop_idx) -> float {
      const unsigned char *p = rows.data() + (size_t)row * row_size + offsets[prop_idx];
      if (props[prop_idx].is_float) { float v; std::memcpy(&v, p, 4); return v; }
      if (props[prop_idx].is_double) { double v; std::memcpy(&v, p, 8); return (float)v; }
      // integer property promoted (rare for coordinates)
      long iv = 0; std::memcpy(&iv, p, props[prop_idx].size); return (float)iv;
    };
    for (long i = 0; i < n_vertices; ++i) {
      out[3 * i + 0] = read_val(i, xi);
      out[3 * i + 1] = read_val(i, yi);
      out[3 * i + 2] = read_val(i, zi);
    }
  }

  std::fclose(f);
  *out_n = n_vertices;
  return out;
}

void ply_free(float *ptr) { std::free(ptr); }

} // extern "C"
