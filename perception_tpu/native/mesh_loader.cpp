// Native mesh loading + decimation for the model bank.
//
// C++ replacement for the reference's assimp-based loader
// (cuda_renderer/src/model.cpp LoadModel + recursive_render flattening) and
// the host-side preprocessing feeding the triangle arrays. The Python
// fallback in core/mesh.py parses binary PLY faces row-by-row, which is
// prohibitively slow on real YCB meshes (~100-250k faces); this loader
// streams the buffer once.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: make -C perception_tpu/native   (produces libperception_mesh.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Mesh {
  std::vector<double> verts;     // 3 * n_verts
  std::vector<int64_t> faces;    // 3 * n_faces (fan-triangulated)
  std::vector<uint8_t> colors;   // 3 * n_verts or empty
};

struct PlyProp {
  std::string name;
  int size = 0;        // bytes (scalar)
  bool is_list = false;
  int count_size = 0;  // bytes of list count
  int item_size = 0;   // bytes of list item
  bool item_float = false;
  bool is_float = false;
};

struct PlyElement {
  std::string name;
  long count = 0;
  std::vector<PlyProp> props;
};

int type_size(const std::string &t, bool *is_float) {
  *is_float = false;
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16") return 2;
  if (t == "int" || t == "int32" || t == "uint" || t == "uint32") return 4;
  if (t == "float" || t == "float32") { *is_float = true; return 4; }
  if (t == "double" || t == "float64") { *is_float = true; return 8; }
  return 0;
}

double read_scalar(const uint8_t *p, int size, bool is_float) {
  if (is_float) {
    if (size == 4) { float v; memcpy(&v, p, 4); return v; }
    double v; memcpy(&v, p, 8); return v;
  }
  // Unsigned interpretation is fine for counts/indices/colors in practice;
  // signed small ints don't appear in mesh data we consume. Counts must be
  // unsigned: a corrupt 4-byte count read as signed int32 would go negative
  // and walk the cursor backwards past the truncation checks.
  switch (size) {
    case 1: return *p;
    case 2: { uint16_t v; memcpy(&v, p, 2); return v; }
    case 4: { uint32_t v; memcpy(&v, p, 4); return v; }
  }
  return 0;
}

bool parse_ply(const std::string &path, Mesh *out, std::string *err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { *err = "cannot open " + path; return false; }
  std::string data((std::istreambuf_iterator<char>(f)),
                   std::istreambuf_iterator<char>());

  size_t hdr_end = data.find("end_header");
  if (hdr_end == std::string::npos) { *err = "no end_header"; return false; }
  hdr_end = data.find('\n', hdr_end) + 1;

  std::istringstream header(data.substr(0, hdr_end));
  std::string line, format;
  std::vector<PlyElement> elements;
  while (std::getline(header, line)) {
    std::istringstream ls(line);
    std::string tok;
    ls >> tok;
    if (tok == "format") {
      ls >> format;
    } else if (tok == "element") {
      PlyElement e;
      ls >> e.name >> e.count;
      elements.push_back(e);
    } else if (tok == "property" && !elements.empty()) {
      PlyProp p;
      std::string t1;
      ls >> t1;
      if (t1 == "list") {
        std::string ct, it;
        ls >> ct >> it >> p.name;
        p.is_list = true;
        bool dummy;
        p.count_size = type_size(ct, &dummy);
        p.item_size = type_size(it, &p.item_float);
      } else {
        ls >> p.name;
        p.size = type_size(t1, &p.is_float);
      }
      elements.back().props.push_back(p);
    }
  }

  bool binary = format == "binary_little_endian";
  if (!binary && format != "ascii") { *err = "unsupported format " + format; return false; }

  const uint8_t *ptr = reinterpret_cast<const uint8_t *>(data.data()) + hdr_end;
  const uint8_t *end = reinterpret_cast<const uint8_t *>(data.data()) + data.size();
  std::istringstream body;
  if (!binary) body.str(data.substr(hdr_end));

  for (const auto &e : elements) {
    bool is_vertex = e.name == "vertex";
    bool is_face = e.name == "face";
    int xi = -1, yi = -1, zi = -1, ri = -1, gi = -1, bi = -1;
    for (size_t i = 0; i < e.props.size(); ++i) {
      const auto &n = e.props[i].name;
      if (n == "x") xi = i; else if (n == "y") yi = i; else if (n == "z") zi = i;
      else if (n == "red") ri = i; else if (n == "green") gi = i;
      else if (n == "blue") bi = i;
    }
    bool has_color = ri >= 0 && gi >= 0 && bi >= 0;
    if (is_vertex) {
      if (xi < 0 || yi < 0 || zi < 0) {
        *err = "vertex element missing x/y/z properties";
        return false;
      }
      out->verts.reserve(3 * e.count);
      if (has_color) out->colors.reserve(3 * e.count);
    }

    std::vector<double> row(e.props.size());
    std::vector<long> list_vals;
    for (long r = 0; r < e.count; ++r) {
      list_vals.clear();
      if (binary) {
        for (size_t i = 0; i < e.props.size(); ++i) {
          const auto &p = e.props[i];
          if (p.is_list) {
            if (ptr + p.count_size > end) { *err = "truncated"; return false; }
            long n = (long)read_scalar(ptr, p.count_size, false);
            ptr += p.count_size;
            // Reject corrupt counts before advancing the cursor: compare as
            // sizes (a huge n could overflow the pointer arithmetic).
            if (n < 0 || (size_t)n > (size_t)(end - ptr) / (size_t)p.item_size) {
              *err = "corrupt list count";
              return false;
            }
            for (long k = 0; k < n; ++k) {
              list_vals.push_back(
                  (long)read_scalar(ptr + k * p.item_size, p.item_size,
                                    p.item_float));
            }
            ptr += n * p.item_size;
          } else {
            if (ptr + p.size > end) { *err = "truncated"; return false; }
            row[i] = read_scalar(ptr, p.size, p.is_float);
            ptr += p.size;
          }
        }
      } else {
        std::string ln;
        do {
          if (!std::getline(body, ln)) { *err = "truncated ascii"; return false; }
        } while (ln.find_first_not_of(" \t\r") == std::string::npos);
        std::istringstream ls(ln);
        for (size_t i = 0; i < e.props.size(); ++i) {
          const auto &p = e.props[i];
          if (p.is_list) {
            long n; ls >> n;
            for (long k = 0; k < n; ++k) {
              long v; ls >> v;
              list_vals.push_back(v);
            }
          } else {
            ls >> row[i];
          }
        }
      }
      if (is_vertex) {
        out->verts.push_back(row[xi]);
        out->verts.push_back(row[yi]);
        out->verts.push_back(row[zi]);
        if (has_color) {
          out->colors.push_back((uint8_t)row[ri]);
          out->colors.push_back((uint8_t)row[gi]);
          out->colors.push_back((uint8_t)row[bi]);
        }
      } else if (is_face && list_vals.size() >= 3) {
        long n_verts_so_far = (long)(out->verts.size() / 3);
        for (long v : list_vals) {
          if (v < 0 || v >= n_verts_so_far) {
            *err = "face index out of range";
            return false;
          }
        }
        for (size_t k = 1; k + 1 < list_vals.size(); ++k) {  // fan
          out->faces.push_back(list_vals[0]);
          out->faces.push_back(list_vals[k]);
          out->faces.push_back(list_vals[k + 1]);
        }
      }
    }
  }
  return true;
}

bool parse_obj(const std::string &path, Mesh *out, std::string *err) {
  std::ifstream f(path);
  if (!f) { *err = "cannot open " + path; return false; }
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ls(line);
    std::string tok;
    ls >> tok;
    if (tok == "v") {
      double x, y, z;
      ls >> x >> y >> z;
      out->verts.insert(out->verts.end(), {x, y, z});
    } else if (tok == "f") {
      std::vector<long> idx;
      std::string v;
      while (ls >> v) {
        idx.push_back(strtol(v.c_str(), nullptr, 10) - 1);
      }
      for (size_t k = 1; k + 1 < idx.size(); ++k) {
        out->faces.insert(out->faces.end(), {idx[0], idx[k], idx[k + 1]});
      }
    }
  }
  return true;
}

// Vertex-clustering decimation matching core/mesh.py
// decimate_vertex_clustering (binary search on grid cells; cluster means;
// degenerate/duplicate face removal).
void decimate(const std::vector<double> &verts,
              const std::vector<int64_t> &faces,
              const std::vector<uint8_t> &colors, long target_faces,
              Mesh *out) {
  long n_faces = faces.size() / 3;
  long n_verts = verts.size() / 3;
  if (n_faces <= target_faces) {
    out->verts = verts;
    out->faces = faces;
    out->colors = colors;
    return;
  }
  double mn[3] = {1e30, 1e30, 1e30}, mx[3] = {-1e30, -1e30, -1e30};
  for (long i = 0; i < n_verts; ++i) {
    for (int d = 0; d < 3; ++d) {
      double v = verts[3 * i + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  }
  double extent = 0;
  for (int d = 0; d < 3; ++d) extent = std::max(extent, mx[d] - mn[d]);

  auto cluster = [&](long cells, Mesh *res) {
    double cell = extent / cells;
    std::map<std::tuple<long, long, long>, long> ids;
    std::vector<long> inverse(n_verts);
    for (long i = 0; i < n_verts; ++i) {
      std::tuple<long, long, long> key(
          (long)std::floor((verts[3 * i] - mn[0]) / cell),
          (long)std::floor((verts[3 * i + 1] - mn[1]) / cell),
          (long)std::floor((verts[3 * i + 2] - mn[2]) / cell));
      auto it = ids.find(key);
      if (it == ids.end()) it = ids.emplace(key, (long)ids.size()).first;
      inverse[i] = it->second;
    }
    long k = ids.size();
    std::vector<double> sums(3 * k, 0.0), csums(3 * k, 0.0);
    std::vector<long> counts(k, 0);
    bool has_color = !colors.empty();
    for (long i = 0; i < n_verts; ++i) {
      long c = inverse[i];
      counts[c]++;
      for (int d = 0; d < 3; ++d) {
        sums[3 * c + d] += verts[3 * i + d];
        if (has_color) csums[3 * c + d] += colors[3 * i + d];
      }
    }
    res->verts.assign(3 * k, 0.0);
    if (has_color) res->colors.assign(3 * k, 0);
    for (long c = 0; c < k; ++c) {
      for (int d = 0; d < 3; ++d) {
        res->verts[3 * c + d] = sums[3 * c + d] / counts[c];
        if (has_color)
          res->colors[3 * c + d] = (uint8_t)(csums[3 * c + d] / counts[c]);
      }
    }
    std::map<std::tuple<long, long, long>, bool> seen;
    res->faces.clear();
    for (long i = 0; i < n_faces; ++i) {
      long a = inverse[faces[3 * i]], b = inverse[faces[3 * i + 1]],
           c = inverse[faces[3 * i + 2]];
      if (a == b || b == c || a == c) continue;
      std::tuple<long, long, long> key(a, b, c);
      if (seen.count(key)) continue;
      seen[key] = true;
      res->faces.insert(res->faces.end(), {a, b, c});
    }
  };

  long lo = 2, hi = 512;
  Mesh best;
  bool have_best = false;
  while (lo <= hi) {
    long mid = (lo + hi) / 2;
    Mesh trial;
    cluster(mid, &trial);
    if ((long)trial.faces.size() / 3 <= target_faces) {
      best = std::move(trial);
      have_best = true;
      lo = mid + 1;
    } else {
      hi = mid - 1;
    }
  }
  if (!have_best) {
    cluster(2, &best);
    if ((long)best.faces.size() / 3 > target_faces)
      best.faces.resize(3 * target_faces);
  }
  *out = std::move(best);
}

std::string g_error;

}  // namespace

extern "C" {

// Loads a mesh, optionally decimates to <= target_faces (0 = no decimation).
// Returns 0 on success. Arrays are malloc'd; caller frees via pt_free.
int pt_load_mesh(const char *path, long target_faces,
                 double **verts, long *n_verts,
                 int64_t **faces, long *n_faces,
                 uint8_t **colors, int *has_colors) {
  Mesh mesh;
  std::string p(path);
  bool ok;
  if (p.size() > 4 && p.substr(p.size() - 4) == ".obj") {
    ok = parse_obj(p, &mesh, &g_error);
  } else {
    ok = parse_ply(p, &mesh, &g_error);
  }
  if (!ok) return 1;

  Mesh result;
  if (target_faces > 0) {
    decimate(mesh.verts, mesh.faces, mesh.colors, target_faces, &result);
  } else {
    result = std::move(mesh);
  }

  *n_verts = result.verts.size() / 3;
  *n_faces = result.faces.size() / 3;
  *verts = (double *)malloc(result.verts.size() * sizeof(double));
  memcpy(*verts, result.verts.data(), result.verts.size() * sizeof(double));
  *faces = (int64_t *)malloc(result.faces.size() * sizeof(int64_t));
  memcpy(*faces, result.faces.data(), result.faces.size() * sizeof(int64_t));
  *has_colors = result.colors.empty() ? 0 : 1;
  if (*has_colors) {
    *colors = (uint8_t *)malloc(result.colors.size());
    memcpy(*colors, result.colors.data(), result.colors.size());
  } else {
    *colors = nullptr;
  }
  return 0;
}

void pt_free(void *p) { free(p); }

const char *pt_last_error() { return g_error.c_str(); }

}  // extern "C"
