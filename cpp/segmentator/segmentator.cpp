// Mesh oversegmentation CLI: Felzenszwalb-Huttenlocher graph segmentation over
// mesh connectivity with normal-based edge weights.
//
// Native replacement for the reference's offline tool
// (dataprocessing/oversegmentation/cpp/segmentator.cpp): same algorithm
// behavior (incremental vertex-normal blending, 1-dot(n1,n2) edge weights
// squared for convex transitions, k/|C| adaptive threshold merging, small-
// segment absorption) and the same CLI + JSON output contract
//   ./segmentator input.ply [kThresh=0.01] [segMinVerts=20] [outPrefix]
//   -> <outPrefix>/<scene>.<kThresh>.segs.json  {"params":...,"sceneId":...,
//      "segIndices":[...]}
// but implemented from scratch with a self-contained PLY/OBJ reader (no
// vendored tinyply/tinyobj).

#include <algorithm>
#include <array>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <numeric>
#include <sstream>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

struct Vec3 {
  float x = 0, y = 0, z = 0;
};

Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }

Vec3 crossn(const Vec3& u, const Vec3& v) {
  Vec3 c{u.y * v.z - u.z * v.y, u.z * v.x - u.x * v.z, u.x * v.y - u.y * v.x};
  float n = std::sqrt(c.x * c.x + c.y * c.y + c.z * c.z);
  if (n > 0) { c.x /= n; c.y /= n; c.z /= n; }
  return c;
}

Vec3 mix(const Vec3& a, const Vec3& b, float t) {
  float u = 1.0f - t;
  return {u * a.x + t * b.x, u * a.y + t * b.y, u * a.z + t * b.z};
}

struct Mesh {
  std::vector<Vec3> verts;
  std::vector<std::array<uint32_t, 3>> faces;
};

// ------------------------------------------------------------------ PLY read
size_t ply_type_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  throw std::runtime_error("unknown ply type " + t);
}

double read_scalar(const char* p, const std::string& t) {
  if (t == "float" || t == "float32") { float v; std::memcpy(&v, p, 4); return v; }
  if (t == "double" || t == "float64") { double v; std::memcpy(&v, p, 8); return v; }
  if (t == "char" || t == "int8") { int8_t v; std::memcpy(&v, p, 1); return v; }
  if (t == "uchar" || t == "uint8") { uint8_t v; std::memcpy(&v, p, 1); return v; }
  if (t == "short" || t == "int16") { int16_t v; std::memcpy(&v, p, 2); return v; }
  if (t == "ushort" || t == "uint16") { uint16_t v; std::memcpy(&v, p, 2); return v; }
  if (t == "int" || t == "int32") { int32_t v; std::memcpy(&v, p, 4); return v; }
  if (t == "uint" || t == "uint32") { uint32_t v; std::memcpy(&v, p, 4); return v; }
  throw std::runtime_error("unknown ply scalar type " + t);
}

Mesh read_ply(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string line;
  std::getline(f, line);
  if (line.rfind("ply", 0) != 0) throw std::runtime_error("not a PLY file");

  struct Prop { std::string name, type, count_type, item_type; bool is_list = false; };
  struct Elem { std::string name; size_t count = 0; std::vector<Prop> props; };
  std::vector<Elem> elems;
  bool binary = false, ascii = false;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string tok; ss >> tok;
    if (tok == "comment") continue;
    if (tok == "format") {
      std::string fmt; ss >> fmt;
      binary = fmt == "binary_little_endian";
      ascii = fmt == "ascii";
      if (!binary && !ascii) throw std::runtime_error("unsupported PLY format");
    } else if (tok == "element") {
      Elem e; ss >> e.name >> e.count; elems.push_back(e);
    } else if (tok == "property") {
      Prop p; std::string t; ss >> t;
      if (t == "list") { p.is_list = true; ss >> p.count_type >> p.item_type >> p.name; }
      else { p.type = t; ss >> p.name; }
      elems.back().props.push_back(p);
    } else if (tok == "end_header") break;
  }

  Mesh mesh;
  for (const auto& e : elems) {
    const bool is_vertex = e.name == "vertex";
    const bool is_face = e.name == "face";
    if (ascii) {
      for (size_t i = 0; i < e.count; i++) {
        std::getline(f, line);
        std::istringstream ss(line);
        if (is_vertex) {
          Vec3 v{}; double val;
          for (const auto& p : e.props) {
            ss >> val;
            if (p.name == "x") v.x = (float)val;
            else if (p.name == "y") v.y = (float)val;
            else if (p.name == "z") v.z = (float)val;
          }
          mesh.verts.push_back(v);
        } else if (is_face) {
          size_t n; ss >> n;
          std::vector<uint32_t> idx(n);
          for (auto& ix : idx) ss >> ix;
          for (size_t k = 2; k < n; k++)
            mesh.faces.push_back({idx[0], idx[k - 1], idx[k]});
        }
      }
    } else {
      // binary: fixed row size for non-list elements
      bool has_list = false;
      size_t row = 0;
      for (const auto& p : e.props) {
        if (p.is_list) { has_list = true; break; }
        row += ply_type_size(p.type);
      }
      if (!has_list) {
        std::vector<char> buf(row * e.count);
        f.read(buf.data(), buf.size());
        if (is_vertex) {
          mesh.verts.resize(e.count);
          size_t off_x = 0, off_y = 0, off_z = 0, off = 0;
          std::string tx, ty, tz;
          for (const auto& p : e.props) {
            if (p.name == "x") { off_x = off; tx = p.type; }
            if (p.name == "y") { off_y = off; ty = p.type; }
            if (p.name == "z") { off_z = off; tz = p.type; }
            off += ply_type_size(p.type);
          }
          for (size_t i = 0; i < e.count; i++) {
            const char* base = buf.data() + i * row;
            mesh.verts[i] = {(float)read_scalar(base + off_x, tx),
                             (float)read_scalar(base + off_y, ty),
                             (float)read_scalar(base + off_z, tz)};
          }
        }
      } else {
        for (size_t i = 0; i < e.count; i++) {
          for (const auto& p : e.props) {
            if (!p.is_list) { f.seekg(ply_type_size(p.type), std::ios::cur); continue; }
            std::vector<char> cbuf(ply_type_size(p.count_type));
            f.read(cbuf.data(), cbuf.size());
            size_t n = (size_t)read_scalar(cbuf.data(), p.count_type);
            std::vector<char> ibuf(ply_type_size(p.item_type) * n);
            f.read(ibuf.data(), ibuf.size());
            if (is_face && p.name.rfind("vertex_ind", 0) == 0) {
              std::vector<uint32_t> idx(n);
              for (size_t k = 0; k < n; k++)
                idx[k] = (uint32_t)read_scalar(
                    ibuf.data() + k * ply_type_size(p.item_type), p.item_type);
              for (size_t k = 2; k < n; k++)
                mesh.faces.push_back({idx[0], idx[k - 1], idx[k]});
            }
          }
        }
      }
    }
  }
  return mesh;
}

Mesh read_obj(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  Mesh mesh;
  std::string line;
  while (std::getline(f, line)) {
    if (line.rfind("v ", 0) == 0) {
      Vec3 v{};
      std::sscanf(line.c_str(), "v %f %f %f", &v.x, &v.y, &v.z);
      mesh.verts.push_back(v);
    } else if (line.rfind("f ", 0) == 0) {
      std::istringstream ss(line.substr(2));
      std::vector<uint32_t> idx;
      std::string tok;
      while (ss >> tok) {
        idx.push_back((uint32_t)std::stol(tok.substr(0, tok.find('/'))) - 1);
      }
      for (size_t k = 2; k < idx.size(); k++)
        mesh.faces.push_back({idx[0], idx[k - 1], idx[k]});
    }
  }
  return mesh;
}

// ---------------------------------------------------------------- union-find
class UnionFind {
 public:
  explicit UnionFind(int n) : parent_(n), rank_(n, 0), size_(n, 1) {
    std::iota(parent_.begin(), parent_.end(), 0);
  }
  int find(int x) {
    int root = x;
    while (parent_[root] != root) root = parent_[root];
    while (parent_[x] != root) { int nxt = parent_[x]; parent_[x] = root; x = nxt; }
    return root;
  }
  void join(int a, int b) {
    a = find(a); b = find(b);
    if (a == b) return;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent_[b] = a;
    size_[a] += size_[b];
    if (rank_[a] == rank_[b]) rank_[a]++;
  }
  int size(int x) { return size_[find(x)]; }

 private:
  std::vector<int> parent_, rank_;
  std::vector<int> size_;
};

struct Edge { float w; uint32_t a, b; };

std::vector<int> segment_mesh(const Mesh& mesh, float kthr, int seg_min_verts) {
  const size_t n_verts = mesh.verts.size();
  const size_t n_faces = mesh.faces.size();

  // incremental vertex-normal blending over incident faces (running average)
  std::vector<Vec3> normals(n_verts);
  std::vector<int> counts(n_verts, 0);
  std::vector<Edge> edges;
  edges.reserve(n_faces * 3);
  for (size_t i = 0; i < n_faces; i++) {
    const auto& fc = mesh.faces[i];
    const Vec3 &p1 = mesh.verts[fc[0]], &p2 = mesh.verts[fc[1]],
               &p3 = mesh.verts[fc[2]];
    edges.push_back({0, fc[0], fc[1]});
    edges.push_back({0, fc[0], fc[2]});
    edges.push_back({0, fc[2], fc[1]});
    Vec3 fn = crossn(sub(p2, p1), sub(p3, p1));
    for (uint32_t vi : {fc[0], fc[1], fc[2]}) {
      normals[vi] = mix(normals[vi], fn, 1.0f / (counts[vi] + 1.0f));
      counts[vi]++;
    }
  }

  // edge weight: 1 - dot(n_a, n_b); squared when the transition is convex
  for (auto& e : edges) {
    const Vec3 &n1 = normals[e.a], &n2 = normals[e.b];
    Vec3 d = sub(mesh.verts[e.b], mesh.verts[e.a]);
    float dd = std::sqrt(d.x * d.x + d.y * d.y + d.z * d.z);
    if (dd > 0) { d.x /= dd; d.y /= dd; d.z /= dd; }
    float dot = n1.x * n2.x + n1.y * n2.y + n1.z * n2.z;
    float convexity = n2.x * d.x + n2.y * d.y + n2.z * d.z;
    float w = 1.0f - dot;
    if (convexity > 0) w *= w;
    e.w = w;
  }

  // Felzenszwalb: ascending-weight pass with adaptive per-component threshold
  std::sort(edges.begin(), edges.end(),
            [](const Edge& a, const Edge& b) { return a.w < b.w; });
  UnionFind uf((int)n_verts);
  std::vector<float> threshold(n_verts, kthr);
  for (const auto& e : edges) {
    int a = uf.find((int)e.a), b = uf.find((int)e.b);
    if (a == b) continue;
    if (e.w <= threshold[a] && e.w <= threshold[b]) {
      uf.join(a, b);
      int r = uf.find(a);
      threshold[r] = e.w + kthr / uf.size(r);
    }
  }
  // absorb small segments into any adjacent one
  for (const auto& e : edges) {
    int a = uf.find((int)e.a), b = uf.find((int)e.b);
    if (a != b && (uf.size(a) < seg_min_verts || uf.size(b) < seg_min_verts))
      uf.join(a, b);
  }

  std::vector<int> out(n_verts);
  for (size_t i = 0; i < n_verts; i++) out[i] = uf.find((int)i);
  return out;
}

void write_json(const std::string& path, const std::string& scene_id,
                float kthr, int seg_min_verts, const std::vector<int>& segs) {
  std::ofstream ofs(path);
  ofs << "{\"params\":{\"kThresh\":" << kthr
      << ",\"segMinVerts\":" << seg_min_verts << "},"
      << "\"sceneId\":\"" << scene_id << "\",\"segIndices\":[";
  for (size_t i = 0; i < segs.size(); i++) {
    if (i) ofs << ",";
    ofs << segs[i];
  }
  ofs << "]}";
}

bool ends_with(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() &&
         std::equal(suf.rbegin(), suf.rend(), s.rbegin(),
                    [](char a, char b) { return std::tolower(a) == std::tolower(b); });
}

}  // namespace

int main(int argc, const char** argv) {
  if (argc < 2) {
    std::printf(
        "Usage: ./segmentator input.{ply,obj} [kThresh=0.01] [segMinVerts=20]"
        " [outPrefix=<input dir>]\n");
    return 2;
  }
  const std::string mesh_file = argv[1];
  const float kthr = argc > 2 ? (float)std::atof(argv[2]) : 0.01f;
  const int seg_min_verts = argc > 3 ? std::atoi(argv[3]) : 20;

  Mesh mesh = ends_with(mesh_file, ".obj") ? read_obj(mesh_file)
                                           : read_ply(mesh_file);
  std::printf("Segmenting %s (%zu verts, %zu faces) kThresh=%f segMinVerts=%d\n",
              mesh_file.c_str(), mesh.verts.size(), mesh.faces.size(), kthr,
              seg_min_verts);
  std::vector<int> segs = segment_mesh(mesh, kthr, seg_min_verts);
  std::unordered_set<int> uniq(segs.begin(), segs.end());

  const size_t dot = mesh_file.find_last_of('.');
  const std::string base = mesh_file.substr(0, dot);
  const size_t slash = base.find_last_of('/');
  const std::string scene = slash == std::string::npos ? base
                                                       : base.substr(slash + 1);
  std::string out_dir = argc > 4 ? std::string(argv[4])
                                 : (slash == std::string::npos
                                        ? std::string(".")
                                        : mesh_file.substr(0, slash));
  std::string out = out_dir + "/" + scene + "." + std::to_string(kthr)
                    + ".segs.json";
  write_json(out, scene, kthr, seg_min_verts, segs);
  std::printf("Segmentation written to %s with %zu segments\n", out.c_str(),
              uniq.size());
  return 0;
}
