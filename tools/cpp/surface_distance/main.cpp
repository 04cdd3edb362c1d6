// surface_distance: mean absolute distance from reconstructed PLY vertices
// to a ground-truth STL mesh.
//
// Native evaluation tool equivalent to the reference's
// gs_toolkit/evaluation/surface_distance (main.cpp:9-73), rebuilt from
// scratch: binary/ASCII STL loader, binary/ASCII PLY vertex loader, and a
// median-split AABB BVH with best-first nearest-triangle queries
// (Eberly-style point-triangle distance) instead of the vendored
// TriangleMeshDistance header. Usage:
//   surface_distance <ground_truth.stl> <reconstruction.ply> [scale]
// Prints mean/median/max distance over PLY vertices (in STL units after
// optional scale applied to PLY points).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <numeric>
#include <queue>
#include <sstream>
#include <string>
#include <vector>

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double a, double b, double c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
  double norm2() const { return dot(*this); }
};

struct Triangle {
  Vec3 a, b, c;
};

// ---------------------------------------------------------------------------
// Point-triangle squared distance (Ericson, Real-Time Collision Detection)
// ---------------------------------------------------------------------------
static double pointTriDist2(const Vec3 &p, const Triangle &t) {
  Vec3 ab = t.b - t.a, ac = t.c - t.a, ap = p - t.a;
  double d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return ap.norm2();
  Vec3 bp = p - t.b;
  double d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return bp.norm2();
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    return (ap - ab * v).norm2();
  }
  Vec3 cp = p - t.c;
  double d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return cp.norm2();
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    return (ap - ac * w).norm2();
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    Vec3 q = t.b + (t.c - t.b) * w;
    return (p - q).norm2();
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  Vec3 q = t.a + ab * v + ac * w;
  return (p - q).norm2();
}

// ---------------------------------------------------------------------------
// AABB BVH (median split) with best-first nearest query
// ---------------------------------------------------------------------------
struct AABB {
  Vec3 lo{1e300, 1e300, 1e300}, hi{-1e300, -1e300, -1e300};
  void expand(const Vec3 &p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  double dist2(const Vec3 &p) const {
    double dx = std::max({lo.x - p.x, 0.0, p.x - hi.x});
    double dy = std::max({lo.y - p.y, 0.0, p.y - hi.y});
    double dz = std::max({lo.z - p.z, 0.0, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
};

struct BVH {
  struct Node {
    AABB box;
    int left = -1, right = -1;  // children; leaf if left < 0
    int start = 0, count = 0;   // triangle range for leaves
  };
  std::vector<Triangle> tris;
  std::vector<Node> nodes;

  explicit BVH(std::vector<Triangle> t) : tris(std::move(t)) {
    std::vector<int> order(tris.size());
    std::iota(order.begin(), order.end(), 0);
    std::vector<Triangle> sorted;
    sorted.reserve(tris.size());
    build(order, 0, (int)order.size(), sorted);
    tris = std::move(sorted);
  }

  int build(std::vector<int> &order, int lo, int hi,
            std::vector<Triangle> &sorted) {
    Node node;
    for (int i = lo; i < hi; i++) {
      const Triangle &t = tris[order[i]];
      node.box.expand(t.a); node.box.expand(t.b); node.box.expand(t.c);
    }
    int idx = (int)nodes.size();
    nodes.push_back(node);
    if (hi - lo <= 8) {
      nodes[idx].start = (int)sorted.size();
      nodes[idx].count = hi - lo;
      for (int i = lo; i < hi; i++) sorted.push_back(tris[order[i]]);
      return idx;
    }
    Vec3 ext = node.box.hi - node.box.lo;
    int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2) : (ext.y > ext.z ? 1 : 2);
    auto centroid = [&](int i) {
      const Triangle &t = tris[i];
      double c[3] = {(t.a.x + t.b.x + t.c.x), (t.a.y + t.b.y + t.c.y),
                     (t.a.z + t.b.z + t.c.z)};
      return c[axis];
    };
    int mid = (lo + hi) / 2;
    std::nth_element(order.begin() + lo, order.begin() + mid,
                     order.begin() + hi,
                     [&](int a, int b) { return centroid(a) < centroid(b); });
    int l = build(order, lo, mid, sorted);
    int r = build(order, mid, hi, sorted);
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  double nearest(const Vec3 &p) const {
    using Entry = std::pair<double, int>;
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> pq;
    pq.push({nodes[0].box.dist2(p), 0});
    double best = std::numeric_limits<double>::max();
    while (!pq.empty()) {
      auto [d2, ni] = pq.top();
      pq.pop();
      if (d2 >= best) break;
      const Node &n = nodes[ni];
      if (n.left < 0) {
        for (int i = n.start; i < n.start + n.count; i++)
          best = std::min(best, pointTriDist2(p, tris[i]));
      } else {
        pq.push({nodes[n.left].box.dist2(p), n.left});
        pq.push({nodes[n.right].box.dist2(p), n.right});
      }
    }
    return std::sqrt(best);
  }
};

// ---------------------------------------------------------------------------
// STL loader (binary + ASCII)
// ---------------------------------------------------------------------------
static std::vector<Triangle> loadSTL(const std::string &path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char head[80] = {0};
  f.read(head, 80);
  std::string h(head, head + 5);
  f.seekg(0, std::ios::end);
  size_t size = (size_t)f.tellg();
  f.seekg(80);
  uint32_t n = 0;
  f.read(reinterpret_cast<char *>(&n), 4);
  std::vector<Triangle> tris;
  if (size == 84 + (size_t)n * 50) {  // binary
    tris.reserve(n);
    for (uint32_t i = 0; i < n; i++) {
      float buf[12];
      f.read(reinterpret_cast<char *>(buf), 48);
      uint16_t attr;
      f.read(reinterpret_cast<char *>(&attr), 2);
      tris.push_back({{buf[3], buf[4], buf[5]},
                      {buf[6], buf[7], buf[8]},
                      {buf[9], buf[10], buf[11]}});
    }
    return tris;
  }
  // ASCII fallback
  std::ifstream fa(path);
  std::string tok;
  std::vector<Vec3> verts;
  while (fa >> tok) {
    if (tok == "vertex") {
      Vec3 v;
      fa >> v.x >> v.y >> v.z;
      verts.push_back(v);
      if (verts.size() == 3) {
        tris.push_back({verts[0], verts[1], verts[2]});
        verts.clear();
      }
    }
  }
  return tris;
}

// ---------------------------------------------------------------------------
// PLY vertex loader (binary_little_endian + ascii; x,y,z properties)
// ---------------------------------------------------------------------------
static std::vector<Vec3> loadPLYVertices(const std::string &path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string line;
  std::getline(f, line);
  if (line.rfind("ply", 0) != 0) throw std::runtime_error("not a PLY");
  bool binary = false;
  size_t nverts = 0;
  struct Prop { std::string type; std::string name; };
  std::vector<Prop> props;
  bool inVertex = false;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string word;
    ss >> word;
    if (word == "format") {
      std::string fmt; ss >> fmt;
      binary = fmt == "binary_little_endian";
    } else if (word == "element") {
      std::string name; size_t cnt; ss >> name >> cnt;
      inVertex = name == "vertex";
      if (inVertex) nverts = cnt;
    } else if (word == "property" && inVertex) {
      Prop p; ss >> p.type >> p.name;
      if (p.type == "list") { std::string a, b; ss >> a >> b; }
      props.push_back(p);
    } else if (word == "end_header") {
      break;
    }
  }
  auto typeSize = [](const std::string &t) -> size_t {
    if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
    if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
    if (t == "double" || t == "float64") return 8;
    return 4;
  };
  std::vector<Vec3> out;
  out.reserve(nverts);
  if (binary) {
    size_t stride = 0, offx = 0, offy = 0, offz = 0;
    std::string tx, ty, tz;
    for (const auto &p : props) {
      if (p.name == "x") { offx = stride; tx = p.type; }
      if (p.name == "y") { offy = stride; ty = p.type; }
      if (p.name == "z") { offz = stride; tz = p.type; }
      stride += typeSize(p.type);
    }
    std::vector<char> row(stride);
    auto rd = [&](size_t off, const std::string &t) -> double {
      if (t == "double" || t == "float64") {
        double v; std::memcpy(&v, row.data() + off, 8); return v;
      }
      float v; std::memcpy(&v, row.data() + off, 4); return v;
    };
    for (size_t i = 0; i < nverts; i++) {
      f.read(row.data(), (std::streamsize)stride);
      out.push_back({rd(offx, tx), rd(offy, ty), rd(offz, tz)});
    }
  } else {
    int ix = -1, iy = -1, iz = -1;
    for (size_t i = 0; i < props.size(); i++) {
      if (props[i].name == "x") ix = (int)i;
      if (props[i].name == "y") iy = (int)i;
      if (props[i].name == "z") iz = (int)i;
    }
    for (size_t i = 0; i < nverts; i++) {
      std::getline(f, line);
      std::istringstream ss(line);
      std::vector<double> vals;
      double v;
      while (ss >> v) vals.push_back(v);
      out.push_back({vals[ix], vals[iy], vals[iz]});
    }
  }
  return out;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: surface_distance <gt.stl> <recon.ply> [scale]\n";
    return 1;
  }
  double scale = argc > 3 ? std::atof(argv[3]) : 1.0;
  auto tris = loadSTL(argv[1]);
  auto pts = loadPLYVertices(argv[2]);
  if (tris.empty() || pts.empty()) {
    std::cerr << "empty mesh or point set\n";
    return 1;
  }
  BVH bvh(std::move(tris));
  std::vector<double> d(pts.size());
  for (size_t i = 0; i < pts.size(); i++) {
    Vec3 p = pts[i] * scale;
    d[i] = bvh.nearest(p);
  }
  double mean = std::accumulate(d.begin(), d.end(), 0.0) / (double)d.size();
  std::nth_element(d.begin(), d.begin() + d.size() / 2, d.end());
  double median = d[d.size() / 2];
  double mx = *std::max_element(d.begin(), d.end());
  std::cout << "points: " << pts.size() << "\n"
            << "mean_distance: " << mean << "\n"
            << "median_distance: " << median << "\n"
            << "max_distance: " << mx << "\n";
  return 0;
}
