// Native mesh preprocessing: the host-side hot loops of mesh loading.
//
// The reference's native component is a CUDA extension for point transforms
// (reference diffdope/c_src/*); on TPU that op is a single XLA einsum, so
// the native budget goes where Python is actually the bottleneck for large
// production meshes: per-edge adjacency construction (silhouette topology
// for render/antialias.py) and area-weighted vertex normals.  Exposed with
// a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: see build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <cmath>

extern "C" {

// adj_out[t*3 + k] = triangle sharing edge (faces[t][k], faces[t][(k+1)%3]),
// or -1 for boundary / non-manifold edges.  Returns 0 on success.
int dd_build_edge_adjacency(const int32_t* faces, int64_t num_tris,
                            int32_t* adj_out) {
    if (!faces || !adj_out || num_tris < 0) return 1;
    // key: (min_vertex, max_vertex) packed into 64 bits
    std::unordered_map<uint64_t, std::pair<int64_t, int64_t>> edges;
    edges.reserve(static_cast<size_t>(num_tris) * 3);
    const int64_t kEmpty = -1, kMulti = -2;

    for (int64_t t = 0; t < num_tris; ++t) {
        for (int k = 0; k < 3; ++k) {
            int32_t a = faces[t * 3 + k];
            int32_t b = faces[t * 3 + (k + 1) % 3];
            uint64_t lo = static_cast<uint32_t>(a < b ? a : b);
            uint64_t hi = static_cast<uint32_t>(a < b ? b : a);
            uint64_t key = (hi << 32) | lo;
            auto it = edges.find(key);
            int64_t slot = t * 3 + k;
            if (it == edges.end()) {
                edges.emplace(key, std::make_pair(slot, kEmpty));
            } else if (it->second.second == kEmpty) {
                it->second.second = slot;
            } else {
                it->second.first = kMulti;  // non-manifold: mark unusable
            }
        }
    }

    std::memset(adj_out, 0xFF, sizeof(int32_t) * 3 * num_tris);  // -1 fill
    for (const auto& kv : edges) {
        int64_t s0 = kv.second.first, s1 = kv.second.second;
        if (s0 == kMulti || s1 == kEmpty) continue;  // boundary/non-manifold
        adj_out[s0] = static_cast<int32_t>(s1 / 3);
        adj_out[s1] = static_cast<int32_t>(s0 / 3);
    }
    return 0;
}

// Area-weighted vertex normals.  out has shape (num_verts, 3).
int dd_vertex_normals(const float* pos, int64_t num_verts,
                      const int32_t* faces, int64_t num_tris, float* out) {
    if (!pos || !faces || !out || num_verts < 0 || num_tris < 0) return 1;
    std::memset(out, 0, sizeof(float) * 3 * num_verts);
    for (int64_t t = 0; t < num_tris; ++t) {
        const int32_t i0 = faces[t * 3], i1 = faces[t * 3 + 1], i2 = faces[t * 3 + 2];
        if (i0 >= num_verts || i1 >= num_verts || i2 >= num_verts) return 2;
        const float* p0 = pos + 3 * i0;
        const float* p1 = pos + 3 * i1;
        const float* p2 = pos + 3 * i2;
        float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        float n[3] = {
            e1[1] * e2[2] - e1[2] * e2[1],
            e1[2] * e2[0] - e1[0] * e2[2],
            e1[0] * e2[1] - e1[1] * e2[0],
        };
        for (int32_t idx : {i0, i1, i2}) {
            out[3 * idx] += n[0];
            out[3 * idx + 1] += n[1];
            out[3 * idx + 2] += n[2];
        }
    }
    for (int64_t v = 0; v < num_verts; ++v) {
        float* n = out + 3 * v;
        float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (len > 1e-20f) {
            n[0] /= len; n[1] /= len; n[2] /= len;
        }
    }
    return 0;
}

// Consistent-orientation repair (the native twin of
// mesh.orient_faces_consistently; see that docstring for the contract):
// BFS over the face-adjacency graph flipping faces so every shared edge is
// traversed in opposite directions, then a per-component global flip so the
// signed volume is positive (outward winding).  Output is traversal-order
// independent: for an orientable component each face's flip state relative
// to the component root is unique.
//
// faces_out receives the repaired winding (or a copy of the input when the
// mesh is non-orientable / non-manifold).  info_out[0]=closed,
// info_out[1]=orientable, info_out[2]=n_flipped.
int dd_orient_faces(const float* pos, int64_t num_verts,
                    const int32_t* faces, int64_t num_tris,
                    int32_t* faces_out, int64_t* info_out) {
    if (!pos || !faces || !faces_out || !info_out || num_tris < 0)
        return 1;
    std::memcpy(faces_out, faces, sizeof(int32_t) * 3 * num_tris);
    info_out[0] = num_tris > 0 ? 1 : 0;  // closed until an odd edge shows
    info_out[1] = 1;                     // orientable until a conflict
    info_out[2] = 0;
    if (num_tris == 0) {
        info_out[0] = 0;
        return 0;
    }

    // undirected edge -> up to 2 (face, direction) users
    struct Users { int64_t f0 = -1, f1 = -1; bool d0 = false, d1 = false; };
    std::unordered_map<uint64_t, Users> edges;
    edges.reserve(static_cast<size_t>(num_tris) * 3);
    bool manifold = true;
    for (int64_t t = 0; t < num_tris && manifold; ++t) {
        for (int k = 0; k < 3; ++k) {
            int32_t a = faces[t * 3 + k];
            int32_t b = faces[t * 3 + (k + 1) % 3];
            uint64_t lo = static_cast<uint32_t>(a < b ? a : b);
            uint64_t hi = static_cast<uint32_t>(a < b ? b : a);
            uint64_t key = (hi << 32) | lo;
            Users& u = edges[key];
            if (u.f0 < 0) {
                u.f0 = t; u.d0 = a < b;
            } else if (u.f1 < 0) {
                u.f1 = t; u.d1 = a < b;
            } else {
                manifold = false;
                break;
            }
        }
    }
    if (!manifold) {
        info_out[0] = 0;
        info_out[1] = 0;
        return 0;
    }

    // face adjacency with relative-flip parity (same_dir -> neighbor needs
    // the opposite flip state)
    std::vector<int64_t> nbr_head(num_tris, -1);
    struct Arc { int64_t to, next; bool same_dir; };
    std::vector<Arc> arcs;
    arcs.reserve(edges.size() * 2);
    for (const auto& kv : edges) {
        const Users& u = kv.second;
        if (u.f1 < 0) {
            info_out[0] = 0;  // boundary edge: not closed
            continue;
        }
        bool same = u.d0 == u.d1;
        arcs.push_back({u.f1, nbr_head[u.f0], same});
        nbr_head[u.f0] = static_cast<int64_t>(arcs.size()) - 1;
        arcs.push_back({u.f0, nbr_head[u.f1], same});
        nbr_head[u.f1] = static_cast<int64_t>(arcs.size()) - 1;
    }

    std::vector<uint8_t> flip(num_tris, 0), seen(num_tris, 0);
    std::vector<int32_t> comp(num_tris, -1);
    std::vector<int64_t> queue;
    int32_t n_comp = 0;
    for (int64_t start = 0; start < num_tris; ++start) {
        if (seen[start]) continue;
        seen[start] = 1;
        comp[start] = n_comp;
        queue.clear();
        queue.push_back(start);
        for (size_t qi = 0; qi < queue.size(); ++qi) {
            int64_t cur = queue[qi];
            for (int64_t a = nbr_head[cur]; a >= 0; a = arcs[a].next) {
                int64_t nxt = arcs[a].to;
                uint8_t want = flip[cur] ^ (arcs[a].same_dir ? 1 : 0);
                if (seen[nxt]) {
                    if (flip[nxt] != want) {
                        info_out[1] = 0;  // non-orientable: leave input
                        info_out[2] = 0;
                        std::memcpy(faces_out, faces,
                                    sizeof(int32_t) * 3 * num_tris);
                        return 0;
                    }
                } else {
                    seen[nxt] = 1;
                    flip[nxt] = want;
                    comp[nxt] = n_comp;
                    queue.push_back(nxt);
                }
            }
        }
        ++n_comp;
    }

    for (int64_t t = 0; t < num_tris; ++t) {
        if (flip[t]) std::swap(faces_out[t * 3 + 1], faces_out[t * 3 + 2]);
    }

    // per-component outward sign via signed volume (double accumulation,
    // matching the numpy float64 path)
    std::vector<double> vol(n_comp, 0.0);
    for (int64_t t = 0; t < num_tris; ++t) {
        const float* v0 = pos + 3 * faces_out[t * 3];
        const float* v1 = pos + 3 * faces_out[t * 3 + 1];
        const float* v2 = pos + 3 * faces_out[t * 3 + 2];
        double cx = double(v1[1]) * v2[2] - double(v1[2]) * v2[1];
        double cy = double(v1[2]) * v2[0] - double(v1[0]) * v2[2];
        double cz = double(v1[0]) * v2[1] - double(v1[1]) * v2[0];
        vol[comp[t]] += v0[0] * cx + v0[1] * cy + v0[2] * cz;
    }
    int64_t n_flipped = 0;
    for (int64_t t = 0; t < num_tris; ++t) {
        if (vol[comp[t]] < 0.0) {
            std::swap(faces_out[t * 3 + 1], faces_out[t * 3 + 2]);
            flip[t] ^= 1;
        }
        if (flip[t]) ++n_flipped;
    }
    info_out[2] = n_flipped;
    return 0;
}

// Parse the body of a binary_little_endian PLY vertex+face block where the
// vertex layout is known to be `stride` float32 properties and faces are
// (uint8 count == 3, 3x int32).  Returns 0 on success, 2 on a non-triangle
// face.  This covers the dominant BOP/scan mesh format; other layouts fall
// back to the numpy parser.
int dd_parse_ply_f32_body(const uint8_t* body, int64_t body_len,
                          int64_t num_verts, int32_t stride,
                          int64_t num_faces,
                          float* verts_out, int32_t* faces_out) {
    const int64_t vbytes = num_verts * stride * 4;
    const int64_t fbytes = num_faces * 13;
    if (body_len < vbytes + fbytes) return 1;
    std::memcpy(verts_out, body, static_cast<size_t>(vbytes));
    const uint8_t* p = body + vbytes;
    for (int64_t f = 0; f < num_faces; ++f) {
        if (p[0] != 3) return 2;
        std::memcpy(faces_out + f * 3, p + 1, 12);
        p += 13;
    }
    return 0;
}

}  // extern "C"
