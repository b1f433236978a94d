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
