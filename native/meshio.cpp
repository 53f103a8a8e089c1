// Native OBJ mesh loader — the TPU framework's fast data-loader path
// (obj.cpp:176-280 analog).  Python's line-by-line parser is fine for
// small procedural assets; production interiors (bathroom-class, 100k+
// triangles) parse ~40x faster here.  Exposed via C ABI for ctypes
// (models/mesh_io.py picks it up automatically when built).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ObjData {
    std::vector<float> positions;   // raw v records
    std::vector<float> normals_raw; // raw vn records
    std::vector<float> uvs_raw;     // raw vt records
    std::vector<float> out_pos;     // resolved per-vertex
    std::vector<float> out_nrm;
    std::vector<float> out_uv;
    std::vector<int32_t> faces;
    bool has_normals = false;
    bool has_uvs = false;
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

// vertex-tuple key: three full 32-bit indices, non-overlapping (a shifted
// XOR pack collides for indices >= 2^20 and silently merges vertices)
struct VKey {
    int32_t p, t, n;
    bool operator==(const VKey& o) const {
        return p == o.p && t == o.t && n == o.n;
    }
};
struct VKeyHash {
    size_t operator()(const VKey& k) const {
        uint64_t h = (uint64_t)(uint32_t)k.p * 0x9E3779B185EBCA87ULL;
        h ^= ((uint64_t)(uint32_t)k.t + 0xC2B2AE3D27D4EB4FULL) + (h << 6);
        h ^= ((uint64_t)(uint32_t)k.n + 0x165667B19E3779F9ULL) + (h >> 3);
        return (size_t)h;
    }
};
using VMap = std::unordered_map<VKey, int32_t, VKeyHash>;

// resolve an OBJ "v/vt/vn" tuple to a flat vertex id (deduplicated)
int32_t resolve(ObjData& d, VMap& map, int pi, int ti, int ni) {
    VKey key{pi, ti, ni};
    auto it = map.find(key);
    if (it != map.end()) return it->second;
    int32_t idx = (int32_t)(d.out_pos.size() / 3);
    for (int k = 0; k < 3; ++k) d.out_pos.push_back(d.positions[pi * 3 + k]);
    if (ni >= 0) {
        d.has_normals = true;
        for (int k = 0; k < 3; ++k)
            d.out_nrm.push_back(d.normals_raw[ni * 3 + k]);
    } else {
        for (int k = 0; k < 3; ++k) d.out_nrm.push_back(0.f);
    }
    if (ti >= 0) {
        d.has_uvs = true;
        d.out_uv.push_back(d.uvs_raw[ti * 2]);
        d.out_uv.push_back(1.f - d.uvs_raw[ti * 2 + 1]);  // flip_tex_coords
    } else {
        d.out_uv.push_back(0.f);
        d.out_uv.push_back(0.f);
    }
    map.emplace(key, idx);
    return idx;
}

ObjData* parse_obj(const char* text, size_t len) {
    auto* d = new ObjData();
    VMap map;
    const char* p = text;
    const char* end = text + len;
    std::vector<int32_t> poly;
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v' &&
            (p[1] == ' ' || p[1] == '\t')) {
            char* q;
            float x = strtof(p + 2, &q);
            float y = strtof(q, &q);
            float z = strtof(q, &q);
            d->positions.insert(d->positions.end(), {x, y, z});
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 'n') {
            char* q;
            float x = strtof(p + 3, &q);
            float y = strtof(q, &q);
            float z = strtof(q, &q);
            d->normals_raw.insert(d->normals_raw.end(), {x, y, z});
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 't') {
            char* q;
            float u = strtof(p + 3, &q);
            float v = strtof(q, &q);
            d->uvs_raw.insert(d->uvs_raw.end(), {u, v});
        } else if (p[0] == 'f' && p + 1 < end &&
                   (p[1] == ' ' || p[1] == '\t')) {
            poly.clear();
            const char* q = p + 2;
            while (q < end && *q != '\n') {
                q = skip_ws(q, end);
                if (q >= end || *q == '\n' || *q == '#') break;
                const char* tok = q;
                long pi = strtol(q, (char**)&q, 10);
                if (q == tok) {
                    // non-numeric token: malformed face record — bail to the
                    // python fallback (never spin; strtol left q unadvanced)
                    delete d;
                    return nullptr;
                }
                long ti = 0, ni = 0;
                bool has_t = false, has_n = false;
                if (q < end && *q == '/') {
                    ++q;
                    if (q < end && *q != '/') {
                        const char* t0 = q;
                        ti = strtol(q, (char**)&q, 10);
                        has_t = q != t0;
                    }
                    if (q < end && *q == '/') {
                        ++q;
                        const char* n0 = q;
                        ni = strtol(q, (char**)&q, 10);
                        has_n = q != n0;
                    }
                }
                int npos = (int)(d->positions.size() / 3);
                int nuv = (int)(d->uvs_raw.size() / 2);
                int nnrm = (int)(d->normals_raw.size() / 3);
                int pidx = pi > 0 ? (int)pi - 1 : npos + (int)pi;
                int tidx = has_t ? (ti > 0 ? (int)ti - 1 : nuv + (int)ti) : -1;
                int nidx = has_n ? (ni > 0 ? (int)ni - 1 : nnrm + (int)ni) : -1;
                // validate against array sizes: a failed/out-of-range index
                // would be an out-of-bounds vector read (UB)
                if (pidx < 0 || pidx >= npos || tidx >= nuv || tidx < -1 ||
                    nidx >= nnrm || nidx < -1) {
                    delete d;
                    return nullptr;
                }
                poly.push_back(resolve(*d, map, pidx, tidx, nidx));
            }
            for (size_t k = 1; k + 1 < poly.size(); ++k) {
                d->faces.push_back(poly[0]);
                d->faces.push_back(poly[k]);
                d->faces.push_back(poly[k + 1]);
            }
        }
        p = next_line(p, end);
    }
    return d;
}

}  // namespace

extern "C" {

void* epsm_obj_parse(const char* path, int64_t* n_verts, int64_t* n_faces,
                     int32_t* has_normals, int32_t* has_uvs) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string buf(len, '\0');
    size_t rd = fread(buf.data(), 1, len, f);
    fclose(f);
    ObjData* d = parse_obj(buf.data(), rd);
    if (!d) return nullptr;  // malformed input -> python fallback
    *n_verts = (int64_t)(d->out_pos.size() / 3);
    *n_faces = (int64_t)(d->faces.size() / 3);
    *has_normals = d->has_normals ? 1 : 0;
    *has_uvs = d->has_uvs ? 1 : 0;
    return d;
}

void epsm_obj_copy(void* handle, float* pos, float* nrm, float* uv,
                   int32_t* faces) {
    auto* d = (ObjData*)handle;
    memcpy(pos, d->out_pos.data(), d->out_pos.size() * 4);
    if (nrm) memcpy(nrm, d->out_nrm.data(), d->out_nrm.size() * 4);
    if (uv) memcpy(uv, d->out_uv.data(), d->out_uv.size() * 4);
    memcpy(faces, d->faces.data(), d->faces.size() * 4);
}

void epsm_obj_free(void* handle) { delete (ObjData*)handle; }

}  // extern "C"
