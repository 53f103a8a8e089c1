// Native BVH builder — TPU-framework analog of the reference's Embree/
// kd-tree acceleration-structure construction (src/render/kdtree.cpp,
// scene_embree.inl).  Host-side C++: builds a binned-SAH BVH2 over the
// triangle soup and emits flat arrays consumed by the JAX/Pallas
// traversal kernels (ops/traverse.py).
//
// Layout (node i):
//   bounds_min[i*3..], bounds_max[i*3..]
//   meta[i*4] = left child (inner) | first prim slot (leaf)
//   meta[i*4+1] = right child (inner) | prim count (leaf)
//   meta[i*4+2] = is_leaf (0/1)
//   meta[i*4+3] = parent (refit support)
// prim_order: triangle ids reordered so leaf prims are contiguous.
//
// Exposed as a C ABI for ctypes (ops/bvh.py); a numpy fallback builder in
// Python covers environments without a compiler.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BBox {
    float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    void grow(const float* p) {
        for (int k = 0; k < 3; ++k) {
            mn[k] = std::min(mn[k], p[k]);
            mx[k] = std::max(mx[k], p[k]);
        }
    }
    void grow(const BBox& b) {
        for (int k = 0; k < 3; ++k) {
            mn[k] = std::min(mn[k], b.mn[k]);
            mx[k] = std::max(mx[k], b.mx[k]);
        }
    }
    float area() const {
        float d[3] = {std::max(0.f, mx[0] - mn[0]),
                      std::max(0.f, mx[1] - mn[1]),
                      std::max(0.f, mx[2] - mn[2])};
        return 2.f * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]);
    }
};

struct Prim {
    BBox box;
    float centroid[3];
    int32_t id;
};

struct Builder {
    std::vector<Prim> prims;
    std::vector<float> bmin, bmax;
    std::vector<int32_t> meta;
    std::vector<int32_t> order;
    int leaf_size;

    int32_t new_node() {
        bmin.insert(bmin.end(), 3, 0.f);
        bmax.insert(bmax.end(), 3, 0.f);
        meta.insert(meta.end(), 4, 0);
        return (int32_t)(meta.size() / 4) - 1;
    }

    int32_t build(int lo, int hi, int32_t parent) {
        int32_t node = new_node();
        BBox box;
        for (int i = lo; i < hi; ++i) box.grow(prims[i].box);
        std::memcpy(&bmin[node * 3], box.mn, 12);
        std::memcpy(&bmax[node * 3], box.mx, 12);
        meta[node * 4 + 3] = parent;

        int n = hi - lo;
        if (n <= leaf_size) {
            meta[node * 4 + 0] = (int32_t)order.size();
            meta[node * 4 + 1] = n;
            meta[node * 4 + 2] = 1;
            for (int i = lo; i < hi; ++i) order.push_back(prims[i].id);
            return node;
        }

        // binned SAH over the widest centroid axis (16 bins)
        BBox cbox;
        for (int i = lo; i < hi; ++i) cbox.grow(prims[i].centroid);
        int axis = 0;
        float ext[3];
        for (int k = 0; k < 3; ++k) ext[k] = cbox.mx[k] - cbox.mn[k];
        if (ext[1] > ext[axis]) axis = 1;
        if (ext[2] > ext[axis]) axis = 2;

        int mid;
        if (ext[axis] < 1e-12f) {
            mid = (lo + hi) / 2;  // degenerate: median split
        } else {
            constexpr int NB = 16;
            BBox bins[NB];
            int counts[NB] = {0};
            float scale = NB / ext[axis];
            for (int i = lo; i < hi; ++i) {
                int b = std::min(NB - 1, (int)((prims[i].centroid[axis] -
                                                cbox.mn[axis]) * scale));
                bins[b].grow(prims[i].box);
                counts[b]++;
            }
            float best_cost = FLT_MAX;
            int best_split = -1;
            BBox left_acc[NB];
            BBox acc;
            int lcount = 0;
            int lcounts[NB];
            for (int b = 0; b < NB - 1; ++b) {
                acc.grow(bins[b]);
                lcount += counts[b];
                left_acc[b] = acc;
                lcounts[b] = lcount;
            }
            BBox racc;
            int rcount = 0;
            for (int b = NB - 1; b >= 1; --b) {
                racc.grow(bins[b]);
                rcount += counts[b];
                if (lcounts[b - 1] == 0 || rcount == 0) continue;
                float cost = left_acc[b - 1].area() * lcounts[b - 1] +
                             racc.area() * rcount;
                if (cost < best_cost) {
                    best_cost = cost;
                    best_split = b;
                }
            }
            if (best_split < 0) {
                mid = (lo + hi) / 2;
                std::nth_element(prims.begin() + lo, prims.begin() + mid,
                                 prims.begin() + hi,
                                 [axis](const Prim& a, const Prim& b) {
                                     return a.centroid[axis] <
                                            b.centroid[axis];
                                 });
            } else {
                float split_pos = cbox.mn[axis] + best_split * ext[axis] / NB;
                auto it = std::partition(
                    prims.begin() + lo, prims.begin() + hi,
                    [axis, split_pos](const Prim& p) {
                        return p.centroid[axis] < split_pos;
                    });
                mid = (int)(it - prims.begin());
                if (mid == lo || mid == hi) mid = (lo + hi) / 2;
            }
        }

        int32_t l = build(lo, mid, node);
        int32_t r = build(mid, hi, node);
        meta[node * 4 + 0] = l;
        meta[node * 4 + 1] = r;
        meta[node * 4 + 2] = 0;
        return node;
    }
};

}  // namespace

extern "C" {

// Returns number of nodes written. Buffers must hold >= 2*nf nodes.
int32_t epsm_build_bvh(const float* verts, int32_t nv, const int32_t* faces,
                       int32_t nf, int32_t leaf_size, float* out_bmin,
                       float* out_bmax, int32_t* out_meta,
                       int32_t* out_order) {
    (void)nv;
    Builder b;
    b.leaf_size = leaf_size;
    b.prims.resize(nf);
    for (int i = 0; i < nf; ++i) {
        Prim& p = b.prims[i];
        p.id = i;
        for (int v = 0; v < 3; ++v) p.box.grow(&verts[faces[i * 3 + v] * 3]);
        for (int k = 0; k < 3; ++k)
            p.centroid[k] = 0.5f * (p.box.mn[k] + p.box.mx[k]);
    }
    b.build(0, nf, -1);
    int32_t n_nodes = (int32_t)(b.meta.size() / 4);
    std::memcpy(out_bmin, b.bmin.data(), b.bmin.size() * 4);
    std::memcpy(out_bmax, b.bmax.data(), b.bmax.size() * 4);
    std::memcpy(out_meta, b.meta.data(), b.meta.size() * 4);
    std::memcpy(out_order, b.order.data(), b.order.size() * 4);
    return n_nodes;
}

}  // extern "C"
