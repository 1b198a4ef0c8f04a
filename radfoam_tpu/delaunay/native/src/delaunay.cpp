// Incremental 3D Delaunay triangulation — the native graph builder.
//
// Role parity: src/delaunay/*.cu in the reference (GPU sample-and-grow
// triangulation). The host-side TPU-native replacement is a sequential
// Bowyer-Watson incremental construction:
//   - points are inserted in Morton order (the caller pre-sorts), so the
//     point-location walk from the previously created tet is near O(1);
//   - the conflict cavity is found by BFS over the tet adjacency with
//     exact-filtered insphere predicates (predicates.h);
//   - a far-away enclosing super-tetrahedron (4e6 x the data diameter)
//     stands in for the point at infinity; with exact arithmetic this
//     only perturbs hull tets whose circumradius exceeds ~1e6 x the data
//     diameter, configurations the reference also rejects as degenerate.
// Degeneracies (duplicate points, exactly cospherical configurations that
// would create zero-volume tets) abort with a status code; the Python
// retry ladder jitters and retries, matching the reference's
// TriangulationFailedError contract (delaunay.cu:350-357, scene.py:160-189).
//
// Point adjacency (the CSR the tracer consumes, delaunay.cu:146-228) is
// extracted by per-vertex star traversal over the final tet mesh.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

#include "predicates.h"

namespace foam {

static const int32_t kNone = -1;

struct Tet {
    int32_t v[4];
    int32_t n[4];  // n[i] = tet across the face opposite v[i]
    uint32_t conflict_stamp = 0;
    uint8_t alive = 1;
};

// face opposite slot i, ordered so orient3d(face, v[i]) > 0 for a
// positively oriented tet
static const int kFace[4][3] = {
    {1, 3, 2}, {0, 2, 3}, {0, 3, 1}, {0, 1, 2}};

struct Mesh {
    std::vector<double> pts;  // (n + 4) * 3, super-tet verts at the end
    int64_t n_real = 0;
    std::vector<Tet> tets;
    std::vector<int32_t> free_list;
    uint32_t stamp = 0;
    uint64_t rng_state = 0x9E3779B97F4A7C15ull;

    const double *P(int32_t v) const { return &pts[3 * (int64_t)v]; }

    uint32_t rnd() {
        rng_state = rng_state * 6364136223846793005ull + 1442695040888963407ull;
        return (uint32_t)(rng_state >> 33);
    }

    int32_t alloc_tet() {
        if (!free_list.empty()) {
            int32_t id = free_list.back();
            free_list.pop_back();
            tets[id].alive = 1;
            tets[id].conflict_stamp = 0;
            return id;
        }
        tets.push_back(Tet());
        return (int32_t)tets.size() - 1;
    }

    int insphere_tet(const Tet &t, const double *p) const {
        return insphere_sign(P(t.v[0]), P(t.v[1]), P(t.v[2]), P(t.v[3]), p);
    }

    int orient_face(const Tet &t, int i, const double *p) const {
        return orient3d_sign(P(t.v[kFace[i][0]]), P(t.v[kFace[i][1]]),
                             P(t.v[kFace[i][2]]), p);
    }
};

// walk from hint to a tet containing p; returns tet id or kNone on failure
static int32_t locate(Mesh &m, const double *p, int32_t hint,
                      int64_t max_steps) {
    int32_t cur = hint;
    for (int64_t step = 0; step < max_steps; ++step) {
        const Tet &t = m.tets[cur];
        int neg[4], n_neg = 0;
        for (int i = 0; i < 4; ++i) {
            if (m.orient_face(t, i, p) < 0) neg[n_neg++] = i;
        }
        if (n_neg == 0) return cur;  // inside (or on boundary of) cur
        int pick = (n_neg == 1) ? neg[0] : neg[m.rnd() % n_neg];
        int32_t nxt = t.n[pick];
        if (nxt == kNone) return kNone;  // walked out of the super-tet
        cur = nxt;
    }
    return kNone;
}

struct EdgeKey {
    int64_t k;
    bool operator==(const EdgeKey &o) const { return k == o.k; }
};
struct EdgeKeyHash {
    size_t operator()(const EdgeKey &e) const {
        uint64_t x = (uint64_t)e.k;
        x ^= x >> 33;
        x *= 0xFF51AFD7ED558CCDull;
        x ^= x >> 33;
        return (size_t)x;
    }
};

// status codes
enum Status {
    OK = 0,
    DEGENERATE = 1,   // duplicates / cospherical -> caller jitters+retries
    INTERNAL = 2,
    TOO_FEW = 3,
};

struct Inserter {
    Mesh &m;
    std::vector<int32_t> cavity;
    std::vector<int32_t> bfs;
    // boundary faces: (cavity tet, slot)
    std::vector<std::pair<int32_t, int>> boundary;
    std::unordered_map<EdgeKey, std::pair<int32_t, int>, EdgeKeyHash>
        edge_map;

    explicit Inserter(Mesh &mesh) : m(mesh) {
        cavity.reserve(128);
        bfs.reserve(128);
        boundary.reserve(128);
        edge_map.reserve(256);
    }

    // returns new hint tet id, or negative Status on failure
    int32_t insert(int32_t vid, int32_t hint) {
        const double *p = m.P(vid);
        int32_t t0 = locate(m, p, hint, (int64_t)m.tets.size() * 4 + 64);
        if (t0 == kNone) return -INTERNAL;

        // conflict BFS (strict insphere)
        m.stamp++;
        cavity.clear();
        bfs.clear();
        boundary.clear();
        if (m.insphere_tet(m.tets[t0], p) <= 0) {
            // p on/outside the circumsphere of its containing tet:
            // duplicate vertex or exactly cospherical -> degenerate
            return -DEGENERATE;
        }
        m.tets[t0].conflict_stamp = m.stamp;
        bfs.push_back(t0);
        cavity.push_back(t0);
        while (!bfs.empty()) {
            int32_t tid = bfs.back();
            bfs.pop_back();
            for (int i = 0; i < 4; ++i) {
                int32_t nb = m.tets[tid].n[i];
                if (nb == kNone) {
                    boundary.push_back({tid, i});
                    continue;
                }
                if (m.tets[nb].conflict_stamp == m.stamp) continue;
                if (m.insphere_tet(m.tets[nb], p) > 0) {
                    m.tets[nb].conflict_stamp = m.stamp;
                    bfs.push_back(nb);
                    cavity.push_back(nb);
                } else {
                    boundary.push_back({tid, i});
                }
            }
        }

        // carve cavity + build new tets on its boundary
        edge_map.clear();
        int32_t first_new = kNone;
        for (auto &bf : boundary) {
            int32_t tid = bf.first;
            int slot = bf.second;
            const Tet &t = m.tets[tid];
            int32_t f0 = t.v[kFace[slot][0]];
            int32_t f1 = t.v[kFace[slot][1]];
            int32_t f2 = t.v[kFace[slot][2]];
            // the new tet (f0, f1, f2, p) must be positively oriented;
            // a zero here means p is coplanar with a cavity face
            if (orient3d_sign(m.P(f0), m.P(f1), m.P(f2), p) <= 0)
                return -DEGENERATE;

            int32_t outside = t.n[slot];
            int32_t nid = m.alloc_tet();
            Tet &nt = m.tets[nid];
            nt.v[0] = f0;
            nt.v[1] = f1;
            nt.v[2] = f2;
            nt.v[3] = vid;
            nt.n[3] = outside;  // across the boundary face
            nt.n[0] = nt.n[1] = nt.n[2] = kNone;
            if (outside != kNone) {
                // fix the outside tet's back-pointer
                Tet &ot = m.tets[outside];
                for (int j = 0; j < 4; ++j) {
                    if (ot.n[j] == tid) {
                        ot.n[j] = nid;
                        break;
                    }
                }
            }
            if (first_new == kNone) first_new = nid;

            // stitch the three p-faces via their boundary edges.
            // new tet layout: slot 3 holds p; face opposite slot j
            // (j<3) contains p and the edge (f_a, f_b) with
            // {a, b} = {0,1,2} \ {j}.
            for (int j = 0; j < 3; ++j) {
                int a = (j == 0) ? 1 : 0;
                int b = (j == 2) ? 1 : 2;
                int32_t va = nt.v[a], vb = nt.v[b];
                int64_t lo = va < vb ? va : vb;
                int64_t hi = va < vb ? vb : va;
                EdgeKey key{lo * (int64_t)(m.n_real + 5) + hi};
                auto it = edge_map.find(key);
                if (it == edge_map.end()) {
                    edge_map.emplace(key, std::make_pair(nid, j));
                } else {
                    int32_t oid = it->second.first;
                    int oslot = it->second.second;
                    m.tets[nid].n[j] = oid;
                    m.tets[oid].n[oslot] = nid;
                    edge_map.erase(it);
                }
            }
        }
        if (first_new == kNone) return -DEGENERATE;
        if (!edge_map.empty()) return -INTERNAL;  // unmatched boundary edges

        for (int32_t tid : cavity) {
            m.tets[tid].alive = 0;
            m.free_list.push_back(tid);
        }
        return first_new;
    }
};

// build the mesh: points (n x 3 float32), already spatially sorted
static int build(Mesh &m, const float *points, int64_t n) {
    if (n < 4) return TOO_FEW;
    m.pts.resize(3 * (n + 4));
    m.n_real = n;
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            double c = (double)points[3 * i + d];
            m.pts[3 * i + d] = c;
            if (c < lo[d]) lo[d] = c;
            if (c > hi[d]) hi[d] = c;
        }
    }
    double cx = 0.5 * (lo[0] + hi[0]);
    double cy = 0.5 * (lo[1] + hi[1]);
    double cz = 0.5 * (lo[2] + hi[2]);
    double h = 1.0;
    for (int d = 0; d < 3; ++d) h = std::max(h, hi[d] - lo[d]);
    double S = 4e6 * h;
    // regular super-tet around the data (inball radius ~ S/sqrt(3))
    const double sv[4][3] = {
        {cx + S, cy + S, cz + S},
        {cx + S, cy - S, cz - S},
        {cx - S, cy + S, cz - S},
        {cx - S, cy - S, cz + S},
    };
    int32_t s0 = (int32_t)n, s1 = (int32_t)n + 1, s2 = (int32_t)n + 2,
            s3 = (int32_t)n + 3;
    for (int i = 0; i < 4; ++i)
        for (int d = 0; d < 3; ++d) m.pts[3 * (n + i) + d] = sv[i][d];

    m.tets.clear();
    m.free_list.clear();
    Tet root;
    root.v[0] = s0;
    root.v[1] = s1;
    root.v[2] = s2;
    root.v[3] = s3;
    if (orient3d_sign(m.P(s0), m.P(s1), m.P(s2), m.P(s3)) < 0) {
        std::swap(root.v[2], root.v[3]);
    }
    root.n[0] = root.n[1] = root.n[2] = root.n[3] = kNone;
    m.tets.push_back(root);

    Inserter ins(m);
    int32_t hint = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t r = ins.insert((int32_t)i, hint);
        if (r < 0) return -r;
        hint = r;
    }
    return OK;
}

// validity re-check after point motion: the triangulation (topology
// unchanged) is still the Delaunay triangulation of the moved points iff
// every tet keeps positive orientation and every internal face is locally
// Delaunay (the opposite vertex of the adjacent tet lies strictly outside
// the circumsphere). This is the incremental-update detector: when it
// passes, the reference's delete-violations/regrow pass would be a no-op
// (delaunay.cu:291-310), so the whole rebuild can be skipped.
static bool still_valid(const Mesh &m) {
    int64_t ntets = (int64_t)m.tets.size();
    for (int64_t t = 0; t < ntets; ++t) {
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        if (orient3d_sign(m.P(tet.v[0]), m.P(tet.v[1]), m.P(tet.v[2]),
                          m.P(tet.v[3])) <= 0)
            return false;
        for (int i = 0; i < 4; ++i) {
            int32_t nb = tet.n[i];
            if (nb == kNone || nb < (int32_t)t) continue;  // visit once
            const Tet &other = m.tets[nb];
            int32_t apex = kNone;
            for (int j = 0; j < 4; ++j) {
                if (other.n[j] == (int32_t)t) {
                    apex = other.v[j];
                    break;
                }
            }
            if (apex == kNone) return false;  // inconsistent adjacency
            if (m.insphere_tet(tet, m.P(apex)) >= 0) return false;
        }
    }
    return true;
}

// collect live tets with only real vertices
static void collect_tets(const Mesh &m, std::vector<int32_t> &out) {
    out.clear();
    for (size_t t = 0; t < m.tets.size(); ++t) {
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        if (tet.v[0] >= m.n_real || tet.v[1] >= m.n_real ||
            tet.v[2] >= m.n_real || tet.v[3] >= m.n_real)
            continue;
        out.push_back((int32_t)t);
    }
}

// point-adjacency CSR by star traversal (equivalent of the reference's
// edge sort + unique, delaunay.cu:146-228, but O(sum degree))
static int adjacency(const Mesh &m, std::vector<uint32_t> &adj,
                     std::vector<uint32_t> &offsets) {
    int64_t n = m.n_real;
    // vertex -> one live incident tet (including super-vertex tets so hull
    // vertices always have a star)
    std::vector<int32_t> v2t(n, kNone);
    for (size_t t = 0; t < m.tets.size(); ++t) {
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        for (int i = 0; i < 4; ++i) {
            if (tet.v[i] < n) v2t[tet.v[i]] = (int32_t)t;
        }
    }

    std::vector<uint32_t> tet_stamp(m.tets.size(), 0);
    std::vector<uint32_t> vert_stamp(n + 4, 0);
    uint32_t stamp = 0;
    std::vector<int32_t> stack;
    std::vector<uint32_t> row;

    offsets.assign(n + 1, 0);
    adj.clear();
    adj.reserve((size_t)n * 16);

    for (int64_t v = 0; v < n; ++v) {
        if (v2t[v] == kNone) return INTERNAL;  // dangling vertex
        stamp++;
        stack.clear();
        row.clear();
        stack.push_back(v2t[v]);
        tet_stamp[v2t[v]] = stamp;
        while (!stack.empty()) {
            int32_t tid = stack.back();
            stack.pop_back();
            const Tet &t = m.tets[tid];
            int vslot = -1;
            for (int i = 0; i < 4; ++i) {
                int32_t u = t.v[i];
                if (u == (int32_t)v) {
                    vslot = i;
                    continue;
                }
                if (u < n && vert_stamp[u] != stamp) {
                    vert_stamp[u] = stamp;
                    row.push_back((uint32_t)u);
                }
            }
            // traverse to neighbor tets still containing v: those across
            // the faces that contain v, i.e. all except the face opposite v
            for (int i = 0; i < 4; ++i) {
                if (i == vslot) continue;
                int32_t nb = t.n[i];
                if (nb == kNone || !m.tets[nb].alive) continue;
                if (tet_stamp[nb] == stamp) continue;
                tet_stamp[nb] = stamp;
                stack.push_back(nb);
            }
        }
        std::sort(row.begin(), row.end());
        offsets[v + 1] = offsets[v] + (uint32_t)row.size();
        adj.insert(adj.end(), row.begin(), row.end());
    }
    return OK;
}

}  // namespace foam

// ----------------------------------------------------------------------
// C API (ctypes binding; this image has no pybind11)

extern "C" {

struct FoamTriangulation {
    foam::Mesh mesh;
    std::vector<int32_t> live_tets;
    std::vector<uint32_t> adj;
    std::vector<uint32_t> offsets;
    std::vector<int32_t> tet_export;
};

FoamTriangulation *foam_create() { return new FoamTriangulation(); }

void foam_destroy(FoamTriangulation *h) { delete h; }

// Build from float32 points (n x 3), pre-sorted spatially by the caller.
// Returns a Status code (0 = OK).
int foam_build(FoamTriangulation *h, const float *points, int64_t n) {
    h->mesh = foam::Mesh();
    int status = foam::build(h->mesh, points, n);
    if (status != foam::OK) return status;
    foam::collect_tets(h->mesh, h->live_tets);
    return foam::adjacency(h->mesh, h->adj, h->offsets);
}

int64_t foam_num_tets(FoamTriangulation *h) {
    return (int64_t)h->live_tets.size();
}

// Update point coordinates in place and check whether the existing
// triangulation is still exactly Delaunay for them. Returns 0 if still
// valid (handle now reflects the new coordinates; tets/adjacency
// unchanged), 1 if a rebuild is required, 2 on a count mismatch.
int foam_revalidate(FoamTriangulation *h, const float *points, int64_t n) {
    if (n != h->mesh.n_real || h->mesh.tets.empty()) return 2;
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            h->mesh.pts[3 * i + d] = (double)points[3 * i + d];
    return foam::still_valid(h->mesh) ? 0 : 1;
}

// Export live finite tets as (T x 4) int32
void foam_get_tets(FoamTriangulation *h, int32_t *out) {
    for (size_t i = 0; i < h->live_tets.size(); ++i) {
        const foam::Tet &t = h->mesh.tets[h->live_tets[i]];
        for (int j = 0; j < 4; ++j) out[4 * i + j] = t.v[j];
    }
}

int64_t foam_adjacency_size(FoamTriangulation *h) {
    return (int64_t)h->adj.size();
}

void foam_get_adjacency(FoamTriangulation *h, uint32_t *adj_out,
                        uint32_t *offsets_out) {
    std::memcpy(adj_out, h->adj.data(), h->adj.size() * sizeof(uint32_t));
    std::memcpy(offsets_out, h->offsets.data(),
                h->offsets.size() * sizeof(uint32_t));
}

}  // extern "C"
