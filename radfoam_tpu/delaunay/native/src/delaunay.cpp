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
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <chrono>
#include <cstdio>

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
    // margin cache for incremental scans: 10 f32 per tet
    // [orient_margin, orient_R, face_margin[4], face_R[4]]; margin <= 0
    // means "recompute exactly". See mark_failures.
    std::vector<float> cert;
    bool certs_valid = false;  // cert margins match the last scan's coords
    std::vector<double> scan_pts;  // coords at the last completed scan
    std::vector<float> scan_fpts;  // float mirror scratch (see
                                   // mark_failures_dense; exact for real
                                   // vertices, rebuilt every dense scan)

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
            if (cert.size() >= (size_t)(id + 1) * 10)
                std::memset(&cert[(size_t)id * 10], 0, 10 * sizeof(float));
            return id;
        }
        tets.push_back(Tet());
        if (!cert.empty()) cert.resize(tets.size() * 10, 0.0f);
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

// build the mesh: points (n x 3 double), already spatially sorted.
// ins_scratch (optional, must be bound to m) reuses an Inserter's hash
// buckets/vectors across builds — the repair path constructs tens of
// thousands of small local DTs per call and the per-build allocations
// were a measurable share of its wall time.
static int build(Mesh &m, const double *points, int64_t n,
                 Inserter *ins_scratch = nullptr) {
    if (n < 4) return TOO_FEW;
    m.pts.resize(3 * (n + 4));
    m.n_real = n;
    // ~6.8 tets/point for random 3D Delaunay + cavity churn headroom:
    // push_back doubling copies of the tet array were 35% of the whole
    // update wall (gprof, round 4) before this reserve
    m.tets.reserve((size_t)(8 * n + 64));
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            double c = points[3 * i + d];
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
    // stale incremental-scan state from a previous mesh: drop it rather
    // than let alloc_tet keep a dead 10-float row per tet in sync
    m.cert.clear();
    m.certs_valid = false;
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

    Inserter local_ins(m);
    Inserter &ins = ins_scratch ? *ins_scratch : local_ins;
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

// ----------------------------------------------------------------------
// Incremental repair after point motion (reference semantics:
// delete-violations + local regrow, delaunay.cu:291-310 /
// delete_violations.cu). The TPU-native host design:
//
//   1. One exact scan marks every tet that is inverted or has a face that
//      is no longer locally Delaunay (the round-1 detector, generalized
//      to collect the full damage set instead of early-returning).
//   2. The damaged tets are carved; a fresh local Delaunay triangulation
//      of just their vertices (typically <<1% of the mesh) is built with
//      the same Bowyer-Watson inserter and exact predicates.
//   3. The hole is filled by flooding the local DT from the hole-boundary
//      faces; the fill must match the boundary watertight.
//   4. Before mutating anything, a certificate pass re-checks every new
//      and boundary face (orientation + strict local Delaunayness). By
//      the Delaunay lemma (a positively oriented triangulation whose
//      every interior face is locally Delaunay is globally Delaunay),
//      passing the certificate proves the repaired mesh is exactly the
//      Delaunay triangulation of the moved points. Any failure leaves the
//      mesh untouched and reports "full rebuild required".

struct FaceKey {
    int32_t a, b, c;  // sorted ascending
    bool operator==(const FaceKey &o) const {
        return a == o.a && b == o.b && c == o.c;
    }
};
struct FaceKeyHash {
    size_t operator()(const FaceKey &f) const {
        uint64_t x = (uint64_t)(uint32_t)f.a;
        x = x * 0x9E3779B97F4A7C15ull + (uint32_t)f.b;
        x = x * 0x9E3779B97F4A7C15ull + (uint32_t)f.c;
        x ^= x >> 29;
        x *= 0xBF58476D1CE4E5B9ull;
        x ^= x >> 32;
        return (size_t)x;
    }
};

static inline FaceKey face_key(int32_t x, int32_t y, int32_t z) {
    if (x > y) std::swap(x, y);
    if (y > z) std::swap(y, z);
    if (x > y) std::swap(x, y);
    return FaceKey{x, y, z};
}

// ----------------------------------------------------------------------
// Wide float-stage predicate filters for the global-motion scan.
//
// Real vertices enter the engine as float32 (foam_build / foam_update)
// and are stored as doubles unchanged, so casting them back to float is
// EXACT — a float filter with a certified forward error bound decides
// the sign of the true determinant for the overwhelming majority of
// faces, at 16 lanes per vector op (GCC vector extensions; one AVX-512
// register or two AVX2 halves) and half the coordinate memory traffic
// of the double table (the 2M-point float mirror mostly fits in L3; the
// double table does not). Lanes the float stage cannot decide fall back
// to the scalar double-filter + exact-expansion path, and any predicate
// involving a super-tet vertex (whose coords are computed in double and
// are NOT float-exact) is routed to the double path outright, so every
// decision remains exact. Only the regime where the margin cache is off
// (global training motion, see mark_failures) uses this stage.

typedef float vfs __attribute__((vector_size(16 * sizeof(float))));
static const int kFLanes = 16;

static inline vfs vabsf(vfs x) { return x > 0.0f ? x : -x; }

static const float kEpsF = 1.1920928955078125e-07f;  // 2^-23, conservative
static const float kOrientErrF = (7.0f + 56.0f * kEpsF) * kEpsF;
static const float kInsphereErrF = (16.0f + 224.0f * kEpsF) * kEpsF;

struct WideOrient {
    vfs ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz;

    void load(int l, const float *a, const float *b, const float *c,
              const float *d) {
        ax[l] = a[0]; ay[l] = a[1]; az[l] = a[2];
        bx[l] = b[0]; by[l] = b[1]; bz[l] = b[2];
        cx[l] = c[0]; cy[l] = c[1]; cz[l] = c[2];
        dx[l] = d[0]; dy[l] = d[1]; dz[l] = d[2];
    }

    // out[l] = +1/-1 when the float filter certifies the sign, 0 when
    // the double/exact fallback is required
    void filter(int cnt, int *out) const {
        vfs adx = ax - dx, ady = ay - dy, adz = az - dz;
        vfs bdx = bx - dx, bdy = by - dy, bdz = bz - dz;
        vfs cdx = cx - dx, cdy = cy - dy, cdz = cz - dz;
        vfs bdxcdy = bdx * cdy, bdycdx = bdy * cdx;
        vfs cdxady = cdx * ady, cdyadx = cdy * adx;
        vfs adxbdy = adx * bdy, adybdx = ady * bdx;
        vfs det = adz * (bdxcdy - bdycdx) + bdz * (cdxady - cdyadx) +
                  cdz * (adxbdy - adybdx);
        vfs permanent =
            (vabsf(bdxcdy) + vabsf(bdycdx)) * vabsf(adz) +
            (vabsf(cdxady) + vabsf(cdyadx)) * vabsf(bdz) +
            (vabsf(adxbdy) + vabsf(adybdx)) * vabsf(cdz);
        vfs errbound = kOrientErrF * permanent;
        for (int l = 0; l < cnt; ++l)
            out[l] = det[l] > errbound[l] ? 1
                     : det[l] < -errbound[l] ? -1 : 0;
    }
};

struct WideInsphere {
    vfs ax, ay, az, bx, by, bz, cx, cy, cz, dx, dy, dz, ex, ey, ez;

    void load(int l, const float *a, const float *b, const float *c,
              const float *d, const float *e) {
        ax[l] = a[0]; ay[l] = a[1]; az[l] = a[2];
        bx[l] = b[0]; by[l] = b[1]; bz[l] = b[2];
        cx[l] = c[0]; cy[l] = c[1]; cz[l] = c[2];
        dx[l] = d[0]; dy[l] = d[1]; dz[l] = d[2];
        ex[l] = e[0]; ey[l] = e[1]; ez[l] = e[2];
    }

    void filter(int cnt, int *out) const {
        vfs aex = ax - ex, aey = ay - ey, aez = az - ez;
        vfs bex = bx - ex, bey = by - ey, bez = bz - ez;
        vfs cex = cx - ex, cey = cy - ey, cez = cz - ez;
        vfs dex = dx - ex, dey = dy - ey, dez = dz - ez;

        vfs ab = aex * bey - bex * aey;
        vfs bc = bex * cey - cex * bey;
        vfs cd = cex * dey - dex * cey;
        vfs da = dex * aey - aex * dey;
        vfs ac = aex * cey - cex * aey;
        vfs bd = bex * dey - dex * bey;

        vfs abc = aez * bc - bez * ac + cez * ab;
        vfs bcd = bez * cd - cez * bd + dez * bc;
        vfs cda = cez * da + dez * ac + aez * cd;
        vfs dab = dez * ab + aez * bd + bez * da;

        vfs alift = aex * aex + aey * aey + aez * aez;
        vfs blift = bex * bex + bey * bey + bez * bez;
        vfs clift = cex * cex + cey * cey + cez * cez;
        vfs dlift = dex * dex + dey * dey + dez * dez;

        vfs det = (dlift * abc - clift * dab) + (blift * cda - alift * bcd);

        vfs aezp = vabsf(aez), bezp = vabsf(bez);
        vfs cezp = vabsf(cez), dezp = vabsf(dez);
        vfs axbyp = vabsf(aex * bey), bxayp = vabsf(bex * aey);
        vfs bxcyp = vabsf(bex * cey), cxbyp = vabsf(cex * bey);
        vfs cxdyp = vabsf(cex * dey), dxcyp = vabsf(dex * cey);
        vfs dxayp = vabsf(dex * aey), axdyp = vabsf(aex * dey);
        vfs axcyp = vabsf(aex * cey), cxayp = vabsf(cex * aey);
        vfs bxdyp = vabsf(bex * dey), dxbyp = vabsf(dex * bey);
        vfs permanent =
            ((cxdyp + dxcyp) * bezp + (dxbyp + bxdyp) * cezp +
             (bxcyp + cxbyp) * dezp) * alift +
            ((dxayp + axdyp) * cezp + (axcyp + cxayp) * dezp +
             (cxdyp + dxcyp) * aezp) * blift +
            ((axbyp + bxayp) * dezp + (bxdyp + dxbyp) * aezp +
             (dxayp + axdyp) * bezp) * clift +
            ((bxcyp + cxbyp) * aezp + (cxayp + axcyp) * bezp +
             (axbyp + bxayp) * cezp) * dlift;
        vfs errbound = kInsphereErrF * permanent;
        for (int l = 0; l < cnt; ++l)
            out[l] = det[l] > errbound[l] ? 1
                     : det[l] < -errbound[l] ? -1 : 0;
    }
};

// Global-motion scan body (margin cache off — see mark_failures for the
// regime decision): identical marking semantics to the scalar loop, with
// the per-face predicates batched 16-wide through the float stage above.
// Faces queue up while the tet walk runs ahead (the two-level prefetch
// keeps the dependent tet/vertex/apex loads in flight), then resolve in
// SIMD batches; only filter-ambiguous lanes pay the scalar double path.
static int64_t mark_failures_dense(Mesh &m, std::vector<uint8_t> &fail,
                                   const std::vector<uint8_t> &moved,
                                   bool have_prev) {
    int64_t ntets = (int64_t)m.tets.size();
    int64_t n = m.n_real;
    int64_t n_marked = 0;

    std::vector<float> &fp = m.scan_fpts;
    fp.resize(m.pts.size());
    for (size_t i = 0; i < m.pts.size(); ++i) fp[i] = (float)m.pts[i];
    const float *F = fp.data();

    auto mark = [&](int32_t x) {
        if (!fail[x]) { fail[x] = 1; ++n_marked; }
    };

    WideOrient oq = {};
    int32_t oq_t[kFLanes];
    int on = 0;
    WideInsphere iq = {};
    int32_t iq_t[kFLanes], iq_nb[kFLanes], iq_apex[kFLanes];
    int in_ = 0;

    auto flush_faces = [&]() {
        int sg[kFLanes];
        iq.filter(in_, sg);
        for (int l = 0; l < in_; ++l) {
            int s = sg[l];
            if (s == 0) {
                const Tet &tt = m.tets[iq_t[l]];
                s = insphere_sign(m.P(tt.v[0]), m.P(tt.v[1]), m.P(tt.v[2]),
                                  m.P(tt.v[3]), m.P(iq_apex[l]));
            }
            if (s >= 0) { mark(iq_t[l]); mark(iq_nb[l]); }
        }
        in_ = 0;
    };

    // vu = the tet's own vertices are unmoved (orientation + unmoved
    // faces hold verbatim by the post-repair invariant; only faces with
    // a moved apex need re-checking)
    auto emit_faces = [&](int32_t t, const Tet &tet, bool vu) {
        bool super = tet.v[0] >= n || tet.v[1] >= n || tet.v[2] >= n ||
                     tet.v[3] >= n;
        for (int i = 0; i < 4; ++i) {
            int32_t nb = tet.n[i];
            if (nb == kNone || nb < t) continue;  // visit once
            const Tet &other = m.tets[nb];
            int32_t apex = kNone;
            for (int j = 0; j < 4; ++j)
                if (other.n[j] == t) { apex = other.v[j]; break; }
            if (apex == kNone) {
                mark(t);
                mark(nb);
                continue;
            }
            if (vu && !moved[apex]) continue;
            if (super || apex >= n) {
                int s = insphere_sign(m.P(tet.v[0]), m.P(tet.v[1]),
                                      m.P(tet.v[2]), m.P(tet.v[3]),
                                      m.P(apex));
                if (s >= 0) { mark(t); mark(nb); }
                continue;
            }
            iq.load(in_, F + 3 * tet.v[0], F + 3 * tet.v[1],
                    F + 3 * tet.v[2], F + 3 * tet.v[3], F + 3 * apex);
            iq_t[in_] = t;
            iq_nb[in_] = nb;
            iq_apex[in_] = apex;
            if (++in_ == kFLanes) flush_faces();
        }
    };

    auto flush_orient = [&]() {
        int sg[kFLanes];
        oq.filter(on, sg);
        int n_keep = on;
        on = 0;  // before emit_faces can refill anything
        for (int l = 0; l < n_keep; ++l) {
            int32_t t = oq_t[l];
            const Tet &tet = m.tets[t];
            int s = sg[l];
            if (s == 0)
                s = orient3d_sign(m.P(tet.v[0]), m.P(tet.v[1]),
                                  m.P(tet.v[2]), m.P(tet.v[3]));
            if (s <= 0) {
                mark(t);
                continue;  // matches the scalar loop: no face checks
            }
            emit_faces(t, tet, false);
        }
    };

    for (int64_t t = 0; t < ntets; ++t) {
        const int64_t PF1 = 16, PF2 = 6;
        if (t + PF1 < ntets) {
            const Tet &ft = m.tets[t + PF1];
            if (ft.alive) {
                for (int i = 0; i < 4; ++i) {
                    __builtin_prefetch(&F[3 * ft.v[i]]);
                    if (ft.n[i] >= (int32_t)(t + PF1))
                        __builtin_prefetch(&m.tets[ft.n[i]]);
                }
            }
        }
        if (t + PF2 < ntets) {
            const Tet &ft = m.tets[t + PF2];
            if (ft.alive) {
                for (int i = 0; i < 4; ++i) {
                    int32_t nb = ft.n[i];
                    if (nb < (int32_t)(t + PF2)) continue;
                    const Tet &other = m.tets[nb];
                    for (int j = 0; j < 4; ++j)
                        if (other.n[j] == (int32_t)(t + PF2)) {
                            __builtin_prefetch(&F[3 * other.v[j]]);
                            break;
                        }
                }
            }
        }
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        bool vu = have_prev && !moved[tet.v[0]] && !moved[tet.v[1]] &&
                  !moved[tet.v[2]] && !moved[tet.v[3]];
        if (vu) {
            bool all_ok = true;
            for (int i = 0; i < 4 && all_ok; ++i) {
                int32_t nb = tet.n[i];
                if (nb == kNone || nb < (int32_t)t) continue;
                const Tet &other = m.tets[nb];
                int32_t apex = kNone;
                for (int j = 0; j < 4; ++j)
                    if (other.n[j] == (int32_t)t) {
                        apex = other.v[j];
                        break;
                    }
                if (apex == kNone || moved[apex]) all_ok = false;
            }
            if (all_ok) continue;
            emit_faces((int32_t)t, tet, true);
            continue;
        }
        if (tet.v[0] >= n || tet.v[1] >= n || tet.v[2] >= n ||
            tet.v[3] >= n) {
            int s = orient3d_sign(m.P(tet.v[0]), m.P(tet.v[1]),
                                  m.P(tet.v[2]), m.P(tet.v[3]));
            if (s <= 0) {
                mark((int32_t)t);
                continue;
            }
            emit_faces((int32_t)t, tet, false);
            continue;
        }
        oq.load(on, F + 3 * tet.v[0], F + 3 * tet.v[1], F + 3 * tet.v[2],
                F + 3 * tet.v[3]);
        oq_t[on] = (int32_t)t;
        if (++on == kFLanes) flush_orient();
    }
    flush_orient();
    flush_faces();
    return n_marked;
}

// mark every tet violating orientation or local Delaunayness (both sides
// of a failing face are marked). Returns the number of marked tets.
//
// MARGIN CACHE: an exact check at scan k certifies |det| >= margin. The
// determinant is a polynomial in the coordinates; if every involved point
// has moved at most delta since then, |det| can have changed by at most a
// Lipschitz bound B(R, delta) (derived by row-wise multilinearity:
// orient3d rows have entries <= R and cofactors <= 2R^2, so
// |ddet| <= 3 rows * 3 entries * 2*delta * 2R'^2 = 36 R'^2 delta, padded to
// 64; the insphere matrix adds the lifted column with entries <= R'^2 and
// cofactors <= 6R'^3/6R'^4, giving |ddet| <= 264 R'^4 delta, padded to
// 512; both with R' = R + 2 delta, valid for delta <= 0.05 R'). While
// margin > B the sign provably cannot flip, so the exact predicate is
// skipped and the cached margin is decremented by B (staying a certified
// bound). This makes the steady-state scan cost a few flops per face for
// small motions instead of a full filtered predicate.
static int64_t mark_failures(Mesh &m, std::vector<uint8_t> &fail) {
    fail.assign(m.tets.size(), 0);
    int64_t n_marked = 0;
    int64_t ntets = (int64_t)m.tets.size();

    int64_t n = m.n_real;
    bool have_prev = m.scan_pts.size() == m.pts.size();
    std::vector<float> delta(n + 4, 0.0f);
    // dense moved-bitmask: the steady-state scan is memory-bound on the
    // four random per-vertex delta loads per tet; most points do not
    // move between scans (triangulation cadence ≤ 100 optimizer steps),
    // and a byte mask for "moved" keeps the hot lookups inside L2
    std::vector<uint8_t> moved(n + 4, 0);
    int64_t n_moved = 0;
    if (have_prev) {
        for (int64_t i = 0; i < n; ++i) {
            double dx = m.pts[3 * i] - m.scan_pts[3 * i];
            double dy = m.pts[3 * i + 1] - m.scan_pts[3 * i + 1];
            double dz = m.pts[3 * i + 2] - m.scan_pts[3 * i + 2];
            double d2 = dx * dx + dy * dy + dz * dz;
            if (d2 > 0.0) {
                moved[i] = 1;
                ++n_moved;
                delta[i] = std::nextafterf((float)std::sqrt(d2), 1e30f);
            }
        }
    }
    // The margin cache only pays when motion is SPARSE: under global
    // optimizer motion (every point moves, the mid-training regime) the
    // Lipschitz bounds exceed the cached margins at trained cell sizes,
    // so every decrement attempt fails and the cache costs 40 B/tet of
    // traffic plus the bound arithmetic on top of the predicates it was
    // meant to avoid (measured 2.2x on the 14M-tet scan). Unmoved tets
    // need no certificate at all: an alive tet was part of a mesh that
    // was globally Delaunay at scan_pts (post-repair invariant), so an
    // unmoved closed star is still locally Delaunay verbatim.
    bool sparse = have_prev && n_moved > 0 && n_moved < n / 16;
    bool certs_were_valid = m.certs_valid;
    bool use_certs = sparse && certs_were_valid;
    bool store_certs = sparse;
    if (store_certs && !certs_were_valid) {
        // Re-entering the sparse regime after >=1 non-sparse scan: any
        // cached margin may have been computed at coords from BEFORE the
        // uncertified period (rows skipped by the verts_unmoved fast path
        // are not refreshed), so zero the WHOLE cache — margin <= 0 reads
        // as "recompute exactly". A resize() here would silently trust
        // stale margins and could certify a non-Delaunay tet.
        m.cert.assign((size_t)ntets * 10, 0.0f);
    } else if (store_certs && m.cert.size() < (size_t)ntets * 10) {
        m.cert.resize((size_t)ntets * 10, 0.0f);
    }
    m.certs_valid = store_certs;

    if (!use_certs && !store_certs) {
        // global-motion regime: no margins to maintain — take the
        // 16-lane float-stage scan (exact decisions, see above)
        int64_t r = mark_failures_dense(m, fail, moved, have_prev);
        m.scan_pts = m.pts;
        return r;
    }

    auto row_R3 = [&](const Tet &t) {
        const double *d = m.P(t.v[3]);
        double r = 0.0;
        for (int i = 0; i < 3; ++i) {
            const double *p = m.P(t.v[i]);
            double dx = p[0] - d[0], dy = p[1] - d[1], dz = p[2] - d[2];
            r = std::max(r, dx * dx + dy * dy + dz * dz);
        }
        return std::sqrt(r);
    };
    auto row_R5 = [&](const Tet &t, const double *e) {
        double r = 0.0;
        for (int i = 0; i < 4; ++i) {
            const double *p = m.P(t.v[i]);
            double dx = p[0] - e[0], dy = p[1] - e[1], dz = p[2] - e[2];
            r = std::max(r, dx * dx + dy * dy + dz * dz);
        }
        return std::sqrt(r);
    };

    for (int64_t t = 0; t < ntets; ++t) {
        // The scan is latency-bound: ~14 dependent random loads per tet
        // (4 vertex rows, up to 4 neighbor tets, their apex rows) mostly
        // missing L2. Two-level software prefetch overlaps them — far
        // ahead for the first-level targets (vertices + neighbor tets),
        // nearer for the apex coords that need the neighbor struct
        // resident first.
        const int64_t PF1 = 16, PF2 = 6;
        if (t + PF1 < ntets) {
            const Tet &ft = m.tets[t + PF1];
            if (ft.alive) {
                if (use_certs)
                    __builtin_prefetch(&m.cert[(size_t)(t + PF1) * 10]);
                for (int i = 0; i < 4; ++i) {
                    __builtin_prefetch(m.P(ft.v[i]));
                    if (ft.n[i] >= (int32_t)(t + PF1))
                        __builtin_prefetch(&m.tets[ft.n[i]]);
                }
            }
        }
        if (t + PF2 < ntets) {
            const Tet &ft = m.tets[t + PF2];
            if (ft.alive) {
                for (int i = 0; i < 4; ++i) {
                    int32_t nb = ft.n[i];
                    if (nb < (int32_t)(t + PF2)) continue;
                    const Tet &other = m.tets[nb];
                    for (int j = 0; j < 4; ++j)
                        if (other.n[j] == (int32_t)(t + PF2)) {
                            __builtin_prefetch(m.P(other.v[j]));
                            break;
                        }
                }
            }
        }
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        bool verts_unmoved = have_prev && !moved[tet.v[0]] &&
                             !moved[tet.v[1]] && !moved[tet.v[2]] &&
                             !moved[tet.v[3]];
        // steady-state fast path (cert-free, exact): nothing in this
        // tet's closed star moved since scan_pts, at which coords the
        // whole mesh was Delaunay -> orientation and every face
        // condition hold verbatim
        if (verts_unmoved) {
            bool all_ok = true;
            for (int i = 0; i < 4 && all_ok; ++i) {
                int32_t nb = tet.n[i];
                if (nb == kNone || nb < (int32_t)t) continue;
                int32_t apex = kNone;
                const Tet &other = m.tets[nb];
                for (int j = 0; j < 4; ++j)
                    if (other.n[j] == (int32_t)t) { apex = other.v[j]; break; }
                if (apex == kNone || moved[apex]) all_ok = false;
            }
            if (all_ok) continue;
        }
        float *ct = (use_certs || store_certs)
                        ? &m.cert[(size_t)t * 10]
                        : nullptr;
        // d4/d5 feed only the certificate bound checks; under global
        // motion (use_certs false) the 4-5 random delta[] loads per tet
        // were pure overhead (measured: warm global-motion scans SLOWER
        // than cold ones)
        double d4 = 1e300;
        if (use_certs)
            d4 = std::max(std::max(delta[tet.v[0]], delta[tet.v[1]]),
                          std::max(delta[tet.v[2]], delta[tet.v[3]]));

        // orientation: an unmoved tet is positively oriented by the
        // post-repair invariant even when a moved apex forces the face
        // checks below
        bool ok_cached = verts_unmoved;
        if (!ok_cached && use_certs && ct[0] > 0.0f) {
            double Rp = (double)ct[1] + 2.0 * d4;
            if (d4 <= 0.05 * Rp) {
                double bound = 64.0 * Rp * Rp * d4;
                if ((double)ct[0] > bound) {
                    ct[0] = std::nextafterf((float)((double)ct[0] - bound),
                                            -1e30f);
                    ct[1] = std::nextafterf((float)Rp, 1e30f);
                    ok_cached = ct[0] > 0.0f;
                }
            }
        }
        if (!ok_cached) {
            double mg = 0.0;
            int sg = orient3d_sign_margin(m.P(tet.v[0]), m.P(tet.v[1]),
                                          m.P(tet.v[2]), m.P(tet.v[3]),
                                          store_certs ? &mg : nullptr);
            if (sg <= 0) {
                if (ct) ct[0] = 0.0f;
                if (!fail[t]) { fail[t] = 1; ++n_marked; }
                continue;
            }
            if (store_certs) {
                ct[0] = std::nextafterf((float)mg, -1e30f);
                if (ct[0] < 0.0f) ct[0] = 0.0f;
                ct[1] = std::nextafterf((float)row_R3(tet), 1e30f);
            }
        }

        for (int i = 0; i < 4; ++i) {
            int32_t nb = tet.n[i];
            if (nb == kNone || nb < (int32_t)t) continue;  // visit once
            const Tet &other = m.tets[nb];
            int32_t apex = kNone;
            for (int j = 0; j < 4; ++j)
                if (other.n[j] == (int32_t)t) { apex = other.v[j]; break; }
            if (apex == kNone) {
                if (!fail[t]) { fail[t] = 1; ++n_marked; }
                if (!fail[nb]) { fail[nb] = 1; ++n_marked; }
                continue;
            }
            // unchanged face: both tets' closed-star subsets involved in
            // this condition are at their scan_pts coords
            if (verts_unmoved && !moved[apex]) continue;
            bool face_ok = false;
            if (use_certs && ct[2 + i] > 0.0f) {
                double d5 = std::max(d4, (double)delta[apex]);
                double Rp = (double)ct[6 + i] + 2.0 * d5;
                if (d5 <= 0.05 * Rp) {
                    double bound = 512.0 * Rp * Rp * Rp * Rp * d5;
                    if ((double)ct[2 + i] > bound) {
                        ct[2 + i] = std::nextafterf(
                            (float)((double)ct[2 + i] - bound), -1e30f);
                        ct[6 + i] = std::nextafterf((float)Rp, 1e30f);
                        face_ok = ct[2 + i] > 0.0f;
                    }
                }
            }
            if (!face_ok) {
                double mg = 0.0;
                int sg = insphere_sign_margin(
                    m.P(tet.v[0]), m.P(tet.v[1]), m.P(tet.v[2]),
                    m.P(tet.v[3]), m.P(apex), store_certs ? &mg : nullptr);
                if (sg >= 0) {
                    if (ct) ct[2 + i] = 0.0f;
                    if (!fail[t]) { fail[t] = 1; ++n_marked; }
                    if (!fail[nb]) { fail[nb] = 1; ++n_marked; }
                } else if (store_certs) {
                    ct[2 + i] = std::nextafterf((float)mg, -1e30f);
                    if (ct[2 + i] < 0.0f) ct[2 + i] = 0.0f;
                    ct[6 + i] = std::nextafterf(
                        (float)row_R5(tet, m.P(apex)), 1e30f);
                }
            }
        }
    }
    m.scan_pts = m.pts;
    return n_marked;
}

struct RepairResult {
    int status;       // OK = repaired or already valid; else rebuild
    bool changed;     // true if tets were replaced
    int64_t n_bad;    // damage-set size (diagnostics)
    int64_t n_local;  // local DT vertex count (diagnostics)
};

// hole-boundary face record: carved-side faces whose neighbor is kept
struct BFace {
    int32_t kept, kept_slot, apex;
    int32_t consumed;
};
// local face map entry: global face key -> up to two (local tet, slot)
struct FaceSlots {
    int32_t t0 = kNone, s0 = -1, t1 = kNone, s1 = -1;
};

// per-call scratch for try_repair: one training-scale repair runs tens
// of thousands of small component repairs, and a fresh Mesh + Inserter +
// two hash maps + five vectors per component was ~half the repair wall
// (the local DTs themselves are ~15 inserts each). Containers are
// clear()ed per component so their buckets/capacity persist.
struct RepairScratch {
    Mesh lm;
    Inserter ins{lm};
    std::vector<double> coords;
    std::unordered_map<FaceKey, BFace, FaceKeyHash> bmap;
    std::unordered_map<FaceKey, FaceSlots, FaceKeyHash> lfaces;
    std::vector<int8_t> in_fill;
    std::vector<int32_t> fill, stack, l2g, W;
};

static RepairResult repair_attempt(Mesh &m,
                                   const std::vector<int32_t> &carve,
                                   const std::vector<uint8_t> &in_carve,
                                   std::vector<int32_t> *w_out,
                                   RepairScratch &S) {
    RepairResult rr{OK, false, (int64_t)carve.size(), 0};

    // vertex set W of the carved region (global ids; supers included).
    // dedup via sort — an O(n_real) seen-array here cost more than the
    // whole local DT when thousands of small components repair per call
    std::vector<int32_t> &W = S.W;
    W.clear();
    W.reserve(carve.size() * 4);
    for (int32_t tid : carve)
        for (int i = 0; i < 4; ++i) W.push_back(m.tets[tid].v[i]);
    std::sort(W.begin(), W.end());
    W.erase(std::unique(W.begin(), W.end()), W.end());
    // caller pre-sorts points spatially,
                                    // so id order ~ Morton order
    rr.n_local = (int64_t)W.size();
    if (w_out) *w_out = W;

    // hole boundary: carved-side faces whose neighbor is kept (or kNone)
    auto &bmap = S.bmap;
    bmap.clear();
    bmap.reserve(carve.size() * 2);
    for (int32_t tid : carve) {
        const Tet &t = m.tets[tid];
        for (int i = 0; i < 4; ++i) {
            int32_t nb = t.n[i];
            if (nb != kNone && in_carve[nb]) continue;  // hole-internal
            FaceKey key = face_key(t.v[kFace[i][0]], t.v[kFace[i][1]],
                                   t.v[kFace[i][2]]);
            int kept_slot = -1;
            if (nb != kNone) {
                for (int j = 0; j < 4; ++j)
                    if (m.tets[nb].n[j] == tid) { kept_slot = j; break; }
                if (kept_slot < 0) { rr.status = INTERNAL; return rr; }
            }
            bmap.emplace(key, BFace{nb, kept_slot, t.v[i], 0});
        }
    }

    // local Delaunay triangulation of W (exact same double coords)
    Mesh &lm = S.lm;
    {
        auto &coords = S.coords;
        coords.resize(3 * W.size());
        for (size_t i = 0; i < W.size(); ++i)
            for (int d = 0; d < 3; ++d) coords[3 * i + d] = m.P(W[i])[d];
        if ((int64_t)W.size() < 4 ||
            build(lm, coords.data(), (int64_t)W.size(), &S.ins) != OK) {
            rr.status = DEGENERATE;
            return rr;
        }
    }
    int64_t nW = (int64_t)W.size();

    // local face map: global face key -> up to two (local tet, slot)
    auto &lfaces = S.lfaces;
    lfaces.clear();
    lfaces.reserve(lm.tets.size() * 2);
    for (int64_t lt = 0; lt < (int64_t)lm.tets.size(); ++lt) {
        const Tet &t = lm.tets[lt];
        if (!t.alive) continue;
        for (int i = 0; i < 4; ++i) {
            int32_t f0 = t.v[kFace[i][0]], f1 = t.v[kFace[i][1]],
                    f2 = t.v[kFace[i][2]];
            if (f0 >= nW || f1 >= nW || f2 >= nW) continue;  // local super
            FaceKey key = face_key(W[f0], W[f1], W[f2]);
            FaceSlots &fs = lfaces[key];
            if (fs.t0 == kNone) { fs.t0 = (int32_t)lt; fs.s0 = i; }
            else { fs.t1 = (int32_t)lt; fs.s1 = i; }
        }
    }

    // flood the fill region from every boundary face, staying on the
    // carved-apex side and never crossing the local hull
    auto &in_fill = S.in_fill;
    in_fill.assign(lm.tets.size(), 0);
    auto &fill = S.fill;
    auto &stack = S.stack;
    fill.clear();
    stack.clear();
    auto local_has_super = [&](int32_t lt) {
        const Tet &t = lm.tets[lt];
        return t.v[0] >= nW || t.v[1] >= nW || t.v[2] >= nW || t.v[3] >= nW;
    };
    for (auto &kv : bmap) {
        const FaceKey &key = kv.first;
        BFace &bf = kv.second;
        auto it = lfaces.find(key);
        if (it == lfaces.end()) { rr.status = INTERNAL; return rr; }
        int s_apex = orient3d_sign(m.P(key.a), m.P(key.b), m.P(key.c),
                                   m.P(bf.apex));
        if (s_apex == 0) { rr.status = DEGENERATE; return rr; }
        int32_t seed = kNone;
        for (int cand = 0; cand < 2; ++cand) {
            int32_t lt = cand == 0 ? it->second.t0 : it->second.t1;
            int slot = cand == 0 ? it->second.s0 : it->second.s1;
            if (lt == kNone) continue;
            int32_t d_local = lm.tets[lt].v[slot];
            if (d_local >= nW) continue;  // apex is a local super vertex
            int s = orient3d_sign(m.P(key.a), m.P(key.b), m.P(key.c),
                                  m.P(W[d_local]));
            if (s == s_apex) { seed = lt; break; }
        }
        if (seed == kNone) { rr.status = INTERNAL; return rr; }
        if (!in_fill[seed]) {
            in_fill[seed] = 1;
            fill.push_back(seed);
            stack.push_back(seed);
        }
    }
    while (!stack.empty()) {
        int32_t lt = stack.back();
        stack.pop_back();
        const Tet &t = lm.tets[lt];
        for (int i = 0; i < 4; ++i) {
            int32_t f0 = t.v[kFace[i][0]], f1 = t.v[kFace[i][1]],
                    f2 = t.v[kFace[i][2]];
            bool super_face = f0 >= nW || f1 >= nW || f2 >= nW;
            if (!super_face) {
                FaceKey key = face_key(W[f0], W[f1], W[f2]);
                if (bmap.count(key)) continue;  // stop at the hole boundary
            }
            int32_t nb = t.n[i];
            if (nb == kNone || super_face || local_has_super(nb)) {
                // leaked out of the hole
                rr.status = INTERNAL;
                return rr;
            }
            if (!in_fill[nb]) {
                in_fill[nb] = 1;
                fill.push_back(nb);
                stack.push_back(nb);
            }
        }
    }

    // watertightness: every fill face is either shared inside the fill or
    // consumes exactly one boundary face (on the correct side)
    for (int32_t lt : fill) {
        const Tet &t = lm.tets[lt];
        if (local_has_super(lt)) { rr.status = INTERNAL; return rr; }
        for (int i = 0; i < 4; ++i) {
            FaceKey key = face_key(W[t.v[kFace[i][0]]], W[t.v[kFace[i][1]]],
                                   W[t.v[kFace[i][2]]]);
            auto bit = bmap.find(key);
            if (bit != bmap.end()) {
                bit->second.consumed++;
            } else {
                int32_t nb = t.n[i];
                if (nb == kNone || !in_fill[nb]) {
                    rr.status = INTERNAL;
                    return rr;
                }
            }
        }
    }
    for (auto &kv : bmap)
        if (kv.second.consumed != 1) { rr.status = INTERNAL; return rr; }

    // certificate (pre-splice): every fill tet positively oriented; every
    // fill-fill and fill-kept face strictly locally Delaunay both ways
    for (int32_t lt : fill) {
        const Tet &t = lm.tets[lt];
        const double *q0 = m.P(W[t.v[0]]), *q1 = m.P(W[t.v[1]]),
                     *q2 = m.P(W[t.v[2]]), *q3 = m.P(W[t.v[3]]);
        if (orient3d_sign(q0, q1, q2, q3) <= 0) {
            rr.status = DEGENERATE;
            return rr;
        }
        for (int i = 0; i < 4; ++i) {
            FaceKey key = face_key(W[t.v[kFace[i][0]]], W[t.v[kFace[i][1]]],
                                   W[t.v[kFace[i][2]]]);
            auto bit = bmap.find(key);
            if (bit != bmap.end()) {
                const BFace &bf = bit->second;
                if (bf.kept == kNone) continue;  // outer super boundary
                const Tet &kt = m.tets[bf.kept];
                int32_t kept_apex = kt.v[bf.kept_slot];
                if (insphere_sign(q0, q1, q2, q3, m.P(kept_apex)) >= 0 ||
                    insphere_sign(m.P(kt.v[0]), m.P(kt.v[1]), m.P(kt.v[2]),
                                  m.P(kt.v[3]), m.P(W[t.v[i]])) >= 0) {
                    rr.status = INTERNAL;
                    return rr;
                }
            } else {
                int32_t nb = t.n[i];
                // apex of the neighbor across this face
                const Tet &nt = lm.tets[nb];
                int32_t apex = kNone;
                for (int j = 0; j < 4; ++j)
                    if (nt.n[j] == lt) { apex = nt.v[j]; break; }
                if (apex == kNone ||
                    insphere_sign(q0, q1, q2, q3, m.P(W[apex])) >= 0) {
                    rr.status = INTERNAL;
                    return rr;
                }
            }
        }
    }

    // splice: kill the carved tets, materialize the fill with global ids
    for (int32_t tid : carve) {
        m.tets[tid].alive = 0;
        m.free_list.push_back(tid);
    }
    auto &l2g = S.l2g;
    l2g.assign(lm.tets.size(), kNone);
    for (int32_t lt : fill) l2g[lt] = m.alloc_tet();
    for (int32_t lt : fill) {
        const Tet &src = lm.tets[lt];
        int32_t gid = l2g[lt];
        Tet &dst = m.tets[gid];
        for (int i = 0; i < 4; ++i) dst.v[i] = W[src.v[i]];
        for (int i = 0; i < 4; ++i) {
            FaceKey key = face_key(dst.v[kFace[i][0]], dst.v[kFace[i][1]],
                                   dst.v[kFace[i][2]]);
            auto bit = bmap.find(key);
            if (bit != bmap.end()) {
                const BFace &bf = bit->second;
                dst.n[i] = bf.kept;
                if (bf.kept != kNone) {
                    m.tets[bf.kept].n[bf.kept_slot] = gid;
                    // the kept tet's cached face margin was certified
                    // against the old (carved) apex — invalidate it
                    if (m.cert.size() >= (size_t)(bf.kept + 1) * 10)
                        m.cert[(size_t)bf.kept * 10 + 2 + bf.kept_slot] =
                            0.0f;
                }
            } else {
                dst.n[i] = l2g[src.n[i]];
            }
        }
    }
    rr.changed = true;
    return rr;
}

// grow one component by a vertex ring: every live tet whose vertex set
// touches W joins the component. Tets incident to a vertex v form a
// face-connected star, so they are reachable by a BFS restricted to tets
// containing v — no O(T) pass. Returns tets appended to `tets_of`;
// absorbed tets of OTHER components are relabeled (the caller must skip
// components whose tets were absorbed).
static int64_t grow_component(Mesh &m, const std::vector<int32_t> &W,
                              std::vector<int32_t> &comp_of, int32_t cid,
                              std::vector<int32_t> &tets_of) {
    // W is sorted (repair_attempt) — membership by binary search, seeds
    // in a small map: no O(n_real) scratch per retry
    auto in_W = [&](int32_t v) {
        return std::binary_search(W.begin(), W.end(), v);
    };
    std::unordered_map<int32_t, int32_t> seed;
    seed.reserve(W.size() * 2);
    for (int32_t tid : tets_of) {
        const Tet &t = m.tets[tid];
        for (int i = 0; i < 4; ++i)
            if (in_W(t.v[i])) seed[t.v[i]] = tid;
    }
    int64_t added = 0;
    std::vector<int32_t> stack;
    std::vector<int32_t> seen_l;
    for (int32_t v : W) {
        auto sit = seed.find(v);
        if (sit == seed.end()) continue;
        stack.clear();
        stack.push_back(sit->second);
        seen_l.clear();
        seen_l.push_back(sit->second);
        // walk the (face-connected) star of v
        while (!stack.empty()) {
            int32_t tid = stack.back();
            stack.pop_back();
            const Tet &t = m.tets[tid];
            int vslot = -1;
            for (int i = 0; i < 4; ++i)
                if (t.v[i] == v) { vslot = i; break; }
            for (int i = 0; i < 4; ++i) {
                // the face opposite slot i contains v iff i != vslot
                if (i == vslot) continue;
                int32_t nb = t.n[i];
                if (nb == kNone || !m.tets[nb].alive) continue;
                bool has_v = false;
                for (int j = 0; j < 4; ++j)
                    if (m.tets[nb].v[j] == v) { has_v = true; break; }
                if (!has_v) continue;
                bool dup = false;
                for (int32_t s : seen_l)
                    if (s == nb) { dup = true; break; }
                if (dup) continue;
                seen_l.push_back(nb);
                stack.push_back(nb);
            }
        }
        for (int32_t tid : seen_l) {
            if (comp_of[tid] == cid) continue;
            comp_of[tid] = cid;
            tets_of.push_back(tid);
            ++added;
        }
    }
    return added;
}

static RepairResult try_repair(Mesh &m, std::vector<int32_t> *w_out) {
    static const bool kTiming = getenv("FOAM_TIMING") != nullptr;
    auto tq0 = std::chrono::steady_clock::now();
    std::vector<uint8_t> fail;
    int64_t n_bad = mark_failures(m, fail);
    if (kTiming) {
        auto tq1 = std::chrono::steady_clock::now();
        fprintf(stderr, "[foam] scan=%.1fms bad=%lld\n",
                std::chrono::duration<double, std::milli>(tq1 - tq0).count(),
                (long long)n_bad);
    }
    if (n_bad == 0) return RepairResult{OK, false, 0, 0};
    // damage too large: a full rebuild is cheaper / safer
    if (n_bad * 8 > (int64_t)m.tets.size())
        return RepairResult{INTERNAL, false, n_bad, 0};

    // label face-connected components of the damage set: each repairs
    // independently with a LOCAL retry/growth loop, so one stubborn
    // region no longer drags every other region through ring growth
    // (previously 6.3k scattered bad tets grew to a single 241k-tet
    // monolithic local DT — 38x the necessary work)
    int64_t ntets = (int64_t)m.tets.size();
    std::vector<int32_t> comp_of(ntets, kNone);
    std::vector<std::vector<int32_t>> comps;
    {
        std::vector<int32_t> stack;
        for (int64_t t = 0; t < ntets; ++t) {
            if (!fail[t] || comp_of[t] != kNone) continue;
            int32_t cid = (int32_t)comps.size();
            comps.emplace_back();
            comp_of[t] = cid;
            stack.push_back((int32_t)t);
            while (!stack.empty()) {
                int32_t tid = stack.back();
                stack.pop_back();
                comps[cid].push_back(tid);
                const Tet &tt = m.tets[tid];
                for (int i = 0; i < 4; ++i) {
                    int32_t nb = tt.n[i];
                    if (nb == kNone || !fail[nb] || comp_of[nb] != kNone)
                        continue;
                    comp_of[nb] = cid;
                    stack.push_back(nb);
                }
            }
        }
    }
    if (kTiming)
        fprintf(stderr, "[foam] components=%zu\n", comps.size());

    bool changed = false;
    int64_t n_local = 0;
    std::vector<uint8_t> in_carve(ntets, 0);
    std::vector<int32_t> W;
    RepairScratch scratch;
    for (int32_t cid = 0; cid < (int32_t)comps.size(); ++cid) {
        std::vector<int32_t> &carve = comps[cid];
        if (carve.empty()) continue;
        // absorbed into an earlier (grown) component?
        if (comp_of[carve[0]] != cid) continue;
        RepairResult rr{INTERNAL, false, 0, 0};
        for (int round = 0; round < 3; ++round) {
            // growth may have absorbed other components' tets
            carve.erase(
                std::remove_if(carve.begin(), carve.end(),
                               [&](int32_t t) {
                                   return comp_of[t] != cid ||
                                          !m.tets[t].alive;
                               }),
                carve.end());
            for (int32_t t : carve) in_carve[t] = 1;
            rr = repair_attempt(m, carve, in_carve, &W, scratch);
            for (int32_t t : carve) in_carve[t] = 0;
            if (rr.status == OK || rr.status == DEGENERATE) break;
            if (W.empty()) break;
            int64_t grown = grow_component(m, W, comp_of, cid, carve);
            n_bad += grown;
            if (n_bad * 8 > ntets) {
                rr.status = INTERNAL;
                break;
            }
            if (kTiming)
                fprintf(stderr,
                        "[foam] comp %d grow round %d -> %zu tets\n",
                        cid, round + 1, carve.size());
        }
        if (rr.status != OK)
            return RepairResult{rr.status, changed, n_bad, n_local};
        changed |= rr.changed;
        n_local += rr.n_local;
        if (w_out && rr.changed) {
            // accumulate damaged vertices across components for the
            // adjacency patch
            w_out->insert(w_out->end(), W.begin(), W.end());
        }
    }
    if (w_out) {
        std::sort(w_out->begin(), w_out->end());
        w_out->erase(std::unique(w_out->begin(), w_out->end()),
                     w_out->end());
    }
    return RepairResult{OK, changed, n_bad, n_local};
}

// recompute the adjacency rows of just the vertices in the damage set and
// splice them into the cached CSR (rows of untouched vertices cannot
// change: an edge (u, w) exists iff some tet contains both, and only tets
// incident to damaged vertices were replaced)
static int adjacency_patch(const Mesh &m, const std::vector<int32_t> &verts,
                           std::vector<uint32_t> &adj,
                           std::vector<uint32_t> &offsets) {
    int64_t n = m.n_real;
    std::vector<uint8_t> dirty(n, 0);
    for (int32_t v : verts)
        if (v < n) dirty[v] = 1;

    // v2t for dirty vertices
    std::vector<int32_t> v2t(n, kNone);
    for (size_t t = 0; t < m.tets.size(); ++t) {
        const Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        for (int i = 0; i < 4; ++i) {
            int32_t v = tet.v[i];
            if (v < n && dirty[v]) v2t[v] = (int32_t)t;
        }
    }

    std::vector<uint32_t> tet_stamp(m.tets.size(), 0);
    std::vector<uint32_t> vert_stamp(n + 4, 0);
    uint32_t stamp = 0;
    std::vector<int32_t> stack;
    std::vector<uint32_t> row;
    std::vector<uint32_t> new_adj;
    new_adj.reserve(adj.size() + verts.size() * 4);
    std::vector<uint32_t> new_offsets(n + 1, 0);

    // ascending dirty vertex list: unchanged rows between two dirty rows
    // copy as ONE bulk span (memcpy) with a constant offset shift —
    // per-row inserts over the ~99.5% clean majority were the patch cost
    std::vector<int64_t> dlist;
    dlist.reserve(verts.size());
    for (int64_t v = 0; v < n; ++v)
        if (dirty[v]) dlist.push_back(v);

    auto copy_span = [&](int64_t v0, int64_t v1) {
        // rows [v0, v1) are unchanged
        if (v0 >= v1) return;
        uint32_t b = offsets[v0], e = offsets[v1];
        int64_t delta = (int64_t)new_adj.size() - (int64_t)b;
        new_adj.insert(new_adj.end(), adj.begin() + b, adj.begin() + e);
        for (int64_t u = v0; u < v1; ++u)
            new_offsets[u + 1] = (uint32_t)((int64_t)offsets[u + 1] + delta);
    };

    int64_t prev = 0;
    for (int64_t v : dlist) {
        copy_span(prev, v);
        prev = v + 1;
        if (v2t[v] == kNone) return INTERNAL;
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
                if (u == (int32_t)v) { vslot = i; continue; }
                if (u < n && vert_stamp[u] != stamp) {
                    vert_stamp[u] = stamp;
                    row.push_back((uint32_t)u);
                }
            }
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
        new_offsets[v + 1] = new_offsets[v] + (uint32_t)row.size();
        new_adj.insert(new_adj.end(), row.begin(), row.end());
    }
    copy_span(prev, n);
    adj.swap(new_adj);
    offsets.swap(new_offsets);
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
    h->mesh = foam::Mesh();  // also drops the margin cache + scan_pts
    std::vector<double> coords(3 * n);
    for (int64_t i = 0; i < 3 * n; ++i) coords[i] = (double)points[i];
    int status = foam::build(h->mesh, coords.data(), n);
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

// Incremental update: move the points, then try the exact local repair
// (detect -> carve -> local DT -> fill -> certificate). Returns:
//   0 = still valid, nothing changed
//   3 = repaired locally; tets/adjacency refreshed
//   1 = repair not possible -> caller must full-rebuild
//   2 = point-count mismatch
int foam_update(FoamTriangulation *h, const float *points, int64_t n,
                int64_t *stats_out /* [n_bad, n_local] or null */) {
    if (n != h->mesh.n_real || h->mesh.tets.empty()) return 2;
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            h->mesh.pts[3 * i + d] = (double)points[3 * i + d];
    static const bool kTiming = getenv("FOAM_TIMING") != nullptr;
    auto tp0 = std::chrono::steady_clock::now();
    std::vector<int32_t> W;
    foam::RepairResult rr = foam::try_repair(h->mesh, &W);
    auto tp1 = std::chrono::steady_clock::now();
    if (stats_out) {
        stats_out[0] = rr.n_bad;
        stats_out[1] = rr.n_local;
    }
    if (rr.status != foam::OK) return 1;
    if (!rr.changed) return 0;
    foam::collect_tets(h->mesh, h->live_tets);
    auto tp2 = std::chrono::steady_clock::now();
    // adjacency rows can only change for the damage-set vertices (an edge
    // (u, w) exists iff some tet contains both; only tets incident to W
    // were replaced), so patch just those rows into the cached CSR
    if (foam::adjacency_patch(h->mesh, W, h->adj, h->offsets) != foam::OK)
        return 1;
    if (kTiming) {
        auto tp3 = std::chrono::steady_clock::now();
        auto ms = [](auto a, auto b) {
            return std::chrono::duration<double, std::milli>(b - a).count();
        };
        fprintf(stderr, "[foam] repair=%.1fms collect=%.1fms patch=%.1fms\n",
                ms(tp0, tp1), ms(tp1, tp2), ms(tp2, tp3));
    }
    return 3;
}

// Export live finite tets as (T x 4) int32
void foam_get_tets(FoamTriangulation *h, int32_t *out) {
    for (size_t i = 0; i < h->live_tets.size(); ++i) {
        const foam::Tet &t = h->mesh.tets[h->live_tets[i]];
        for (int j = 0; j < 4; ++j) out[4 * i + j] = t.v[j];
    }
}

// Per-cell AABB of each Voronoi cell's finite extent + hull flags, straight
// off the live mesh (sequential; the numpy path is pathologically slow on
// random access at 10M-tet scale). A bounded Voronoi cell is the convex
// hull of its incident tet circumcenters, so their AABB (plus the site)
// contains the cell exactly. Tets touching a super vertex mark their real
// vertices as hull (the far super points see every hull vertex).
// Near-degenerate tets contribute a +-fallback cube (fallback <= 0 picks
// the data bbox diagonal). f32 outputs are rounded outward.
int foam_cell_bounds(FoamTriangulation *h, float *bbmin, float *bbmax,
                     uint8_t *hull, double fallback) {
    const foam::Mesh &m = h->mesh;
    int64_t n = m.n_real;
    if (n == 0 || m.tets.empty()) return foam::INTERNAL;

    if (fallback <= 0.0) {
        double lo[3] = {1e300, 1e300, 1e300};
        double hi[3] = {-1e300, -1e300, -1e300};
        for (int64_t i = 0; i < n; ++i)
            for (int d = 0; d < 3; ++d) {
                double c = m.pts[3 * i + d];
                if (c < lo[d]) lo[d] = c;
                if (c > hi[d]) hi[d] = c;
            }
        fallback = 0.0;
        for (int d = 0; d < 3; ++d)
            fallback += (hi[d] - lo[d]) * (hi[d] - lo[d]);
        fallback = std::sqrt(fallback);
    }

    std::vector<double> lo(3 * n, 1e300), hi(3 * n, -1e300);
    std::memset(hull, 0, (size_t)n);

    for (size_t t = 0; t < m.tets.size(); ++t) {
        const foam::Tet &tet = m.tets[t];
        if (!tet.alive) continue;
        bool super = tet.v[0] >= n || tet.v[1] >= n || tet.v[2] >= n ||
                     tet.v[3] >= n;
        if (super) {
            for (int i = 0; i < 4; ++i)
                if (tet.v[i] < n) hull[tet.v[i]] = 1;
            continue;
        }
        // circumcenter by Cramer's rule on 2 (v_k - v_0) . x = |v_k|^2-|v_0|^2
        const double *a = m.P(tet.v[0]);
        double ba[3], ca[3], da[3];
        for (int d = 0; d < 3; ++d) {
            ba[d] = m.P(tet.v[1])[d] - a[d];
            ca[d] = m.P(tet.v[2])[d] - a[d];
            da[d] = m.P(tet.v[3])[d] - a[d];
        }
        double rb = 0.5 * (ba[0] * ba[0] + ba[1] * ba[1] + ba[2] * ba[2]);
        double rc = 0.5 * (ca[0] * ca[0] + ca[1] * ca[1] + ca[2] * ca[2]);
        double rd = 0.5 * (da[0] * da[0] + da[1] * da[1] + da[2] * da[2]);
        double xcd[3] = {ca[1] * da[2] - ca[2] * da[1],
                         ca[2] * da[0] - ca[0] * da[2],
                         ca[0] * da[1] - ca[1] * da[0]};
        double xdb[3] = {da[1] * ba[2] - da[2] * ba[1],
                         da[2] * ba[0] - da[0] * ba[2],
                         da[0] * ba[1] - da[1] * ba[0]};
        double xbc[3] = {ba[1] * ca[2] - ba[2] * ca[1],
                         ba[2] * ca[0] - ba[0] * ca[2],
                         ba[0] * ca[1] - ba[1] * ca[0]};
        double det = ba[0] * xcd[0] + ba[1] * xcd[1] + ba[2] * xcd[2];
        double cc[3];
        bool ok = std::abs(det) > 1e-30;
        if (ok) {
            double inv = 1.0 / det;
            for (int d = 0; d < 3; ++d)
                cc[d] = a[d] + (rb * xcd[d] + rc * xdb[d] + rd * xbc[d]) * inv;
        }
        for (int i = 0; i < 4; ++i) {
            int64_t v = tet.v[i];
            double *l = &lo[3 * v], *hh = &hi[3 * v];
            for (int d = 0; d < 3; ++d) {
                double cl = ok ? cc[d] : m.P((int32_t)v)[d] - fallback;
                double ch = ok ? cc[d] : m.P((int32_t)v)[d] + fallback;
                if (cl < l[d]) l[d] = cl;
                if (ch > hh[d]) hh[d] = ch;
            }
        }
    }

    for (int64_t v = 0; v < n; ++v) {
        for (int d = 0; d < 3; ++d) {
            double site = m.pts[3 * v + d];
            double l = std::min(lo[3 * v + d], site);
            double hh = std::max(hi[3 * v + d], site);
            bbmin[3 * v + d] = std::nextafterf((float)l, -1e30f);
            bbmax[3 * v + d] = std::nextafterf((float)hh, 1e30f);
        }
    }
    return foam::OK;
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
