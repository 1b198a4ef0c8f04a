// Adaptive-precision geometric predicates for the Delaunay engine.
//
// Role parity: src/delaunay/shewchuk.cuh in the reference (float-expansion
// Shewchuk predicates on the GPU). This implementation is written from the
// standard error-free-transform construction (two_sum / two_prod via fma,
// expansion arithmetic), in double precision on the host:
//   - a fast floating-point filter with a forward error bound handles the
//     overwhelming majority of calls;
//   - ambiguous cases fall back to exact sign evaluation with dynamic
//     floating-point expansions (nonoverlapping sums of doubles).
// Exactly-degenerate configurations (sign == 0) are reported as such; the
// caller surfaces them as a triangulation failure so the Python retry
// ladder can jitter the points (matching the reference's failure-and-retry
// contract, delaunay.cu:350-357 / scene.py:160-189).
#pragma once

#include <cmath>
#include <cstddef>
#include <vector>

namespace foam {

// ----------------------------------------------------------------------
// error-free transforms

inline void two_sum(double a, double b, double &s, double &e) {
    s = a + b;
    double bb = s - a;
    e = (a - (s - bb)) + (b - bb);
}

inline void two_diff(double a, double b, double &s, double &e) {
    s = a - b;
    double bb = s - a;
    e = (a - (s - bb)) - (b + bb);
}

inline void two_prod(double a, double b, double &p, double &e) {
    p = a * b;
    e = std::fma(a, b, -p);
}

// An expansion: a sum of doubles, stored increasing in magnitude,
// nonoverlapping. Dynamic length (slow path only).
using Exp = std::vector<double>;

inline Exp exp_from(double a) { return Exp{a}; }

inline Exp exp_from2(double hi, double lo) {
    // (lo, hi) with lo the roundoff term
    return Exp{lo, hi};
}

// grow_expansion: add a single double into an expansion
inline Exp exp_add1(const Exp &e, double b) {
    Exp h;
    h.reserve(e.size() + 1);
    double q = b;
    for (double ei : e) {
        double s, err;
        two_sum(q, ei, s, err);
        if (err != 0.0) h.push_back(err);
        q = s;
    }
    h.push_back(q);
    return h;
}

// expansion_sum via repeated grow (robust, O(mn) — fine for the slow path)
inline Exp exp_add(const Exp &a, const Exp &b) {
    Exp r = a;
    for (double bi : b) r = exp_add1(r, bi);
    if (r.empty()) r.push_back(0.0);
    return r;
}

inline Exp exp_neg(const Exp &a) {
    Exp r = a;
    for (double &x : r) x = -x;
    return r;
}

inline Exp exp_sub(const Exp &a, const Exp &b) { return exp_add(a, exp_neg(b)); }

// scale_expansion: expansion times a double, exactly
inline Exp exp_scale(const Exp &e, double b) {
    Exp r;
    r.reserve(2 * e.size());
    for (double ei : e) {
        double p, perr;
        two_prod(ei, b, p, perr);
        if (perr != 0.0) r = exp_add1(r, perr);
        if (p != 0.0) r = exp_add1(r, p);
    }
    if (r.empty()) r.push_back(0.0);
    return r;
}

// product of two expansions
inline Exp exp_mul(const Exp &a, const Exp &b) {
    Exp r{0.0};
    for (double bi : b) r = exp_add(r, exp_scale(a, bi));
    return r;
}

inline int exp_sign(const Exp &e) {
    // components are nonoverlapping & magnitude-increasing: the last
    // nonzero term determines the sign
    for (size_t i = e.size(); i-- > 0;) {
        if (e[i] > 0.0) return 1;
        if (e[i] < 0.0) return -1;
    }
    return 0;
}

// exact product of two doubles as an expansion
inline Exp exp_prod(double a, double b) {
    double p, err;
    two_prod(a, b, p, err);
    return exp_from2(p, err);
}

// exact a*b - c*d (the 2x2 determinant), as an expansion
inline Exp exp_det2(double a, double b, double c, double d) {
    return exp_sub(exp_prod(a, b), exp_prod(c, d));
}

// ----------------------------------------------------------------------
// orient3d: sign of det[b-a; c-a; d-a]
//   > 0 if d is on the positive side (left-handed/right-handed per
//   convention below: positive when the four points form a positively
//   oriented tet)

static const double kEps = std::ldexp(1.0, -52);  // 2^-52
static const double kOrientErr = (7.0 + 56.0 * kEps) * kEps;
static const double kInsphereErr = (16.0 + 224.0 * kEps) * kEps;

// margin variants: when the float filter decides the sign, *margin gets a
// certified lower bound on |det| (|det_float| - errbound); when the exact
// fallback is needed the margin is 0 (callers must not cache it). Used by
// the incremental-update margin cache in delaunay.cpp.
inline int orient3d_sign_margin(const double *a, const double *b,
                                const double *c, const double *d,
                                double *margin);
inline int insphere_sign_margin(const double *a, const double *b,
                                const double *c, const double *d,
                                const double *e, double *margin);

inline int orient3d_sign_margin(const double *a, const double *b,
                                const double *c, const double *d,
                                double *margin) {
    if (margin) *margin = 0.0;
    double adx = a[0] - d[0], ady = a[1] - d[1], adz = a[2] - d[2];
    double bdx = b[0] - d[0], bdy = b[1] - d[1], bdz = b[2] - d[2];
    double cdx = c[0] - d[0], cdy = c[1] - d[1], cdz = c[2] - d[2];

    double bdxcdy = bdx * cdy, bdycdx = bdy * cdx;
    double cdxady = cdx * ady, cdyadx = cdy * adx;
    double adxbdy = adx * bdy, adybdx = ady * bdx;

    double det = adz * (bdxcdy - bdycdx) + bdz * (cdxady - cdyadx) +
                 cdz * (adxbdy - adybdx);

    double permanent = (std::fabs(bdxcdy) + std::fabs(bdycdx)) * std::fabs(adz) +
                       (std::fabs(cdxady) + std::fabs(cdyadx)) * std::fabs(bdz) +
                       (std::fabs(adxbdy) + std::fabs(adybdx)) * std::fabs(cdz);
    double errbound = kOrientErr * permanent;
    if (det > errbound) {
        if (margin) *margin = det - errbound;
        return 1;
    }
    if (det < -errbound) {
        if (margin) *margin = -det - errbound;
        return -1;
    }

    // exact fallback: the subtractions above are exact only if the inputs
    // share exponent range; redo fully exactly. Differences of two doubles
    // are NOT exact in general, so build them as expansions.
    auto diff = [](double x, double y) {
        double s, e;
        two_diff(x, y, s, e);
        return exp_from2(s, e);
    };
    Exp eadx = diff(a[0], d[0]), eady = diff(a[1], d[1]), eadz = diff(a[2], d[2]);
    Exp ebdx = diff(b[0], d[0]), ebdy = diff(b[1], d[1]), ebdz = diff(b[2], d[2]);
    Exp ecdx = diff(c[0], d[0]), ecdy = diff(c[1], d[1]), ecdz = diff(c[2], d[2]);

    Exp m1 = exp_sub(exp_mul(ebdx, ecdy), exp_mul(ebdy, ecdx));
    Exp m2 = exp_sub(exp_mul(ecdx, eady), exp_mul(ecdy, eadx));
    Exp m3 = exp_sub(exp_mul(eadx, ebdy), exp_mul(eady, ebdx));

    Exp res = exp_add(exp_add(exp_mul(eadz, m1), exp_mul(ebdz, m2)),
                      exp_mul(ecdz, m3));
    return exp_sign(res);
}

inline int orient3d_sign(const double *a, const double *b, const double *c,
                         const double *d) {
    return orient3d_sign_margin(a, b, c, d, nullptr);
}

// ----------------------------------------------------------------------
// insphere: sign of the 5x5 determinant; with a positively oriented tet
// (a,b,c,d), > 0 iff e lies strictly inside the circumsphere.

inline int insphere_sign_margin(const double *a, const double *b,
                                const double *c, const double *d,
                                const double *e, double *margin) {
    if (margin) *margin = 0.0;
    double aex = a[0] - e[0], aey = a[1] - e[1], aez = a[2] - e[2];
    double bex = b[0] - e[0], bey = b[1] - e[1], bez = b[2] - e[2];
    double cex = c[0] - e[0], cey = c[1] - e[1], cez = c[2] - e[2];
    double dex = d[0] - e[0], dey = d[1] - e[1], dez = d[2] - e[2];

    double ab = aex * bey - bex * aey;
    double bc = bex * cey - cex * bey;
    double cd = cex * dey - dex * cey;
    double da = dex * aey - aex * dey;
    double ac = aex * cey - cex * aey;
    double bd = bex * dey - dex * bey;

    double abc = aez * bc - bez * ac + cez * ab;
    double bcd = bez * cd - cez * bd + dez * bc;
    double cda = cez * da + dez * ac + aez * cd;
    double dab = dez * ab + aez * bd + bez * da;

    double alift = aex * aex + aey * aey + aez * aez;
    double blift = bex * bex + bey * bey + bez * bez;
    double clift = cex * cex + cey * cey + cez * cez;
    double dlift = dex * dex + dey * dey + dez * dez;

    double det = (dlift * abc - clift * dab) + (blift * cda - alift * bcd);

    double aezplus = std::fabs(aez), bezplus = std::fabs(bez);
    double cezplus = std::fabs(cez), dezplus = std::fabs(dez);
    double aexbeyplus = std::fabs(aex * bey), bexaeyplus = std::fabs(bex * aey);
    double bexceyplus = std::fabs(bex * cey), cexbeyplus = std::fabs(cex * bey);
    double cexdeyplus = std::fabs(cex * dey), dexceyplus = std::fabs(dex * cey);
    double dexaeyplus = std::fabs(dex * aey), aexdeyplus = std::fabs(aex * dey);
    double aexceyplus = std::fabs(aex * cey), cexaeyplus = std::fabs(cex * aey);
    double bexdeyplus = std::fabs(bex * dey), dexbeyplus = std::fabs(dex * bey);
    double permanent =
        ((cexdeyplus + dexceyplus) * bezplus +
         (dexbeyplus + bexdeyplus) * cezplus +
         (bexceyplus + cexbeyplus) * dezplus) * alift +
        ((dexaeyplus + aexdeyplus) * cezplus +
         (aexceyplus + cexaeyplus) * dezplus +
         (cexdeyplus + dexceyplus) * aezplus) * blift +
        ((aexbeyplus + bexaeyplus) * dezplus +
         (bexdeyplus + dexbeyplus) * aezplus +
         (dexaeyplus + aexdeyplus) * bezplus) * clift +
        ((bexceyplus + cexbeyplus) * aezplus +
         (cexaeyplus + aexceyplus) * bezplus +
         (aexbeyplus + bexaeyplus) * cezplus) * dlift;
    double errbound = kInsphereErr * permanent;
    if (det > errbound) {
        if (margin) *margin = det - errbound;
        return 1;
    }
    if (det < -errbound) {
        if (margin) *margin = -det - errbound;
        return -1;
    }

    // exact fallback with expansions
    auto diff = [](double x, double y) {
        double s, err;
        two_diff(x, y, s, err);
        return exp_from2(s, err);
    };
    Exp ax = diff(a[0], e[0]), ay = diff(a[1], e[1]), az = diff(a[2], e[2]);
    Exp bx = diff(b[0], e[0]), by = diff(b[1], e[1]), bz = diff(b[2], e[2]);
    Exp cx = diff(c[0], e[0]), cy = diff(c[1], e[1]), cz = diff(c[2], e[2]);
    Exp dx = diff(d[0], e[0]), dy = diff(d[1], e[1]), dz = diff(d[2], e[2]);

    auto det2 = [](const Exp &p, const Exp &q, const Exp &r, const Exp &s) {
        return exp_sub(exp_mul(p, q), exp_mul(r, s));
    };
    Exp eab = det2(ax, by, bx, ay);
    Exp ebc = det2(bx, cy, cx, by);
    Exp ecd = det2(cx, dy, dx, cy);
    Exp eda = det2(dx, ay, ax, dy);
    Exp eac = det2(ax, cy, cx, ay);
    Exp ebd = det2(bx, dy, dx, by);

    Exp eabc = exp_add(exp_sub(exp_mul(az, ebc), exp_mul(bz, eac)),
                       exp_mul(cz, eab));
    Exp ebcd = exp_add(exp_sub(exp_mul(bz, ecd), exp_mul(cz, ebd)),
                       exp_mul(dz, ebc));
    Exp ecda = exp_add(exp_add(exp_mul(cz, eda), exp_mul(dz, eac)),
                       exp_mul(az, ecd));
    Exp edab = exp_add(exp_add(exp_mul(dz, eab), exp_mul(az, ebd)),
                       exp_mul(bz, eda));

    auto lift = [](const Exp &x, const Exp &y, const Exp &z) {
        return exp_add(exp_add(exp_mul(x, x), exp_mul(y, y)), exp_mul(z, z));
    };
    Exp la = lift(ax, ay, az), lb = lift(bx, by, bz);
    Exp lc = lift(cx, cy, cz), ld = lift(dx, dy, dz);

    Exp res = exp_add(exp_sub(exp_mul(ld, eabc), exp_mul(lc, edab)),
                      exp_sub(exp_mul(lb, ecda), exp_mul(la, ebcd)));
    return exp_sign(res);
}

inline int insphere_sign(const double *a, const double *b, const double *c,
                         const double *d, const double *e) {
    return insphere_sign_margin(a, b, c, d, e, nullptr);
}

}  // namespace foam
