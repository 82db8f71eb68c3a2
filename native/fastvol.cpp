// fastvol: native host-side volume ops for adell_mri_tpu.
//
// The reference's host hot path runs inside SimpleITK/MONAI C++ (resampling,
// interpolation). Our host path only needs one composed resample per volume
// (adell_mri_tpu/transforms/host.py); this implements it directly —
// a tight trilinear kernel instead of scipy.ndimage's generic spline
// machinery — plus nearest-neighbour for labels.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastvol.so fastvol.cpp
// Loaded via ctypes (adell_mri_tpu/data/native.py); scipy fallback when
// the library is unavailable.

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// dst[i,j,k] = src(trilinear at ((i+ox)/zx, (j+oy)/zy, (k+oz)/zz))
// src strides are in elements (C-contiguous [X, Y, Z]). The coordinate is
// computed as (index + offset) / zoom — the exact double arithmetic the
// scipy fallback uses — so half-integer ties round identically.
void resample_trilinear_f32(
    const float* src, int64_t sx, int64_t sy, int64_t sz,
    float* dst, int64_t dx, int64_t dy, int64_t dz,
    double zx, double zy, double zz,
    double ox, double oy, double oz,
    float cval)
{
    const int64_t s_yz = sy * sz;
    for (int64_t i = 0; i < dx; ++i) {
        const double fx = ((double)i + ox) / zx;
        const int64_t x0 = (int64_t)std::floor(fx);
        const double wx = fx - x0;
        for (int64_t j = 0; j < dy; ++j) {
            const double fy = ((double)j + oy) / zy;
            const int64_t y0 = (int64_t)std::floor(fy);
            const double wy = fy - y0;
            float* drow = dst + (i * dy + j) * dz;
            for (int64_t k = 0; k < dz; ++k) {
                const double fz = ((double)k + oz) / zz;
                const int64_t z0 = (int64_t)std::floor(fz);
                const double wz = fz - z0;
                // scipy map_coordinates(mode="constant") semantics: any
                // point outside [0, s-1] yields cval outright
                if (fx < 0.0 || fx > (double)(sx - 1) ||
                    fy < 0.0 || fy > (double)(sy - 1) ||
                    fz < 0.0 || fz > (double)(sz - 1)) {
                    drow[k] = cval;
                    continue;
                }
                double acc = 0.0;
                for (int c = 0; c < 8; ++c) {
                    const int bx = (c >> 2) & 1, by = (c >> 1) & 1,
                              bz = c & 1;
                    const int64_t xi = x0 + bx, yi = y0 + by, zi = z0 + bz;
                    double w = (bx ? wx : 1.0 - wx) *
                               (by ? wy : 1.0 - wy) *
                               (bz ? wz : 1.0 - wz);
                    double v;
                    if (xi < 0 || xi >= sx || yi < 0 || yi >= sy ||
                        zi < 0 || zi >= sz) {
                        v = cval;
                    } else {
                        v = src[xi * s_yz + yi * sz + zi];
                    }
                    acc += w * v;
                }
                drow[k] = (float)acc;
            }
        }
    }
}

void resample_nearest_f32(
    const float* src, int64_t sx, int64_t sy, int64_t sz,
    float* dst, int64_t dx, int64_t dy, int64_t dz,
    double zx, double zy, double zz,
    double ox, double oy, double oz,
    float cval)
{
    const int64_t s_yz = sy * sz;
    for (int64_t i = 0; i < dx; ++i) {
        const double fx = ((double)i + ox) / zx;
        const int64_t xi = (int64_t)std::floor(fx + 0.5);
        for (int64_t j = 0; j < dy; ++j) {
            const double fy = ((double)j + oy) / zy;
            const int64_t yi = (int64_t)std::floor(fy + 0.5);
            float* drow = dst + (i * dy + j) * dz;
            // same domain rule as scipy order-0 mode="constant"
            const bool xy_ok = fx >= 0.0 && fx <= (double)(sx - 1) &&
                               fy >= 0.0 && fy <= (double)(sy - 1);
            for (int64_t k = 0; k < dz; ++k) {
                const double fz = ((double)k + oz) / zz;
                const int64_t zi = (int64_t)std::floor(fz + 0.5);
                if (!xy_ok || fz < 0.0 || fz > (double)(sz - 1)) {
                    drow[k] = cval;
                } else {
                    drow[k] = src[std::min(xi, sx - 1) * s_yz +
                                  std::min(yi, sy - 1) * sz +
                                  std::min(zi, sz - 1)];
                }
            }
        }
    }
}

// min-max normalize in place; returns 0, or 1 when constant
int minmax_scale_f32(float* data, int64_t n, float lo_out, float hi_out)
{
    if (n <= 0) return 1;
    float lo = data[0], hi = data[0];
    for (int64_t i = 1; i < n; ++i) {
        lo = std::min(lo, data[i]);
        hi = std::max(hi, data[i]);
    }
    const float span = hi - lo;
    if (span <= 0.0f) return 1;
    const float scale = (hi_out - lo_out) / span;
    for (int64_t i = 0; i < n; ++i) {
        data[i] = (data[i] - lo) * scale + lo_out;
    }
    return 0;
}

}  // extern "C"
