// Native runtime helpers for pism_tpu.
//
// The reference carries native non-compute runtime code alongside its
// solvers: the bundled calcalcs C library (calendar arithmetic,
// src/external/calcalcs/) and the C++ regridding path in src/util/io
// (io_helpers.cc: bilinear interpolation of input fields onto the model
// grid at bootstrap time). These are host-side (never inside jit), so they
// are implemented natively here and exposed through ctypes
// (pism_tpu/native/__init__.py), with a numpy fallback when no compiler is
// available.
//
// Build: g++ -O3 -shared -fPIC -o libpism_native.so pism_native.cpp
// (done on demand by pism_tpu.native.build()).

#include <cmath>
#include <cstdint>

extern "C" {

// ---------------------------------------------------------------------------
// Calendar arithmetic (calcalcs analog)
// ---------------------------------------------------------------------------

// Day number since 0001-01-01 for the proleptic Gregorian calendar.
// Returns -1 on invalid input.
long long gregorian_day_number(int year, int month, int day) {
    if (month < 1 || month > 12 || day < 1) return -1;
    // Fliegel & Van Flandern (1968) Julian day number, shifted
    long long a = (14 - month) / 12;
    long long y = (long long)year + 4800 - a;
    long long m = month + 12 * a - 3;
    long long jdn = day + (153 * m + 2) / 5 + 365 * y + y / 4 - y / 100
        + y / 400 - 32045;
    return jdn - 1721426 + 1;  // 0001-01-01 -> 1
}

// Inverse: day number -> (year, month, day), Gregorian.
void gregorian_date(long long dayno, int* year, int* month, int* day) {
    long long jdn = dayno + 1721426 - 1;
    long long f = jdn + 1401 + (((4 * jdn + 274277) / 146097) * 3) / 4 - 38;
    long long e = 4 * f + 3;
    long long g = (e % 1461) / 4;
    long long h = 5 * g + 2;
    *day = (int)((h % 153) / 5 + 1);
    *month = (int)(((h / 153 + 2) % 12) + 1);
    *year = (int)(e / 1461 - 4716 + (12 + 2 - *month) / 12);
}

// Day number for fixed-length calendars (365_day / 360_day).
long long fixed_day_number(int year, int month, int day, int days_per_month_360) {
    static const int cum365[12] = {0, 31, 59, 90, 120, 151, 181, 212, 243,
                                   273, 304, 334};
    if (month < 1 || month > 12 || day < 1) return -1;
    if (days_per_month_360)
        return (long long)(year - 1) * 360 + (month - 1) * 30 + (day - 1) + 1;
    return (long long)(year - 1) * 365 + cum365[month - 1] + (day - 1) + 1;
}

int is_gregorian_leap(int year) {
    return (year % 4 == 0 && year % 100 != 0) || (year % 400 == 0);
}

// ---------------------------------------------------------------------------
// Bilinear regridding (io_helpers regrid analog)
// ---------------------------------------------------------------------------

// Regrid src (ny_s x nx_s, row-major, coordinates xs/ys ascending) onto the
// target points (xt[nx_t], yt[ny_t]); out is (ny_t x nx_t). Clamped at the
// source boundary. Source cells equal to fill are treated as missing: the
// result takes the nearest valid neighbor contribution (weight
// renormalization), or fill if all 4 corners are missing.
void regrid_bilinear(const double* src, const double* xs, const double* ys,
                     long long nx_s, long long ny_s,
                     const double* xt, const double* yt,
                     long long nx_t, long long ny_t,
                     double fill, double* out) {
    for (long long j = 0; j < ny_t; ++j) {
        // find the source row interval by binary search (ys ascending)
        double y = yt[j];
        long long j0 = 0, j1 = ny_s - 1;
        if (y <= ys[0]) { j0 = j1 = 0; }
        else if (y >= ys[ny_s - 1]) { j0 = j1 = ny_s - 1; }
        else {
            long long lo = 0, hi = ny_s - 1;
            while (hi - lo > 1) {
                long long mid = (lo + hi) / 2;
                if (ys[mid] <= y) lo = mid; else hi = mid;
            }
            j0 = lo; j1 = hi;
        }
        double wy = (j1 == j0) ? 0.0 : (y - ys[j0]) / (ys[j1] - ys[j0]);

        for (long long i = 0; i < nx_t; ++i) {
            double x = xt[i];
            long long i0 = 0, i1 = nx_s - 1;
            if (x <= xs[0]) { i0 = i1 = 0; }
            else if (x >= xs[nx_s - 1]) { i0 = i1 = nx_s - 1; }
            else {
                long long lo = 0, hi = nx_s - 1;
                while (hi - lo > 1) {
                    long long mid = (lo + hi) / 2;
                    if (xs[mid] <= x) lo = mid; else hi = mid;
                }
                i0 = lo; i1 = hi;
            }
            double wx = (i1 == i0) ? 0.0 : (x - xs[i0]) / (xs[i1] - xs[i0]);

            double v[4] = {src[j0 * nx_s + i0], src[j0 * nx_s + i1],
                           src[j1 * nx_s + i0], src[j1 * nx_s + i1]};
            double w[4] = {(1 - wy) * (1 - wx), (1 - wy) * wx,
                           wy * (1 - wx), wy * wx};
            double acc = 0.0, wsum = 0.0;
            for (int k = 0; k < 4; ++k) {
                if (v[k] != fill && !std::isnan(v[k])) {
                    acc += w[k] * v[k];
                    wsum += w[k];
                }
            }
            out[j * nx_t + i] = (wsum > 0.0) ? acc / wsum : fill;
        }
    }
}

}  // extern "C"
