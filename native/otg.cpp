// Native jerk-limited time-optimal online trajectory generation.
//
// C++ counterpart of mpc_motion_planner_tpu/ops/otg.py — the framework's
// replacement for the Ruckig dependency used by the C++ reference
// (/root/reference/mpc_solver/motionPlanner.hpp:35-37). Two roles:
//   1. a host-side low-latency single-trajectory path (no accelerator
//      round-trip for a one-off warm start / baseline trajectory);
//   2. an independent cross-language oracle for the JAX implementation
//      (tests compare both on random problems).
//
// Algorithm (zero boundary accelerations, per-joint):
//   * an S-ramp va -> vb under (amax, jmax) lasts |dv|/amax + amax/jmax
//     (trapezoidal acceleration) or 2 sqrt(|dv|/jmax) (triangular), and by
//     time-symmetry covers distance (va + vb)/2 * T;
//   * the time-optimal profile cruises at +-vmax when possible, otherwise
//     at the root of the monotone no-cruise displacement D(vp) = dp;
//   * joints synchronize to the slowest duration by re-solving vp against
//     the clamped fixed-time displacement over the full [-vmax, vmax].
//
// Exposed as a C ABI for ctypes (see mpc_motion_planner_tpu/utils/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

constexpr int kPhases = 7;
constexpr int kBisectIters = 80;

struct Ramp {
  double t_jerk;
  double t_const;
  double total;
  double dist;
};

Ramp ramp(double va, double vb, double amax, double jmax) {
  const double dv = std::abs(vb - va);
  Ramp r;
  if (dv >= amax * amax / jmax) {
    r.t_jerk = amax / jmax;
    r.t_const = dv / amax - amax / jmax;
  } else {
    r.t_jerk = std::sqrt(dv / jmax);
    r.t_const = 0.0;
  }
  r.total = 2.0 * r.t_jerk + r.t_const;
  r.dist = 0.5 * (va + vb) * r.total;
  return r;
}

void ramps_time_dist(double v0, double vp, double vf, double amax,
                     double jmax, double* t, double* d) {
  const Ramp r1 = ramp(v0, vp, amax, jmax);
  const Ramp r3 = ramp(vp, vf, amax, jmax);
  *t = r1.total + r3.total;
  *d = r1.dist + r3.dist;
}

// Minimal-duration cruise velocity + cruise time for one joint.
void min_time(double dp, double v0, double vf, double vmax, double amax,
              double jmax, double* vp_out, double* tb_out, double* t_out) {
  double t_hi, d_hi, t_lo, d_lo;
  ramps_time_dist(v0, vmax, vf, amax, jmax, &t_hi, &d_hi);
  ramps_time_dist(v0, -vmax, vf, amax, jmax, &t_lo, &d_lo);
  const double tb_hi = (dp - d_hi) / vmax;
  const double tb_lo = (dp - d_lo) / (-vmax);
  double vp, tb;
  if (tb_hi >= 0.0) {
    vp = vmax;
    tb = tb_hi;
  } else if (tb_lo >= 0.0) {
    vp = -vmax;
    tb = tb_lo;
  } else {
    double lo = -vmax, hi = vmax;
    for (int i = 0; i < kBisectIters; ++i) {
      const double mid = 0.5 * (lo + hi);
      double t_mid, d_mid;
      ramps_time_dist(v0, mid, vf, amax, jmax, &t_mid, &d_mid);
      (d_mid < dp ? lo : hi) = mid;
    }
    vp = 0.5 * (lo + hi);
    tb = 0.0;
  }
  double t_ramps, d_ramps;
  ramps_time_dist(v0, vp, vf, amax, jmax, &t_ramps, &d_ramps);
  *vp_out = vp;
  *tb_out = tb;
  *t_out = t_ramps + tb;
}

// Re-solve vp for an exact (synchronized) duration: bisect the clamped
// fixed-time displacement over [-vmax, vmax] (monotone non-decreasing).
void for_duration(double dp, double v0, double vf, double vmax, double amax,
                  double jmax, double duration, double* vp_out,
                  double* tb_out) {
  double lo = -vmax, hi = vmax;
  for (int i = 0; i < kBisectIters; ++i) {
    const double mid = 0.5 * (lo + hi);
    double t_ramps, d_ramps;
    ramps_time_dist(v0, mid, vf, amax, jmax, &t_ramps, &d_ramps);
    const double d_fixed =
        d_ramps + mid * std::max(duration - t_ramps, 0.0);
    (d_fixed < dp ? lo : hi) = mid;
  }
  const double vp = 0.5 * (lo + hi);
  double t_ramps, d_ramps;
  ramps_time_dist(v0, vp, vf, amax, jmax, &t_ramps, &d_ramps);
  *vp_out = vp;
  *tb_out = std::max(duration - t_ramps, 0.0);
}

double sign(double x) { return (x > 0.0) - (x < 0.0); }

}  // namespace

extern "C" {

// Plan a synchronized nj-joint trajectory. Outputs: duration (scalar),
// phase_dt and phase_jerk (nj x 7, row-major).
void otg_plan(int32_t nj, const double* p0, const double* v0,
              const double* pf, const double* vf, const double* vmax,
              const double* amax, const double* jmax, double* duration,
              double* phase_dt, double* phase_jerk) {
  double t_sync = 0.0;
  for (int j = 0; j < nj; ++j) {
    double vp, tb, t;
    min_time(pf[j] - p0[j], v0[j], vf[j], vmax[j], amax[j], jmax[j], &vp,
             &tb, &t);
    t_sync = std::max(t_sync, t);
  }
  *duration = t_sync;
  for (int j = 0; j < nj; ++j) {
    double vp, tb;
    for_duration(pf[j] - p0[j], v0[j], vf[j], vmax[j], amax[j], jmax[j],
                 t_sync, &vp, &tb);
    const Ramp r1 = ramp(v0[j], vp, amax[j], jmax[j]);
    const Ramp r3 = ramp(vp, vf[j], amax[j], jmax[j]);
    const double s1 = sign(vp - v0[j]);
    const double s3 = sign(vf[j] - vp);
    double* dt = phase_dt + j * kPhases;
    double* jk = phase_jerk + j * kPhases;
    dt[0] = r1.t_jerk;
    dt[1] = r1.t_const;
    dt[2] = r1.t_jerk;
    dt[3] = tb;
    dt[4] = r3.t_jerk;
    dt[5] = r3.t_const;
    dt[6] = r3.t_jerk;
    jk[0] = s1 * jmax[j];
    jk[1] = 0.0;
    jk[2] = -s1 * jmax[j];
    jk[3] = 0.0;
    jk[4] = s3 * jmax[j];
    jk[5] = 0.0;
    jk[6] = -s3 * jmax[j];
  }
}

// Sample the planned trajectory at nt times (clamped to the duration).
// Outputs p/v/a are (nt x nj), row-major.
void otg_sample(int32_t nj, int32_t nt, const double* times, double duration,
                const double* p0, const double* v0, const double* phase_dt,
                const double* phase_jerk, double* p_out, double* v_out,
                double* a_out) {
  for (int it = 0; it < nt; ++it) {
    const double t = std::min(times[it], duration);
    for (int j = 0; j < nj; ++j) {
      double p = p0[j], v = v0[j], a = 0.0;
      double remaining = t;
      const double* dt = phase_dt + j * kPhases;
      const double* jk = phase_jerk + j * kPhases;
      for (int k = 0; k < kPhases; ++k) {
        const double h = std::min(std::max(remaining, 0.0), dt[k]);
        p += v * h + 0.5 * a * h * h + jk[k] * h * h * h / 6.0;
        v += a * h + 0.5 * jk[k] * h * h;
        a += jk[k] * h;
        remaining -= dt[k];
      }
      p_out[it * nj + j] = p;
      v_out[it * nj + j] = v;
      a_out[it * nj + j] = a;
    }
  }
}

}  // extern "C"
