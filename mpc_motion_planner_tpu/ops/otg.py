"""Batched jerk-limited time-optimal online trajectory generation (OTG).

TPU-native replacement for the used slice of Ruckig (/root/reference/
mpc_solver/motionPlanner.hpp:35-37, motionPlanner.cpp:146-175): per-joint
time-optimal third-order (jerk-limited) point-to-point profiles with
velocity/acceleration/jerk bounds, nonzero boundary velocities, zero boundary
accelerations (the only case the reference exercises — current/target
accelerations default to zero), time-synchronized across joints, and
evaluable at arbitrary times.

Design (everything closed-form + fixed-iteration bisection, so it vmaps and
jits with static shapes):

* A velocity ramp va -> vb under (amax, jmax) is the classic S-ramp: two
  jerk phases around an optional constant-acceleration phase. Its duration
  is ``|dv|/amax + amax/jmax`` (trapezoidal) or ``2 sqrt(|dv|/jmax)``
  (triangular); because the acceleration profile is time-symmetric the ramp
  distance is exactly ``(va+vb)/2 * T``.
* A full profile is ramp(v0 -> vp), cruise at vp, ramp(vp -> vf). The
  no-cruise displacement D(vp) is non-decreasing in vp, so the time-optimal
  cruise velocity is +-vmax when a cruise phase fits, otherwise the root of
  D(vp) = dp found by bisection.
* Synchronization: T = max over joints of the per-joint minimal time; each
  joint is re-solved for duration exactly T by bisecting vp on
  [min(0, vp*), max(0, vp*)] of the fixed-time displacement
  D_T(vp) = D(vp) + vp * (T - T_ramps(vp)), which is increasing in vp
  (the vp -> 0 limit degenerates to a dwell, so any T >= T* is reachable).
* ``at_time`` composes the seven phases with per-phase clipped dt, which is
  exact and branch-free.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

_N_PHASES = 7


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class JerkLimitedTrajectory:
    """Synchronized multi-joint jerk-limited trajectory (a pytree).

    All leaves share leading batch dims; the last axis is joints for the
    state arrays and (joints, 7) for the phase tables.
    """

    duration: jax.Array  # (...,) synchronized total duration
    start_position: jax.Array  # (..., nj)
    start_velocity: jax.Array  # (..., nj)
    phase_dt: jax.Array  # (..., nj, 7) phase durations (>= 0)
    phase_jerk: jax.Array  # (..., nj, 7) constant jerk per phase

    def at_time(self, t):
        """Sample (position, velocity, acceleration) at time(s) ``t``.

        ``t`` broadcasts against the batch shape; times beyond the duration
        clamp to the final state (reference semantics, motionPlanner.hpp:132).
        """
        t = jnp.minimum(jnp.asarray(t, self.duration.dtype), self.duration)
        p = self.start_position
        v = self.start_velocity
        a = jnp.zeros_like(v)
        remaining = t[..., None]  # broadcast over joints
        for k in range(_N_PHASES):
            dt = jnp.clip(remaining, 0.0, self.phase_dt[..., k])
            j = self.phase_jerk[..., k]
            p = p + v * dt + 0.5 * a * dt**2 + j * dt**3 / 6.0
            v = v + a * dt + 0.5 * j * dt**2
            a = a + j * dt
            remaining = remaining - self.phase_dt[..., k]
        return p, v, a


def _ramp(va, vb, amax, jmax):
    """S-ramp va -> vb: (t_jerk, t_const_accel, total_time, distance)."""
    dv = jnp.abs(vb - va)
    trapezoid = dv >= amax**2 / jmax
    tj = jnp.where(trapezoid, amax / jmax, jnp.sqrt(dv / jmax))
    ta = jnp.where(trapezoid, dv / amax - amax / jmax, 0.0)
    total = 2.0 * tj + ta
    dist = 0.5 * (va + vb) * total
    return tj, ta, total, dist


def _ramps_time_dist(v0, vp, vf, amax, jmax):
    *_, t1, d1 = _ramp(v0, vp, amax, jmax)
    *_, t3, d3 = _ramp(vp, vf, amax, jmax)
    return t1 + t3, d1 + d3


def _min_time_cruise_velocity(dp, v0, vf, vmax, amax, jmax, iters):
    """Time-optimal cruise velocity and cruise duration for one joint."""
    t_hi, d_hi = _ramps_time_dist(v0, vmax, vf, amax, jmax)
    t_lo, d_lo = _ramps_time_dist(v0, -vmax, vf, amax, jmax)
    tb_hi = (dp - d_hi) / vmax
    tb_lo = (dp - d_lo) / (-vmax)
    use_hi = tb_hi >= 0.0
    use_lo = jnp.logical_and(jnp.logical_not(use_hi), tb_lo >= 0.0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        _, d_mid = _ramps_time_dist(v0, mid, vf, amax, jmax)
        go_up = d_mid < dp
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, iters, body, (-vmax * jnp.ones_like(dp), vmax * jnp.ones_like(dp))
    )
    vp_bisect = 0.5 * (lo + hi)

    vp = jnp.where(use_hi, vmax, jnp.where(use_lo, -vmax, vp_bisect))
    tb = jnp.where(use_hi, tb_hi, jnp.where(use_lo, tb_lo, 0.0))
    t_ramps, _ = _ramps_time_dist(v0, vp, vf, amax, jmax)
    return vp, tb, t_ramps + tb


def _cruise_velocity_for_duration(dp, v0, vf, vmax, duration, amax, jmax, iters):
    """Re-solve vp so the profile lasts exactly `duration` (>= min time).

    Bisects the CLAMPED fixed-time displacement
        D_T(vp) = d_ramps(vp) + vp * max(duration - t_ramps(vp), 0)
    over the full [-vmax, vmax]: with the cruise time clamped at zero both
    pieces are non-decreasing in vp (ramp-only displacement is, and the
    cruise term only adds |vp|-weighted time), the function is continuous
    at the clamp boundary, and for duration >= per-joint minimal time a
    root with nonnegative cruise always exists — including the cases where
    the cruise velocity must flip sign against the boundary velocities
    (e.g. v0 = vf < 0 with a small negative displacement needs vp > 0)."""

    def d_fixed_time(vp):
        t_ramps, d = _ramps_time_dist(v0, vp, vf, amax, jmax)
        return d + vp * jnp.maximum(duration - t_ramps, 0.0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        go_up = d_fixed_time(mid) < dp
        return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (-vmax, vmax))
    vp = 0.5 * (lo + hi)
    t_ramps, _ = _ramps_time_dist(v0, vp, vf, amax, jmax)
    tb = jnp.maximum(duration - t_ramps, 0.0)
    return vp, tb


def _build_phases(v0, vp, vf, tb, amax, jmax):
    """Phase tables (dt, jerk) each (..., 7) for ramp/cruise/ramp."""
    s1 = jnp.sign(vp - v0)
    s3 = jnp.sign(vf - vp)
    tj1, ta1, _, _ = _ramp(v0, vp, amax, jmax)
    tj3, ta3, _, _ = _ramp(vp, vf, amax, jmax)
    zeros = jnp.zeros_like(tb)
    phase_dt = jnp.stack([tj1, ta1, tj1, tb, tj3, ta3, tj3], axis=-1)
    phase_jerk = jnp.stack(
        [s1 * jmax, zeros, -s1 * jmax, zeros, s3 * jmax, zeros, -s3 * jmax],
        axis=-1,
    )
    return phase_dt, phase_jerk


def plan_trajectory(
    start_position,
    start_velocity,
    target_position,
    target_velocity,
    max_velocity,
    max_acceleration,
    max_jerk,
    bisect_iters: int = 64,
) -> JerkLimitedTrajectory:
    """Time-optimal synchronized trajectory (``Ruckig<7>::calculate``).

    All state arrays are (..., nj); limit arrays broadcast against them.
    Boundary accelerations are zero (the only case the reference uses:
    motionPlanner.cpp:41-54 defaults).
    """
    dp = target_position - start_position
    v0, vf = start_velocity, target_velocity
    vmax = jnp.broadcast_to(max_velocity, dp.shape).astype(dp.dtype)
    amax = jnp.broadcast_to(max_acceleration, dp.shape).astype(dp.dtype)
    jmax = jnp.broadcast_to(max_jerk, dp.shape).astype(dp.dtype)

    _, _, t_min = _min_time_cruise_velocity(
        dp, v0, vf, vmax, amax, jmax, bisect_iters
    )
    duration = jnp.max(t_min, axis=-1)

    vp, tb = _cruise_velocity_for_duration(
        dp, v0, vf, vmax, duration[..., None], amax, jmax, bisect_iters
    )
    phase_dt, phase_jerk = _build_phases(v0, vp, vf, tb, amax, jmax)
    return JerkLimitedTrajectory(
        duration=duration,
        start_position=start_position,
        start_velocity=start_velocity,
        phase_dt=phase_dt,
        phase_jerk=phase_jerk,
    )
