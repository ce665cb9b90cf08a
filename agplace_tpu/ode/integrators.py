"""Neural-ODE integrators, in-repo (the torchdiffeq replacement).

The reference integrates dx/dt = f(x) over t in [0, 1] via
``torchdiffeq.odeint`` (``/root/reference/network_mm/ffns.py:82-87``) with
``method='euler', step_size=0.1`` by default, or adaptive ``dopri5`` with
rtol=atol=1e-3 (``tools/options.py:132-138``).  TPU-native design:

* fixed-step methods (euler / midpoint / rk4) are a ``lax.scan`` with a
  static step count — XLA unrolls/pipelines it, reverse-mode AD differentiates
  straight through the scan;
* ``dopri5`` is a **bounded** ``lax.scan`` over ``max_steps`` attempts with a
  PI step-size controller and accept/reject masking.  Using scan (not
  while_loop) keeps it reverse-differentiable without an adjoint pass; once a
  trajectory reaches t1 the remaining iterations are masked no-ops.
* an optimise-then-discretise adjoint (``odeint_adjoint``) is provided for
  memory-constrained settings, mirroring ``odeint_adjoint`` used by
  BeltramiODE (``network_mm/gnns.py:97``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

Func = Callable[[jax.Array, jax.Array], jax.Array]  # f(t, y) -> dy/dt


# ---------------------------------------------------------------------------
# fixed-step methods
# ---------------------------------------------------------------------------

def _axpy(a, x, y):
    """y + a*x over arbitrary pytree states (the adjoint integrates a
    (y, a, grad_p) tuple through the same steppers)."""
    return jax.tree_util.tree_map(lambda yi, xi: yi + a * xi, y, x)


def _euler_step(func: Func, t, dt, y):
    return _axpy(dt, func(t, y), y)


def _midpoint_step(func: Func, t, dt, y):
    k1 = func(t, y)
    return _axpy(dt, func(t + dt / 2, _axpy(dt / 2, k1, y)), y)


def _rk4_step(func: Func, t, dt, y):
    k1 = func(t, y)
    k2 = func(t + dt / 2, _axpy(dt / 2, k1, y))
    k3 = func(t + dt / 2, _axpy(dt / 2, k2, y))
    k4 = func(t + dt, _axpy(dt, k3, y))
    ksum = jax.tree_util.tree_map(
        lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4)
    return _axpy(dt / 6, ksum, y)


_FIXED_STEPPERS = {
    "euler": _euler_step,
    "midpoint": _midpoint_step,
    "rk4": _rk4_step,
}


def odeint_fixed(func: Func, y0, t0: float = 0.0, t1: float = 1.0,
                 step_size: float = 0.1, method: str = "euler"):
    """Fixed-step integration from t0 to t1; returns y(t1).

    Step count = ceil((t1-t0)/step_size) like torchdiffeq's fixed-grid
    solvers; the final step is shortened to land exactly on t1.
    """
    stepper = _FIXED_STEPPERS[method]
    n_steps = max(int(-(-(t1 - t0) // step_size)), 1)
    ts = jnp.minimum(t0 + jnp.arange(n_steps) * step_size, t1)
    dts = jnp.minimum(t0 + (jnp.arange(n_steps) + 1.0) * step_size, t1) - ts

    def body(y, t_dt):
        t, dt = t_dt
        return stepper(func, t, dt, y), None

    y, _ = jax.lax.scan(body, y0, (ts, dts))
    return y


# ---------------------------------------------------------------------------
# dopri5 (adaptive Runge-Kutta 4(5), Dormand-Prince) with PI controller
# ---------------------------------------------------------------------------

# Butcher tableau
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                    11 / 84, 0.0])
_DP_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                    -92097 / 339200, 187 / 2100, 1 / 40])


def _dopri5_step(func: Func, t, dt, y):
    ks = []
    for i in range(7):
        yi = y
        for j, a in enumerate(_DP_A[i]):
            yi = yi + dt * a * ks[j]
        ks.append(func(t + _DP_C[i] * dt, yi))
    y5 = y
    y4 = y
    for i in range(7):
        y5 = y5 + dt * _DP_B5[i] * ks[i]
        y4 = y4 + dt * _DP_B4[i] * ks[i]
    return y5, y5 - y4


def odeint_dopri5(func: Func, y0, t0: float = 0.0, t1: float = 1.0,
                  rtol: float = 1e-3, atol: float = 1e-3,
                  max_steps: int = 64, safety: float = 0.9):
    """Adaptive dopri5 with a PI(0.7/0.4) step controller, expressed as a
    bounded scan so it is jit-compatible AND reverse-differentiable
    (SURVEY.md §7.4 hard-part 2).  Trajectories that finish early idle out
    the remaining scan iterations under a mask.
    """
    dt0 = (t1 - t0) / 10.0

    def body(carry, _):
        t, dt, y, prev_err = carry
        done = t >= t1
        dt_eff = jnp.minimum(dt, t1 - t)
        y_new, err_vec = _dopri5_step(func, t, dt_eff, y)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
        # stop_gradient: step-size control is a discrete decision; it must not
        # leak gradients (and sqrt at an exactly-zero error — which happens
        # once a trajectory lands on t1 and dt_eff becomes 0 — has an
        # infinite derivative that would poison the whole backward pass).
        err2 = jax.lax.stop_gradient(jnp.mean((err_vec / scale) ** 2))
        err = jnp.sqrt(jnp.maximum(err2, 1e-20))
        err = jnp.maximum(err, 1e-10)
        accept = err <= 1.0
        # PI controller: dt *= safety * err^-0.7/5 * prev_err^0.4/5
        factor = safety * err ** (-0.14) * prev_err ** 0.08
        factor = jnp.clip(factor, 0.2, 5.0)
        new_dt = dt_eff * factor
        t_next = jnp.where(done, t, jnp.where(accept, t + dt_eff, t))
        y_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.logical_and(accept, ~done), b, a),
            y, y_new)
        err_next = jnp.where(accept, err, prev_err)
        dt_next = jnp.where(done, dt, new_dt)
        return (t_next, dt_next, y_next, err_next), None

    init = (jnp.asarray(t0, jnp.float32), jnp.asarray(dt0, jnp.float32),
            y0, jnp.asarray(1.0, jnp.float32))
    (t, dt, y, _), _ = jax.lax.scan(body, init, None, length=max_steps)
    return y


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def odeint(func: Func, y0, t0: float = 0.0, t1: float = 1.0,
           method: str = "euler", step_size: float = 0.1,
           rtol: float = 1e-3, atol: float = 1e-3, max_steps: int = 64):
    """torchdiffeq-equivalent entry: integrate f from t0 to t1, return y(t1)
    (the reference always takes ``out[-1]``, ``ffns.py:86``)."""
    if method in _FIXED_STEPPERS:
        return odeint_fixed(func, y0, t0, t1, step_size, method)
    if method == "dopri5":
        return odeint_dopri5(func, y0, t0, t1, rtol, atol, max_steps)
    raise NotImplementedError(f"odeint method={method}")


# ---------------------------------------------------------------------------
# adjoint (optimise-then-discretise) — memory O(1) in step count
# ---------------------------------------------------------------------------

def odeint_adjoint(func_with_params, params, y0, t0: float = 0.0,
                   t1: float = 1.0, method: str = "euler",
                   step_size: float = 0.1):
    """Adjoint-method odeint for fixed-step solvers.

    ``func_with_params(params, t, y) -> dy/dt``.  The backward pass integrates
    the augmented adjoint ODE backwards in time instead of storing activations
    — the classical Neural-ODE trick (used by ``odeint_adjoint`` at
    ``gnns.py:97``).  Gradients match direct backprop through the scan up to
    integration error of the same order.
    """

    @jax.custom_vjp
    def _solve(params, y0):
        return odeint_fixed(lambda t, y: func_with_params(params, t, y),
                            y0, t0, t1, step_size, method)

    def _fwd(params, y0):
        y1 = _solve(params, y0)
        return y1, (params, y1)

    def _bwd(res, g):
        params, y1 = res
        zero_p = jax.tree_util.tree_map(jnp.zeros_like, params)

        def aug_dyn_s(s, state):
            # reparametrised s = t1 + t0 - t so we can integrate "forwards"
            # in s while time runs backwards:
            #   dy/ds  = -f(t, y)
            #   da/ds  = +a df/dy          (adjoint ODE)
            #   dgp/ds = +a df/dp          (parameter-gradient quadrature)
            y, a, _ = state
            t = t1 + t0 - s
            f_y, vjp = jax.vjp(
                lambda yy, pp: func_with_params(pp, t, yy), y, params)
            a_dy, a_dp = vjp(a)
            return (-f_y, a_dy, a_dp)

        state0 = (y1, g, zero_p)
        _, aT, gpT = odeint_fixed(aug_dyn_s, state0, t0, t1,
                                  step_size, method)
        return gpT, aT

    _solve.defvjp(_fwd, _bwd)
    return _solve(params, y0)
