"""SDE / CDE integrators — reference scaffolding ``network_mm/ffns.py:24-48``
(torchsde Itô SDEFunc, CDEFunc) reachable via the ``sdeint/cdeint`` flags
(``tools/options.py:134-137``).

* ``sdeint_euler``: Itô Euler-Maruyama with diagonal noise, ``lax.scan``
  over fixed steps with a folded-in PRNG key (deterministic given the key).
* ``cdeint``: neural controlled differential equation dz = f(z) dX with a
  piecewise-linear control path, integrated with Euler or rk4 steps on the
  reparametrised ODE dz/dt = f(z) X'(t).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sdeint_euler(mu_fn: Callable, sigma_fn: Callable, y0: jax.Array,
                 key: jax.Array, t0: float = 0.0, t1: float = 1.0,
                 step_size: float = 0.1) -> jax.Array:
    """Integrate dY = mu(Y) dt + sigma(Y) dW (diagonal noise, Itô) from t0
    to t1; returns Y(t1)."""
    n_steps = max(int(-(-(t1 - t0) // step_size)), 1)
    dt = (t1 - t0) / n_steps
    sqrt_dt = jnp.sqrt(jnp.asarray(dt, y0.dtype))
    keys = jax.random.split(key, n_steps)

    def body(y, k):
        dw = jax.random.normal(k, y.shape, y.dtype) * sqrt_dt
        y = y + dt * mu_fn(y) + sigma_fn(y) * dw
        return y, None

    y, _ = jax.lax.scan(body, y0, keys)
    return y


def cdeint(func: Callable, z0: jax.Array, path: jax.Array,
           method: str = "euler", substeps: int = 2) -> jax.Array:
    """Neural CDE: dz = f(z) dX over the control path.

    func(z) -> [..., hidden, control] vector field (the reference's CDEFunc
    reshape, ``ffns.py:44-48``); path [..., T, control] observations at
    uniform times.  Integrates segment by segment with ``substeps`` Euler or
    rk4 steps per segment; returns z at the final observation.
    """
    t = path.shape[-2]
    dx = path[..., 1:, :] - path[..., :-1, :]  # [..., T-1, control]

    def seg(z, dxi):
        # dz/ds = f(z) @ dxi over s in [0,1] (X' constant per segment)
        h = 1.0 / substeps

        def fz(z):
            return jnp.einsum("...hc,...c->...h", func(z), dxi)

        def sub(z, _):
            if method == "rk4":
                k1 = fz(z)
                k2 = fz(z + h / 2 * k1)
                k3 = fz(z + h / 2 * k2)
                k4 = fz(z + h * k3)
                return z + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4), None
            return z + h * fz(z), None

        z, _ = jax.lax.scan(sub, z, None, length=substeps)
        return z, None

    dx_t = jnp.moveaxis(dx, -2, 0)  # [T-1, ..., control]
    z, _ = jax.lax.scan(seg, z0, dx_t)
    return z
