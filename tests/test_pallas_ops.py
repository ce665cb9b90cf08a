"""Pallas kernel tests (run interpreted on CPU; compiled on TPU): the fused
Euler ODE chain must match the lax.scan integrator in value and gradient."""

import numpy as np
import jax
import jax.numpy as jnp

from agplace_tpu.ode.integrators import odeint_fixed
from agplace_tpu.ops.pallas.ode_step import fused_euler_ode


def _ref(x, w, b, act, n_steps=10, dt=0.1):
    acts = {"relu": lambda v: jnp.maximum(v, 0), "tanh": jnp.tanh,
            "sigmoid": jax.nn.sigmoid, "id": lambda v: v}
    f = lambda t, y: acts[act](jnp.dot(y, w) + b)
    return odeint_fixed(f, x, step_size=dt)


def test_fused_ode_matches_scan():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 128)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 128)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    for act in ("relu", "tanh", "sigmoid", "id"):
        got = fused_euler_ode(x, w, b, 10, 0.1, act)
        ref = _ref(x, w, b, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=act)


def test_fused_ode_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(fused_euler_ode(x, w, b, 10, 0.1, "relu") ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_ref(x, w, b, "relu") ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_fused_ode_under_jit():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 64)) * 0.05, jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    f = jax.jit(lambda x, w, b: fused_euler_ode(x, w, b, 10, 0.1, "relu"))
    out = f(x, w, b)
    assert np.isfinite(np.asarray(out)).all()
