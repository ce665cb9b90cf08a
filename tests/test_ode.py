"""ODE integrator tests: fixed-step vs closed-form linear-ODE solution,
dopri5 accuracy, adjoint gradients vs direct backprop (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from agplace_tpu.ode.integrators import (
    odeint,
    odeint_adjoint,
    odeint_fixed,
)


def test_euler_linear_ode_convergence():
    # dx/dt = A x  =>  x(1) = expm(A) x0 ; euler error ~ O(h)
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((8, 8)) * 0.3).astype(np.float32)
    x0 = rng.standard_normal((8,)).astype(np.float32)
    import scipy.linalg

    exact = scipy.linalg.expm(a) @ x0

    func = lambda t, y: jnp.dot(jnp.asarray(a), y)
    err_coarse = np.linalg.norm(
        np.asarray(odeint_fixed(func, jnp.asarray(x0), step_size=0.1)) - exact)
    err_fine = np.linalg.norm(
        np.asarray(odeint_fixed(func, jnp.asarray(x0), step_size=0.01))
        - exact)
    assert err_fine < err_coarse / 5  # ~linear convergence
    assert err_fine < 1e-2


def test_rk4_is_accurate():
    rng = np.random.default_rng(1)
    a = (rng.standard_normal((6, 6)) * 0.3).astype(np.float32)
    x0 = rng.standard_normal((6,)).astype(np.float32)
    import scipy.linalg

    exact = scipy.linalg.expm(a) @ x0
    func = lambda t, y: jnp.dot(jnp.asarray(a), y)
    got = np.asarray(odeint_fixed(func, jnp.asarray(x0), step_size=0.1,
                                  method="rk4"))
    np.testing.assert_allclose(got, exact, rtol=1e-4, atol=1e-5)


def test_dopri5_matches_exact():
    rng = np.random.default_rng(2)
    a = (rng.standard_normal((6, 6)) * 0.3).astype(np.float32)
    x0 = rng.standard_normal((6,)).astype(np.float32)
    import scipy.linalg

    exact = scipy.linalg.expm(a) @ x0
    func = lambda t, y: jnp.dot(jnp.asarray(a), y)
    got = np.asarray(odeint(func, jnp.asarray(x0), method="dopri5",
                            rtol=1e-5, atol=1e-5, max_steps=64))
    np.testing.assert_allclose(got, exact, rtol=1e-3, atol=1e-4)


def test_dopri5_nonautonomous():
    # dx/dt = t  =>  x(1) = x0 + 0.5
    func = lambda t, y: jnp.full_like(y, t)
    got = np.asarray(odeint(func, jnp.zeros((3,)), method="dopri5"))
    np.testing.assert_allclose(got, 0.5, rtol=1e-3)


def test_odeint_is_differentiable():
    w = jnp.eye(4) * 0.5

    def loss(w):
        func = lambda t, y: jnp.tanh(jnp.dot(y, w))
        out = odeint(func, jnp.ones((4,)), method="euler", step_size=0.1)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_dopri5_is_differentiable():
    w = jnp.eye(4) * 0.5

    def loss(w):
        func = lambda t, y: jnp.tanh(jnp.dot(y, w))
        out = odeint(func, jnp.ones((4,)), method="dopri5", max_steps=32)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_adjoint_matches_direct_grad():
    rng = np.random.default_rng(3)
    w0 = (rng.standard_normal((5, 5)) * 0.2).astype(np.float32)
    x0 = rng.standard_normal((5,)).astype(np.float32)

    def f(params, t, y):
        return jnp.tanh(jnp.dot(y, params))

    # rk4: O(h^4) discretisation error in both the forward solve and the
    # backward adjoint solve, so optimise-then-discretise (adjoint) and
    # discretise-then-optimise (backprop through scan) agree tightly.
    def loss_direct(w, x):
        out = odeint_fixed(lambda t, y: f(w, t, y), x, step_size=0.05,
                           method="rk4")
        return jnp.sum(out ** 2)

    def loss_adjoint(w, x):
        out = odeint_adjoint(f, w, x, step_size=0.05, method="rk4")
        return jnp.sum(out ** 2)

    gd_w, gd_x = jax.grad(loss_direct, argnums=(0, 1))(
        jnp.asarray(w0), jnp.asarray(x0))
    ga_w, ga_x = jax.grad(loss_adjoint, argnums=(0, 1))(
        jnp.asarray(w0), jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(ga_w), np.asarray(gd_w),
                               rtol=0.01, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga_x), np.asarray(gd_x),
                               rtol=0.01, atol=1e-4)
