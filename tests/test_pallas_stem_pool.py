"""Parity of the fused stem-tail kernel (ops/pallas/stem_pool.py) against
the XLA path it replaces: ``maxpool3x3/2,pad1(relu(x*scale+bias))`` on a
bf16 conv1 output (reference stem ``network_mm/image_fe.py:14-26`` via
``torchvision resnet.forward``).  Runs the kernel in CPU interpret mode —
the same kernel runs on real TPU (scripts/hw_parity_stem_pool.py is the
on-hardware three-way check whose numbers live in BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from agplace_tpu.ops.pallas.stem_pool import fused_affine_relu_maxpool


def _xla_reference(x, scale, bias):
    """The exact XLA path from models/resnet.py:141-145 (BatchNorm2D eval
    affine applied in the activation dtype, then relu, then max_pool)."""
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    y = nn.relu(y)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _single_round_reference(x, scale, bias):
    """The kernel's exact arithmetic: bf16 scale/bias, f32 fma, one final
    round — what XLA:TPU emits in hardware for the same bf16 epilogue
    (the CPU XLA path above rounds the intermediate product too, so it
    can differ from both by 1 bf16 ulp)."""
    s = scale.astype(jnp.bfloat16).astype(jnp.float32)
    b = bias.astype(jnp.bfloat16).astype(jnp.float32)
    y = nn.relu(x.astype(jnp.float32) * s + b).astype(jnp.bfloat16)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _f64_oracle(x, scale, bias):
    """float64 numpy oracle: affine rounds at bf16 (both real paths round
    the effective affine to the activation dtype), window max exact."""
    xf = np.asarray(x, np.float64)
    s = np.asarray(scale.astype(jnp.bfloat16), np.float64)
    b = np.asarray(bias.astype(jnp.bfloat16), np.float64)
    y = np.maximum(xf * s + b, 0.0)
    bs, h, w, c = y.shape
    pad = np.full((bs, h + 2, w + 2, c), -np.inf)
    pad[:, 1:-1, 1:-1] = y
    out = np.full((bs, h // 2, w // 2, c), -np.inf)
    for dh in range(3):
        for dw in range(3):
            out = np.maximum(out, pad[:, dh:dh + h:2, dw:dw + w:2, :])
    return out


@pytest.mark.parametrize("b,h,w,c", [
    (4, 32, 32, 64),    # bench-like: batch-pair fold k=2 -> 128 lanes
    (2, 16, 16, 128),   # full-lane channels, no fold
    (3, 16, 16, 64),    # b % k != 0 -> fold backs off to k=1
    (1, 8, 8, 32),      # k = min(4, 1) = 1, tiny tb
    (2, 14, 12, 8),     # non-square even dims, k=2
    (16, 16, 16, 8),    # deep fold k=16 -> c2=128, tb=1
])
def test_kernel_matches_xla_and_f64_oracle(b, h, w, c):
    rng = np.random.default_rng(0)
    # conv outputs straddle zero so relu + pool padding semantics are
    # both exercised (the kernel's zero pad relies on post-relu >= 0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)) * 2.0, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.2, 2.0, (c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    got = np.asarray(fused_affine_relu_maxpool(x, scale, bias), np.float32)
    assert got.shape == (b, h // 2, w // 2, c)
    # identical taps, identical single-round f32 fma -> bitwise equal
    want = np.asarray(_single_round_reference(x, scale, bias), np.float32)
    np.testing.assert_array_equal(got, want)

    # vs the float64 oracle: one bf16 round of the output (max commutes
    # with the monotone round, so pooling adds nothing)
    oracle = _f64_oracle(x, scale, bias)
    np.testing.assert_allclose(got, oracle, rtol=2 ** -8, atol=2 ** -8)

    # the module's CPU XLA fallback rounds the intermediate product too
    # (bf16 double-round); under cancellation (x*s ~ -b) that costs up to
    # ~1 bf16 ulp of the PRE-relu magnitude, absolute
    xla = np.asarray(_xla_reference(x, scale, bias), np.float32)
    amax = float(np.abs(np.asarray(x, np.float32)
                        * np.asarray(scale)[None, None, None]
                        + np.asarray(bias)[None, None, None]).max())
    np.testing.assert_allclose(got, xla, rtol=2 ** -7, atol=amax * 2 ** -7)


def test_negative_bias_pool_padding():
    """All-negative pre-relu block: every real tap clamps to 0, so the
    pool must return exactly 0 everywhere (the zero-pad-as--inf trick
    must not leak a wrong value)."""
    x = jnp.full((2, 8, 8, 32), -3.0, jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.full((32,), -1.0, jnp.float32)
    got = np.asarray(fused_affine_relu_maxpool(x, scale, bias))
    assert np.all(got == 0)


def test_resnet_stem_module_routes_to_kernel(monkeypatch):
    """ResNetFeatures(use_pallas_stem=True) in eval/bf16 must produce the
    XLA-path outputs from the same variables (kernel interpreted on CPU)."""
    from agplace_tpu.models import resnet as resnet_mod
    from agplace_tpu.models.resnet import ResNetFeatures
    from agplace_tpu.sparse import bev_grid

    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.bfloat16)

    ref = ResNetFeatures(arch="resnet18", num_stages=2, train=False,
                         dtype=jnp.bfloat16, use_pallas_stem=False)
    fus = ResNetFeatures(arch="resnet18", num_stages=2, train=False,
                         dtype=jnp.bfloat16, use_pallas_stem=True)
    vs = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
    # non-trivial batch stats so the eval affine isn't the identity
    vs = {
        "params": vs["params"],
        "batch_stats": jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                np.random.default_rng(7).uniform(0.5, 1.5, a.shape),
                a.dtype),
            vs["batch_stats"]),
    }
    out_ref, maps_ref = ref.apply(vs, x)
    out_fus, maps_fus = fus.apply(vs, x)
    np.testing.assert_allclose(np.asarray(out_fus, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=2e-2, atol=4e-2)
    for mr, mf in zip(maps_ref, maps_fus):
        np.testing.assert_allclose(np.asarray(mf, np.float32),
                                   np.asarray(mr, np.float32),
                                   rtol=2e-2, atol=4e-2)


def test_odd_spatial_gate_falls_back(monkeypatch):
    """Odd H/W inputs must take the XLA path (the module gate), and the
    kernel itself asserts on odd shapes rather than mis-pooling."""
    from agplace_tpu.models.resnet import ResNetFeatures
    from agplace_tpu.sparse import bev_grid

    monkeypatch.setattr(bev_grid, "_pallas_backend_ok", lambda: True)
    rng = np.random.default_rng(11)
    # 254px input -> conv1 stride-2 output 127x127 (odd) -> gate must
    # reject, XLA path must run
    x = jnp.asarray(rng.standard_normal((1, 254, 254, 3)), jnp.bfloat16)
    mod = ResNetFeatures(arch="resnet18", num_stages=1, train=False,
                         dtype=jnp.bfloat16, use_pallas_stem=True)
    vs = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    out, _ = mod.apply(vs, x)  # must not raise
    assert out.shape[0] == 1

    with pytest.raises(AssertionError):
        fused_affine_relu_maxpool(
            jnp.zeros((1, 7, 8, 32), jnp.bfloat16),
            jnp.ones((32,), jnp.float32), jnp.zeros((32,), jnp.float32))
