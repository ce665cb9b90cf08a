"""Three-way on-hardware check of the fused stem-tail kernel
(ops/pallas/stem_pool.py) at bench shapes: TPU Pallas kernel vs TPU XLA
path vs float64 numpy oracle.  Companion to tests/test_pallas_stem_pool.py
(CPU interpret); results recorded in BASELINE.md."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from agplace_tpu.ops.pallas.stem_pool import fused_affine_relu_maxpool

print("backend:", jax.default_backend())

for B in (32, 128):
    H = W = 128  # conv1 output at the 256px bench input
    C = 64
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 2.0, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.2, 2.0, (C,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    xla = jax.jit(lambda x, s, b: nn.max_pool(
        nn.relu(x * s.astype(x.dtype) + b.astype(x.dtype)),
        (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))))(x, scale, bias)
    ker = jax.jit(fused_affine_relu_maxpool)(x, scale, bias)

    # float64 oracle (affine rounds at bf16 like both device paths)
    xf = np.asarray(x, np.float64)
    s64 = np.asarray(scale.astype(jnp.bfloat16), np.float64)
    b64 = np.asarray(bias.astype(jnp.bfloat16), np.float64)
    y = np.maximum(xf * s64 + b64, 0.0)
    pad = np.full((B, H + 2, W + 2, C), -np.inf)
    pad[:, 1:-1, 1:-1] = y
    oracle = np.full((B, H // 2, W // 2, C), -np.inf)
    for dh in range(3):
        for dw in range(3):
            oracle = np.maximum(oracle, pad[:, dh:dh + H:2, dw:dw + W:2, :])

    for name, a in [("xla", xla), ("kernel", ker)]:
        a = np.asarray(a, np.float64)
        d = np.abs(a - oracle)
        nz = oracle != 0
        rel = d / np.maximum(np.abs(oracle), 1e-3)
        print(f"b{B} {name:6s}: maxabs={d.max():.4e} mean={d.mean():.3e} "
              f"p99rel={np.percentile(rel[nz], 99):.3e}")
    d_xk = np.abs(np.asarray(xla, np.float64) - np.asarray(ker, np.float64))
    print(f"b{B} xla-vs-kernel maxabs={d_xk.max():.4e} "
          f"bitwise_equal={bool((d_xk == 0).all())}")
