#!/usr/bin/env python
"""Space-to-depth rewrite of the resnet stem conv (7x7/2, K=3x7x7=147)
as an EXACT 4x4/1 conv over the s2d input (K=4x4x12=768): pad the kernel
to 8x8, fold 2x2 input pixels into channels.  Classic TPU MXU-packing
rewrite (MLPerf resnet); measures plain vs s2d at the bench shape, plus
exactness."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
H = W = 256
INNER = 20
ITERS = 6


def timed(step):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(y):
        return jax.lax.fori_loop(0, INNER, lambda i, y: step(y), y)

    y = jnp.float32(0.0)
    for _ in range(2):
        y = many(y)
    float(y)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = many(y)
    float(y)
    return (time.perf_counter() - t0) / (ITERS * INNER)


def s2d_weights(w):
    """[7,7,3,64] -> [4,4,12,64] such that conv4x4/1(s2d(x)) ==
    conv7x7/2,pad3(x).  Output site i reads input rows 2i-3..2i+3; in s2d
    coords (input row = 2r+p, p in {0,1}) that is s2d rows i-2..i+1 with
    kernel tap t = r - (i-2).  Solving 2r+p = 2i+dh for dh in -3..3:
    t = (dh + 3 + (1 - p)) // 2  maps (dh, p) -> tap, i.e. kernel row
    index kh = dh + 3 in 0..6 lands at tap t = (kh + 1 - p) // 2."""
    import numpy as np

    w = np.asarray(w)  # [7,7,3,64]
    # Direct construction: for each (th, tw, ph, pw), the source kernel
    # tap is kh = 2*th + ph - 1, kw = 2*tw + pw - 1 (pad taps drop out).
    out = np.zeros((4, 4, 2, 2, w.shape[2], w.shape[3]), w.dtype)
    for th in range(4):
        for tw in range(4):
            for ph in range(2):
                for pw in range(2):
                    kh = 2 * th + ph - 1
                    kw = 2 * tw + pw - 1
                    if 0 <= kh < 7 and 0 <= kw < 7:
                        out[th, tw, ph, pw] = w[kh, kw]
    return out.reshape(4, 4, 2 * 2 * w.shape[2], w.shape[3])


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.bfloat16)
    w_s2d = jnp.asarray(s2d_weights(np.asarray(w, np.float32)),
                        jnp.bfloat16)

    @jax.jit
    def plain(xx):
        return jax.lax.conv_general_dilated(
            xx, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def s2d(xx):
        b = xx.shape[0]
        # fold 2x2 pixels into channels: [B, H/2, W/2, 12].  Output site i
        # needs s2d rows i-2..i+1 -> pad (2, 1).
        xs = xx.reshape(b, H // 2, 2, W // 2, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, H // 2, W // 2, 12)
        return jax.lax.conv_general_dilated(
            xs, w_s2d, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    o1 = np.asarray(plain(x), np.float32)
    o2 = np.asarray(s2d(x), np.float32)
    d = np.abs(o1 - o2)
    print(f"exactness: maxabs={d.max():.3e} shapes {o1.shape} {o2.shape}",
          file=sys.stderr)

    results = {}
    for name, fn in (("plain", plain), ("s2d", s2d)):
        def step(y, fn=fn):
            xx = (x * (1.0 + 1e-9 * y)).astype(jnp.bfloat16)
            return fn(xx)[0, 0, 0, 0].astype(jnp.float32)

        results[name] = round(timed(step) * 1e3, 3)
        print(name, results[name], "ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
