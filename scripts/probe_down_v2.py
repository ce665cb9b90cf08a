#!/usr/bin/env python
"""Prototype A/B: restructured fused_conv0_down0 (concat formulation —
one wide affine, one mask-expansion dot, one K=4*ZC1 down dot, bf16 mask
dots) vs the shipped per-parity kernel.  Checks numerical parity against
the shipped kernel, then times both on chip at bench shapes."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
VOX_CAP = 8192
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


def make_v2():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(g00, g01, g10, g11, mt_ref, a0_ref, wd_ref, ad_ref,
                e_ref, pe_ref, out_ref):
        f32 = jnp.float32
        bf16 = jnp.bfloat16
        mt = mt_ref[:]  # [TX, Yo, B, 4Z] bf16 0/1

        m1zc = jax.lax.dot_general(
            mt, pe_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=f32)
        m1zc = (m1zc > 0.0).astype(bf16)

        g_all = jnp.concatenate([g00[:], g01[:], g10[:], g11[:]], axis=-1)
        s0 = a0_ref[0].astype(bf16)
        b0 = a0_ref[1].astype(bf16)
        act = jnp.maximum(
            g_all * s0[None, None, None, :] + b0[None, None, None, :], 0)
        mzc = jax.lax.dot_general(
            mt, e_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=f32)
        act = act * mzc.astype(bf16)
        acc = jax.lax.dot_general(
            act, wd_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=f32)

        sd = ad_ref[0].astype(bf16)
        bd = ad_ref[1].astype(bf16)
        out = acc.astype(bf16) * sd[None, None, None, :] + bd[None, None,
                                                              None, :]
        out_ref[:] = jnp.maximum(out, 0) * m1zc

    def fused_v2(feats, mask, w0_folded, scale0, bias0, wd_folded,
                 scale_d, bias_d, *, z: int):
        import flax.linen as nn
        from agplace_tpu.sparse.voxels import me_down_align

        b, x, y, zc0 = feats.shape
        k0 = int(w0_folded.shape[0])
        zc1 = int(w0_folded.shape[3])
        zc2 = int(wd_folded.shape[3])
        lo_z, hi_z, zo = me_down_align(z)
        c1, c2 = zc1 // z, zc2 // zo
        xo, yo = x // 2, y // 2
        h = k0 // 2

        w2 = w0_folded.astype(jnp.bfloat16)
        fb = feats.astype(jnp.bfloat16)
        gs = [
            jax.lax.conv_general_dilated(
                fb, w2, window_strides=(2, 2),
                padding=[(h - px, k0 - 2 - h + px),
                         (h - py, k0 - 2 - h + py)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).transpose(1, 2, 0, 3)
            for px in range(2) for py in range(2)
        ]

        mt = (mask.astype(jnp.bfloat16)
              .reshape(b, xo, 2, yo, 2, z)
              .transpose(1, 3, 0, 2, 4, 5)
              .reshape(xo, yo, b, 4 * z))

        a0 = jnp.stack([jnp.tile(scale0, 4),
                        jnp.tile(bias0, 4)]).astype(jnp.float32)
        ad = jnp.stack([scale_d, bias_d]).astype(jnp.float32)
        wd = wd_folded.reshape(4 * zc1, zc2).astype(jnp.bfloat16)
        e = np.zeros((4 * z, 4 * zc1), np.float32)
        pe = np.zeros((4 * z, zo * c2), np.float32)
        for p in range(4):
            for zi in range(z):
                e[p * z + zi,
                  p * zc1 + zi * c1: p * zc1 + (zi + 1) * c1] = 1.0
                zp = (zi + lo_z) // 2
                pe[p * z + zi, zp * c2: (zp + 1) * c2] = 1.0
        e = jnp.asarray(e, jnp.bfloat16)
        pe = jnp.asarray(pe, jnp.bfloat16)

        mask_out = nn.max_pool(
            mask[..., None].astype(jnp.float32), (2, 2, 2),
            strides=(2, 2, 2), padding=[(0, 0), (0, 0), (lo_z, hi_z)])[
                ..., 0] > 0

        tx = xo
        while tx > 1 and tx * yo * b * (4 * zc1 + zc2) * 2 \
                > 20 * 1024 * 1024:
            tx //= 2
            while tx > 1 and xo % tx:
                tx -= 1

        interpret = jax.default_backend() != "tpu"
        blk = lambda c: pl.BlockSpec((tx, yo, b, c),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            grid=(xo // tx,),
            out_shape=jax.ShapeDtypeStruct((xo, yo, b, zc2), jnp.bfloat16),
            in_specs=[blk(zc1)] * 4 + [blk(4 * z)]
            + [full(), full(), full(), full(), full()],
            out_specs=blk(zc2),
        )(*gs, mt, a0, wd, ad, e, pe)
        return out.transpose(2, 0, 1, 3), mask_out

    return fused_v2


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.config import kitti360_config
    from agplace_tpu.ops.pallas.bev_down import fused_conv0_down0
    from agplace_tpu.sparse.bev_grid import (
        fold_w2_k2s2, fold_w2_stride1, rasterize_from_voxels_host)
    from agplace_tpu.sparse.voxels import batched_from_pointclouds, \
        me_down_align

    fused_v2 = make_v2()

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, VOX_CAP)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))
    feats = vox.feats.astype(jnp.bfloat16)
    mask = vox.mask
    z0 = vox.z
    c1 = cfg.model.mm.voxfe_planes[0]

    rngp = np.random.default_rng(1)
    k0 = jnp.asarray(rngp.standard_normal((5, 5, z0, 1, c1)) * 0.1,
                     jnp.float32)
    kd = jnp.asarray(rngp.standard_normal((2, 2, z0, c1, c1)) * 0.1,
                     jnp.float32)
    w0 = fold_w2_stride1(k0, z0)
    wd = fold_w2_k2s2(kd, z0)
    zo = me_down_align(z0)[2]
    s0 = jnp.asarray(rngp.uniform(0.5, 1.5, (z0 * c1,)), jnp.float32)
    b0 = jnp.asarray(rngp.standard_normal((z0 * c1,)), jnp.float32)
    sd = jnp.asarray(rngp.uniform(0.5, 1.5, (zo * c1,)), jnp.float32)
    bd = jnp.asarray(rngp.standard_normal((zo * c1,)), jnp.float32)

    # numerical parity first
    o1, m1 = jax.jit(functools.partial(fused_conv0_down0, z=z0))(
        feats, mask, w0, s0, b0, wd, sd, bd)
    o2, m2 = jax.jit(functools.partial(fused_v2, z=z0))(
        feats, mask, w0, s0, b0, wd, sd, bd)
    d = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32))
    rel = d.max() / max(np.abs(np.asarray(o1)).max(), 1e-6)
    print(f"parity: maxabs={d.max():.3e} maxrel={rel:.3e} "
          f"mask_equal={bool((np.asarray(m1) == np.asarray(m2)).all())}",
          file=sys.stderr)

    results = {}
    for name, fn in (("v1_shipped", fused_conv0_down0), ("v2_concat",
                                                         fused_v2)):
        @jax.jit
        def step(yv, fn=fn):
            o, _ = fn((feats * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16),
                      mask, w0, s0, b0, wd, sd, bd, z=z0)
            return o[0, 0, 0, 0].astype(jnp.float32)

        results[name] = timed(step)
        print(f"{name}: {results[name] * 1e3:.3f} ms", file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
