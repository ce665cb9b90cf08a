#!/usr/bin/env python
"""Prototype A/B: bev_block_sm conv3x3 as im2col-concat chunks (fewer,
bigger MXU dots + fewer f32 accumulation adds) vs the shipped 9-dot
accumulation.  The r3 bev_head lesson says concat wins (~2us latency
floor per dot + the f32 acc adds spill to VMEM at these M sizes)."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 32
INNER = 20
ITERS = 6
CHUNK = int(os.environ.get("CHUNK", "3"))  # taps per concat chunk (1/3/9)


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


def make_v2(chunk: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _block_kernel(x_ref, mt_ref, w1_ref, w2_ref, a1_ref, a2_ref,
                      we_ref, e_ref, fold_ref, cnt_ref, wd_ref, ad_ref,
                      out_ref, pad1_ref, pad2_ref, *, xdim, ydim, tb, zci,
                      zco, c, k_eca, has_ds):
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        x = x_ref[:]
        mzc = jax.lax.dot_general(
            mt_ref[:], e_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=f32).astype(bf16)

        def conv3x3(src, w_ref, pad_ref, zc_in):
            # im2col-concat: group the 9 taps into ceil(9/chunk) chunks;
            # each chunk is ONE MXU dot over chunk*zc_in folded channels
            pad_ref[:] = jnp.zeros_like(pad_ref)
            pad_ref[1 : xdim + 1, 1 : ydim + 1] = src
            taps = [(dx, dy) for dx in range(3) for dy in range(3)]
            acc = None
            for i0 in range(0, 9, chunk):
                grp = taps[i0 : i0 + chunk]
                cols = jnp.concatenate(
                    [pad_ref[dx : dx + xdim, dy : dy + ydim]
                     for dx, dy in grp], axis=-1)
                wg = jnp.concatenate(
                    [w_ref[3 * dx + dy] for dx, dy in grp], axis=0)
                d = jax.lax.dot_general(
                    cols, wg, (((3,), (0,)), ((), ())),
                    preferred_element_type=f32)
                acc = d if acc is None else acc + d
            return acc

        a1s = a1_ref[0].astype(bf16)
        a1b = a1_ref[1].astype(bf16)
        h = conv3x3(x, w1_ref, pad1_ref, zci).astype(bf16)
        h = jnp.maximum(
            h * a1s[None, None, None, :] + a1b[None, None, None, :],
            0) * mzc

        a2s = a2_ref[0].astype(bf16)
        a2b = a2_ref[1].astype(bf16)
        g = conv3x3(h, w2_ref, pad2_ref, zco).astype(bf16)
        g = g * a2s[None, None, None, :] + a2b[None, None, None, :]

        s_zc = jnp.sum((g * mzc).astype(f32), axis=(0, 1))
        pooled = jax.lax.dot_general(
            s_zc, fold_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        pooled = pooled / cnt_ref[:]

        att = jnp.zeros((tb, c), f32)
        half = (k_eca - 1) // 2
        for t in range(k_eca):
            shift = t - half
            wt = we_ref[t]
            if shift == 0:
                sp = pooled
            elif shift > 0:
                sp = jnp.concatenate(
                    [pooled[:, shift:], jnp.zeros((tb, shift), f32)],
                    axis=1)
            else:
                sp = jnp.concatenate(
                    [jnp.zeros((tb, -shift), f32),
                     pooled[:, : c + shift]], axis=1)
            att = att + wt * sp
        att = jax.nn.sigmoid(att)

        if has_ds:
            r = jax.lax.dot_general(
                x, wd_ref[:], (((3,), (0,)), ((), ())),
                preferred_element_type=f32).astype(bf16)
            r = r * ad_ref[0].astype(bf16)[None, None, None, :] \
                + ad_ref[1].astype(bf16)[None, None, None, :]
        else:
            r = x

        att_zc = jax.lax.dot_general(
            att, fold_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(bf16)
        out = g * att_zc[None, None, :, :] + r
        out_ref[:] = jnp.maximum(out, 0) * mzc

    def fused_v2(x, mask, w1, w2, scale1, bias1, scale2, bias2, w_eca,
                 z, wd=None, scale_d=None, bias_d=None, tb=None):
        b, xdim, ydim, zci = x.shape
        zco = int(w2.shape[2])
        c = zco // z
        has_ds = wd is not None
        k_eca = int(w_eca.shape[0])
        a1 = jnp.stack([scale1, bias1]).astype(jnp.float32)
        a2 = jnp.stack([scale2, bias2]).astype(jnp.float32)
        if has_ds:
            wdf = wd.astype(jnp.bfloat16).reshape(zci, zco)
            ad = jnp.stack([scale_d, bias_d]).astype(jnp.float32)
        else:
            wdf = jnp.zeros((zci, zco), jnp.bfloat16)
            ad = jnp.zeros((2, zco), jnp.float32)

        x_sm = x.astype(jnp.bfloat16).transpose(1, 2, 0, 3)
        mt = mask.astype(jnp.bfloat16).transpose(1, 2, 0, 3)
        cnt = jnp.maximum(
            jnp.sum(mask.astype(jnp.float32), axis=(1, 2, 3)), 1.0
        )[:, None]
        e = jnp.repeat(jnp.eye(z, dtype=jnp.float32), c, axis=1)
        fold = jnp.tile(jnp.eye(c, dtype=jnp.float32), (z, 1))
        w1f = w1.astype(jnp.bfloat16).reshape(9, zci, zco)
        w2f = w2.astype(jnp.bfloat16).reshape(9, zco, zco)

        zmax = max(zci, zco)
        cands = sorted({d for d in range(1, b + 1)
                        if b % d == 0 and (d % 8 == 0 or d == b)},
                       reverse=True)
        if tb is None:
            tb = cands[-1]
            for cand in cands:
                if xdim * ydim * cand * zmax * 2 <= 8.5 * 1024 * 1024:
                    tb = cand
                    break

        interpret = jax.default_backend() != "tpu"
        kernel = functools.partial(
            _block_kernel, xdim=xdim, ydim=ydim, tb=tb, zci=zci, zco=zco,
            c=c, k_eca=k_eca, has_ds=has_ds)
        blk = lambda ch: pl.BlockSpec((xdim, ydim, tb, ch),
                                      lambda i: (0, 0, i, 0),
                                      memory_space=pltpu.VMEM)
        full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
            grid=(b // tb,),
            out_shape=jax.ShapeDtypeStruct((xdim, ydim, b, zco),
                                           jnp.bfloat16),
            in_specs=[
                blk(zci), blk(z),
                full(), full(), full(), full(), full(),
                full(), full(),
                pl.BlockSpec((tb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(), full(),
            ],
            out_specs=blk(zco),
            scratch_shapes=[
                pltpu.VMEM((xdim + 2, ydim + 2, tb, zci), jnp.bfloat16),
                pltpu.VMEM((xdim + 2, ydim + 2, tb, zco), jnp.bfloat16),
            ],
        )(x_sm, mt, w1f, w2f, a1, a2, w_eca.astype(jnp.float32), e, fold,
          cnt, wdf, ad)
        return out.transpose(2, 0, 1, 3)

    return fused_v2


def main() -> None:
    import jax
    import jax.numpy as jnp

    from agplace_tpu.ops.pallas.bev_block_sm import fused_eca_block_sm
    from agplace_tpu.sparse.bev_grid import (
        BEVECABasicBlock, BEVGrid, rasterize_from_voxels_host)
    from agplace_tpu.sparse.voxels import batched_from_pointclouds
    from agplace_tpu.config import kitti360_config

    fused_v2 = make_v2(CHUNK)

    cfg = kitti360_config()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (BATCH, 30000, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, 8192)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))
    import flax.linen as nn

    # block0 shape: post-down0 grid
    m1 = nn.max_pool(vox.mask[..., None].astype(jnp.float32), (2, 2, 2),
                     strides=(2, 2, 2))[..., 0] > 0
    b, xo, yo, zo = m1.shape
    c1 = cfg.model.mm.voxfe_planes[0]
    rngp = np.random.default_rng(1)
    f1 = jnp.asarray(rngp.standard_normal((b, xo, yo, zo * c1)),
                     jnp.bfloat16)
    f1 = f1 * jnp.repeat(m1.astype(jnp.bfloat16), c1, axis=-1)

    w1 = jnp.asarray(rngp.standard_normal((3, 3, zo * c1, zo * c1)) * 0.05,
                     jnp.float32)
    w2 = jnp.asarray(rngp.standard_normal((3, 3, zo * c1, zo * c1)) * 0.05,
                     jnp.float32)
    s1 = jnp.asarray(rngp.uniform(0.5, 1.5, (zo * c1,)), jnp.float32)
    b1 = jnp.asarray(rngp.standard_normal((zo * c1,)), jnp.float32)
    s2 = jnp.asarray(rngp.uniform(0.5, 1.5, (zo * c1,)), jnp.float32)
    b2 = jnp.asarray(rngp.standard_normal((zo * c1,)), jnp.float32)
    we = jnp.asarray(rngp.standard_normal((3,)), jnp.float32)

    o1 = jax.jit(functools.partial(fused_eca_block_sm, z=zo))(
        f1, m1, w1, w2, s1, b1, s2, b2, we)
    o2 = jax.jit(functools.partial(fused_v2, z=zo))(
        f1, m1, w1, w2, s1, b1, s2, b2, we)
    d = np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32))
    print(f"parity: maxabs={d.max():.3e} "
          f"(|o1|max={np.abs(np.asarray(o1)).max():.2f})", file=sys.stderr)

    results = {"chunk": CHUNK}
    for name, fn in (("v1_shipped", fused_eca_block_sm),
                     ("v2_concat", fused_v2)):
        @jax.jit
        def step(yv, fn=fn):
            fi = (f1 * (1.0 + 1e-9 * yv)).astype(jnp.bfloat16)
            o = fn(fi, m1, w1, w2, s1, b1, s2, b2, we, z=zo)
            return o[0, 0, 0, 0].astype(jnp.float32)

        results[name] = round(timed(step) * 1e3, 3)
        print(f"{name}: {results[name]} ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
