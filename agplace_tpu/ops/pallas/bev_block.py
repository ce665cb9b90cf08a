"""Pallas TPU kernel: fused BEV ECA-basic-block (inference).

The BEV voxel branch is elementwise-bandwidth-bound: at the bench shapes a
single XLA elementwise pass over the stage-0 activation costs ~0.26 ms, and
the unfused block (2 convs + 2 BN affines + relu/mask passes + ECA pool +
attention multiply + residual) measures 1.74 ms against ~0.28 ms of conv
compute (scripts/profile_components.py, BASELINE.md r3 notes).  This kernel
executes the ENTIRE block per batch element in VMEM:

    conv3x3 (9 shifted MXU matmuls over the z-folded channels)
    -> BN affine -> relu -> per-z mask
    -> conv3x3 -> BN affine
    -> ECA: masked global-average pool + 1D channel conv + sigmoid
    -> attention multiply -> residual add -> relu -> per-z mask

so the activation crosses HBM exactly twice (one read, one write).

Semantics: identical to ``sparse/bev_grid.BEVECABasicBlock`` in eval mode
(reference ``layers/eca_block.py:13-79`` + ``models/resnet.py`` BasicBlock);
parity-tested against the XLA path on CPU interpret and real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, m_ref, w1_ref, w2_ref, a1_ref, a2_ref, we_ref,
                  out_ref, pad_ref, acc_ref, hb_ref, *, xdim: int,
                  ydim: int, z: int, c: int, k_eca: int):
    zc = z * c
    f32 = jnp.float32

    m = m_ref[0]  # [X, Y, Z] bf16 occupancy

    def conv3x3(src, w_ref):
        """3x3 'same' conv via 9 shifted matmuls into the shared f32
        accumulator scratch (VMEM budget: one [X,Y,ZC] f32 buffer total)."""
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[1 : xdim + 1, 1 : ydim + 1, :] = src
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for dy in range(3):
            for dx in range(3):
                xs = pad_ref[dy : dy + xdim, dx : dx + ydim, :]
                acc_ref[:] += jax.lax.dot_general(
                    xs, w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )

    # conv1 -> affine -> relu -> mask  (no .at[] value updates in-kernel:
    # full-slice scatters capture empty index constants pallas rejects)
    conv3x3(x_ref[0], w1_ref)
    for zi in range(z):
        sl = slice(zi * c, (zi + 1) * c)
        s1v = a1_ref[0, sl]  # slice at the REF (mosaic: no value gathers)
        b1v = a1_ref[1, sl]
        h = (acc_ref[:, :, sl] * s1v[None, None, :]
             + b1v[None, None, :])
        h = jnp.maximum(h, 0.0) * m[:, :, zi : zi + 1].astype(f32)
        hb_ref[:, :, sl] = h.astype(jnp.bfloat16)

    # conv2 -> affine (left in the f32 accumulator scratch, ROUNDED
    # through bf16 so results match the XLA path bit-for-bit in spirit:
    # there the BN output materialises as a bf16 grid before pool/attn)
    conv3x3(hb_ref[:], w2_ref)
    acc_ref[:] = (acc_ref[:] * a2_ref[0][None, None, :]
                  + a2_ref[1][None, None, :]
                  ).astype(jnp.bfloat16).astype(f32)

    # ECA: masked global average over (x, y, z) per channel c
    pooled = jnp.zeros((1, c), f32)
    for zi in range(z):
        sl = slice(zi * c, (zi + 1) * c)
        pooled = pooled + jnp.sum(
            acc_ref[:, :, sl] * m[:, :, zi : zi + 1].astype(f32),
            axis=(0, 1))[None, :]
    cnt = jnp.maximum(jnp.sum(m.astype(f32)), 1.0)
    pooled = pooled / cnt  # [1, C]

    # 1D channel conv (kernel k_eca, zero-padded) + sigmoid
    att = jnp.zeros((1, c), f32)
    half = (k_eca - 1) // 2
    for t in range(k_eca):
        shift = t - half  # y[c] += w[t] * p[c + shift]
        wt = we_ref[t]
        if shift == 0:
            sp = pooled
        elif shift > 0:
            sp = jnp.concatenate(
                [pooled[:, shift:], jnp.zeros((1, shift), f32)], axis=1)
        else:
            sp = jnp.concatenate(
                [jnp.zeros((1, -shift), f32), pooled[:, : c + shift]],
                axis=1)
        att = att + wt * sp
    att = jax.nn.sigmoid(att)  # [1, C]

    # attention multiply + residual + relu + mask, per z slice
    for zi in range(z):
        sl = slice(zi * c, (zi + 1) * c)
        t = acc_ref[:, :, sl] * att[0][None, None, :]
        t = t + x_ref[0, :, :, sl].astype(f32)
        t = jnp.maximum(t, 0.0) * m[:, :, zi : zi + 1].astype(f32)
        out_ref[0, :, :, sl] = t.astype(jnp.bfloat16)


def fused_eca_block(x, mask, w1, w2, scale1, bias1, scale2, bias2, w_eca,
                    z: int):
    """x [B,X,Y,Z*C] bf16 (masked), mask [B,X,Y,Z] bool, w1/w2 folded
    [3,3,Z*C,Z*C], scale/bias [Z*C] f32 (BN eval affine), w_eca [k] f32.
    Returns the block output [B,X,Y,Z*C] bf16."""
    b, xdim, ydim, zc = x.shape
    c = zc // z
    k_eca = int(w_eca.shape[0])
    a1 = jnp.stack([scale1, bias1]).astype(jnp.float32)  # [2, ZC]
    a2 = jnp.stack([scale2, bias2]).astype(jnp.float32)
    mb = mask.astype(jnp.bfloat16)

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    kernel = functools.partial(_block_kernel, xdim=xdim, ydim=ydim, z=z,
                               c=c, k_eca=k_eca)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the stage-0 block needs ~18 MB of scoped VMEM (f32
            # accumulator + double-buffered blocks); the default scoped
            # limit is 16 MB, the hardware has more
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, xdim, ydim, zc), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec((1, xdim, ydim, zc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, xdim, ydim, z), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, xdim, ydim, zc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((xdim + 2, ydim + 2, zc), jnp.bfloat16),  # halo pad
            pltpu.VMEM((xdim, ydim, zc), jnp.float32),  # f32 accumulator
            pltpu.VMEM((xdim, ydim, zc), jnp.bfloat16),  # conv1 output
        ],
    )(x.astype(jnp.bfloat16), mb, w1.astype(jnp.bfloat16),
      w2.astype(jnp.bfloat16), a1, a2, w_eca.astype(jnp.float32))
