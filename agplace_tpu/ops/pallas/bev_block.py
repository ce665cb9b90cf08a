"""Pallas TPU kernel: fused BEV ECA-basic-block (inference).

The BEV voxel branch is elementwise-bandwidth-bound: at the bench shapes a
single XLA elementwise pass over the stage-0 activation costs ~0.26 ms, and
the unfused block (2 convs + 2 BN affines + relu/mask passes + ECA pool +
attention multiply + residual) measures 1.74 ms against ~0.28 ms of conv
compute (scripts/profile_components.py, BASELINE.md r3 notes).  This kernel
executes the ENTIRE block per batch element in VMEM:

    conv3x3 (9 shifted MXU matmuls over the z-folded channels)
    -> BN affine -> relu -> mask
    -> conv3x3 -> BN affine
    -> ECA: masked global-average pool + 1D channel conv + sigmoid
    -> attention multiply -> residual add -> relu -> mask

so the activation crosses HBM exactly twice (one read, one write).

Semantics: identical to ``sparse/bev_grid.BEVECABasicBlock`` in eval mode
(reference ``layers/eca_block.py:13-79`` + ``models/resnet.py`` BasicBlock);
parity-tested against the XLA path on CPU interpret and against a float64
oracle on real TPU (tests/test_pallas_bev_block.py).

Lowering notes (established by on-hardware bisection, r3): the original
formulation accumulated the conv taps into a VMEM scratch and read it back
in per-z lane slices — each piece is bit-exact in isolation on hardware,
but COMPOSED they mis-lower (first-stage output diverged ~10% mean rel on
TPU while CPU interpret was exact; a Mosaic scratch-RMW -> sliced-read
scheduling hazard).  This version therefore:

* accumulates the 9 conv taps in an SSA *value* (no scratch read-modify-
  write) — only the halo pad lives in a scratch, whose store/load pattern
  is proven exact in isolation;
* never lane-slices activations: the per-z occupancy mask arrives
  pre-expanded to [X, Y, Z*C] (built by XLA outside the kernel), and the
  ECA z-fold / z-tile run as tiny MXU matmuls against a fold matrix
  instead of slicing the channel axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, mzc_ref, w1_ref, w2_ref, a1_ref, a2_ref, we_ref,
                  fold_ref, cnt_ref, out_ref, pad1_ref, pad2_ref, *,
                  xdim: int, ydim: int, z: int, c: int, k_eca: int):
    f32 = jnp.float32

    x = x_ref[0]                       # [X, Y, ZC] bf16 (masked input)
    mzc = mzc_ref[0].astype(f32)       # [X, Y, ZC] expanded occupancy

    def conv3x3(src, w_ref, pad_ref):
        """3x3 'same' conv via 9 shifted matmuls, accumulated in an SSA
        value (f32).  The halo pad is the only scratch (store + shifted
        reads — bit-exact on hardware in isolation).  Each conv gets its
        OWN pad scratch: reusing one buffer for both convs mis-computes on
        hardware (Mosaic reorders the second overwrite before the first
        conv's last shifted reads — a WAR hazard it does not track;
        established by on-chip bisection, r3)."""
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[1 : xdim + 1, 1 : ydim + 1, :] = src
        acc = jnp.zeros((xdim, ydim, z * c), f32)
        for dy in range(3):
            for dx in range(3):
                xs = pad_ref[dy : dy + xdim, dx : dx + ydim, :]
                acc = acc + jax.lax.dot_general(
                    xs, w_ref[dy, dx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        return acc

    # conv1 -> affine -> relu -> mask (full-width; a1[0]=scale, a1[1]=bias)
    h = conv3x3(x, w1_ref, pad1_ref)
    h = h * a1_ref[0][None, None, :] + a1_ref[1][None, None, :]
    h = jnp.maximum(h, 0.0) * mzc
    h = h.astype(jnp.bfloat16)

    # conv2 -> affine, ROUNDED through bf16 to match the XLA path (there
    # the BN output materialises as a bf16 grid before pool/attention)
    g = conv3x3(h, w2_ref, pad2_ref)
    g = (g * a2_ref[0][None, None, :] + a2_ref[1][None, None, :]
         ).astype(jnp.bfloat16).astype(f32)

    # ECA: masked global average.  Sum over (x, y) full-width, then fold
    # the z-replicated channel axis with the [ZC, C] fold matrix (z
    # stacked identities) on the MXU — no lane slicing.
    s_zc = jnp.sum(g * mzc, axis=(0, 1))[None, :]          # [1, ZC]
    pooled = jax.lax.dot_general(
        s_zc, fold_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                        # [1, C]
    pooled = pooled / cnt_ref[0, 0, 0]

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
    att = jax.nn.sigmoid(att)                              # [1, C]

    # z-tile the attention back to [1, ZC] via the fold matrix transpose,
    # then attention multiply + residual + relu + mask, full-width
    att_zc = jax.lax.dot_general(
        att, fold_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # [1, ZC]
    out = g * att_zc[0][None, None, :] + x.astype(f32)
    out = jnp.maximum(out, 0.0) * mzc
    out_ref[0] = out.astype(jnp.bfloat16)


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

    # host-side (XLA) prep: expanded mask, per-item valid count, z-fold
    # matrix — all cheap, fused by XLA into the surrounding graph
    mzc = jnp.repeat(mask, c, axis=-1).astype(jnp.bfloat16)  # [B,X,Y,ZC]
    cnt = jnp.maximum(
        jnp.sum(mask.astype(jnp.float32), axis=(1, 2, 3)), 1.0
    ).reshape(b, 1, 1)                                       # [B,1,1]
    fold = jnp.tile(jnp.eye(c, dtype=jnp.float32), (z, 1))   # [ZC, C]

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    kernel = functools.partial(_block_kernel, xdim=xdim, ydim=ydim, z=z,
                               c=c, k_eca=k_eca)
    big = lambda: pl.BlockSpec((1, xdim, ydim, zc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # the stage-0 block needs ~20 MB of scoped VMEM (f32 value
            # accumulator + double-buffered blocks); the default scoped
            # limit is 16 MB, the hardware has more
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, xdim, ydim, zc), jnp.bfloat16),
        in_specs=[
            big(),                                            # x
            big(),                                            # mask (ZC)
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # a1
            pl.BlockSpec(memory_space=pltpu.VMEM),            # a2
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_eca
            pl.BlockSpec(memory_space=pltpu.VMEM),            # fold
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # cnt
        ],
        out_specs=big(),
        scratch_shapes=[
            pltpu.VMEM((xdim + 2, ydim + 2, zc), jnp.bfloat16),  # halo pad 1
            pltpu.VMEM((xdim + 2, ydim + 2, zc), jnp.bfloat16),  # halo pad 2
        ],
    )(x.astype(jnp.bfloat16), mzc, w1.astype(jnp.bfloat16),
      w2.astype(jnp.bfloat16), a1, a2, w_eca.astype(jnp.float32),
      fold, cnt)
