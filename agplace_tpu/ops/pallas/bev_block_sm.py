"""Pallas TPU kernel: fused BEV ECA-basic-block, spatial-major formulation.

Second-generation version of ``ops/pallas/bev_block.py``, built on the r4
layout finding (see ops/pallas/bev_down.py): XLA:TPU lays conv outputs out
as {3,0,2,1} — physically x-major, batch in sublanes, channels in lanes —
while a Pallas custom-call demands the default layout of its operands'
LOGICAL shape.  Feeding the batch-major [B,X,Y,Z*C] logical view costs a
full relayout copy on both sides of the kernel (why the r3 batch-major
block kernel, 2x faster standalone, was neutral in the full model).  This
kernel's operands are the SPATIAL-MAJOR logical view [X,Y,B,Z*C], whose
default layout IS the physical layout the surrounding convolutions
already produce — the boundary transposes are bitcasts, and transpose
pairs between consecutive fused ops cancel entirely.

The spatial-major block layout also dissolves the r3 kernel's two
hardware hazards by construction: x and y are ARRAY dimensions (batch
rides the sublanes, channels the lanes), so the nine 3x3-conv taps are
plain array-dim slices of a halo-padded scratch — no ``pltpu.roll``, no
sublane-offset mismatches, no lane slicing anywhere.  One halo scratch
per conv (the r3 WAR-hazard rule); tap accumulation in an SSA f32 value.

Computation per grid step (a batch tile of TB items, full X x Y extent):

    conv3x3 (9 array-shifted MXU matmuls over z-folded channels)
    -> BN eval affine -> relu -> mask
    -> conv3x3 -> BN eval affine
    -> ECA: masked global-average pool (z-fold matmul) + 1D channel conv
       + sigmoid
    -> attention multiply -> residual add -> relu -> mask

Masks arrive compact ([X,Y,B,Z]) and expand over channels in-kernel via a
[Z, Z*C] selection matmul.  Semantics: identical to
``sparse/bev_grid.BEVECABasicBlock`` in eval mode (reference
``layers/eca_block.py:13-79`` + ``models/resnet.py`` BasicBlock);
parity-tested against the XLA path on CPU interpret
(tests/test_pallas_bev_block_sm.py) and against the XLA path on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, mt_ref, w1_ref, w2_ref, a1_ref, a2_ref, we_ref,
                  e_ref, fold_ref, cnt_ref, wd_ref, ad_ref, out_ref,
                  pad1_ref, pad2_ref, *, xdim: int, ydim: int, tb: int,
                  zci: int, zco: int, c: int, k_eca: int, has_ds: bool):
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    x = x_ref[:]                                  # [X, Y, TB, ZCin] bf16
    mzc = jax.lax.dot_general(                    # [X, Y, TB, ZCout] bf16
        mt_ref[:], e_ref[:], (((3,), (0,)), ((), ())),
        preferred_element_type=f32).astype(bf16)

    def conv3x3(src, w_ref, pad_ref, zc_in):
        """3x3 'same' conv: halo-pad scratch + 9 array-dim shifted reads,
        each one MXU dot over the folded channels, accumulated in SSA f32.
        x/y are array dims, so every tap is a canonical-layout slice."""
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[1 : xdim + 1, 1 : ydim + 1] = src
        acc = None
        for dx in range(3):
            for dy in range(3):
                xs = pad_ref[dx : dx + xdim, dy : dy + ydim]
                d = jax.lax.dot_general(
                    xs, w_ref[3 * dx + dy], (((3,), (0,)), ((), ())),
                    preferred_element_type=f32)
                acc = d if acc is None else acc + d
        return acc

    # dtype flow mirrors the XLA path exactly (and keeps f32 temporaries
    # off the VMEM stack): conv accumulates f32 and rounds to bf16 (XLA
    # conv semantics), the BN affine/relu/mask run in bf16 (BEVBatchNorm
    # casts eff_scale/eff_bias to the feats dtype).
    a1s = a1_ref[0].astype(bf16)
    a1b = a1_ref[1].astype(bf16)
    h = conv3x3(x, w1_ref, pad1_ref, zci).astype(bf16)
    h = jnp.maximum(
        h * a1s[None, None, None, :] + a1b[None, None, None, :], 0) * mzc

    a2s = a2_ref[0].astype(bf16)
    a2b = a2_ref[1].astype(bf16)
    g = conv3x3(h, w2_ref, pad2_ref, zco).astype(bf16)
    g = g * a2s[None, None, None, :] + a2b[None, None, None, :]

    # ECA: masked global average per batch item.  Sum over (x, y) then
    # fold the z-replicated channel axis with the [ZCout, C] matrix.
    s_zc = jnp.sum((g * mzc).astype(f32), axis=(0, 1))        # [TB, ZCout]
    pooled = jax.lax.dot_general(
        s_zc, fold_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                           # [TB, C]
    pooled = pooled / cnt_ref[:]  # [TB, 1] broadcast

    # 1D channel conv (kernel k_eca, zero-padded) + sigmoid
    att = jnp.zeros((tb, c), f32)
    half = (k_eca - 1) // 2
    for t in range(k_eca):
        shift = t - half  # y[c] += w[t] * p[c + shift]
        wt = we_ref[t]
        if shift == 0:
            sp = pooled
        elif shift > 0:
            sp = jnp.concatenate(
                [pooled[:, shift:], jnp.zeros((tb, shift), f32)], axis=1)
        else:
            sp = jnp.concatenate(
                [jnp.zeros((tb, -shift), f32), pooled[:, : c + shift]],
                axis=1)
        att = att + wt * sp
    att = jax.nn.sigmoid(att)                                 # [TB, C]

    # residual: identity, or the channel-change path conv1x1 -> BN (the
    # XLA path's downsample_conv/downsample_bn, unmasked before the sum)
    if has_ds:
        r = jax.lax.dot_general(
            x, wd_ref[:], (((3,), (0,)), ((), ())),
            preferred_element_type=f32).astype(bf16)
        r = r * ad_ref[0].astype(bf16)[None, None, None, :] \
            + ad_ref[1].astype(bf16)[None, None, None, :]
    else:
        r = x

    # z-tile attention back to [TB, ZCout]; multiply, residual, relu,
    # mask in bf16 — exactly the XLA path's dtypes (_eca_apply multiplies
    # the bf16 grid; the residual add + relu run on bf16 feats)
    att_zc = jax.lax.dot_general(
        att, fold_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(bf16)              # [TB, ZCout]
    out = g * att_zc[None, None, :, :] + r
    out_ref[:] = jnp.maximum(out, 0) * mzc


def _pick_tb(b: int, xdim: int, ydim: int, zmax: int) -> int:
    """Batch tile: Mosaic needs the sublane block dim divisible by 8 (or
    equal to the full array dim); largest candidate whose input block
    stays under ~8.5 MB, else the smallest legal one."""
    cands = sorted({d for d in range(1, b + 1)
                    if b % d == 0 and (d % 8 == 0 or d == b)},
                   reverse=True)
    tb = cands[-1]
    for cand in cands:
        if xdim * ydim * cand * zmax * 2 <= 8.5 * 1024 * 1024:
            tb = cand
            break
    return tb


def sm_block_vmem_ok(b: int, xdim: int, ydim: int, zci: int,
                     zco: int) -> bool:
    """Whether the kernel's per-step VMEM footprint fits at this shape.

    The kernel holds, per grid step: double-buffered in/out blocks, two
    halo-pad scratches, and the f32 conv accumulator + h + mzc SSA values
    (these spill to VMEM at block sizes).  At z-extent 8 shapes (nuScenes:
    zci=zco=256 at 64x64) the total exceeds scoped VMEM and XLA aborts
    with 80 MB of register-allocator spills — the caller must take the
    XLA path instead.  Budget 110 MB: the proven-working KITTI shapes sit
    at ~85 MB, the failing nuScenes block0 at ~170 MB."""
    tb = _pick_tb(b, xdim, ydim, max(zci, zco))
    xy = xdim * ydim
    est = tb * (
        xy * (2 * zci + 2 * zco) * 2                 # in/out, double-buffered
        + (xdim + 2) * (ydim + 2) * (zci + zco) * 2  # halo-pad scratches
        + xy * zco * (4 + 2 + 2)                     # f32 acc + h + mzc
    )
    return est <= 110 * 1024 * 1024


def fused_eca_block_sm(x, mask, w1, w2, scale1, bias1, scale2, bias2,
                       w_eca, z: int, wd=None, scale_d=None, bias_d=None,
                       tb: int = None):
    """x [B,X,Y,Z*Cin] bf16 (masked), mask [B,X,Y,Z] bool, w1 folded
    [3,3,Z*Cin,Z*Cout], w2 [3,3,Z*Cout,Z*Cout], scale/bias [Z*Cout] f32
    (BN eval affines), w_eca [k] f32.  For channel-changing blocks pass
    the 1x1 downsample path: wd folded [1,1,Z*Cin,Z*Cout] (block-diagonal
    over z), scale_d/bias_d [Z*Cout].  Returns [B,X,Y,Z*Cout] bf16.

    The batch-major interface transposes at the boundary; on TPU those
    transposes are bitcasts against the conv-native physical layout (and
    cancel outright between consecutive fused ops)."""
    b, xdim, ydim, zci = x.shape
    zco = int(w2.shape[2])
    c = zco // z
    has_ds = wd is not None
    assert has_ds or zci == zco, (zci, zco)
    k_eca = int(w_eca.shape[0])
    a1 = jnp.stack([scale1, bias1]).astype(jnp.float32)  # [2, ZCout]
    a2 = jnp.stack([scale2, bias2]).astype(jnp.float32)
    if has_ds:
        wdf = wd.astype(jnp.bfloat16).reshape(zci, zco)
        ad = jnp.stack([scale_d, bias_d]).astype(jnp.float32)
    else:  # placeholders (tiny, never read)
        wdf = jnp.zeros((zci, zco), jnp.bfloat16)
        ad = jnp.zeros((2, zco), jnp.float32)

    x_sm = x.astype(jnp.bfloat16).transpose(1, 2, 0, 3)   # [X, Y, B, ZCin]
    mt = mask.astype(jnp.bfloat16).transpose(1, 2, 0, 3)  # [X, Y, B, Z]
    cnt = jnp.maximum(
        jnp.sum(mask.astype(jnp.float32), axis=(1, 2, 3)), 1.0
    )[:, None]                                                   # [B, 1]
    e = jnp.repeat(jnp.eye(z, dtype=jnp.float32), c, axis=1)     # [Z, ZCout]
    fold = jnp.tile(jnp.eye(c, dtype=jnp.float32), (z, 1))       # [ZCout, C]
    w1f = w1.astype(jnp.bfloat16).reshape(9, zci, zco)
    w2f = w2.astype(jnp.bfloat16).reshape(9, zco, zco)

    if tb is None:
        tb = _pick_tb(b, xdim, ydim, max(zci, zco))
    else:
        assert b % tb == 0 and (tb % 8 == 0 or tb == b), (tb, b)

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_block_kernel, xdim=xdim, ydim=ydim, tb=tb,
                               zci=zci, zco=zco, c=c, k_eca=k_eca,
                               has_ds=has_ds)
    blk = lambda ch: pl.BlockSpec((xdim, ydim, tb, ch),
                                  lambda i: (0, 0, i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        grid=(b // tb,),
        out_shape=jax.ShapeDtypeStruct((xdim, ydim, b, zco), jnp.bfloat16),
        in_specs=[
            blk(zci),                                         # x
            blk(z),                                           # mask
            full(), full(), full(), full(), full(),           # w1 w2 a1 a2 we
            full(), full(),                                   # e fold
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # cnt
            full(), full(),                                   # wd ad
        ],
        out_specs=blk(zco),
        scratch_shapes=[
            pltpu.VMEM((xdim + 2, ydim + 2, tb, zci), jnp.bfloat16),
            pltpu.VMEM((xdim + 2, ydim + 2, tb, zco), jnp.bfloat16),
        ],
    )(x_sm, mt, w1f, w2f, a1, a2, w_eca.astype(jnp.float32), e, fold, cnt,
      wdf, ad)
    return out.transpose(2, 0, 1, 3)
