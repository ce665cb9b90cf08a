"""Pallas TPU kernel: fused BEV-FPN head (conv0 stage + down0 stage).

The r3 in-jit stage-prefix profile (BASELINE.md) shows the BEV voxel
branch's cost concentrating in its first two stages: ``conv0 -> bn0 ->
relu -> mask`` at the full grid resolution plus the ``down0`` chain cost
1.97 ms of the 3.4 ms branch at bench shapes ([32,128,128,4] occupancy,
z=4) — almost entirely HBM traffic for the [B,128,128,Z*C1] conv0
activation, which XLA materialises twice (conv write + down0 read,
~8 MB/item each way).  This kernel computes

    conv0 (k0 x k0 x k0, 'same') -> BN0 eval affine -> relu -> mask
    -> down0 (2x2x2, stride 2)  -> BN  eval affine -> relu -> mask

without ever materialising the full-resolution activation: HBM traffic is
the tiny input occupancy grid in and the stride-2 output out.

TPU-native formulation (no strided access — Mosaic does not support it):

* The input grid arrives PRE-SPLIT into its four (x, y)-parity planes
  (an XLA strided-slice over the small input, fused upstream).  A
  full-resolution coordinate 2*xo + u decomposes into parity u mod 2 and
  shift (u - u%2)/2 in {-1, 0, 1}: every conv0 tap becomes a +/-1 shifted
  copy of a parity plane, built with ``pltpu.roll`` + iota boundary masks
  so each tap keeps a CANONICAL vector layout.  (Halo-pad scratch reads
  at different y-shifts carry distinct sublane offsets, and Mosaic cannot
  concatenate offset-mismatched vectors — hit on hardware, r3.)  The 36
  (parity, sx, sy) planes are computed once and shared by all four output
  parities.
* conv0 is evaluated directly on output parity (dxp, dyp) as ONE im2col
  matmul: the k0^2 shifted taps concatenate along channels into a
  [Xo, Yo, k0^2*Z*C0] value contracted against the folded weight in a
  single MXU dot (k0=5, z=4, c0=1 -> K=100).  Accumulating k0^2 separate
  K=4 dots instead would be MXU-latency-bound (~2 us/dot measured).
* down0 consumes the four parity activations WITHOUT re-gathering: its
  2x2 spatial taps ARE the parity planes, so it is four K=Z*C1 dots
  (K=256 at bench shapes — the high-throughput MXU regime) accumulated
  in an SSA value.
* Masks never lane-slice: the BN/relu epilogue mask and the down0 output
  occupancy expand from the z-resolution mask planes via small fold-matrix
  matmuls (E0 [Z, Z*C1], PE [Z, Zo*C2]), exactly like the ECA fold in
  ops/pallas/bev_block.py.

Hazard rules (established by on-chip bisection, r3): the kernel uses NO
scratch buffers at all — every intermediate is an SSA value, so the
Mosaic scratch-WAR hazard class cannot occur.

Semantics: identical to the eval-mode XLA prefix ``BEVConv(conv0) ->
BEVBatchNorm -> relu -> mask -> BEVConv(k=2, s=2) -> BEVBatchNorm ->
relu -> mask`` of ``sparse/bev_grid.BEVMinkFPN`` (reference
``models/minkfpn.py:19-123`` stage 0); parity-tested against the XLA path
on CPU interpret (tests/test_pallas_bev_head.py) and against a float64
oracle on hardware (r3: kernel meanrel 2.3e-3 vs the XLA path's 3.6e-3 —
the fused f32 accumulation is TIGHTER than XLA's bf16 round trips).

Measured outcome (r3 full-model A/B on the chip, BASELINE.md): despite
hardware-exact parity, the FULL forward is SLOWER with the fused head
(7.34 ms vs 5.57 ms at batch 32) — the 36 shared f32 shift planes
(~9 MB VMEM at bench shapes) serialise against the image branch that XLA
otherwise overlaps with the voxel stage-0 HBM traffic.  The kernel
therefore ships OFF by default (``MMConfig.bev_pallas_head=False``); it
is kept as a parity-proven building block (the roll-based canonical-
layout im2col and the no-scratch SSA style are the reusable patterns)
and for shapes where the voxel branch dominates end-to-end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted(v, sx: int, sy: int, xo: int, yo: int):
    """v shifted so result[x, y] = v[x+sx, y+sy], zero outside — built
    from pltpu.roll + iota masks so the result keeps a CANONICAL vector
    layout.  (Halo-pad scratch reads at different y-shifts carry distinct
    sublane offsets, and Mosaic cannot concatenate vectors whose offsets
    mismatch on a non-concat dimension — hit on hardware, r3.)

    Operates in f32: Mosaic's rotate lowering only supports 32-bit data
    ("Rotate with non-32-bit data" — hit on hardware, r3); the caller
    casts the concatenated im2col block back to bf16 for the MXU dot."""
    out = v.astype(jnp.float32)
    if sx:
        out = pltpu.roll(out, (-sx) % xo, axis=0)
    if sy:
        out = pltpu.roll(out, (-sy) % yo, axis=1)
    if sx or sy:
        ok = None
        if sx:
            ix = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
            ok = (ix + sx >= 0) & (ix + sx < xo)
        if sy:
            iy = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
            oky = (iy + sy >= 0) & (iy + sy < yo)
            ok = oky if ok is None else ok & oky
        out = jnp.where(ok, out, jnp.zeros_like(out))
    return out


def _head_kernel(x00, x01, x10, x11, m00, m01, m10, m11, w_ref, a0_ref,
                 wd_ref, ad_ref, e0_ref, pe_ref, out_ref, *,
                 xo: int, yo: int, k0: int, z: int, zc1: int, zc2: int):
    f32 = jnp.float32
    half = k0 // 2
    xs = {(0, 0): x00, (0, 1): x01, (1, 0): x10, (1, 1): x11}
    ms = {(0, 0): m00, (0, 1): m01, (1, 0): m10, (1, 1): m11}

    # precompute every (parity, sx, sy) shifted plane ONCE — all four
    # output parities draw their im2col taps from this shared set
    shifts = sorted({(p + a - half - (p + a - half) % 2) // 2
                     for a in range(k0) for p in range(2)})
    planes = {}
    for p, v in xs.items():
        vv = v[0]
        for sx in shifts:
            for sy in shifts:
                planes[(p, sx, sy)] = _shifted(vv, sx, sy, xo, yo)

    # occupancy count per down0 output cell, for the output mask:
    # sum of the four parity mask planes folded over z pairs (PE matmul)
    scnt = (m00[0] + m01[0] + m10[0] + m11[0]).astype(f32)  # [Xo, Yo, Z]
    m1zc = jax.lax.dot_general(
        scnt, pe_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=f32)                          # [Xo, Yo, Zo*C2]
    m1zc = (m1zc > 0.0).astype(f32)

    acc_d = jnp.zeros((xo, yo, zc2), f32)
    for dxp in range(2):
        for dyp in range(2):
            # conv0 on output parity (dxp, dyp): im2col over k0^2 taps
            taps = []
            for a in range(k0):
                ux = dxp + a - half
                sx = (ux - ux % 2) // 2
                for b in range(k0):
                    uy = dyp + b - half
                    sy = (uy - uy % 2) // 2
                    taps.append(planes[((ux % 2, uy % 2), sx, sy)])
            # taps are f32 (see _shifted); one cast on the concat block
            col = jnp.concatenate(taps, axis=-1).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                col, w_ref[:], (((2,), (0,)), ((), ())),
                preferred_element_type=f32)        # [Xo, Yo, Z*C1]
            act = acc * a0_ref[0][None, None, :] + a0_ref[1][None, None, :]
            act = jnp.maximum(act, 0.0)
            # mask: z-resolution parity mask plane expanded over C1 (E0)
            mzc = jax.lax.dot_general(
                ms[(dxp, dyp)][0].astype(f32), e0_ref[:],
                (((2,), (0,)), ((), ())), preferred_element_type=f32)
            act = (act * mzc).astype(jnp.bfloat16)
            # down0: this parity plane is exactly tap (dxp, dyp)
            acc_d = acc_d + jax.lax.dot_general(
                act, wd_ref[2 * dxp + dyp], (((2,), (0,)), ((), ())),
                preferred_element_type=f32)

    out = acc_d * ad_ref[0][None, None, :] + ad_ref[1][None, None, :]
    out = jnp.maximum(out, 0.0) * m1zc
    out_ref[0] = out.astype(jnp.bfloat16)


def fused_head(feats, mask, w0_folded, scale0, bias0, wd_folded, scale_d,
               bias_d, *, z: int):
    """Fused conv0+down0 stage pair on the folded BEV grid.

    feats [B,X,Y,Z*C0] bf16 (masked), mask [B,X,Y,Z] bool, w0_folded
    [k0,k0,Z*C0,Z*C1] (``fold_w2_stride1`` of the conv0 kernel), scale/bias
    [Z*C1] f32 (BN0 eval affine), wd_folded [2,2,Z*C1,Zo*C2] (k2s2 fold of
    the down0 kernel), scale_d/bias_d [Zo*C2] f32.  X and Y must be even.
    Returns (feats_out [B,X/2,Y/2,Zo*C2] bf16, mask_out [B,X/2,Y/2,Zo]).
    """
    b, x, y, zc0 = feats.shape
    assert x % 2 == 0 and y % 2 == 0, (x, y)
    k0 = int(w0_folded.shape[0])
    assert k0 % 2 == 1 and k0 <= 5, k0
    from agplace_tpu.sparse.voxels import me_down_align

    zc1 = int(w0_folded.shape[3])
    zc2 = int(wd_folded.shape[3])
    # ME floor-alignment (me_down_align): z groups are (2m-lo, 2m+1-lo)
    # — the features side is already encoded in wd_folded (fold_w2_k2s2),
    # and the occupancy fold below must pair the same cells
    lo_z, hi_z, zo = me_down_align(z)
    c1, c2 = zc1 // z, zc2 // zo
    xo, yo = x // 2, y // 2

    # XLA-side prep (tiny tensors, fused into the surrounding graph)
    mb = mask.astype(jnp.bfloat16)
    xs = [feats[:, dx::2, dy::2, :] for dx in range(2) for dy in range(2)]
    ms = [mb[:, dx::2, dy::2, :] for dx in range(2) for dy in range(2)]
    w_im2col = w0_folded.reshape(k0 * k0 * zc0, zc1).astype(jnp.bfloat16)
    a0 = jnp.stack([scale0, bias0]).astype(jnp.float32)        # [2, Z*C1]
    ad = jnp.stack([scale_d, bias_d]).astype(jnp.float32)      # [2, Zo*C2]
    wd = wd_folded.reshape(4, zc1, zc2).astype(jnp.bfloat16)
    e0 = jnp.repeat(jnp.eye(z, dtype=jnp.float32), c1, axis=1)  # [Z, Z*C1]
    pe = np.zeros((z, zo * c2), np.float32)                     # [Z, Zo*C2]
    for zi in range(z):
        zp = (zi + lo_z) // 2
        pe[zi, zp * c2 : (zp + 1) * c2] = 1.0
    pe = jnp.asarray(pe)

    # down0 output occupancy for the returned grid (maxpool 2x2x2 with
    # the ME-aligned z pad — identical to BEVConv's k2s2 mask rule)
    import flax.linen as nn

    mask_out = nn.max_pool(
        mask[..., None].astype(jnp.float32), (2, 2, 2), strides=(2, 2, 2),
        padding=[(0, 0), (0, 0), (lo_z, hi_z)])[..., 0] > 0

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_head_kernel, xo=xo, yo=yo, k0=k0, z=z,
                               zc1=zc1, zc2=zc2)
    blk = lambda c: pl.BlockSpec((1, xo, yo, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, xo, yo, zc2), jnp.bfloat16),
        in_specs=[blk(zc0)] * 4 + [blk(z)] * 4
        + [full(), full(), full(), full(), full(), full()],
        out_specs=blk(zc2),
    )(*[v.astype(jnp.bfloat16) for v in xs], *ms, w_im2col, a0, wd, ad,
      e0, pe)
    return out, mask_out
