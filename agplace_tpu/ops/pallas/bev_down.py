"""Pallas TPU kernel: fused stage-0 epilogue + masked down0 for the BEV FPN.

Why this exists (r4 on-chip probe, batch 32, [32,128,128,4] grid): the XLA
stage-0 chain ``conv0 -> bn0 -> relu -> mask -> down0 -> down_bn0 -> relu
-> mask`` pays one full extra HBM pass for the ``mask`` between conv0 and
down0 — XLA fuses the BN affine + relu into conv0's output epilogue, but
refuses the z-broadcast mask multiply in every formulation tried (5D-
reshape where/multiply, 4D repeat-expanded mask, relu-with--inf trick,
parity-split down0): the no-mask chain runs 0.85 ms, every masked variant
1.6+ ms.  536 MB of avoidable traffic at the bench shapes.

TPU-native fix, built on three measured facts (r4 probes):

* Splitting conv0 into its four (x, y)-parity stride-2 convolutions is
  FREE: XLA's conv emitter runs the 4-conv split at the same cost as the
  full-resolution conv, and each parity output is exactly one spatial tap
  of the k=2 s=2 down0.
* down0's 2x2 windows are non-overlapping, so — unlike the fused
  conv0+down0 head kernel (ops/pallas/bev_head.py), whose 36 shared f32
  shift planes serialised against the image branch — the fused
  epilogue+down0 needs NO halo shifts at all: it streams the four bare
  parity activations once and writes the half-resolution output.
* XLA:TPU assigns the parity convolutions the layout {3,0,2,1} (batch
  SECOND-minor), and a Pallas custom-call demands default layouts — fed
  naively, XLA inserts four 67 MB relayout copies that eat the entire
  win (measured: 1.55 ms vs 1.06 ms).  The kernel therefore consumes the
  conv outputs LOGICALLY TRANSPOSED to [X/2, Y/2, B, Z*C1], whose default
  layout IS the conv's native physical layout — the transposes compile to
  bitcasts — and the grid tiles the leading spatial dim instead of batch.

Pipeline:  XLA computes the four BARE parity convolutions (pure conv, the
fastest emitter path); the kernel applies conv0's BN eval affine + relu +
z-mask per parity, contracts each parity against its down0 tap (four
K=Z*C1 MXU dots accumulated in SSA f32), then applies down0's BN affine +
relu + output-occupancy mask.  The full-resolution activation is written
and read exactly once, unmasked; every mask materialisation disappears.

Masks never lane-slice and never strided-slice (XLA lowers bool parity
slices to pathological bitpacked gathers — seen in the r4 HLO dump): ONE
parity-folded mask tensor [X/2, Y/2, B, 4*Z] is built by a cheap XLA
transpose of the tiny input mask, and each parity's z-mask expands over
channels inside the kernel via small selection-matrix matmuls
(E [4, 4Z, Z*C1], PE [4Z, Zo*C2]), like the ECA fold in
ops/pallas/bev_block.py.  No scratch buffers — every intermediate is an
SSA value (the Mosaic scratch-WAR hazard class cannot occur; r3 rule).

Semantics: identical to the eval-mode XLA prefix ``BEVConv(conv0) ->
BEVBatchNorm -> relu -> mask -> BEVConv(k=2, s=2) -> BEVBatchNorm -> relu
-> mask`` of ``sparse/bev_grid.BEVMinkFPN`` (reference
``models/minkfpn.py:88-123`` stage 0 under MinkowskiEngine semantics);
parity-tested against the XLA path on CPU interpret
(tests/test_pallas_bev_down.py) and against the XLA path on hardware.
Valid only when the spatial dims need no ME alignment padding
(``me_down_align(dim)[:2] == (0, 0)``, true for the live extents) — the
caller gates on that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _down_kernel(g00, g01, g10, g11, mt_ref, a0_ref, wd_ref, ad_ref,
                 e_ref, pe_ref, out_ref):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    gs = (g00, g01, g10, g11)
    mt = mt_ref[:]  # [TX, Yo, B, 4*Z] parity-folded mask, bf16 0/1

    # down0 output occupancy: any parent occupied, folded over ME z pairs
    m1zc = jax.lax.dot_general(
        mt, pe_ref[:].astype(bf16), (((3,), (0,)), ((), ())),
        preferred_element_type=f32)                    # [TX, Yo, B, Zo*C2]
    m1zc = (m1zc > 0.0).astype(bf16)

    # dtype flow mirrors the XLA path (BEVBatchNorm casts its eval affine
    # to the bf16 feats dtype; convs accumulate f32 and round to bf16)
    s0 = a0_ref[0].astype(bf16)
    b0 = a0_ref[1].astype(bf16)
    acc = None
    for p in range(4):
        # conv0 epilogue: BN eval affine + relu + z-mask (E expansion)
        act = jnp.maximum(
            gs[p][:] * s0[None, None, None, :] + b0[None, None, None, :], 0)
        mzc = jax.lax.dot_general(
            mt, e_ref[p].astype(bf16), (((3,), (0,)), ((), ())),
            preferred_element_type=f32)                # [TX, Yo, B, Z*C1]
        act = act * mzc.astype(bf16)
        # down0: parity p IS spatial tap p — one K=Z*C1 MXU dot
        d = jax.lax.dot_general(
            act, wd_ref[p], (((3,), (0,)), ((), ())),
            preferred_element_type=f32)
        acc = d if acc is None else acc + d

    sd = ad_ref[0].astype(bf16)
    bd = ad_ref[1].astype(bf16)
    out = acc.astype(bf16) * sd[None, None, None, :] + bd[None, None,
                                                          None, :]
    out_ref[:] = jnp.maximum(out, 0) * m1zc


def fused_conv0_down0(feats, mask, w0_folded, scale0, bias0, wd_folded,
                      scale_d, bias_d, *, z: int):
    """Stage-0 conv0..down0 chain with all masking fused into one kernel.

    Same signature and semantics as ``bev_head.fused_head``: feats
    [B,X,Y,Z*C0] bf16 (masked), mask [B,X,Y,Z] bool, w0_folded
    [k0,k0,Z*C0,Z*C1] (``fold_w2_stride1``), scale/bias [Z*C1] f32 (BN0
    eval affine), wd_folded [2,2,Z*C1,Zo*C2] (``fold_w2_k2s2``),
    scale_d/bias_d [Zo*C2] f32.  X and Y must be even with zero ME
    alignment padding (``me_down_align(X)[:2] == (0, 0)``), k0 odd >= 3.
    Returns (feats_out [B,X/2,Y/2,Zo*C2] bf16, mask_out [B,X/2,Y/2,Zo]).
    """
    b, x, y, zc0 = feats.shape
    assert x % 2 == 0 and y % 2 == 0, (x, y)
    k0 = int(w0_folded.shape[0])
    assert k0 % 2 == 1 and k0 >= 3, k0
    from agplace_tpu.sparse.voxels import me_down_align

    zc1 = int(w0_folded.shape[3])
    zc2 = int(wd_folded.shape[3])
    lo_z, hi_z, zo = me_down_align(z)
    c1, c2 = zc1 // z, zc2 // zo
    xo, yo = x // 2, y // 2
    h = k0 // 2

    # conv0 as four BARE parity convolutions (XLA; measured at the same
    # cost as the single full-resolution conv).  Parity (px, py) selects
    # full-res output sites (2i+px, 2j+py): stride 2 with pad lo = h - p,
    # hi = k0 - 2 - h + p.  The transpose to [Xo, Yo, B, Z*C1] is a
    # BITCAST (the conv's native layout) — not a copy.
    w2 = w0_folded.astype(jnp.bfloat16)
    fb = feats.astype(jnp.bfloat16)
    gs = [
        jax.lax.conv_general_dilated(
            fb, w2, window_strides=(2, 2),
            padding=[(h - px, k0 - 2 - h + px), (h - py, k0 - 2 - h + py)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).transpose(1, 2, 0, 3)
        for px in range(2) for py in range(2)
    ]

    # parity-folded mask [Xo, Yo, B, 4*Z]: channel = (2*px + py)*Z + z —
    # one transpose of the tiny mask; NO bool strided slices (they lower
    # to bitpacked gathers)
    mt = (mask.astype(jnp.bfloat16)
          .reshape(b, xo, 2, yo, 2, z)
          .transpose(1, 3, 0, 2, 4, 5)
          .reshape(xo, yo, b, 4 * z))

    a0 = jnp.stack([scale0, bias0]).astype(jnp.float32)        # [2, Z*C1]
    ad = jnp.stack([scale_d, bias_d]).astype(jnp.float32)      # [2, Zo*C2]
    wd = wd_folded.reshape(4, zc1, zc2).astype(jnp.bfloat16)
    # per-parity z-mask expansion [4, 4Z, Z*C1] and the shared output-
    # occupancy fold [4Z, Zo*C2] (ME z pairing via lo_z)
    e = np.zeros((4, 4 * z, zc1), np.float32)
    pe = np.zeros((4 * z, zo * c2), np.float32)
    for p in range(4):
        for zi in range(z):
            e[p, p * z + zi, zi * c1 : (zi + 1) * c1] = 1.0
            zp = (zi + lo_z) // 2
            pe[p * z + zi, zp * c2 : (zp + 1) * c2] = 1.0
    e, pe = jnp.asarray(e), jnp.asarray(pe)

    import flax.linen as nn

    mask_out = nn.max_pool(
        mask[..., None].astype(jnp.float32), (2, 2, 2), strides=(2, 2, 2),
        padding=[(0, 0), (0, 0), (lo_z, hi_z)])[..., 0] > 0

    # spatial tiling: bound the per-step block bytes (~4 parity inputs +
    # output, double-buffered) independent of batch size
    # cap block bytes so blocks + double-buffering + the kernel's f32 SSA
    # intermediates fit VMEM (the f32 act/mask/acc values cost ~1.5x the
    # bf16 input blocks again; 40 MB blocks OOM'd at 128 MB scoped vmem)
    tx = xo
    while tx > 1 and tx * yo * b * (4 * zc1 + zc2) * 2 > 20 * 1024 * 1024:
        tx //= 2
        while tx > 1 and xo % tx:  # keep tx a divisor of xo
            tx -= 1

    interpret = jax.default_backend() != "tpu"
    blk = lambda c: pl.BlockSpec((tx, yo, b, c), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _down_kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        grid=(xo // tx,),
        out_shape=jax.ShapeDtypeStruct((xo, yo, b, zc2), jnp.bfloat16),
        in_specs=[blk(zc1)] * 4 + [blk(4 * z)]
        + [full(), full(), full(), full(), full()],
        out_specs=blk(zc2),
    )(*gs, mt, a0, wd, ad, e, pe)
    return out.transpose(2, 0, 1, 3), mask_out
