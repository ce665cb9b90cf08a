"""Pallas TPU kernel: fused BN-affine + relu + 3x3/2 maxpool (stem tail).

**Ships OFF by default** (``config.py stem_pallas``): the full-forward
A/B on v5e (``scripts/ab_stem.py``, BASELINE.md r5 stem table) measures
the kernel a net LOSS in context — MM -3.2% at b32, -12% at b128, DB
tower -9.5% — the same standalone-win/in-context-serialisation failure
mode as ``bev_pallas_head`` (the kernel's single grid serialises against
the voxel-branch HBM traffic XLA otherwise overlaps with the stem's
epilogue passes).  Kept as an opt-in because the fusion IS the right
shape for image-only configs on less-overlapped programs; correctness is
pinned by tests/test_pallas_stem_pool.py (CPU interpret, bitwise vs a
single-round reference) and scripts/hw_parity_stem_pool.py (on-chip
float64 oracle).

The ResNet stem (reference ``torchvision resnet.forward`` via
``network_mm/image_fe.py:14-26``; in-repo ``models/resnet.py:128-145``)
ends with ``maxpool3x3/2(relu(bn(conv7x7/2(x))))``.  XLA runs the
affine+relu epilogue and the maxpool as separate full passes over the
conv1 output; this kernel fuses the three elementwise/window ops into
ONE pass that reads the conv output once and writes only the pooled
[B,H/2,W/2,C] quarter-size result.

Layout (the ops/pallas/bev_block_sm.py finding): operands are presented
in the SPATIAL-MAJOR logical view [H,W,B,C] whose default layout is the
{3,0,2,1} physical layout the producing conv already emits — the
boundary transposes are bitcasts.  Two refinements over a naive
spatial-major block:

* **Batch-pair channel fold.**  C=64 would waste half of every 128-lane
  vector register and double the VMEM footprint via lane padding.  Since
  B is the second-minor memory dim, ``reshape(H, W, B//k, k*C)`` is a
  contiguous (free) regroup; k is chosen so k*C == 128 when possible,
  and the BN scale/bias are ``jnp.tile``-d to match.  The folded batch
  dim sits in sublanes (16 = one exact bf16 tile).
* **H-gridding with a 1-row top halo.**  A full 128x128 spatial block is
  64 MB — far over VMEM.  The pool window for output row r covers input
  rows 2r-1..2r+1, so a block of hb input rows needs exactly ONE extra
  row (the last row of the previous block); it is passed as a second
  1-row operand whose index map points at ``i*hb - 1`` (masked to the
  zero pad row at i == 0).  No bottom halo is needed: the last output
  row's window ends at input row H-1.

Maxpool decomposition (no strided slices, Mosaic-friendly): zero-pad by
one row/column at the TOP/LEFT only (valid: post-relu values are >= 0,
so the zero pad behaves as the true ``-inf`` pad), then take the three
window taps via even/odd phase reshapes of the UNTILED leading dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, halo_ref, a_ref, out_ref, pad_ref, *, hb: int, w: int,
            tb: int, c: int):
    bf16 = jnp.bfloat16
    # scale/bias round to bf16 (the module's XLA fallback applies the
    # effective affine in the activation dtype) but the multiply-add runs
    # in f32 with ONE final round — the fma XLA:TPU emits for the same
    # bf16 epilogue (hw-measured 4x tighter vs the float64 oracle than a
    # bf16*bf16+bf16 double-round; see tests/test_pallas_stem_pool.py).
    s = a_ref[0].astype(bf16).astype(jnp.float32)
    b = a_ref[1].astype(bf16).astype(jnp.float32)

    def aff(v):
        return jnp.maximum(
            v.astype(jnp.float32) * s[None, None, None, :]
            + b[None, None, None, :], 0).astype(bf16)

    # pad_ref [hb+1, W+1, TB, C]: row 0 = previous block's last input row
    # (the top halo; the global zero pad at block 0), col 0 = left zero pad.
    pad_ref[:, 0] = jnp.zeros_like(pad_ref[:, 0])

    @pl.when(pl.program_id(0) == 0)
    def _zero_halo():
        pad_ref[0] = jnp.zeros_like(pad_ref[0])

    @pl.when(pl.program_id(0) != 0)
    def _fill_halo():
        pad_ref[0, 1 : w + 1] = aff(halo_ref[:])[0]

    pad_ref[1 : hb + 1, 1 : w + 1] = aff(x_ref[:])

    ho, wo = hb // 2, w // 2
    # rows: output row r reads padded rows 2r, 2r+1, 2r+2
    a = pad_ref[0:hb].reshape(ho, 2, w + 1, tb, c)
    hi = pad_ref[1 : hb + 1].reshape(ho, 2, w + 1, tb, c)
    r = jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), hi[:, 1])
    # cols: output col c reads padded cols 2c, 2c+1, 2c+2
    ca = r[:, 0:w].reshape(ho, wo, 2, tb, c)
    chi = r[:, 1 : w + 1].reshape(ho, wo, 2, tb, c)
    out_ref[:] = jnp.maximum(jnp.maximum(ca[:, :, 0], ca[:, :, 1]),
                             chi[:, :, 1])


def _tile_candidates(n: int, mult: int):
    """Divisors of n that are multiples of ``mult`` (or n itself),
    largest first."""
    return sorted({d for d in range(1, n + 1)
                   if n % d == 0 and (d % mult == 0 or d == n)},
                  reverse=True)


def fused_affine_relu_maxpool(x, scale, bias):
    """x [B,H,W,C] bf16 (a conv output), scale/bias [C] f32 (BN eval
    affine): returns maxpool3x3/2,pad1(relu(x*scale+bias)) as
    [B,H/2,W/2,C] bf16.  H and W must be even (every resnet stem shape
    is).  The spatial-major boundary transposes are bitcasts against the
    conv-native {3,0,2,1} layout."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)

    # fold batch pairs into channels up to a full 128-lane register
    k = 1
    if c < 128 and 128 % c == 0:
        k = min(128 // c, b)
        while b % k:
            k -= 1
    b2, c2 = b // k, c * k
    a = jnp.stack([jnp.tile(scale, k), jnp.tile(bias, k)]).astype(
        jnp.float32)

    x_sm = x.astype(jnp.bfloat16).transpose(1, 2, 0, 3)  # [H, W, B, C]
    x_sm = x_sm.reshape(h, w, b2, c2)

    # sublane tile: one exact 16-row bf16 tile when the folded batch allows
    tb = next(iter(_tile_candidates(b2, 16)[-1:]))
    for cand in _tile_candidates(b2, 16):
        if cand <= 16:
            tb = cand
            break

    # H block: even divisor of H keeping in+scratch+out under ~64 MB VMEM
    hb = h
    for cand in sorted(d for d in range(2, h + 1) if h % d == 0 and
                       d % 2 == 0):
        byts = ((2 * cand + (cand + 1)) * (w + 1) + cand * w // 2) \
            * tb * c2 * 2
        if byts <= 64 * 1024 * 1024:
            hb = cand
    grid = (h // hb, b2 // tb)

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel, hb=hb, w=w, tb=tb, c=c2)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, b2, c2),
                                       jnp.bfloat16),
        in_specs=[
            pl.BlockSpec((hb, w, tb, c2), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            # top halo: the last input row of the previous block (dummy
            # row 0 at i == 0, masked to zeros in-kernel)
            pl.BlockSpec((1, w, tb, c2),
                         lambda i, j: (jnp.maximum(i * hb - 1, 0), 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb // 2, w // 2, tb, c2),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hb + 1, w + 1, tb, c2), jnp.bfloat16),
        ],
    )(x_sm, x_sm, a)
    return out.reshape(h // 2, w // 2, b, c).transpose(2, 0, 1, 3)
