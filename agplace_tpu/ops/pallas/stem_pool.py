"""Pallas TPU kernel: fused BN-affine + relu + 3x3/2 maxpool (stem tail).

The ResNet stem (reference ``torchvision resnet.forward`` via
``network_mm/image_fe.py:14-26``; in-repo ``models/resnet.py:123-127``)
ends with ``maxpool3x3/2(relu(bn(conv7x7/2(x))))``.  Measured on v5e at
the bench shape ([32,128,128,64] bf16 conv output), XLA runs the affine+
relu epilogue and the maxpool as separate full passes over the 64 MB
activation: conv 0.38 ms -> +epilogue 0.74 ms -> +pool 0.94 ms, i.e.
~0.55 ms of pure HBM traffic after the conv (BASELINE.md r4 stem table).
This kernel fuses the three elementwise/window ops into ONE pass that
reads the conv output once and writes only the pooled [B,H/2,W/2,C]
quarter-size result.

Layout: operands are presented in the SPATIAL-MAJOR logical view
[H,W,B,C] whose default layout is the {3,0,2,1} physical layout the
producing conv already emits — the boundary transposes are bitcasts
(the ops/pallas/bev_block_sm.py finding).

Maxpool decomposition (no strided slices, Mosaic-friendly): zero-pad the
relu'd activation by 1 (valid: post-relu values are >= 0 and every 3x3
window contains a real element, so zero behaves as -inf), then per output
row i take max(pad[2i], pad[2i+1], pad[2i+2]) via an even/odd phase
reshape of the UNTILED leading dims — pad[0:H].reshape(H/2, 2, ...)
gives phases 2i / 2i+1, and pad[2:H+2] re-phased gives 2i+2.  Separable:
rows first, then the same on columns.

Semantics identical to the XLA path (parity-tested on CPU interpret and
against hardware in tests/test_pallas_stem_pool.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, a_ref, out_ref, pad_ref, *, h: int, w: int, tb: int,
            c: int):
    bf16 = jnp.bfloat16
    s = a_ref[0].astype(bf16)
    b = a_ref[1].astype(bf16)
    pad_ref[:] = jnp.zeros_like(pad_ref)
    pad_ref[1 : h + 1, 1 : w + 1] = jnp.maximum(
        x_ref[:] * s[None, None, None, :] + b[None, None, None, :], 0)

    # rows: [H+2, W+2, TB, C] -> [H/2, W+2, TB, C]
    a = pad_ref[0:h].reshape(h // 2, 2, w + 2, tb, c)
    hi = pad_ref[2 : h + 2].reshape(h // 2, 2, w + 2, tb, c)
    r = jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), hi[:, 0])
    # cols: [H/2, W+2, TB, C] -> [H/2, W/2, TB, C]
    ca = r[:, 0:w].reshape(h // 2, w // 2, 2, tb, c)
    chi = r[:, 2 : w + 2].reshape(h // 2, w // 2, 2, tb, c)
    out_ref[:] = jnp.maximum(jnp.maximum(ca[:, :, 0], ca[:, :, 1]),
                             chi[:, :, 0])


def fused_affine_relu_maxpool(x, scale, bias):
    """x [B,H,W,C] bf16 (a conv output), scale/bias [C] f32 (BN eval
    affine): returns maxpool3x3/2,pad1(relu(x*scale+bias)) as
    [B,H/2,W/2,C] bf16.  H and W must be even (every resnet stem shape
    is).  The batch-major boundary transposes are bitcasts against the
    conv-native {3,0,2,1} layout."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    a = jnp.stack([scale, bias]).astype(jnp.float32)
    x_sm = x.astype(jnp.bfloat16).transpose(1, 2, 0, 3)  # [H, W, B, C]

    # batch tile: multiples of 8 sublanes (or the whole batch); keep
    # block + padded scratch + output under ~100 MB of the 128 MB VMEM
    cands = sorted({d for d in range(1, b + 1)
                    if b % d == 0 and (d % 8 == 0 or d == b)},
                   reverse=True)
    tb = cands[-1]
    for cand in cands:
        if (2 * h * w + (h + 2) * (w + 2) + h * w // 4) * cand * c * 2 \
                <= 100 * 1024 * 1024:
            tb = cand
            break

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel, h=h, w=w, tb=tb, c=c)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        grid=(b // tb,),
        out_shape=jax.ShapeDtypeStruct((h // 2, w // 2, b, c),
                                       jnp.bfloat16),
        in_specs=[
            pl.BlockSpec((h, w, tb, c), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h // 2, w // 2, tb, c),
                               lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, tb, c), jnp.bfloat16),
        ],
    )(x_sm, a)
    return out.transpose(2, 0, 1, 3)
