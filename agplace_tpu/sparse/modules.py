"""Sparse conv/norm/attention layers over ``SparseVoxels``.

TPU-native equivalents of the MinkowskiEngine layers the reference voxel
branch uses (``models/minkfpn.py``, ``layers/eca_block.py``,
``layers/pooling.py``): generalized sparse convolution as
gather -> GEMM -> accumulate over a precomputed neighbour table (SURVEY.md
§2.4 plan), masked batch norm, ECA channel attention, GeM pooling.

All shapes are static; all geometry runs on device (see ``voxels.py``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from agplace_tpu.sparse.voxels import (
    SparseVoxels,
    build_neighbor_table,
    build_point_grid,
    downsample_coords,
    grid_lookup,
    kernel_offsets,
    lookup,
    masked_global_avg,
    pack_coords,
    sort_by_key,
)


def gather_neighbors(feats: jax.Array, table: jax.Array, k: int) -> jax.Array:
    """feats [B, N, C], table [B, No, K] -> neighbour features [B, No, C]
    for offset k, zeroed where the neighbour is absent."""
    idx = table[:, :, k]
    safe = jnp.maximum(idx, 0)
    g = jnp.take_along_axis(feats, safe[..., None], axis=1)
    return jnp.where((idx >= 0)[..., None], g, 0.0)


_GATHER_BUDGET_ELEMS = 256 * 1024 * 1024  # cap the [B,No,Kc,Cin] im2col buf


def sparse_conv_apply(feats: jax.Array, table: jax.Array,
                      kernel: jax.Array,
                      compute_dtype=jnp.bfloat16) -> jax.Array:
    """Gather-GEMM-accumulate sparse convolution.

    feats [B, N, Cin], table [B, No, K], kernel [K, Cin, Cout]
    -> [B, No, Cout] in feats.dtype.

    Offsets are processed in chunks: each chunk is ONE flattened gather over
    all its offsets followed by ONE einsum — a small XLA graph (fast compile)
    and a big MXU contraction — with the chunk size picked so the gathered
    im2col buffer stays under a fixed memory budget.  Compute runs in
    ``compute_dtype`` (bf16: native MXU rate and half the gather traffic)
    with fp32 accumulation; pass float32 for oracle-exact results.
    """
    K, cin, cout = kernel.shape
    b, no, _ = table.shape
    in_dtype = feats.dtype
    feats = feats.astype(compute_dtype)
    kernel = kernel.astype(compute_dtype)
    per_offset = b * no * cin
    chunk = max(1, min(K, _GATHER_BUDGET_ELEMS // max(per_offset, 1)))
    out = jnp.zeros((b, no, cout), dtype=jnp.float32)
    for s in range(0, K, chunk):
        kc = min(chunk, K - s)
        idx = table[:, :, s : s + kc]  # [B, No, kc]
        safe = jnp.maximum(idx, 0).reshape(b, no * kc)
        g = jnp.take_along_axis(feats, safe[..., None], axis=1)
        g = g.reshape(b, no, kc, cin)
        g = jnp.where((idx >= 0)[..., None], g,
                      jnp.zeros((), compute_dtype))
        out = out + jnp.einsum(
            "bnkc,kco->bno", g, kernel[s : s + kc],
            preferred_element_type=jnp.float32)
    return out.astype(in_dtype)


class SparseConv(nn.Module):
    """ME.MinkowskiConvolution equivalent.

    stride 1: output coords == input coords (assumed key-sorted).
    stride 2: output coords = unique floor-aligned coarser coords (sorted by
    construction via jnp.unique), capacity preserved.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16  # MXU-native; float32 for oracle tests

    @nn.compact
    def __call__(self, sv: SparseVoxels, sorted_keys: jax.Array,
                 table: Optional[jax.Array] = None):
        cin = sv.channels
        if self.kernel_size == 1 and self.stride == 1:
            kern = self.param(
                "kernel", nn.initializers.kaiming_normal(), (cin, self.features)
            )
            out = jnp.einsum("bnc,co->bno", sv.feats, kern,
                             preferred_element_type=jnp.float32)
            if self.use_bias:
                out = out + self.param("bias", nn.initializers.zeros,
                                       (self.features,))
            out = jnp.where(sv.mask[..., None], out, 0.0)
            return (
                SparseVoxels(coords=sv.coords, feats=out, mask=sv.mask,
                             stride=sv.stride),
                sorted_keys,
            )

        offsets = kernel_offsets(self.kernel_size, sv.stride)
        K = offsets.shape[0]
        kern = self.param(
            "kernel",
            lambda key, shape: nn.initializers.kaiming_normal()(
                key, (K * cin, self.features)).reshape(shape),
            (K, cin, self.features),
        )
        if self.stride == 1:
            out_coords, out_mask = sv.coords, sv.mask
            out_stride = sv.stride
        else:
            out_coords, out_mask = downsample_coords(sv, self.stride)
            out_stride = sv.stride * self.stride
        if table is None:
            table = build_neighbor_table(sv, sorted_keys, out_coords,
                                         out_mask, offsets)
        out = sparse_conv_apply(sv.feats, table, kern,
                                compute_dtype=self.compute_dtype)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        out = jnp.where(out_mask[..., None], out, 0.0)
        out_sv = SparseVoxels(coords=out_coords, feats=out, mask=out_mask,
                              stride=out_stride)
        if self.stride == 1:
            return out_sv, sorted_keys
        return out_sv, pack_coords(out_coords, out_mask)


class SparseConvTranspose(nn.Module):
    """ME.MinkowskiConvolutionTranspose (kernel 2, stride 2) for the FPN
    top-down pass (``models/minkfpn.py:62-63``): upsample coarse features onto
    a given finer coordinate set.  Each fine coord has exactly one coarse
    parent; the kernel tap is selected by the fine coord's offset within the
    parent cell."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coarse: SparseVoxels, coarse_keys: jax.Array,
                 fine_coords: jax.Array, fine_mask: jax.Array,
                 fine_stride: int):
        cin = coarse.channels
        K = 8  # 2x2x2 kernel
        kern = self.param(
            "kernel",
            lambda key, shape: nn.initializers.kaiming_normal()(
                key, (K * cin, self.features)).reshape(shape),
            (K, cin, self.features),
        )
        step = coarse.stride
        parent = (fine_coords // step) * step  # [B, Nf, 3]
        grid = build_point_grid(coarse.coords, coarse.mask)
        idx = grid_lookup(grid, parent, fine_mask)  # [B, Nf]
        safe = jnp.maximum(idx, 0)
        g = jnp.take_along_axis(coarse.feats, safe[..., None], axis=1)
        g = jnp.where((idx >= 0)[..., None], g, 0.0)  # [B, Nf, Cin]
        off = (fine_coords - parent) // fine_stride  # each in {0, 1}
        tap = off[..., 0] * 4 + off[..., 1] * 2 + off[..., 2]  # [B, Nf]
        out = jnp.zeros((*tap.shape, self.features), dtype=jnp.float32)
        for k in range(K):
            sel = (tap == k)[..., None]
            out = out + jnp.where(
                sel,
                jnp.einsum("bnc,co->bno", g, kern[k],
                           preferred_element_type=jnp.float32),
                0.0,
            )
        out = jnp.where(fine_mask[..., None], out, 0.0)
        return SparseVoxels(coords=fine_coords, feats=out.astype(g.dtype),
                            mask=fine_mask, stride=fine_stride)


class MaskedBatchNorm(nn.Module):
    """ME.MinkowskiBatchNorm equivalent: BN over all *valid* points in the
    batch.  Under pjit data parallelism the stats are global automatically;
    ``axis_name`` adds an explicit pmean for shard_map/pmap execution
    (replacing the vendored SyncBN, ``model/sync_batchnorm/``)."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array):
        c = feats.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.sum(m)
            f32 = feats.astype(jnp.float32)
            s = jnp.sum(f32 * m, axis=(0, 1))
            sq = jnp.sum(jnp.square(f32) * m, axis=(0, 1))
            if self.axis_name is not None:
                # psum raw (count, sum, sumsq): shards hold different
                # numbers of valid points, so averaging per-shard stats
                # would weight them equally and (for variance) subtract
                # around per-shard means — both wrong (torch SyncBN
                # reduces the raw moments likewise)
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(sq / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (feats - mean) * inv * scale + bias
        return jnp.where(mask[..., None], out, 0.0)


class ECALayer(nn.Module):
    """Efficient Channel Attention (``layers/eca_block.py:13-42``): masked
    global avg pool -> 1D conv over the channel axis -> sigmoid -> broadcast
    multiply.  Kernel size derived from channel count exactly as the
    reference: t = |log2(C)+1|/2, k = t odd-ified."""

    channels: int
    gamma: float = 2.0
    b: float = 1.0

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> SparseVoxels:
        t = int(abs((math.log2(self.channels) + self.b) / self.gamma))
        k_size = t if t % 2 else t + 1
        y = masked_global_avg(sv)  # [B, C]
        # conv1d over channels, circular? reference uses zero padding
        w = self.param("conv_w", nn.initializers.lecun_normal(),
                       (k_size, 1, 1))
        y = y[..., None]  # [B, C, 1]
        y = jax.lax.conv_general_dilated(
            y, w, window_strides=(1,),
            padding=[((k_size - 1) // 2, (k_size - 1) // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[..., 0]  # [B, C]
        y = jax.nn.sigmoid(y)
        feats = sv.feats * y[:, None, :]
        feats = jnp.where(sv.mask[..., None], feats, 0.0)
        return SparseVoxels(coords=sv.coords, feats=feats, mask=sv.mask,
                            stride=sv.stride)


def build_k3_table(sv: SparseVoxels, sorted_keys: jax.Array) -> jax.Array:
    """Kernel-3 neighbour table on a tensor's own coordinate set — built once
    per resolution level and shared by every stride-1 k=3 conv on it (the
    blocks' conv1/conv2/... all see identical geometry)."""
    return build_neighbor_table(sv, sorted_keys, sv.coords, sv.mask,
                                kernel_offsets(3, sv.stride))


class ECABasicBlock(nn.Module):
    """ME BasicBlock + ECA after conv2 (``layers/eca_block.py:45-79``)."""

    planes: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, sorted_keys: jax.Array,
                 table: Optional[jax.Array] = None):
        def bn(name):
            return MaskedBatchNorm(use_running_average=not self.train,
                                   axis_name=self.axis_name, name=name)

        if table is None:
            table = build_k3_table(sv, sorted_keys)
        residual = sv
        out, _ = SparseConv(self.planes, kernel_size=3, name="conv1")(
            sv, sorted_keys, table=table)
        out = out.replace(feats=bn("norm1")(out.feats, out.mask))
        out = out.replace(feats=nn.relu(out.feats))
        out, _ = SparseConv(self.planes, kernel_size=3, name="conv2")(
            out, sorted_keys, table=table)
        out = out.replace(feats=bn("norm2")(out.feats, out.mask))
        out = ECALayer(self.planes, name="eca")(out)
        if residual.channels != self.planes:
            residual, _ = SparseConv(self.planes, kernel_size=1,
                                     name="downsample_conv")(
                residual, sorted_keys)
            residual = residual.replace(
                feats=bn("downsample_bn")(residual.feats, residual.mask))
        feats = nn.relu(out.feats + residual.feats)
        feats = jnp.where(sv.mask[..., None], feats, 0.0)
        return sv.replace(feats=feats), sorted_keys


class SparseBasicBlock(nn.Module):
    """Plain ME BasicBlock (no ECA) — MinkFPN's default block option."""

    planes: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, sorted_keys: jax.Array,
                 table: Optional[jax.Array] = None):
        def bn(name):
            return MaskedBatchNorm(use_running_average=not self.train,
                                   axis_name=self.axis_name, name=name)

        if table is None:
            table = build_k3_table(sv, sorted_keys)
        residual = sv
        out, _ = SparseConv(self.planes, kernel_size=3, name="conv1")(
            sv, sorted_keys, table=table)
        out = out.replace(feats=nn.relu(bn("norm1")(out.feats, out.mask)))
        out, _ = SparseConv(self.planes, kernel_size=3, name="conv2")(
            out, sorted_keys, table=table)
        out = out.replace(feats=bn("norm2")(out.feats, out.mask))
        if residual.channels != self.planes:
            residual, _ = SparseConv(self.planes, kernel_size=1,
                                     name="downsample_conv")(
                residual, sorted_keys)
            residual = residual.replace(
                feats=bn("downsample_bn")(residual.feats, residual.mask))
        feats = nn.relu(out.feats + residual.feats)
        feats = jnp.where(sv.mask[..., None], feats, 0.0)
        return sv.replace(feats=feats), sorted_keys


class MinkGeM(nn.Module):
    """GeM over valid points (``layers/pooling.py:70-87``): clamp(eps)^p ->
    masked avg pool -> ^(1/p)."""

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> jax.Array:
        p = self.param("p", lambda k: jnp.ones((1,)) * self.p_init)
        clamped = jnp.clip(sv.feats, min=self.eps) ** p
        pooled = masked_global_avg(sv.replace(feats=clamped))
        return pooled ** (1.0 / p)


class SparseASPP(nn.Module):
    """ASPP block on the padded-sparse backend (``models_minkloc/
    minkfpn.py:14-37``, DEAD in the reference — intended behaviour, same
    semantics as ``dense_grid.GridASPP`` / ``bev_grid.BEVASPP``): three
    parallel odd convs (k=3/5/7), each BN+ReLU, summed."""

    planes: int
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, sorted_keys: jax.Array,
                 table: Optional[jax.Array] = None):
        feats = None
        for i, k in enumerate((3, 5, 7)):
            o, _ = SparseConv(self.planes, kernel_size=k,
                              name=f"conv{i + 1}")(
                sv, sorted_keys, table=table if k == 3 else None)
            f = MaskedBatchNorm(use_running_average=not self.train,
                                axis_name=self.axis_name,
                                name=f"bn{i + 1}")(o.feats, o.mask)
            r = nn.relu(f)
            feats = r if feats is None else feats + r
        feats = jnp.where(sv.mask[..., None], feats, 0.0)
        return sv.replace(feats=feats), sorted_keys


class SparseConvNextBlock(nn.Module):
    """Sparse-ConvNeXt block on the padded-sparse backend
    (``models_minkloc/minkfpn.py:41-60``, DEAD in the reference): conv k ->
    BN -> 1x1 expand 4x -> ReLU -> 1x1 project -> + identity (1x1
    downsample when channels change)."""

    planes: int
    kernel_size: int = 3
    train: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sv: SparseVoxels, sorted_keys: jax.Array,
                 table: Optional[jax.Array] = None):
        residual = sv
        out, _ = SparseConv(self.planes, kernel_size=self.kernel_size,
                            name="conv1")(sv, sorted_keys, table=table)
        out = out.replace(feats=MaskedBatchNorm(
            use_running_average=not self.train, axis_name=self.axis_name,
            name="bn")(out.feats, out.mask))
        out, _ = SparseConv(4 * self.planes, kernel_size=1,
                            name="conv2")(out, sorted_keys)
        out = out.replace(feats=nn.relu(out.feats))
        out, _ = SparseConv(self.planes, kernel_size=1,
                            name="conv3")(out, sorted_keys)
        if residual.channels != self.planes:
            residual, _ = SparseConv(self.planes, kernel_size=1,
                                     name="downsample_conv")(
                residual, sorted_keys)
        feats = out.feats + residual.feats
        feats = jnp.where(sv.mask[..., None], feats, 0.0)
        return sv.replace(feats=feats), sorted_keys
