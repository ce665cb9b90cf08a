"""Padded sparse-voxel tensors — the TPU-native MinkowskiEngine replacement.

The reference's voxel branch runs on ME ``SparseTensor``s with variable point
counts and CUDA hash-map kernel maps (``network_mm/mm.py:87``,
``models/minkfpn.py``).  XLA needs static shapes, so here a batch of sparse
voxel sets is:

    coords: int32 [B, N, 3]   (quantised grid coords; padding rows = sentinel)
    feats:  f32   [B, N, C]
    mask:   bool  [B, N]      (True = real point)
    stride: int (static)      (tensor stride, like ME's tensor_stride)

All geometry ops (dedup, downsampling, neighbour lookup) run on device via
pack-to-int32 keys + sort + ``searchsorted`` — no host round-trips inside the
jitted step.  Capacity ``N`` is a static knob (``DataConfig.vox_max_points``).

Coordinate range: |coord| < 512 after quantisation (KITTI/nuScenes clouds at
quant_size=2 span ~±110 voxels), packed into one int32 as three 10-bit fields.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

COORD_BOUND = 512  # per-axis coordinate bound after quantisation
_SHIFT = 10  # bits per axis
INVALID_KEY = jnp.int32(2 ** 30 - 1)  # sorts after every valid key


@flax.struct.dataclass
class SparseVoxels:
    coords: jax.Array  # [B, N, 3] int32
    feats: jax.Array  # [B, N, C]
    mask: jax.Array  # [B, N] bool
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def capacity(self) -> int:
        return self.coords.shape[1]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]


def pack_coords(coords: jax.Array, mask: jax.Array) -> jax.Array:
    """[..., 3] int32 -> packed int32 key; masked-out rows -> INVALID_KEY.

    Keys preserve lexicographic coordinate order, so a sorted key array
    supports exact membership queries via searchsorted.
    """
    shifted = coords + COORD_BOUND  # [0, 2*BOUND)
    key = (
        (shifted[..., 0] << (2 * _SHIFT))
        | (shifted[..., 1] << _SHIFT)
        | shifted[..., 2]
    )
    return jnp.where(mask, key, INVALID_KEY)


def unpack_coords(keys: jax.Array) -> jax.Array:
    x = (keys >> (2 * _SHIFT)) & (2 ** _SHIFT - 1)
    y = (keys >> _SHIFT) & (2 ** _SHIFT - 1)
    z = keys & (2 ** _SHIFT - 1)
    return jnp.stack([x, y, z], axis=-1) - COORD_BOUND


def quantize(points: jax.Array, quant_size: float, capacity: int,
             mask: jax.Array | None = None) -> SparseVoxels:
    """ME.sparse_quantize equivalent (``datasets_ws_nuscenes.py:567-572``):
    floor-divide metric points by quant_size, deduplicate, pad to capacity.

    points: [B, P, 3] float.  Returns SparseVoxels with all-ones features
    (the reference uses constant-1 features, ``kitti360 collate:127``).
    Fully jittable; also usable on host with numpy inputs.
    """
    b, p, _ = points.shape
    coords = jnp.floor(points / quant_size).astype(jnp.int32)
    # clamp into the occupancy grid's extent so every voxel participates in
    # kernel maps (GRID_RADIUS=64 covers ±128 m at the default quant_size=2)
    coords = jnp.clip(coords, -GRID_RADIUS + 1, GRID_RADIUS - 1)
    if mask is None:
        mask = jnp.ones((b, p), dtype=bool)
    keys = pack_coords(coords, mask)

    def dedup_one(k):
        uniq = jnp.unique(k, size=capacity, fill_value=INVALID_KEY)
        m = uniq != INVALID_KEY
        return uniq, m

    uniq_keys, out_mask = jax.vmap(dedup_one)(keys)
    out_coords = jnp.where(out_mask[..., None], unpack_coords(uniq_keys), 0)
    feats = out_mask[..., None].astype(jnp.float32)
    return SparseVoxels(coords=out_coords, feats=feats, mask=out_mask,
                        stride=1)


def kernel_offsets(kernel_size: int, stride_units: int) -> np.ndarray:
    """ME-style kernel offset list for a cubic kernel, in coordinate units of
    the *input* tensor stride.

    odd k  -> centred offsets {-(k//2), ..., k//2}
    even k -> forward offsets {0, ..., k-1}  (ME convention for k=2 stride-2)
    """
    if kernel_size % 2 == 1:
        r = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = np.arange(0, kernel_size)
    grid = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1)
    return (grid.reshape(-1, 3) * stride_units).astype(np.int32)


def sort_by_key(sv: SparseVoxels) -> Tuple[SparseVoxels, jax.Array]:
    """Sort points by packed key (padding sorts last).  Returns the sorted
    tensor and the sorted keys [B, N] for subsequent searchsorted lookups."""
    keys = pack_coords(sv.coords, sv.mask)
    order = jnp.argsort(keys, axis=-1)
    keys_s = jnp.take_along_axis(keys, order, axis=-1)
    coords_s = jnp.take_along_axis(sv.coords, order[..., None], axis=1)
    feats_s = jnp.take_along_axis(sv.feats, order[..., None], axis=1)
    mask_s = keys_s != INVALID_KEY
    return (
        SparseVoxels(coords=coords_s, feats=feats_s, mask=mask_s,
                     stride=sv.stride),
        keys_s,
    )


def lookup(sorted_keys: jax.Array, query_keys: jax.Array) -> jax.Array:
    """Exact membership lookup via binary search: for each query key, the row
    index into the sorted point list, or -1 if absent.  sorted_keys [B, N],
    query_keys [B, M] -> int32 [B, M].

    NOTE: for the conv neighbour tables the occupancy-grid path
    (``build_point_grid``/``grid_lookup``) is much faster on TPU — search is
    O(log N) *serial* steps of dynamic gathers, the grid is one scatter +
    one gather.  This remains for sparse/irregular key sets.
    """

    def one(sk, qk):
        pos = jnp.searchsorted(sk, qk)
        pos = jnp.clip(pos, 0, sk.shape[0] - 1)
        hit = sk[pos] == qk
        return jnp.where(jnp.logical_and(hit, qk != INVALID_KEY), pos, -1)

    return jax.vmap(one)(sorted_keys, query_keys)


# ---------------------------------------------------------------------------
# occupancy-grid lookup — the fast path for kernel-map construction
# ---------------------------------------------------------------------------

GRID_RADIUS = 64  # static half-extent of the dense occupancy grid, in voxels
# (KITTI/nuScenes clouds at quant_size=2 span ~±55 voxels; quantize() clamps)


def build_point_grid(coords: jax.Array, mask: jax.Array,
                     radius: int = GRID_RADIUS) -> jax.Array:
    """Dense per-sample occupancy grid: grid[b, flat(c)] = row index of the
    point at coordinate c, or -1.  One scatter — O(N), trivial HLO.

    coords [B, N, 3] int32 (|coord| < radius), mask [B, N].
    Returns int32 [B, (2*radius)^3].
    """
    d = 2 * radius
    b, n, _ = coords.shape
    inb = jnp.logical_and(mask, jnp.all(jnp.abs(coords) < radius, axis=-1))
    shifted = jnp.clip(coords + radius, 0, d - 1)
    flat = ((shifted[..., 0] * d + shifted[..., 1]) * d
            + shifted[..., 2])  # [B, N]
    # masked-out rows all collide on one sacrificial slot
    flat = jnp.where(inb, flat, d * d * d)
    rows = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 1), (b, n))

    def scatter_one(f, r):
        g = jnp.full((d * d * d + 1,), -1, jnp.int32)
        return g.at[f].set(r, mode="drop")[:-1]

    return jax.vmap(scatter_one)(flat, rows)


def grid_lookup(grid: jax.Array, query_coords: jax.Array,
                query_valid: jax.Array, radius: int = GRID_RADIUS
                ) -> jax.Array:
    """Row indices of query coordinates in the grid's point set (-1 if
    absent/invalid).  query_coords [B, ..., 3] -> int32 [B, ...]."""
    d = 2 * radius
    inb = jnp.logical_and(
        query_valid, jnp.all(jnp.abs(query_coords) < radius, axis=-1))
    shifted = jnp.clip(query_coords + radius, 0, d - 1)
    flat = ((shifted[..., 0] * d + shifted[..., 1]) * d + shifted[..., 2])
    flat = jnp.where(inb, flat, 0)
    lead = query_coords.shape[1:-1]
    flat2 = flat.reshape(flat.shape[0], -1)
    got = jnp.take_along_axis(grid, flat2, axis=1).reshape(
        (flat.shape[0],) + lead)
    return jnp.where(inb, got, -1)


def build_neighbor_table(
    sv_sorted: SparseVoxels,
    sorted_keys: jax.Array,
    out_coords: jax.Array,
    out_mask: jax.Array,
    offsets: np.ndarray,
) -> jax.Array:
    """Kernel map: for each output point and kernel offset, the input-point
    row index (or -1).  Replaces ME's CUDA coordinate-map/kernel-map
    machinery with one occupancy-grid scatter + one gather — O(N + No*K)
    with no search loop (binary-search lowering measured 20-40x slower on
    TPU; see ``lookup``).  ``sorted_keys`` is unused on this path and kept
    for signature stability.

    Returns int32 [B, N_out, K].
    """
    del sorted_keys
    grid = build_point_grid(sv_sorted.coords, sv_sorted.mask)
    off = jnp.asarray(offsets)  # [K, 3]
    nbr_coords = out_coords[:, :, None, :] + off[None, None]  # [B,No,K,3]
    valid = jnp.broadcast_to(out_mask[:, :, None], nbr_coords.shape[:-1])
    return grid_lookup(grid, nbr_coords, valid)


def me_down_align(cells: int) -> Tuple[int, int, int]:
    """Alignment for a k=2 s=2 downsample of a dense dim with ME floor
    semantics.  Cell index is i = c/stride + cells//2, and ME groups
    coordinates by floor((c/stride)/2) — in index space those groups are
    pairs (2m - lo, 2m + 1 - lo) with lo = (cells//2) % 2, NOT always
    (2m, 2m+1).  A plain stride-2 conv therefore needs ``lo`` zero cells
    of low padding (plus ``hi`` high padding to cover evenly) or the
    deepest levels of the live configs pair the wrong cells (z=2 cells
    hold coords {-s, 0} whose ME parents are distinct).  Returns
    (lo, hi, out_cells); out_cells' own index offset out_cells//2 is
    consistent with the parent coordinates by construction."""
    lo = (cells // 2) % 2
    hi = (cells + lo) % 2
    return lo, hi, (cells + lo + hi) // 2


def downsample_coords(sv: SparseVoxels, factor: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Output coordinate set of a stride-``factor`` conv: unique floor-aligned
    coords at the coarser stride (ME stride-2 semantics).  Returns
    (out_coords [B, N, 3], out_mask [B, N]) at the same capacity."""
    step = sv.stride * factor
    coarse = (sv.coords // step) * step
    keys = pack_coords(coarse, sv.mask)

    def dedup_one(k):
        uniq = jnp.unique(k, size=sv.capacity, fill_value=INVALID_KEY)
        return uniq, uniq != INVALID_KEY

    uniq_keys, out_mask = jax.vmap(dedup_one)(keys)
    out_coords = jnp.where(out_mask[..., None], unpack_coords(uniq_keys), 0)
    return out_coords, out_mask


def masked_global_avg(sv: SparseVoxels) -> jax.Array:
    """ME.MinkowskiGlobalAvgPooling equivalent: per-sample mean over valid
    points -> [B, C]."""
    m = sv.mask[..., None].astype(sv.feats.dtype)
    s = jnp.sum(sv.feats * m, axis=1)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return s / n


def masked_global_max(sv: SparseVoxels) -> jax.Array:
    """ME.MinkowskiGlobalMaxPooling equivalent."""
    neg = jnp.finfo(sv.feats.dtype).min
    f = jnp.where(sv.mask[..., None], sv.feats, neg)
    return jnp.max(f, axis=1)


def batched_from_pointclouds(points: np.ndarray, quant_size: float,
                             capacity: int) -> SparseVoxels:
    """Host-side collate helper: metric point clouds [B, P, 3] (NaN-padded)
    -> quantised SparseVoxels.  Mirrors ``ME.utils.batched_coordinates`` +
    per-item ``sparse_quantize`` in the reference collates
    (``kitti360:120-127``).

    Pure numpy: the input pipeline must never dispatch eager device ops
    (per-op round-trips dominate on remote-attached accelerators).
    """
    pts = np.asarray(points, dtype=np.float32)
    b = pts.shape[0]

    # fast path: first-party C++ voxelizer (threaded over the batch)
    from agplace_tpu.native import voxelize_batch_native

    native = voxelize_batch_native(pts, quant_size, capacity, GRID_RADIUS)
    if native is not None:
        out_coords, out_mask = native
    else:  # pure-numpy fallback
        finite = np.all(np.isfinite(pts), axis=-1)
        coords_all = np.floor(np.nan_to_num(pts) / quant_size).astype(
            np.int32)
        np.clip(coords_all, -GRID_RADIUS + 1, GRID_RADIUS - 1,
                out=coords_all)
        out_coords = np.zeros((b, capacity, 3), np.int32)
        out_mask = np.zeros((b, capacity), bool)
        for i in range(b):
            c = coords_all[i][finite[i]]
            if len(c):
                uniq = np.unique(c, axis=0)
                k = min(len(uniq), capacity)
                out_coords[i, :k] = uniq[:k]
                out_mask[i, :k] = True
    feats = out_mask[..., None].astype(np.float32)
    return SparseVoxels(coords=jnp.asarray(out_coords),
                        feats=jnp.asarray(feats),
                        mask=jnp.asarray(out_mask), stride=1)
