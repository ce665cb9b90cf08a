"""Sparse FPN voxel backbone — reference ``models/minkfpn.py:19-123``.

Architecture (defaults: planes=(64,128,256), layers=(1,1,1), num_top_down=0,
conv0 k=5, block=ECABasicBlock):

    conv0 (k=5) -> BN -> ReLU
    per stage i: stride-2 conv (k=2, ch-preserving) -> BN -> ReLU
                 -> block stack (changes channels to planes[i])
    final 1x1 conv planes[-1] -> out_channels, replacing out_maps[-1]
    optional top-down: tconv(k=2,s=2) + lateral 1x1, num_top_down levels

Returns (final SparseVoxels, out_maps list) exactly as the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from agplace_tpu.sparse.modules import (
    ECABasicBlock,
    MaskedBatchNorm,
    SparseASPP,
    SparseBasicBlock,
    SparseConv,
    SparseConvNextBlock,
    SparseConvTranspose,
)
from agplace_tpu.sparse.voxels import SparseVoxels, sort_by_key

_BLOCKS = {"eca": ECABasicBlock, "basic": SparseBasicBlock,
           "aspp": SparseASPP, "convnext": SparseConvNextBlock}

# GeneralMinkFPN (reference models/minkfpn.py:131-205) — the plain pyramid
# without lateral/top-down wiring — is MinkFPN with num_top_down=0 (the
# live default); use `MinkFPN(..., num_top_down=0)` and take the first
# return value.


class MinkFPN(nn.Module):
    out_channels: int = 256
    planes: Tuple[int, ...] = (64, 128, 256)
    layers: Tuple[int, ...] = (1, 1, 1)
    num_top_down: int = 0
    conv0_kernel_size: int = 5
    block: str = "eca"
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sv: SparseVoxels):
        assert len(self.layers) == len(self.planes)
        assert 0 <= self.num_top_down <= len(self.layers)
        if self.block not in _BLOCKS:
            raise NotImplementedError(
                f"sparse backend blocks: {sorted(_BLOCKS)}; "
                f"got {self.block!r}")
        block_cls = _BLOCKS[self.block]
        n_stages = len(self.planes)

        def bn(name):
            return MaskedBatchNorm(use_running_average=not self.train,
                                   axis_name=self.axis_name, name=name)

        sv, keys = sort_by_key(sv)

        # conv0: big receptive field on raw voxels
        sv, keys = SparseConv(self.planes[0],
                              kernel_size=self.conv0_kernel_size,
                              name="conv0")(sv, keys)
        sv = sv.replace(feats=nn.relu(bn("bn0")(sv.feats, sv.mask)))

        lateral_feature_maps = []  # (sv, keys) inputs to top-down lateral 1x1s
        if self.num_top_down == n_stages:
            lateral_feature_maps.append((sv, keys))

        out_maps = []  # per-stage block outputs (sv, keys)
        for i in range(n_stages):
            # stride-2 conv keeps channels (minkfpn.py:54), block changes them
            sv, keys = SparseConv(sv.channels, kernel_size=2, stride=2,
                                  name=f"down{i}")(sv, keys)
            sv = sv.replace(feats=nn.relu(bn(f"down_bn{i}")(sv.feats,
                                                            sv.mask)))
            # one k=3 neighbour table per level, shared by all block convs
            from agplace_tpu.sparse.modules import build_k3_table

            level_table = build_k3_table(sv, keys)
            for b in range(self.layers[i]):
                sv, keys = block_cls(self.planes[i], train=self.train,
                                     axis_name=self.axis_name,
                                     name=f"block{i}_{b}")(
                    sv, keys, table=level_table)
            if n_stages - 1 - self.num_top_down <= i < n_stages - 1:
                lateral_feature_maps.append((sv, keys))
            out_maps.append((sv, keys))

        assert len(lateral_feature_maps) == self.num_top_down

        # final lateral 1x1 on the deepest map (minkfpn.py:112-113)
        sv, keys = SparseConv(self.out_channels, kernel_size=1,
                              name="lateral_top")(sv, keys)
        out_maps[-1] = (sv, keys)

        # top-down pass (minkfpn.py:116-119)
        for ndx in range(self.num_top_down):
            fine_sv, fine_keys = lateral_feature_maps[-ndx - 1]
            up = SparseConvTranspose(self.out_channels,
                                     name=f"tconv{ndx}")(
                sv, keys, fine_sv.coords, fine_sv.mask, fine_sv.stride)
            lat, _ = SparseConv(self.out_channels, kernel_size=1,
                                name=f"lateral{ndx}")(fine_sv, fine_keys)
            sv = up.replace(feats=up.feats + lat.feats)
            keys = fine_keys
            out_maps[-2 - ndx] = (sv, keys)

        return sv, keys, out_maps
