"""MM ground/query tower — reference ``network_mm/mm.py:31-172``.

Fuses an image branch (truncated ResNet + GeM) with a sparse-voxel branch
(MinkFPN + MinkGeM) through two Neural-ODE fusion stages, and emits a
weighted sum of component embeddings.

Input is a dict of fixed-shape arrays:
    query_image: [B, H, W, 3]          (NHWC)
    vox:         SparseVoxels          (padded, see sparse/voxels.py)

Output mirrors the reference dict (``mm.py:150-158``):
    imagevec_org, voxvec_org, shallowvec_org, stg2fusevec, stg2imagevec,
    stg2voxvec, embedding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from agplace_tpu.config import MMConfig
from agplace_tpu.models.fusion import FuseBlockToShallow, Stage2FuseBlockAdd
from agplace_tpu.models.image_fe import ImageFE
from agplace_tpu.models.pooling import GeM
from agplace_tpu.sparse.dense_grid import (
    DenseMinkFPN,
    GridMinkGeM,
    densify,
    grid_global_avg,
)
from agplace_tpu.sparse.minkfpn import MinkFPN
from agplace_tpu.sparse.modules import MinkGeM
from agplace_tpu.sparse.voxels import SparseVoxels, masked_global_avg


def _l2(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class MM(nn.Module):
    config: MMConfig
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _weight(self, name: str, init: float, learn: bool):
        if learn:
            return self.param(name, lambda k: jnp.asarray(init, jnp.float32))
        return jnp.asarray(init, jnp.float32)

    @nn.compact
    def __call__(self, query_image: jax.Array,
                 vox: Optional[SparseVoxels] = None) -> Dict[str, jax.Array]:
        cfg = self.config

        from agplace_tpu.sparse.bev_grid import BEVGrid

        is_grid = isinstance(vox, BEVGrid)  # host-rasterized occupancy

        # modality-drop ablation (mm.py:71-74).  The reference zeroes the ME
        # coordinates, which ME re-quantises into a SINGLE origin voxel per
        # cloud; mirror that by masking all but one point so the branch sees
        # one valid zero-coordinate voxel, not N duplicates.
        if cfg.drop == "image":
            query_image = query_image * 0
        elif cfg.drop == "pc" and vox is not None:
            if is_grid:
                bb, gx, gy, gz = vox.mask.shape
                m0 = jnp.zeros_like(vox.mask).at[
                    :, gx // 2, gy // 2, gz // 2].set(True)
                vox = BEVGrid(feats=m0.astype(vox.feats.dtype), mask=m0,
                              z=vox.z, stride=vox.stride)
            else:
                keep_one = jnp.zeros_like(vox.mask).at[:, 0].set(True)
                vox = vox.replace(coords=vox.coords * 0, mask=keep_one)

        out_components = []
        outputs: Dict[str, jax.Array] = {}
        use_image = "image" in cfg.output_type
        use_vox = "vox" in cfg.output_type and vox is not None

        imagefeatmap = None
        imagemaplist = None
        if use_image:
            imagefeatmap, imagemaplist = ImageFE(
                fe_type=cfg.imgfe, layers=cfg.imgfe_layers, train=self.train,
                axis_name=self.axis_name, dtype=self.dtype,
                use_pallas_stem=cfg.stem_pallas, name="image_fe",
            )(query_image)
            imagefeatvec = GeM(name="image_pool")(imagefeatmap)
            if cfg.output_l2:
                imagefeatvec = _l2(imagefeatvec)
            outputs["imagevec_org"] = imagefeatvec
            w = self._weight("image_weight", cfg.image_weight,
                             cfg.image_learnweight)
            out_components.append(imagefeatvec * w)

        voxfeatmap = None
        vox_keys = None
        voxmaplist = None
        if use_vox:
            if cfg.voxfe_backend == "bev":
                # z folded into channels: every conv is a plain NHWC 2D conv
                # (fastest TPU layout; see sparse/bev_grid.py header for the
                # measured 3D-conv epilogue pathology this avoids)
                from agplace_tpu.sparse.bev_grid import (
                    BEVMinkFPN,
                    BEVMinkGeM,
                    bev_densify,
                )

                # collate builds constant-1 voxel features (the reference's
                # semantics): the feature scatter collapses to the mask.
                # When the input pipeline already rasterized the grid on
                # host (the production path — the on-device scatter costs
                # ~1.8 ms/batch), use it directly.
                if is_grid:
                    bev = vox.replace(feats=vox.feats.astype(self.dtype))
                else:
                    bev = bev_densify(vox, extent=cfg.vox_grid_extent,
                                      dtype=self.dtype, ones_feats=True)
                bev_out, voxmaplist = BEVMinkFPN(
                    out_channels=cfg.voxfe_planes[-1],
                    planes=cfg.voxfe_planes,
                    layers=cfg.voxfe_layers,
                    num_top_down=cfg.voxfe_ntd,
                    conv0_kernel_size=5,
                    block=cfg.voxfe_block,
                    train=self.train,
                    axis_name=self.axis_name,
                    use_pallas=cfg.bev_pallas,
                    use_pallas_head=cfg.bev_pallas_head,
                    use_fused_down=cfg.bev_fused_down,
                    name="vox_fe",
                )(bev)
                # stage-2 consumes the FOLDED grid directly (all-2D convs;
                # the unfolded 5D path hits the XLA:TPU 3D-conv epilogue
                # pathology even on the small deepest map — BASELINE r4)
                voxfeatmap = bev_out
                voxfeatvec = BEVMinkGeM(name="vox_pool")(bev_out)
            elif cfg.voxfe_backend == "dense":
                assert not is_grid, (
                    "host-rasterized BEVGrid input requires "
                    "voxfe_backend='bev'")
                grid = densify(vox, extent=cfg.vox_grid_extent)
                # keep the big grid activations in compute dtype end-to-end
                # (fp32<->bf16 round-trips of the [B,X,Y,Z,C] buffers cost
                # more than the convs themselves)
                grid = grid.replace(feats=grid.feats.astype(self.dtype))
                voxfeatmap, voxmaplist = DenseMinkFPN(
                    out_channels=cfg.voxfe_planes[-1],
                    planes=cfg.voxfe_planes,
                    layers=cfg.voxfe_layers,
                    num_top_down=cfg.voxfe_ntd,
                    conv0_kernel_size=5,
                    block=cfg.voxfe_block,
                    train=self.train,
                    axis_name=self.axis_name,
                    name="vox_fe",
                )(grid)
                voxfeatvec = GridMinkGeM(name="vox_pool")(voxfeatmap)
            else:
                assert not is_grid, (
                    "host-rasterized BEVGrid input requires "
                    "voxfe_backend='bev'")
                voxfeatmap, vox_keys, voxmaplist = MinkFPN(
                    out_channels=cfg.voxfe_planes[-1],
                    planes=cfg.voxfe_planes,
                    layers=cfg.voxfe_layers,
                    num_top_down=cfg.voxfe_ntd,
                    conv0_kernel_size=5,
                    block=cfg.voxfe_block,
                    train=self.train,
                    axis_name=self.axis_name,
                    name="vox_fe",
                )(vox)
                voxfeatvec = MinkGeM(name="vox_pool")(voxfeatmap)
            if cfg.output_l2:
                voxfeatvec = _l2(voxfeatvec)
            outputs["voxvec_org"] = voxfeatvec
            w = self._weight("vox_weight", cfg.vox_weight,
                             cfg.vox_learnweight)
            out_components.append(voxfeatvec * w)

        # ==== stage-1 fusion (mm.py:98-111)
        shallowfeatvec = None
        if "shallow" in cfg.output_type:
            n_scales = len(cfg.imgfe_planes)
            imageveclist = [jnp.mean(m, axis=(1, 2)) for m in imagemaplist]
            voxveclist = None
            if use_vox:
                if cfg.voxfe_backend == "bev":
                    from agplace_tpu.sparse.bev_grid import bev_global_avg

                    voxveclist = [bev_global_avg(g) for g in voxmaplist]
                elif cfg.voxfe_backend == "dense":
                    voxveclist = [grid_global_avg(g) for g in voxmaplist]
                else:
                    voxveclist = [masked_global_avg(sv)
                                  for sv, _ in voxmaplist]
            shallowfeatvec = FuseBlockToShallow(
                dims=tuple(cfg.stg2fuse_dim for _ in range(n_scales)),
                img_dims=cfg.imgfe_planes,
                vox_dims=cfg.voxfe_planes,
                ode=cfg.ode,
                name="fuseblocktoshallow",
            )(imageveclist, voxveclist)
            outputs["shallowvec_org"] = shallowfeatvec
            if cfg.output_l2:
                shallowfeatvec = _l2(shallowfeatvec)
            w = self._weight("shallow_weight", cfg.shallow_weight,
                             cfg.shallow_learnweight)
            out_components.append(shallowfeatvec * w)
        elif "addorg" in cfg.output_type:
            addorgvec = outputs["imagevec_org"]
            if use_vox:
                addorgvec = addorgvec + outputs["voxvec_org"]
            if cfg.output_l2:
                addorgvec = _l2(addorgvec)
            outputs["shallowvec_org"] = addorgvec
            w = self._weight("shallow_weight", cfg.shallow_weight,
                             cfg.shallow_learnweight)
            out_components.append(addorgvec * w)

        # ==== stage-2 fusion (mm.py:114-118)
        stg2fusevec, stg2imagevec, stg2voxvec = Stage2FuseBlockAdd(
            fusedim=cfg.stg2fuse_dim,
            imgdim=cfg.imgfe_dim,
            voxdim=cfg.voxfe_dim,
            nlayers=cfg.stg2nlayers,
            stg2fuse_type=cfg.stg2fuse_type,
            use_proj=cfg.stg2_useproj,
            train=self.train,
            axis_name=self.axis_name,
            dtype=self.dtype,
            bev_pallas=cfg.bev_pallas,
            name="stg2fuseblock",
        )(imagefeatmap, voxfeatmap if use_vox else None, vox_keys,
          out_components[-1])
        stg2fusevec = nn.Dense(cfg.stg2fuse_dim,
                               name="stg2fusefc")(stg2fusevec)
        outputs["stg2fusevec"] = stg2fusevec
        outputs["stg2imagevec"] = stg2imagevec
        if stg2voxvec is not None:
            outputs["stg2voxvec"] = stg2voxvec

        # ==== final weighted combination (mm.py:122-146)
        final = []
        if "imageorg" in cfg.final_type and use_image:
            final.append(outputs["imagevec_org"] * self._weight(
                "imageorg_weight", cfg.imagevoxorg_weight,
                cfg.imagevoxorg_learnweight))
        if "voxorg" in cfg.final_type and use_vox:
            final.append(outputs["voxvec_org"] * self._weight(
                "voxorg_weight", cfg.imagevoxorg_weight,
                cfg.imagevoxorg_learnweight))
        if "shalloworg" in cfg.final_type and shallowfeatvec is not None:
            final.append(shallowfeatvec * self._weight(
                "shalloworg_weight", cfg.shalloworg_weight,
                cfg.shalloworg_learnweight))
        if "stg2image" in cfg.final_type:
            final.append(stg2imagevec * self._weight(
                "stg2image_weight", cfg.stg2imagevox_weight,
                cfg.stg2imagevox_learnweight))
        if "stg2vox" in cfg.final_type and stg2voxvec is not None:
            final.append(stg2voxvec * self._weight(
                "stg2vox_weight", cfg.stg2imagevox_weight,
                cfg.stg2imagevox_learnweight))
        if "stg2fuse" in cfg.final_type:
            final.append(stg2fusevec * self._weight(
                "stg2fuse_weight", cfg.stg2fuse_weight,
                cfg.stg2fuse_learnweight))

        if cfg.final_fusetype == "add":
            x = sum(final)
        elif cfg.final_fusetype == "cat":
            x = jnp.concatenate(final, axis=-1)
        elif cfg.final_fusetype == "catadd":
            x = jnp.concatenate(final[:-1], axis=-1) + final[-1]
        else:
            raise NotImplementedError(cfg.final_fusetype)
        if cfg.final_l2:
            x = _l2(x)
        outputs["embedding"] = x
        return outputs
