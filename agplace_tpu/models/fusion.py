"""Neural-ODE fusion blocks — reference ``network_mm/{ffns,diff_block,
fuse_block_toshallow,stage2fuse_blockadd}.py``.

The ODE dynamics functions declare their weights directly (plain jnp matmuls)
so the integrators in ``agplace_tpu.ode`` can treat them as pure closures —
no module-tracing inside ``lax.scan`` bodies.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from agplace_tpu.config import ODEConfig
from agplace_tpu.ode.integrators import odeint
from agplace_tpu.sparse.dense_grid import (
    DenseVoxelGrid,
    GridConv,
    GridECABasicBlock,
    GridMinkGeM,
    grid_global_avg,
)
from agplace_tpu.sparse.modules import ECABasicBlock, MinkGeM, SparseConv
from agplace_tpu.sparse.voxels import SparseVoxels, masked_global_avg

_ACTS = {
    None: lambda x: x,
    "id": lambda x: x,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


class FCODE(nn.Module):
    """Integrates dx/dt = act(Wx + b) over t in [0,1]
    (``network_mm/ffns.py:78-87``)."""

    dim: int
    act: Optional[str] = "relu"
    ode: ODEConfig = ODEConfig()

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.dim, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        # the ODE state is a small [B, dim] vector: integrate in fp32
        # regardless of the tower's activation dtype (also keeps the scan
        # carry dtype stable under bf16 inputs)
        x = x.astype(jnp.float32)

        n_steps = max(int(-(-1.0 // self.ode.step_size)), 1)
        uniform_steps = abs(n_steps * self.ode.step_size - 1.0) < 1e-9
        import os

        if (self.ode.use_pallas and self.ode.method == "euler"
                and not os.environ.get("AGPLACE_DISABLE_PALLAS")
                and uniform_steps and x.ndim == 2
                and self.act in ("relu", "tanh", "sigmoid", "id", None)):
            # fused VMEM-resident Euler chain (Pallas kernel; exact same
            # math as the scan path, with a matching custom VJP)
            from agplace_tpu.ops.pallas.ode_step import fused_euler_ode

            return fused_euler_ode(x, w, b, n_steps, self.ode.step_size,
                                   self.act or "id")

        act = _ACTS[self.act]

        def func(t, y):
            return act(jnp.dot(y, w, preferred_element_type=jnp.float32) + b)

        return odeint(func, x, 0.0, 1.0, method=self.ode.method,
                      step_size=self.ode.step_size, rtol=self.ode.rtol,
                      atol=self.ode.atol, max_steps=self.ode.dopri5_max_steps)


class DiffBlock(nn.Module):
    """Sum of ODE blocks parsed from ``diff_type`` (e.g. 'fcode@relu')
    (``network_mm/diff_block.py:18-47``)."""

    dim: int
    ode: ODEConfig = ODEConfig()

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, spec in enumerate(self.ode.diff_type.split("_")):
            kind, act = spec.split("@")
            if kind == "fcode":
                outs.append(FCODE(self.dim, act, self.ode,
                                  name=f"fcode_{i}")(x))
            else:
                raise NotImplementedError(f"diff block kind {kind}")
        return sum(outs)


class FuseBlockToShallow(nn.Module):
    """Stage-1 deep-to-shallow ODE fusion chain
    (``network_mm/fuse_block_toshallow.py:79-121``).

    Consumes per-scale *pooled* vectors (the tower pools image maps with
    global-avg and voxel maps with masked-avg before calling; the reference
    pools inside, ``fuse_block_toshallow.py:82-83``) and walks scales
    deep->shallow (``diff_direction='backward'``), accumulating and running a
    DiffBlock ODE step per scale.
    """

    dims: Tuple[int, ...]  # fusion dim per scale (all 256 by default)
    img_dims: Tuple[int, ...]
    vox_dims: Tuple[int, ...]
    ode: ODEConfig = ODEConfig()

    @nn.compact
    def __call__(self, imageveclist: Sequence[jax.Array],
                 voxveclist: Optional[Sequence[jax.Array]] = None):
        n = len(self.dims)
        assert len(imageveclist) == n
        fuse_dim = self.dims[-1]
        blocks = [DiffBlock(fuse_dim, self.ode, name=f"diff_{i}")
                  for i in range(n)]
        updims_img = [
            nn.Dense(fuse_dim, name=f"updim_img_{i}") if i < n - 1 else None
            for i in range(n)
        ]
        updims_vox = [
            nn.Dense(fuse_dim, name=f"updim_vox_{i}") if i < n - 1 else None
            for i in range(n)
        ]

        order = range(n - 1, -1, -1) if self.ode.diff_direction == "backward" \
            else range(n)
        fusevec = 0.0
        for i in order:
            imagevec = imageveclist[i]
            if updims_img[i] is not None:
                imagevec = updims_img[i](imagevec)
            fusevec = fusevec + imagevec
            if voxveclist is not None:
                voxvec = voxveclist[i]
                if updims_vox[i] is not None:
                    voxvec = updims_vox[i](voxvec)
                fusevec = fusevec + voxvec
            fusevec = blocks[i](fusevec)
        return fusevec


class BasicBlock2D(nn.Module):
    """Dense conv residual block (``stage2fuse_blockadd.py:61-79``), NHWC."""

    dim: int
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from agplace_tpu.models.norm import BatchNorm2D

        def bn(name):
            return BatchNorm2D(use_running_average=not self.train,
                               momentum=0.9, epsilon=1e-5,
                               axis_name=self.axis_name if self.train
                               else None, name=name)

        identity = x
        out = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        out = bn("bn2")(out)
        return nn.relu(out + identity)


class Basic(nn.Module):
    """Residual MLP block (``stage2fuse_blockadd.py:82-100``)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Dense(self.dim, name="fc1")(x)
        out = nn.relu(nn.LayerNorm(epsilon=1e-5, name="ln1")(out))
        out = nn.Dense(self.dim, name="fc2")(out)
        out = nn.LayerNorm(epsilon=1e-5, name="ln2")(out)  # torch LN eps
        return nn.relu(out + identity)


class FFNFuse(nn.Module):
    """Sum of Basic blocks per ``stg2fuse_type``
    (``stage2fuse_blockadd.py:117-135``)."""

    dim: int
    stg2fuse_type: str = "basic"

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, e in enumerate(self.stg2fuse_type.split("_")):
            if e == "basic":
                outs.append(Basic(self.dim, name=f"basic_{i}")(x))
            else:
                raise NotImplementedError(f"stg2fuse_type {e}")
        return sum(outs)


class GeM2D(nn.Module):
    """GeM over an NHWC map -> [B, C] (same math as models/pooling.GeM;
    duplicated class in the reference at ``stage2fuse_blockadd.py:103-114``).
    """

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.ones((1,)) * self.p_init)
        x = jnp.clip(x, min=self.eps) ** p
        return jnp.mean(x, axis=(1, 2)) ** (1.0 / p)


class Stage2FuseBlockAdd(nn.Module):
    """Stage-2 fusion (``stage2fuse_blockadd.py:139-219``, ``stg2_type='full'``):
    project the fused vector into each modality's channel space, broadcast-add
    into the feature maps, refine each map (dense BasicBlock / sparse
    ECABasicBlock), GeM-pool the refined maps, then fold pooled projections
    back into the fused vector through FFNFuse.

    Returns (fusevec, imgoutvec, voxoutvec).
    """

    fusedim: int
    imgdim: int
    voxdim: int
    nlayers: int = 1
    stg2fuse_type: str = "basic"
    use_proj: bool = True
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    bev_pallas: bool = False  # fused ECA refine (see MMConfig.bev_pallas)

    @nn.compact
    def __call__(self, imgmap: jax.Array, voxmap=None,
                 vox_keys: Optional[jax.Array] = None,
                 fusevec: jax.Array = None):
        from agplace_tpu.sparse.bev_grid import (
            BEVConv, BEVECABasicBlock, BEVGrid, BEVMinkGeM, _mask_bev,
            bev_global_avg)

        dense_vox = isinstance(voxmap, DenseVoxelGrid)
        # z-folded BEV path: all-2D convs, same parameter tree as the
        # dense path (avoids the measured XLA:TPU 3D-conv epilogue
        # pathology even on the small deepest map; BASELINE.md r2/r4)
        bev_vox = isinstance(voxmap, BEVGrid)
        imgoutvec = None
        voxoutvec = None
        for i in range(self.nlayers):
            if self.use_proj:
                fusevec_img = nn.Dense(self.imgdim,
                                       name=f"proj_fuse_img_{i}")(fusevec)
                imgmap = imgmap + fusevec_img[:, None, None, :]
            else:
                imgmap = imgmap + fusevec[:, None, None, :]
            if voxmap is not None:
                if self.use_proj:
                    fusevec_vox = nn.Dense(self.voxdim,
                                           name=f"proj_fuse_vox_{i}")(fusevec)
                else:
                    fusevec_vox = fusevec
                # ME_broadcast_add (stage2fuse_blockadd.py:26-32)
                if bev_vox:
                    add = jnp.tile(fusevec_vox, (1, voxmap.z))
                    vfeats = _mask_bev(
                        voxmap.feats + add[:, None, None, :].astype(
                            voxmap.feats.dtype), voxmap.mask, voxmap.z)
                elif dense_vox:
                    vfeats = jnp.where(
                        voxmap.mask[..., None],
                        voxmap.feats + fusevec_vox[:, None, None, None, :],
                        0.0)
                else:
                    vfeats = jnp.where(
                        voxmap.mask[..., None],
                        voxmap.feats + fusevec_vox[:, None, :], 0.0)
                voxmap = voxmap.replace(feats=vfeats)

            imgmap = BasicBlock2D(self.imgdim, train=self.train,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype,
                                  name=f"ffn_img_{i}")(imgmap)
            if voxmap is not None:
                if bev_vox:
                    voxmap = BEVECABasicBlock(self.voxdim, train=self.train,
                                              axis_name=self.axis_name,
                                              use_pallas=self.bev_pallas,
                                              name=f"ffn_vox_{i}")(voxmap)
                elif dense_vox:
                    voxmap = GridECABasicBlock(self.voxdim, train=self.train,
                                               axis_name=self.axis_name,
                                               name=f"ffn_vox_{i}")(voxmap)
                else:
                    voxmap, _ = ECABasicBlock(self.voxdim, train=self.train,
                                              axis_name=self.axis_name,
                                              name=f"ffn_vox_{i}")(
                        voxmap, vox_keys)
            imgoutvec = GeM2D(name=f"pool_img_{i}")(imgmap)
            if voxmap is not None:
                if bev_vox:
                    pool_cls = BEVMinkGeM
                elif dense_vox:
                    pool_cls = GridMinkGeM
                else:
                    pool_cls = MinkGeM
                voxoutvec = pool_cls(name=f"pool_vox_{i}")(voxmap)

            # fold refined maps back into the fused vector; with
            # use_proj=False the reference appends Identity for
            # projsimgfuse/projsvoxfuse (stage2fuse_blockadd.py:165-169)
            # — the raw refined maps pool straight into fusevec.  The img
            # 1x1 is nn.Conv2d (bias by default, :160-161); the vox 1x1
            # is ME.MinkowskiConvolution (bias=False default, :162-163)
            if self.use_proj:
                imgmap_fuse = nn.Conv(self.fusedim, (1, 1),
                                      dtype=self.dtype,
                                      name=f"proj_img_fuse_{i}")(imgmap)
            else:
                imgmap_fuse = imgmap
            imgvec_fuse = jnp.mean(imgmap_fuse, axis=(1, 2))
            fusevec = fusevec + imgvec_fuse
            if voxmap is not None:
                if not self.use_proj:
                    voxmap_fuse = voxmap
                elif bev_vox:
                    voxmap_fuse = BEVConv(self.fusedim, kernel_size=1,
                                          name=f"proj_vox_fuse_{i}")(voxmap)
                elif dense_vox:
                    voxmap_fuse = GridConv(self.fusedim, kernel_size=1,
                                           name=f"proj_vox_fuse_{i}")(voxmap)
                else:
                    voxmap_fuse, _ = SparseConv(self.fusedim, kernel_size=1,
                                                name=f"proj_vox_fuse_{i}")(
                        voxmap, vox_keys)
                if bev_vox:
                    vavg = bev_global_avg(voxmap_fuse)
                elif dense_vox:
                    vavg = grid_global_avg(voxmap_fuse)
                else:
                    vavg = masked_global_avg(voxmap_fuse)
                fusevec = fusevec + vavg
            fusevec = FFNFuse(self.fusedim, self.stg2fuse_type,
                              name=f"ffn_fuse_{i}")(fusevec)
        return fusevec, imgoutvec, voxoutvec


# ---------------------------------------------------------------------------
# Graph-ODE blocks (reference network_mm/gnns.py — ALT path via --stg2gnn)
# ---------------------------------------------------------------------------


class QKVAttention(nn.Module):
    """Multi-head self-attention over token maps (``gnns.py:24-53``)."""

    dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        h = self.num_heads
        q = nn.Dense(self.dim, name="fc_q")(x).reshape(b, n, h, c // h)
        k = nn.Dense(self.dim, name="fc_k")(x).reshape(b, n, h, c // h)
        v = nn.Dense(self.dim, name="fc_v")(x).reshape(b, n, h, c // h)
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))  # [B,H,N,C/H]
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        return jnp.swapaxes(out, 1, 2).reshape(b, n, c)


class BeltramiODE(nn.Module):
    """Beltrami graph-diffusion ODE (``gnns.py:64-102``): learned positions ->
    cosine kNN graph -> softmax-weighted neighbour aggregation as dx/dt,
    integrated over [0,1].  Differentiated directly through the scan (the
    reference uses odeint_adjoint; see ``ode.integrators.odeint_adjoint`` for
    the O(1)-memory alternative)."""

    dim: int
    k: int = 16
    ode: ODEConfig = ODEConfig()

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        w = self.param("fc_kernel", nn.initializers.lecun_normal(),
                       (c, 2 * c))
        bias = self.param("fc_bias", nn.initializers.zeros, (2 * c,))
        k = min(self.k, n)

        def func(t, y):
            feat_pos = jnp.dot(y, w, preferred_element_type=jnp.float32) + bias
            feat, pos = feat_pos[..., :c], feat_pos[..., c:]
            pos = pos / jnp.maximum(
                jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-12)
            sim = jnp.einsum("bnc,bmc->bnm", pos, pos,
                             preferred_element_type=jnp.float32)
            topksim, topkid = jax.lax.top_k(sim, k)  # [B, N, k]
            # gather neighbour features: feat [B, M, C], topkid [B, N, k]
            tk = jax.vmap(lambda f, ids: f[ids])(feat, topkid)  # [B,N,k,C]
            attn = jax.nn.softmax(topksim, axis=-1)
            return jnp.sum(attn[..., None] * tk, axis=-2)

        return odeint(func, x, 0.0, 1.0, method=self.ode.method,
                      step_size=self.ode.step_size, rtol=self.ode.rtol,
                      atol=self.ode.atol, max_steps=self.ode.dopri5_max_steps)
