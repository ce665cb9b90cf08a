"""Dtype-preserving BatchNorm for dense image branches (the reference uses
torch ``nn.BatchNorm2d`` inside its torchvision backbones; under >=2 GPUs it
swaps in the vendored SyncBN, ``/root/reference/train.py:253-256`` — here
cross-replica stats are free under GSPMD, with ``axis_name`` pmean for
shard_map).

flax's ``nn.BatchNorm`` with ``dtype=float32`` promotes the whole activation
buffer to fp32 (and back) around every conv — measured as the dominant cost
of the bf16 training path.  This BN computes the reduction statistics in
fp32 (cast fused into the reduce by XLA, never materialised) but applies the
normalisation as one fused affine in the input dtype:

    y = x * scale' + bias',  scale' = rsqrt(var+eps)*scale,
                             bias'  = bias - mean*scale'

Math identical to flax BN; parameter/batch-stats naming matches flax so the
torchvision weight converter keeps working.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm2D(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, return_affine: bool = False):
        # x [..., C], stats over all leading axes.  With
        # ``return_affine=True`` (eval only) the fused effective affine is
        # returned as fp32 ``(eff_scale, eff_bias)`` instead of being
        # applied — consumers that fuse the BN epilogue into a Pallas
        # kernel (e.g. ops/pallas/stem_pool.py) read it off the same
        # parameter tree.
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            msq = jnp.mean(jnp.square(x32), axis=axes)
            if self.axis_name is not None:
                # pmean the RAW moments, then subtract: pmean of per-shard
                # variances (computed around per-shard means) would
                # underestimate the global variance whenever shard means
                # differ (torch SyncBN reduces E[x] and E[x^2] likewise)
                mean = jax.lax.pmean(mean, self.axis_name)
                msq = jax.lax.pmean(msq, self.axis_name)
            var = msq - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        inv = jax.lax.rsqrt(var + self.epsilon)
        if return_affine:
            assert self.use_running_average, \
                "return_affine is an eval-mode contract"
            return inv * scale, bias - mean * inv * scale
        eff_scale = (inv * scale).astype(x.dtype)
        eff_bias = (bias - mean * inv * scale).astype(x.dtype)
        return x * eff_scale + eff_bias
