"""Fused flattened Adam == optax.multi_transform(per-group Adam).

The train step's optimizer update used to lower to ~6 ops per param leaf
(~1,100 dispatches for the 187-leaf tree) costing a measured 12.1 ms/step
of pure per-op floor on the v5e (BASELINE.md r3).  ``_fused_group_adam``
runs ONE scale_by_adam over the flattened vector with the group LR folded
into the un-flatten — this file pins that it is elementwise-identical to
the labelled multi_transform it replaced (which itself is pinned against
the reference's two torch Adams by tests/test_torch_full_oracle.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from agplace_tpu.config import TrainConfig
from agplace_tpu.train.optim import (
    _group_lrs,
    label_params,
    make_optimizer,
)


def _tree(rng):
    """A params tree shaped like the real one: mm (with vox_fe -> 'pc'
    group) + db, mixed leaf shapes."""
    def leaf(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    return {
        "mm": {
            "image_fe": {"conv1": {"kernel": leaf(3, 3, 4, 8)},
                         "bn": {"scale": leaf(8), "bias": leaf(8)}},
            "vox_fe": {"conv0": {"kernel": leaf(3, 3, 3, 1, 6)}},
            "vox_pool": {"p": leaf(1)},
            "stg2fusefc": {"kernel": leaf(16, 16), "bias": leaf(16)},
        },
        "db": {"fe_0": {"conv1": {"kernel": leaf(3, 3, 4, 8)}},
               "mlp": {"kernel": leaf(8, 16)}},
    }


def _reference_tx(cfg: TrainConfig):
    """The pre-fusion construction: labelled multi_transform of adams."""
    make = lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    lrs = _group_lrs(cfg, crn=False)
    transforms = {k: (make(v) if v else optax.set_to_zero())
                  for k, v in lrs.items()}
    return optax.multi_transform(
        transforms, lambda params: label_params(params))


@pytest.mark.parametrize("train_modeldb", [True, False])
def test_fused_adam_matches_multi_transform(train_modeldb):
    cfg = dataclasses.replace(TrainConfig(), lr=1e-3, lrpc=5e-3, lrdb=2e-3,
                              train_modeldb=train_modeldb)
    rng = np.random.default_rng(0)
    params_a = _tree(rng)
    params_b = jax.tree_util.tree_map(lambda x: x, params_a)

    fused = make_optimizer(cfg)
    ref = _reference_tx(cfg)
    sa, sb = fused.init(params_a), ref.init(params_b)

    for step in range(4):
        grng = np.random.default_rng(100 + step)
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(grng.standard_normal(x.shape),
                                  jnp.float32), params_a)
        ua, sa = fused.update(grads, sa, params_a)
        ub, sb = ref.update(grads, sb, params_b)
        params_a = optax.apply_updates(params_a, ua)
        params_b = optax.apply_updates(params_b, ub)
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(params_a),
                jax.tree_util.tree_leaves_with_path(params_b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=0, atol=1e-7,
                err_msg=f"step {step}: {jax.tree_util.keystr(pa)}")

    # the pc group really moved at its own LR (labels reached the fused path)
    labels = label_params(params_a)
    flat_labels = {jax.tree_util.keystr(p): l for p, l in
                   jax.tree_util.tree_leaves_with_path(labels)}
    assert any(v == "pc" for v in flat_labels.values())
    assert any(v == "db" for v in flat_labels.values())


def test_fused_adam_under_jit_and_grad_dtype():
    """The fused update works inside jit with donated state and returns
    updates in each leaf's own dtype."""
    cfg = dataclasses.replace(TrainConfig(), lr=1e-3)
    rng = np.random.default_rng(1)
    params = _tree(rng)
    tx = make_optimizer(cfg)
    state = tx.init(params)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_params, state = step(params, state, grads)
    for p, l in jax.tree_util.tree_leaves_with_path(new_params):
        assert l.dtype == jnp.float32, p
        assert bool(jnp.isfinite(l).all()), p
    # a second step advances the shared count without error
    step(new_params, state, grads)
