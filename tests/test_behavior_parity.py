"""Behaviour-parity tests: mining determinism (golden seeds), modality-drop
ablations, resume mid-training, squeezenet variant."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.config import synthetic_config
from agplace_tpu.data.base import collate_train
from agplace_tpu.data.synthetic import SyntheticDataset
from agplace_tpu.train.mining import TripletMiner
from agplace_tpu.train.step import init_state, make_infer_fns


def _world():
    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=128,
                           negs=2)
    ds = SyntheticDataset(n_db=24, n_q=16, image_size=32, seed=0)
    return cfg, ds


def test_mining_is_deterministic_given_seed():
    cfg, ds = _world()
    miner = TripletMiner(cfg, ds)
    a = miner.mine_random(np.random.default_rng(7), 8)
    b = miner.mine_random(np.random.default_rng(7), 8)
    np.testing.assert_array_equal(a, b)
    c = miner.mine_random(np.random.default_rng(8), 8)
    assert not np.array_equal(a, c)


@pytest.mark.slow
def test_partial_sep_mining_deterministic():
    cfg, ds = _world()
    miner = TripletMiner(cfg, ds)
    rng = np.random.default_rng(0)
    batch = collate_train(ds, miner.mine_random(rng, 2), cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    eq, edb = make_infer_fns(cfg)
    t1 = miner.mine_partial_sep(np.random.default_rng(5), 6, state.params,
                                state.batch_stats, eq, edb)
    t2 = miner.mine_partial_sep(np.random.default_rng(5), 6, state.params,
                                state.batch_stats, eq, edb)
    np.testing.assert_array_equal(t1, t2)


def test_collate_deterministic_given_rng():
    cfg, ds = _world()
    miner = TripletMiner(cfg, ds)
    rows = miner.mine_random(np.random.default_rng(1), 2)
    b1 = collate_train(ds, rows, cfg, np.random.default_rng(3))
    b2 = collate_train(ds, rows, cfg, np.random.default_rng(3))
    np.testing.assert_array_equal(np.asarray(b1["query_image"]),
                                  np.asarray(b2["query_image"]))
    # vox is a BEVGrid (default bev backend) or SparseVoxels: compare all
    # array leaves generically
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(b1["vox"]),
                    jax.tree_util.tree_leaves(b2["vox"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_modality_drop_changes_embedding():
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg, ds = _world()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    pts = rng.uniform(-20, 20, (2, 100, 3)).astype(np.float32)
    vox = batched_from_pointclouds(pts, 2.0, 128)

    base = MM(config=cfg.model.mm, train=False)
    v = base.init(jax.random.PRNGKey(0), imgs, vox)
    e_full = np.asarray(base.apply(v, imgs, vox)["embedding"])
    for drop in ("image", "pc"):
        m = MM(config=dataclasses.replace(cfg.model.mm, drop=drop),
               train=False)
        e_drop = np.asarray(m.apply(v, imgs, vox)["embedding"])
        assert not np.allclose(e_full, e_drop), drop
        assert np.isfinite(e_drop).all()

    # drop='pc' must equal a cloud that is literally ONE origin voxel —
    # the ME re-quantisation semantics of zeroed coordinates
    # (reference mm.py:73-74: ME.SparseTensor collapses N duplicate
    # zero coords into a single origin voxel)
    m_pc = MM(config=dataclasses.replace(cfg.model.mm, drop="pc"),
              train=False)
    e_drop_pc = np.asarray(m_pc.apply(v, imgs, vox)["embedding"])
    origin = batched_from_pointclouds(
        np.zeros((2, 1, 3), np.float32), 2.0, 128)
    e_origin = np.asarray(base.apply(v, imgs, origin)["embedding"])
    np.testing.assert_allclose(e_drop_pc, e_origin, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_resume_roundtrip_continues_training(tmp_path):
    from agplace_tpu.train.checkpoint import CheckpointManager
    from agplace_tpu.train.step import make_train_step

    cfg, ds = _world()
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, ds)
    rows = miner.mine_random(rng, cfg.train.train_batch_size)
    batch = collate_train(ds, rows, cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    state, _ = step(state, batch)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(state, epoch_num=0, recalls=np.array([1.0, 2, 3, 4]),
              best_r5=2.0, not_improved_num=0, is_best=True)

    template = init_state(cfg, jax.random.PRNGKey(0), batch)
    restored, meta = ckpt.restore("ep@0__r1@1", template)
    assert meta["epoch_num"] == 0 and meta["best_r5"] == 2.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    restored, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(restored.step) == 2
    # best_model copy exists
    import os

    assert os.path.isdir(tmp_path / "best_model")


def test_squeezenet_image_fe():
    from agplace_tpu.models.image_fe import ImageFE

    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    for fe in ("squeezenet10", "squeezenet11"):
        m = ImageFE(fe_type=fe)
        v = m.init(jax.random.PRNGKey(0), x)
        out, maps = m.apply(v, x)
        assert out.shape[-1] == 256
        assert ImageFE.last_dim(fe, (2, 2, 2)) == 256
        assert np.isfinite(np.asarray(out)).all()


def test_bf16_staged_images_are_bitwise_identical():
    """The serving input pipeline may stage images in the compute dtype
    (bench.py r5): the model's first conv casts to bf16 at exactly that
    point anyway, so host-cast bf16 inputs must produce BITWISE-identical
    descriptors to f32 inputs.  Pins the identity the bf16 staging relies
    on."""
    from agplace_tpu.models.mm import MM
    from agplace_tpu.sparse.bev_grid import rasterize_from_voxels_host
    from agplace_tpu.sparse.voxels import batched_from_pointclouds

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=128)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    pts = rng.uniform(-20, 20, (2, 500, 3)).astype(np.float32)
    sv = batched_from_pointclouds(pts, cfg.data.quant_size, 128)
    vox = jax.tree_util.tree_map(
        jnp.asarray,
        rasterize_from_voxels_host(sv, cfg.model.mm.vox_grid_extent))

    mm = MM(config=cfg.model.mm, train=False, dtype=jnp.bfloat16)
    v = jax.jit(mm.init)(jax.random.PRNGKey(0), jnp.asarray(images), vox)
    e32 = jax.jit(lambda v, im, vx: mm.apply(v, im, vx)["embedding"])(
        v, jnp.asarray(images, jnp.float32), vox)
    e16 = jax.jit(lambda v, im, vx: mm.apply(v, im, vx)["embedding"])(
        v, jnp.asarray(images, jnp.bfloat16), vox)
    np.testing.assert_array_equal(np.asarray(e32), np.asarray(e16))
