"""Multi-device tests on the 8-way virtual CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): sharded-gallery retrieval parity,
data-parallel train step parity, and batch sharding."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.config import MeshConfig, synthetic_config
from agplace_tpu.parallel.mesh import make_mesh, shard_batch
from agplace_tpu.retrieval.knn import l2_topk
from agplace_tpu.retrieval.sharded import shard_gallery, sharded_l2_topk


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_gallery_matches_single_device():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((32, 64)).astype(np.float32)
    db = rng.standard_normal((1000, 64)).astype(np.float32)  # not 8-divisible
    mesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=8))
    db_sharded = shard_gallery(mesh, db)
    d_sh, i_sh = sharded_l2_topk(mesh, jnp.asarray(q), db_sharded, k=10)
    d_ref, i_ref = l2_topk(jnp.asarray(q), jnp.asarray(db), 10)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device():
    """The same train step, same batch: sharded over an 8-way data mesh vs
    unsharded must produce (numerically) the same updated params — GSPMD
    data parallelism with implicit gradient all-reduce and global BN.

    Uses a 2-way mesh: the parity math is device-count independent, and
    8-way CPU collectives on a single-core CI host abort nondeterministically
    under thread starvation (the 8-way path is exercised by
    ``__graft_entry__.dryrun_multichip``).
    """
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state, make_train_step

    cfg = synthetic_config(batch_size=8, image_size=32, vox_max_points=64,
                           negs=2)
    ds = SyntheticDataset(n_db=16, n_q=16, image_size=32, n_points=64,
                          seed=0)
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, ds)
    rows = miner.mine_random(rng, 8)
    batch = collate_train(ds, rows, cfg, rng)

    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)

    # train_step donates its state argument: clone before the first call
    state_b = jax.tree_util.tree_map(lambda x: jnp.array(x), state)

    # single device (default placement)
    state1, m1 = step(state, batch)

    # 2-way data parallel: shard every batch leaf on its leading axis
    mesh = make_mesh(MeshConfig(data_parallel=2, gallery_parallel=1),
                     devices=jax.devices()[:2])
    sharded = shard_batch(mesh, batch)
    state8, m8 = step(state_b, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4, atol=1e-5)
    # sharded execution reassociates reductions (BN stats, grad sums); the
    # float32 rounding deltas pass through Adam's rsqrt normalisation, so
    # compare with an absolute tolerance on the scale of a couple of updates
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=5e-4)


def test_bootstrap_single_process_noop(monkeypatch):
    """initialize_distributed is a silent no-op without a coordinator."""
    from agplace_tpu.parallel import bootstrap

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert bootstrap.initialize_distributed() is False
    # single-process hybrid mesh falls back to a flat ICI mesh
    mesh = bootstrap.make_hybrid_mesh(gallery_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "gallery": 2}
    # and is usable for the sharded retrieval engine
    rng = np.random.default_rng(0)
    db = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    db_sh = shard_gallery(mesh, db)
    d, i = sharded_l2_topk(mesh, jnp.asarray(q), db_sh, k=3)
    d_ref, i_ref = l2_topk(jnp.asarray(q), jnp.asarray(db), 3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_sharded_int8_candidates_contain_true_topk():
    """Sharded int8 candidate scan (shard_quant_gallery +
    sharded_l2_candidates_int8) over the 8-way virtual mesh: the merged
    candidate set must contain the exact top-k, with sentinel padding
    rows (1000 is not 8-divisible) never displacing a real candidate."""
    from agplace_tpu.retrieval.sharded import (
        shard_quant_gallery, sharded_l2_candidates_int8)

    rng = np.random.default_rng(3)
    db = rng.standard_normal((1000, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = 5
    mesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=8))
    qgal = shard_quant_gallery(mesh, db)
    assert qgal[0].dtype == jnp.int8
    _, cand = sharded_l2_candidates_int8(mesh, jnp.asarray(q), qgal, 4 * k)
    cand = np.asarray(cand)
    _, i_ref = l2_topk(jnp.asarray(q), jnp.asarray(db), k)
    i_ref = np.asarray(i_ref)
    assert (cand < 1000).all()  # sentinels never make the merged top-nc
    for r in range(q.shape[0]):
        assert set(i_ref[r]) <= set(cand[r]), r


def test_sharded_topk_k_in_padding_window_gives_faiss_padding():
    """10 real rows on an 8-way mesh pad to 16; any k in (10, 16] used to
    pass the k-vs-PADDED-rows guard and return sentinel pad rows as
    valid-looking indices 10..15 with ~1e36 distances.  With n_rows the
    result must carry faiss +inf/-1 padding past row 10 instead."""
    from agplace_tpu.retrieval.sharded import shard_gallery, sharded_l2_topk

    rng = np.random.default_rng(7)
    db = rng.standard_normal((10, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    mesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=8))
    db_sh = shard_gallery(mesh, db)
    assert db_sh.shape[0] == 16  # padded

    for k in (12, 16, 20):
        d, i = sharded_l2_topk(mesh, jnp.asarray(q), db_sh, k, n_rows=10)
        d, i = np.asarray(d), np.asarray(i)
        d_ref, i_ref = l2_topk(jnp.asarray(q), jnp.asarray(db), k)
        np.testing.assert_array_equal(i, np.asarray(i_ref))
        assert (i[:, 10:] == -1).all() and np.isinf(d[:, 10:]).all()
        np.testing.assert_allclose(d[:, :10], np.asarray(d_ref)[:, :10],
                                   rtol=1e-5, atol=1e-6)


def test_syncbn_moments_match_global_stats():
    """Cross-replica BN under shard_map must equal single-device BN on the
    concatenated batch — shards with different means (and, for the masked
    twin, different valid counts) expose the old pmean-of-variances /
    equal-shard-weight bias (r3 review fix: psum raw moments)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from agplace_tpu.models.norm import BatchNorm2D
    from agplace_tpu.sparse.modules import MaskedBatchNorm

    mesh = make_mesh(MeshConfig(data_parallel=8, gallery_parallel=1))
    rng = np.random.default_rng(0)
    # per-shard means differ strongly: shard i centered at 5*i
    x = np.concatenate([
        5.0 * i + rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        for i in range(8)])

    bn = BatchNorm2D()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want, wmut = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    bn_sync = BatchNorm2D(axis_name="data")

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"),
             out_specs=(P("data"), P()), check_vma=False)
    def run(xs):
        out, mut = bn_sync.apply(v, xs, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    got, stats = run(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats[k]), np.asarray(wmut["batch_stats"][k]),
            rtol=1e-4, atol=1e-4)

    # masked twin: wildly different valid counts per shard
    feats = np.concatenate([
        3.0 * i + rng.standard_normal((1, 16, 3)).astype(np.float32)
        for i in range(8)])
    mask = np.zeros((8, 16), bool)
    for i in range(8):
        mask[i, : 2 + i] = True  # 2..9 valid points per shard

    mbn = MaskedBatchNorm()
    mv = mbn.init(jax.random.PRNGKey(1), jnp.asarray(feats),
                  jnp.asarray(mask))
    want_m, wmut_m = mbn.apply(mv, jnp.asarray(feats), jnp.asarray(mask),
                               mutable=["batch_stats"])
    mbn_sync = MaskedBatchNorm(axis_name="data")

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
             out_specs=(P("data"), P()), check_vma=False)
    def run_m(f, m):
        out, mut = mbn_sync.apply(mv, f, m, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    got_m, stats_m = run_m(jnp.asarray(feats), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-4, atol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats_m[k]), np.asarray(wmut_m["batch_stats"][k]),
            rtol=1e-4, atol=1e-4)
