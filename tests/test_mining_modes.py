"""Mining-mode matrix (VERDICT r2 item 4): every reference mining mode
(``datasets_ws_kitti360.py:892-903`` dispatch) produces valid triplets, and
``random`` follows the reference's exact semantics — model-chosen BEST
positive (kitti360:1004-1012) and without-replacement soft-filtered
negatives (kitti360:1015-1017).

Also the end-to-end PCA eval path (VERDICT r2 item 5): ``--pca_dim`` makes
``evaluate`` fit a PCA on database descriptors and reduce both sides — the
intended behaviour of the reference's dead fit path (``util.py:65-78``)
feeding ``test.py:104-107``.  Shares the module's compiled world fixture."""

import dataclasses

import jax
import numpy as np
import pytest

from agplace_tpu.config import synthetic_config
from agplace_tpu.data.base import collate_train
from agplace_tpu.data.synthetic import SyntheticDataset
from agplace_tpu.embed import batched_embed_db, batched_embed_q
from agplace_tpu.train.mining import TripletMiner
from agplace_tpu.train.step import init_state, make_infer_fns


@pytest.fixture(scope="module")
def world():
    cfg = synthetic_config(batch_size=4, image_size=32, vox_max_points=64,
                           negs=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, infer_batch_size=4))
    ds = SyntheticDataset(n_db=24, n_q=12, image_size=32, n_points=64, seed=3)
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, ds)
    batch = collate_train(ds, miner.mine_random(rng, 4), cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    embed_q, embed_db = make_infer_fns(cfg)
    return cfg, ds, state, embed_q, embed_db


def _check_rows(rows, ds, nneg):
    assert rows.shape[1] == 2 + nneg
    for q, pos, *negs in rows:
        assert pos in ds.hard_positives_per_query[q]
        soft = set(ds.soft_positives_per_query[q].tolist())
        assert not (set(int(n) for n in negs) & soft)


@pytest.mark.parametrize(
    "mode", ["random", "partial", "partial_sep", "msls_weighted", "full",
             "full_gallery"])
def test_mining_mode_matrix(world, mode):
    cfg, ds, state, embed_q, embed_db = world
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, mining=mode))
    miner = TripletMiner(cfg, ds)
    rows = miner.mine(np.random.default_rng(1), 6, params=state.params,
                      batch_stats=state.batch_stats, embed_q=embed_q,
                      embed_db=embed_db)
    _check_rows(rows, ds, cfg.train.negs_num_per_query)


def test_mine_random_picks_best_positive(world):
    """With params available, ``random`` mining must return the CLOSEST hard
    positive per query, exactly as compute_triplets_random does via its
    faiss best-positive search (kitti360:1004-1012)."""
    cfg, ds, state, embed_q, embed_db = world
    miner = TripletMiner(cfg, ds)
    rows = miner.mine_random(np.random.default_rng(5), 8, params=state.params,
                             batch_stats=state.batch_stats, embed_q=embed_q,
                             embed_db=embed_db)
    db = batched_embed_db(ds, list(range(ds.database_num)), embed_db,
                          state.params, state.batch_stats, 4)
    for q, pos, *_ in rows:
        qf = batched_embed_q(ds, [q] * 4, embed_q, state.params,
                             state.batch_stats, 4, cfg)[0]
        d = ((db - qf) ** 2).sum(-1)
        hard = ds.hard_positives_per_query[q]
        assert d[pos] == pytest.approx(d[hard].min(), rel=1e-5)


def test_mine_random_negatives_without_replacement(world):
    """Reference negatives come from np.random.choice(replace=False) then a
    soft-positive setdiff (kitti360:1015-1017): no duplicate negatives within
    a triplet (the r2 miner's rejection loop could emit duplicates)."""
    cfg, ds, state, *_ = world
    miner = TripletMiner(cfg, ds)
    rng = np.random.default_rng(11)
    rows = miner.mine_random(rng, 10)  # warm-up path (no params)
    for _, _, *negs in rows:
        assert len(set(int(n) for n in negs)) == len(negs)
    _check_rows(rows, ds, cfg.train.negs_num_per_query)


def test_evaluate_with_pca_dim(world):
    """Rank-complete PCA (dim = gallery rows, the full span of the 24-row
    fit matrix) preserves recalls; a lower pca_dim must run and return
    valid recalls; and over-rank pca_dim raises like sklearn (the
    reference's compute_pca backend) instead of silently changing the
    output dimensionality."""
    cfg, ds, state, embed_q, embed_db = world
    from agplace_tpu.evaluate import evaluate

    base, _ = evaluate(cfg, ds, state.params, state.batch_stats,
                       embed_q, embed_db)

    full_dim = ds.database_num  # the fit matrix's full rank span
    cfg_full = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, pca_dim=full_dim))
    r_full, _ = evaluate(cfg_full, ds, state.params, state.batch_stats,
                         embed_q, embed_db)
    np.testing.assert_array_equal(base, r_full)

    cfg_over = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, pca_dim=256))
    with pytest.raises(ValueError, match="PCA dim"):
        evaluate(cfg_over, ds, state.params, state.batch_stats,
                 embed_q, embed_db)

    cfg_low = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, pca_dim=8))
    r_low, _ = evaluate(cfg_low, ds, state.params, state.batch_stats,
                        embed_q, embed_db)
    assert r_low.shape == base.shape and np.isfinite(r_low).all()


def test_evaluate_prefit_pca_still_respected(world):
    """An explicitly passed PCA object wins over cfg.eval.pca_dim."""
    cfg, ds, state, embed_q, embed_db = world
    from agplace_tpu.evaluate import evaluate, extract_features
    from agplace_tpu.utils.pca import PCA

    q, db = extract_features(cfg, ds, state.params, state.batch_stats,
                             embed_q, embed_db)
    pca = PCA(16).fit(db)
    cfg_p = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, pca_dim=64))
    r, _ = evaluate(cfg_p, ds, state.params, state.batch_stats,
                    embed_q, embed_db, pca=pca)
    assert np.isfinite(r).all()


def test_mine_random_all_soft_world_avoids_pos_as_neg(world):
    """When every database row is a soft positive of the query, the filler
    negative must still differ from the positive: a (q, pos, pos) triplet
    has constant margin loss and zero gradient."""
    cfg, ds, *_ = world
    import copy

    dense = copy.copy(ds)
    all_rows = np.arange(ds.database_num)
    dense.soft_positives_per_query = [all_rows] * ds.queries_num
    miner = TripletMiner(cfg, dense)
    rows = miner.mine_random(np.random.default_rng(0), 8)
    for q, pos, *negs in rows:
        assert all(int(n) != int(pos) for n in negs), (q, pos, negs)


def test_mine_full_neg_cache_union_and_refresh(world):
    """Reference compute_triplets_full (kitti360:1036-1046): the hardest-
    negative pool is a neg_samples_num random draw minus soft positives,
    UNIONED with the query's persistent neg_cache; the selected negatives
    refresh the cache.  A planted cache entry that is the globally
    hardest negative must therefore always be selected, regardless of
    the random draw."""
    from agplace_tpu.embed import batched_embed_db, batched_embed_q

    cfg, ds, state, embed_q, embed_db = world
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, mining="full"))
    miner = TripletMiner(cfg, ds)

    db = batched_embed_db(ds, list(range(ds.database_num)), embed_db,
                          state.params, state.batch_stats, 4)
    q0 = int(miner.valid_queries[0])
    qf = batched_embed_q(ds, [q0] * 4, embed_q, state.params,
                         state.batch_stats, 4, cfg)[0]
    d = ((db - qf) ** 2).sum(-1)
    soft = set(ds.soft_positives_per_query[q0].tolist())
    hardest = min((i for i in range(ds.database_num) if i not in soft),
                  key=lambda i: d[i])
    miner.neg_cache[q0] = np.array([hardest], np.int64)

    rows = miner.mine(np.random.default_rng(2), len(miner.valid_queries),
                      params=state.params, batch_stats=state.batch_stats,
                      embed_q=embed_q, embed_db=embed_db)
    _check_rows(rows, ds, cfg.train.negs_num_per_query)
    row = next(r for r in rows if r[0] == q0)
    assert hardest in set(int(n) for n in row[2:])
    # the cache was refreshed with exactly the selected negatives
    np.testing.assert_array_equal(
        np.sort(miner.neg_cache[q0]), np.sort(np.unique(row[2:])))


def test_mine_partial_pool_overflow_repaired(world):
    """A query whose soft positives swamp the sampled negative pool used to
    receive forbidden (soft-positive) rows from top_k's big-distance
    filler slots.  The host-side repair must substitute non-soft rows
    whenever one exists (the reference crashes on this input: its ragged
    triplet tuple breaks the [N, 12] tensor, kitti360:1097)."""
    import copy

    cfg, ds, state, embed_q, embed_db = world
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, mining="partial_sep",
                                       neg_samples_num=4))
    swamped = copy.copy(ds)
    # every row but 23 is a soft positive of every query: at most one
    # legitimate negative exists, so with nneg=2 a forbidden slot always
    # wins before the repair
    swamped.soft_positives_per_query = [
        np.arange(ds.database_num - 1)] * ds.queries_num
    miner = TripletMiner(cfg, swamped)
    rows = miner.mine(np.random.default_rng(3), 6, params=state.params,
                      batch_stats=state.batch_stats, embed_q=embed_q,
                      embed_db=embed_db)
    last = ds.database_num - 1
    for q, pos, *negs in rows:
        assert last in set(int(n) for n in negs), (q, negs)
        assert all(int(n) != int(pos) for n in negs)
