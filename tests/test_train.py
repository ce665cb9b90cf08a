"""Training-subsystem tests: loss parity with torch, optimizer param groups,
one jitted train step reduces loss, and the full synthetic end-to-end loop —
training improves recall (the SURVEY.md §4 integration test)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from agplace_tpu.config import synthetic_config
from agplace_tpu.data.base import collate_train
from agplace_tpu.data.synthetic import SyntheticDataset
from agplace_tpu.train.losses import (
    compute_bcemat,
    compute_other_loss,
    compute_triplet_loss,
    sare_ind,
    triplet_margin_loss,
)
from agplace_tpu.train.mining import TripletMiner
from agplace_tpu.train.optim import label_params
from agplace_tpu.train.step import init_state, make_infer_fns, make_train_step


def _small_cfg(**kw):
    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=128,
                           negs=2)
    return cfg


@pytest.fixture(scope="module")
def world():
    cfg = _small_cfg()
    train_ds = SyntheticDataset(n_db=24, n_q=16, image_size=32, seed=0)
    test_ds = SyntheticDataset(n_db=24, n_q=12, image_size=32, seed=1)
    return cfg, train_ds, test_ds


def test_triplet_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 16)).astype(np.float32)
    p = rng.standard_normal((8, 16)).astype(np.float32)
    n = rng.standard_normal((8, 16)).astype(np.float32)
    ours = float(triplet_margin_loss(jnp.asarray(a), jnp.asarray(p),
                                     jnp.asarray(n), margin=0.1))
    theirs = float(torch.nn.TripletMarginLoss(margin=0.1, p=2,
                                              reduction="sum")(
        torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)))
    assert abs(ours - theirs) < 1e-3


def test_sare_ind_matches_reference_formula():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 8)).astype(np.float32)
    p = rng.standard_normal((1, 8)).astype(np.float32)
    n = rng.standard_normal((1, 8)).astype(np.float32)
    got = float(sare_ind(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)))
    dp = ((q - p) ** 2).sum()
    dn = ((q - n) ** 2).sum()
    import scipy.special

    ref = -(-dp - scipy.special.logsumexp([-dp, -dn]))
    assert abs(got - ref) < 1e-4


def test_bcemat_thresholds():
    d = jnp.asarray([[5.0, 15.0, 30.0]])
    m = np.asarray(compute_bcemat(d, 10, 25))
    np.testing.assert_array_equal(m, [[0.0, -1.0, 1.0]])


def test_param_group_labels(world):
    cfg, train_ds, _ = world
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, train_ds)
    batch = collate_train(train_ds, miner.mine_random(rng, 2), cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    labels = label_params(state.params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {}
    for path, lab in flat:
        keys = [getattr(p, "key", None) for p in path]
        seen.setdefault(lab, set()).add(tuple(keys[:2]))
    assert ("db",) in {k[:1] for k in seen["db"]}
    assert all(k[1] in ("vox_fe", "vox_pool") for k in seen["pc"])
    assert ("mm", "image_fe") in seen["base"]


@pytest.mark.slow
def test_train_step_decreases_loss(world):
    cfg, train_ds, _ = world
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, train_ds)
    rows = miner.mine_random(rng, cfg.train.train_batch_size)
    batch = collate_train(train_ds, rows, cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    # same batch repeatedly: loss must go down
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert int(state.step) == 6


def test_mining_partial_sep_excludes_soft_positives(world):
    cfg, train_ds, _ = world
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, train_ds)
    batch = collate_train(train_ds, miner.mine_random(rng, 2), cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    embed_q, embed_db = make_infer_fns(cfg)
    triplets = miner.mine_partial_sep(
        rng, 8, state.params, state.batch_stats, embed_q, embed_db)
    assert triplets.shape == (8, 2 + cfg.train.negs_num_per_query)
    for row in triplets:
        q, pos, negs = row[0], row[1], row[2:]
        assert pos in train_ds.hard_positives_per_query[q]
        soft = set(train_ds.soft_positives_per_query[q].tolist())
        assert not (set(negs.tolist()) & soft)


def test_other_loss_runs(world):
    cfg, train_ds, _ = world
    rng = np.random.default_rng(0)
    b, ndb, c = 2, 3, 16
    feats_ground = {
        "embedding": jnp.asarray(rng.standard_normal((b, c)), jnp.float32),
        "imagevec_org": jnp.asarray(rng.standard_normal((b, c)), jnp.float32),
        "voxvec_org": jnp.asarray(rng.standard_normal((b, c)), jnp.float32),
    }
    aerial = jnp.asarray(rng.standard_normal((b, ndb, c)), jnp.float32)
    q_en = jnp.asarray(rng.uniform(0, 100, (b, 2)), jnp.float32)
    db_en = jnp.asarray(rng.uniform(0, 100, (b, ndb, 2)), jnp.float32)
    loss = compute_other_loss(feats_ground, aerial, q_en, db_en,
                              cfg.train.loss)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_end_to_end_training_improves_recall(world):
    """The integration test: tiny synthetic dataset, a few mined-training
    steps, recall@5 after > recall of the untrained model (or already
    perfect)."""
    from agplace_tpu.evaluate import evaluate
    from agplace_tpu.train.loop import train

    cfg, train_ds, test_ds = world
    # LRs raised from the reference 1e-5 so ~48 steps actually learn, and BN
    # running stats (momentum .9) converge before the final eval.
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs_num=7,
                                       queries_per_epoch=16,
                                       cache_refresh_rate=8,
                                       lr=1e-3, lrpc=1e-3, lrdb=1e-3,
                                       save_dir="/tmp/agp_test_e2e"))
    rng = np.random.default_rng(0)
    miner = TripletMiner(cfg, train_ds)
    batch = collate_train(train_ds, miner.mine_random(rng, 2), cfg, rng)
    state0 = init_state(cfg, jax.random.PRNGKey(0), batch)
    embed_q, embed_db = make_infer_fns(cfg)
    r0, _ = evaluate(cfg, test_ds, state0.params, state0.batch_stats,
                     embed_q, embed_db)

    out = train(cfg, train_ds, test_ds, state=state0)
    best_r5 = max(h["recalls"][1] for h in out["history"])
    # training must reach at least the untrained recall, and losses must drop
    assert best_r5 >= r0[1] or r0[1] == 100.0
    losses = [h["loss"] for h in out["history"]]
    assert losses[-1] < losses[0]
    assert len(out["history"]) == 7
