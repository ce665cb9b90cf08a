"""Round-2 flag wirings: share_qdb, CRN LR groups, freeze_te, per-component
colour jitter — each mapped to its reference behaviour."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agplace_tpu.config import parse_arguments, synthetic_config


def _geoloc_cfg(**model_kw):
    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64,
                           negs=2)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, modelq="geoloc",
                                       pretrained=False, **model_kw))


def _batch(cfg, seed=0):
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner

    ds = SyntheticDataset(n_db=8, n_q=4, image_size=32, n_points=64,
                          seed=seed)
    rng = np.random.default_rng(seed)
    return ds, collate_train(ds, TripletMiner(cfg, ds).mine_random(rng, 2),
                             cfg, rng)


def test_share_qdb_trains_and_embeds_with_query_tower():
    """--share_qdb (train.py:193-196): the query tower embeds aerial maps;
    no db params exist; training still steps."""
    from agplace_tpu.train.step import (
        init_state,
        make_infer_fns,
        make_train_step,
    )

    cfg = _geoloc_cfg(share_qdb=True)
    ds, batch = _batch(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    assert state.params["db"] == {}

    step = make_train_step(cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    # embed_db == query tower applied per map then L2+mean
    embed_q, embed_db = make_infer_fns(cfg)
    maps = np.asarray(batch["db_map"][:, 0])  # [B, NMAP, H, W, 3]
    out = np.asarray(embed_db(state.params, state.batch_stats, maps))
    from agplace_tpu.models.factory import make_query_model

    q = make_query_model(cfg, train=False)
    flat = maps.reshape(-1, *maps.shape[2:])
    emb = np.asarray(q.apply(
        {"params": state.params["mm"],
         "batch_stats": state.batch_stats["mm"]}, jnp.asarray(flat)))
    emb = emb / np.maximum(
        np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    want = emb.reshape(maps.shape[0], maps.shape[1], -1).mean(axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_share_qdb_rejects_mm():
    """The reference MM crashes on mode='db' (mm.py:165-170); we raise a
    clear error instead of silently misbehaving."""
    from agplace_tpu.train.step import init_state, make_train_step

    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64,
                           negs=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, share_qdb=True,
                                       pretrained=False))
    ds, batch = _batch(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    with pytest.raises(NotImplementedError):
        make_train_step(cfg)(state, batch)


def test_crn_lr_groups():
    """--aggregation crn: CRN params update at lr_crn_layer, the rest of
    that tower at lr_crn_net (train.py:200-210)."""
    from agplace_tpu.train.optim import label_params

    cfg = _geoloc_cfg(aggregation="crn", netvlad_clusters=4)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       db=dataclasses.replace(
                                           cfg.model.db, modeldb="geoloc")))
    from agplace_tpu.train.step import init_state

    ds, batch = _batch(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    labels = label_params(state.params, crn=True)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    crn_labels = {lbl for path, lbl in flat if "crn" in str(path)}
    assert crn_labels == {"crn_layer"}
    other = {lbl for path, lbl in flat if "crn" not in str(path)}
    assert "crn_layer" not in other


def test_freeze_te_zeroes_low_layers():
    """--freeze_te N: backbone encoder layers <= N (and the stem) get zero
    updates (model/network.py:160-183)."""
    import optax

    from agplace_tpu.train.optim import label_params, make_optimizer

    cfg = _geoloc_cfg(backbone="vit", aggregation="cls", freeze_te=1)
    from agplace_tpu.models.factory import make_query_model

    q = make_query_model(cfg)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = q.init(jax.random.PRNGKey(0), img)
    params = {"mm": v["params"], "db": {}}
    labels = label_params(params, freeze_te=1)
    flat = {str(p): l for p, l in
            jax.tree_util.tree_leaves_with_path(labels)}
    frozen = [p for p, l in flat.items() if l == "frozen"]
    live = [p for p, l in flat.items() if l != "frozen"]
    assert any("attn_0" in p for p in frozen)
    assert any("attn_1" in p for p in frozen)
    assert any("attn_2" in p for p in live)
    assert any("embed" in p for p in frozen)  # non-indexed stem frozen

    # frozen params receive exactly zero updates through the optimizer
    tx = make_optimizer(cfg.train, freeze_te=1)
    ostate = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, ostate, params)
    upd = {str(p): np.asarray(u) for p, u in
           jax.tree_util.tree_leaves_with_path(updates)}
    for p in frozen:
        assert (upd[p] == 0).all(), p
    assert any((abs(upd[p]) > 0).any() for p in live)


def test_per_component_jitter():
    from agplace_tpu.data.transforms import color_jitter

    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    # hue-only jitter preserves per-pixel luminance better than full jitter
    out = color_jitter(img, 0.0, np.random.default_rng(1),
                       brightness=0.0, contrast=0.0, saturation=0.0,
                       hue_strength=0.4)
    assert not np.allclose(out, img)
    # zero everywhere = identity
    same = color_jitter(img, 0.0, np.random.default_rng(1))
    np.testing.assert_array_equal(same, img)
    # brightness-only scales all channels by one factor
    b = color_jitter(img, 0.0, np.random.default_rng(2), brightness=0.5,
                     contrast=0.0, saturation=0.0, hue_strength=0.0)
    ratio = b[img > 0.01] / img[img > 0.01]
    assert np.allclose(ratio, ratio.ravel()[0], atol=0.2)


def test_new_flags_parse():
    cfg = parse_arguments([
        "--brightness", "0.3", "--hue", "0.1",
        "--sdeint_method", "euler_maruyama", "--sdeint_size", "0.05",
        "--trunc_te", "4", "--freeze_te", "2", "--share_qdb", "true",
        "--lr_crn_layer", "1e-3", "--mm_voxfe_block", "convnext",
    ])
    assert cfg.data.brightness == 0.3 and cfg.data.hue == 0.1
    assert cfg.model.mm.ode.sdeint_size == 0.05
    assert cfg.model.trunc_te == 4 and cfg.model.freeze_te == 2
    assert cfg.model.share_qdb is True
    assert cfg.train.lr_crn_layer == 1e-3
    assert cfg.model.mm.voxfe_block == "convnext"


def test_share_qdb_bn_stats_see_both_passes():
    """With one shared tower, BN running stats must advance through BOTH
    forwards sequentially (query EMA step, then aerial EMA step) like a
    single torch model would — the query pass's contribution must not be
    discarded (r3 review fix)."""
    from agplace_tpu.models.factory import query_apply, shared_db_apply
    from agplace_tpu.models.factory import make_query_model
    from agplace_tpu.train.step import init_state, make_train_step

    cfg = _geoloc_cfg(share_qdb=True)
    ds, batch = _batch(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    mm = make_query_model(cfg, train=True)

    # oracle FIRST (make_train_step donates the state's buffers): apply
    # the two passes sequentially by hand from the initial stats
    params0 = jax.tree_util.tree_map(np.asarray, state.params["mm"])
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats["mm"])
    _, mut_q = query_apply(
        "geoloc", mm, {"params": params0, "batch_stats": stats0},
        batch["query_image"], batch["vox"], mutable=True)
    _, mut_db = shared_db_apply(
        "geoloc", mm,
        {"params": params0, "batch_stats": mut_q["batch_stats"]},
        batch["db_map"], mutable=True)
    want = mut_db["batch_stats"]
    _, mut_db_only = shared_db_apply(
        "geoloc", mm, {"params": params0, "batch_stats": stats0},
        batch["db_map"], mutable=True)

    step = make_train_step(cfg)
    new_state, _ = step(state, batch)

    got = new_state.batch_stats["mm"]
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_w) == len(flat_g) > 0
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pw))

    # and the query contribution is really in there: aerial-only stats
    # from the initial state differ from the composed ones
    leaves_only = jax.tree_util.tree_leaves(mut_db_only["batch_stats"])
    leaves_got = jax.tree_util.tree_leaves(got)
    assert any(not np.allclose(np.asarray(a), np.asarray(b), atol=1e-7)
               for a, b in zip(leaves_only, leaves_got))
