"""Auxiliary subsystem tests: folder dataset (@utm@ names), viz, flops,
checkpoint round-trip, metrics writer."""

import json
import os

import numpy as np
import pytest

from agplace_tpu.config import synthetic_config
from agplace_tpu.utils.common import MetricsWriter, PhaseTimer, make_rngs


@pytest.fixture
def folder_root(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    base = tmp_path / "pitts_mini" / "images" / "train"
    for sub in ("database", "queries"):
        os.makedirs(base / sub)
    e0, n0 = 500000.0, 4000000.0
    for i in range(8):
        img = Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                           dtype=np.uint8))
        img.save(base / "database" / f"@{e0 + i * 30}@{n0}@x@.jpg")
    for i in range(4):
        img = Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                           dtype=np.uint8))
        img.save(base / "queries" / f"@{e0 + i * 30 + 3}@{n0}@x@.jpg")
    return str(tmp_path / "pitts_mini")


def test_folder_dataset(folder_root):
    from agplace_tpu.data.folder_dataset import FolderDataset, PCADataset

    cfg = synthetic_config(image_size=32)
    ds = FolderDataset(cfg, folder_root, "train")
    assert ds.database_num == 8 and ds.queries_num == 4
    # query i is 3 m from database tile i -> within 10 m hard radius
    for q in range(4):
        assert q in ds.hard_positives_per_query[q]
    img = ds.load_query_image(0)
    assert img.shape == (32, 32, 3)
    crops = ds.load_query_crops(0, 24)
    assert crops.shape == (5, 24, 24, 3)
    maps = ds.load_db_maps(0)
    assert maps.shape == (1, 32, 32, 3)

    pca_ds = PCADataset(ds, num_images=6)
    assert len(pca_ds) == 6
    assert pca_ds[0].shape == (32, 32, 3)


def test_viz_outputs(tmp_path):
    from agplace_tpu.utils.viz import viz_lidar, viz_retrievals

    rng = np.random.default_rng(1)
    pc = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    pc[450:] = np.nan
    p1 = viz_lidar([pc], out_path=str(tmp_path / "l.png"))
    assert os.path.exists(p1)
    q = rng.random((32, 32, 3))
    p2 = viz_retrievals(q, [q, q], [True, False],
                        out_path=str(tmp_path / "r.png"))
    assert os.path.exists(p2)


def test_flops_counts_matmul():
    import jax.numpy as jnp

    from agplace_tpu.utils.flops import get_flops

    f = lambda x: jnp.dot(x, x)
    assert get_flops(f, jnp.ones((32, 32))) == 2 * 32 ** 3


def test_metrics_writer_and_timer(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write({"loss": 1.5, "recalls": np.array([1.0, 2.0])})
    rec = json.loads(open(path).read().strip())
    assert rec["loss"] == 1.5 and rec["recalls"] == [1.0, 2.0]

    t = PhaseTimer()
    with t("phase_a"):
        pass
    assert "phase_a" in t.totals


def test_make_rngs_deterministic():
    a = make_rngs(0, "x", "y")
    b = make_rngs(0, "x", "y")
    assert (np.asarray(a["x"]) == np.asarray(b["x"])).all()
    assert not (np.asarray(a["x"]) == np.asarray(a["y"])).all()


def test_checkpoint_explicit_filename_precedence(tmp_path):
    """Regression: an explicit ``filename`` must win regardless of whether
    recalls is None (round-1 ternary-precedence bug, checkpoint.py)."""
    from agplace_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path))
    state = {"w": np.zeros(3, np.float32)}
    p1 = ckpt.save(state, epoch_num=3, recalls=None, best_r5=0.0,
                   not_improved_num=0, is_best=False, filename="custom_name")
    assert os.path.basename(p1) == "custom_name"
    p2 = ckpt.save(state, epoch_num=3, recalls=np.array([9.0, 1, 1, 1]),
                   best_r5=0.0, not_improved_num=0, is_best=False,
                   filename="custom2")
    assert os.path.basename(p2) == "custom2"
    p3 = ckpt.save(state, epoch_num=3, recalls=None, best_r5=0.0,
                   not_improved_num=0, is_best=False)
    assert os.path.basename(p3) == "ep@3"
    p4 = ckpt.save(state, epoch_num=3, recalls=np.array([9.0, 1, 1, 1]),
                   best_r5=0.0, not_improved_num=0, is_best=False)
    assert os.path.basename(p4) == "ep@3__r1@9"


def test_checkpoint_restore_accepts_absolute_paths(tmp_path):
    """--resume accepts an absolute path (or an existing relative path) to
    a checkpoint saved under a DIFFERENT run dir; bare names still resolve
    inside this manager's save_dir, and saves are never redirected by a
    same-named dir in the CWD (ADVICE r3)."""
    from agplace_tpu.train.checkpoint import CheckpointManager

    src = CheckpointManager(str(tmp_path / "run_a"))
    state = {"w": np.arange(3, dtype=np.float32)}
    path = src.save(state, epoch_num=1, recalls=None, best_r5=0.0,
                    not_improved_num=0, is_best=False)
    assert os.path.isabs(path)

    other = CheckpointManager(str(tmp_path / "run_b"))
    got, meta = other.restore(path, {"w": np.zeros(3, np.float32)})
    np.testing.assert_array_equal(got["w"], state["w"])
    assert meta["epoch_num"] == 1
    # bare name: resolves in the OWN save_dir (and run_b has none)
    got2, _ = src.restore("ep@1", {"w": np.zeros(3, np.float32)})
    np.testing.assert_array_equal(got2["w"], state["w"])
    with pytest.raises(Exception):
        other.restore("ep@1", {"w": np.zeros(3, np.float32)})


def test_folder_test_methods_single_query_central_crop(tmp_path):
    """datasets_ws.py:444-462 parity: central_crop = ratio-preserving
    biggest central crop; single_query = original resolution at batch 1
    through the full evaluate() path."""
    import dataclasses

    from PIL import Image

    from agplace_tpu.data.folder_dataset import FolderDataset

    rng = np.random.default_rng(3)
    base = tmp_path / "mini" / "images" / "test"
    for sub in ("database", "queries"):
        os.makedirs(base / sub)
    e0, n0 = 500000.0, 4000000.0
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(base / "database" / f"@{e0 + 30*i}@{n0}@.jpg")
    # rectangular queries (40x80) so the crop paths differ from hard_resize
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 80, 3), dtype=np.uint8)
                        ).save(base / "queries" / f"@{e0 + 30*i + 3}@{n0}@.jpg")

    cfg = synthetic_config(image_size=32)
    root = str(tmp_path / "mini")

    cfg_cc = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, test_method="central_crop"))
    ds = FolderDataset(cfg_cc, root, "test")
    img = ds.load_query_image(0)
    assert img.shape == (32, 32, 3)  # ratio-preserving central crop

    cfg_sq = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, test_method="single_query"))
    ds_sq = FolderDataset(cfg_sq, root, "test")
    img = ds_sq.load_query_image(0)
    assert img.shape == (40, 80, 3)  # original resolution

    # full evaluate() at batch 1 with ragged queries
    import jax

    from agplace_tpu.evaluate import evaluate
    from agplace_tpu.models.factory import make_db_model, make_query_model
    from agplace_tpu.train.step import init_state, make_infer_fns
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.data.synthetic import SyntheticDataset
    from agplace_tpu.train.mining import TripletMiner

    sds = SyntheticDataset(n_db=4, n_q=2, image_size=32, n_points=64, seed=0)
    rng2 = np.random.default_rng(0)
    batch = collate_train(sds, TripletMiner(cfg_sq, sds).mine_random(rng2, 2),
                          cfg_sq, rng2)
    state = init_state(cfg_sq, jax.random.PRNGKey(0), batch)
    embed_q, embed_db = make_infer_fns(cfg_sq)
    recalls, _ = evaluate(cfg_sq, ds_sq, state.params, state.batch_stats,
                          embed_q, embed_db)
    assert recalls.shape == (4,) and np.isfinite(recalls).all()


def test_single_query_compile_storm_is_capped():
    """Ragged single_query eval compiles at most eval.max_query_shapes
    distinct query shapes (VERDICT r3 item 7): the first ``cap`` shapes
    embed exactly, later new shapes hard-resize into a compiled bucket —
    asserted by counting the distinct image shapes the embed fn sees
    (each distinct shape = one XLA compile)."""
    import dataclasses

    from agplace_tpu.config import synthetic_config
    from agplace_tpu.evaluate import extract_features

    cap = 3
    cfg = synthetic_config(image_size=32)
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, test_method="single_query",
                                      max_query_shapes=cap))

    rng = np.random.default_rng(0)
    q_shapes = [(32, 32), (40, 32), (32, 48), (44, 44), (52, 36), (60, 60),
                (32, 32), (44, 44)]  # 6 distinct, cap 3

    class RaggedDS:
        queries_num = len(q_shapes)
        database_num = 2

        def load_query_image(self, i):
            h, w = q_shapes[i]
            return rng.random((h, w, 3)).astype(np.float32)

        def load_query_points(self, i):
            return rng.uniform(-20, 20, (64, 3)).astype(np.float32)

        def load_db_maps(self, i):
            return rng.random((1, 32, 32, 3)).astype(np.float32)

    seen_q_shapes = set()

    def fake_embed_q(params, batch_stats, images, vox):
        seen_q_shapes.add(tuple(images.shape))
        return np.zeros((images.shape[0], 8), np.float32)

    def fake_embed_db(params, batch_stats, maps):
        return np.zeros((maps.shape[0], 8), np.float32)

    q_feats, db_feats = extract_features(
        cfg, RaggedDS(), {}, {}, fake_embed_q, fake_embed_db)
    assert q_feats.shape == (len(q_shapes), 8)
    assert db_feats.shape == (2, 8)
    assert len(seen_q_shapes) <= cap, seen_q_shapes
    # the capped shapes are exactly the first `cap` distinct ones (exact
    # embedding for them; the tail resized into these buckets)
    assert seen_q_shapes == {(1, 32, 32, 3), (1, 40, 32, 3), (1, 32, 48, 3)}


def test_dvglb_query_augmentations(folder_root):
    """The reference's parse-only torchvision aug flags (tools/options.py:
    230-233; transforms commented out at datasets_ws.py:516-519) now have
    functional equivalents: each op preserves shape/range, is deterministic
    under a seeded rng, and is identity at zero settings; FolderDataset
    applies the stack to TRAIN queries only."""
    import dataclasses

    from agplace_tpu.config import parse_arguments, synthetic_config
    from agplace_tpu.data.folder_dataset import FolderDataset
    from agplace_tpu.data.transforms import (
        random_horizontal_flip,
        random_perspective,
        random_query_augment,
        random_resized_crop,
        random_rotation,
    )

    rng = np.random.default_rng(0)
    img = rng.random((40, 48, 3)).astype(np.float32)

    # determinism + shape + range per op
    for fn, args in [
        (random_horizontal_flip, ()),
        (random_rotation, (20.0,)),
        (random_resized_crop, (0.6,)),
        (random_perspective, (0.4,)),
    ]:
        a = fn(img, *args, np.random.default_rng(7)) if args else \
            fn(img, np.random.default_rng(7))
        b = fn(img, *args, np.random.default_rng(7)) if args else \
            fn(img, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)
        assert a.shape == img.shape and a.dtype == np.float32
        assert a.min() >= 0.0 and a.max() <= 1.0

    # identity at zero settings
    cfg0 = synthetic_config().data
    np.testing.assert_array_equal(
        random_query_augment(img, cfg0, np.random.default_rng(1)), img)

    # flags parse into DataConfig
    cfg = parse_arguments([
        "--dataset", "synthetic", "--horizontal_flip", "true",
        "--rand_perspective", "0.3", "--random_resized_crop", "0.2",
        "--random_rotation", "15",
    ])
    assert cfg.data.horizontal_flip is True
    assert cfg.data.rand_perspective == 0.3
    assert cfg.data.random_resized_crop == 0.2
    assert cfg.data.random_rotation == 15.0

    # FolderDataset: train queries augmented (stochastic across calls),
    # database and test split untouched
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, q_resize=32, db_resize=32, db_cropsize=32))
    ds = FolderDataset(cfg, folder_root, "train")
    q1 = ds.load_query_image(0)
    q2 = ds.load_query_image(0)
    assert q1.shape == q2.shape == (32, 32, 3)
    assert not np.array_equal(q1, q2)  # random aug applied per call
    d1 = ds.load_db_maps(0)
    d2 = ds.load_db_maps(0)
    np.testing.assert_array_equal(d1, d2)  # database never augmented
