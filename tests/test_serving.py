"""Serving index: checkpoint load -> gallery build -> query search, with
ragged request batches and faiss-parity tiny-gallery padding."""

import dataclasses

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from agplace_tpu.config import MeshConfig, synthetic_config
from agplace_tpu.data.synthetic import SyntheticDataset
from agplace_tpu.serving import PlaceIndex


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One short training run -> checkpoint on disk."""
    from agplace_tpu.data.base import collate_train
    from agplace_tpu.train.checkpoint import CheckpointManager
    from agplace_tpu.train.mining import TripletMiner
    from agplace_tpu.train.step import init_state, make_train_step

    tmp = tmp_path_factory.mktemp("serve")
    cfg = synthetic_config(batch_size=2, image_size=32, vox_max_points=64,
                           negs=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, save_dir=str(tmp),
                                       infer_batch_size=4))
    ds = SyntheticDataset(n_db=12, n_q=8, image_size=32, n_points=64, seed=0)
    rng = np.random.default_rng(0)
    batch = collate_train(ds, TripletMiner(cfg, ds).mine_random(rng, 2),
                          cfg, rng)
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    state, _ = make_train_step(cfg)(state, batch)
    CheckpointManager(str(tmp)).save(state, 0, np.array([1.0, 2, 3, 4]),
                                     best_r5=2.0, not_improved_num=0,
                                     is_best=True)
    return cfg, str(tmp), ds


def test_index_from_checkpoint_end_to_end(trained):
    cfg, save_dir, ds = trained
    idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    assert idx.add_tiles(ds) == ds.database_num

    # ragged request (5 queries, batch 4): a query near tile 0 must retrieve
    # its own tile first — the synthetic world shares content signatures
    imgs = np.stack([ds.load_query_image(i) for i in range(5)])
    pts = np.stack([ds.load_query_points(i) for i in range(5)])
    d, i = idx.search(imgs, pts, k=3)
    assert d.shape == (5, 3) and i.shape == (5, 3)
    assert np.isfinite(d).all()
    # distances sorted ascending per row
    assert (np.diff(d, axis=1) >= -1e-6).all()

    # embedding equals the eval-path extractor
    from agplace_tpu.embed import batched_embed_q

    want = batched_embed_q(ds, list(range(5)), idx._embed_q, idx.params,
                           idx.batch_stats, 4, cfg)
    got = idx.embed(imgs, pts)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_index_small_gallery_faiss_padding(trained):
    cfg, save_dir, ds = trained
    idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx.add_descriptors(np.random.default_rng(0).standard_normal(
        (2, cfg.model.features_dim)).astype(np.float32))
    imgs = np.stack([ds.load_query_image(i) for i in range(2)])
    d, i = idx.search(imgs, None, k=5)
    assert (i[:, 2:] == -1).all()
    assert np.isinf(d[:, 2:]).all()


def test_index_sharded_gallery(trained):
    from agplace_tpu.parallel.mesh import make_mesh

    cfg, save_dir, ds = trained
    gmesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=2),
                      devices=jax.devices()[:2])
    idx1 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx2 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model",
                                      gallery_mesh=gmesh)
    idx1.add_tiles(ds)
    idx2.add_tiles(ds)
    q = np.random.default_rng(1).standard_normal(
        (3, cfg.model.features_dim)).astype(np.float32)
    d1, i1 = idx1.search_descriptors(q, k=4)
    d2, i2 = idx2.search_descriptors(q, k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)


def test_index_gallery_stays_device_resident(trained):
    """Repeated searches must not re-upload the gallery (VERDICT r2 #6):
    exactly one host->device build per gallery mutation, in both the
    single-device and the sharded configuration."""
    from agplace_tpu.parallel.mesh import make_mesh

    cfg, save_dir, ds = trained
    gmesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=2),
                      devices=jax.devices()[:2])
    for mesh in (None, gmesh):
        idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model",
                                         gallery_mesh=mesh)
        idx.add_tiles(ds)
        q = np.random.default_rng(2).standard_normal(
            (3, cfg.model.features_dim)).astype(np.float32)
        d1, i1 = idx.search_descriptors(q, k=4)
        gal_ref = idx._gallery
        for _ in range(3):
            d2, i2 = idx.search_descriptors(q, k=4)
            np.testing.assert_array_equal(i1, i2)
        assert idx.upload_count == 1
        assert idx._gallery is gal_ref  # same device buffer, not rebuilt

        # a mutation triggers exactly one rebuild on the NEXT search
        idx.add_descriptors(np.random.default_rng(3).standard_normal(
            (2, cfg.model.features_dim)).astype(np.float32))
        assert idx.upload_count == 1  # lazy: no upload at add time
        idx.search_descriptors(q, k=4)
        assert idx.upload_count == 2
        assert len(idx) == ds.database_num + 2


def test_index_int8_matches_fp32(trained):
    """quant='int8' returns the same neighbours and exact fp32 distances
    as the full-precision path (device int8 candidate scan + host exact
    re-rank), keeps the device gallery resident across searches, and
    honours the faiss k > ntotal padding."""
    cfg, save_dir, ds = trained
    idx32 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx8 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model",
                                      quant="int8")
    idx32.add_tiles(ds)
    idx8.add_tiles(ds)
    q = np.random.default_rng(5).standard_normal(
        (6, cfg.model.features_dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d32, i32 = idx32.search_descriptors(q, k=4)
    d8, i8 = idx8.search_descriptors(q, k=4)
    np.testing.assert_array_equal(i32, i8)
    np.testing.assert_allclose(d32, d8, rtol=1e-4, atol=1e-5)

    # device-resident across repeated searches
    for _ in range(3):
        idx8.search_descriptors(q, k=4)
    assert idx8.upload_count == 1

    # k > ntotal: +inf / -1 padding like faiss (and the fp32 path)
    n = len(idx8)
    d, i = idx8.search_descriptors(q, k=n + 3)
    assert (i[:, n:] == -1).all() and np.isinf(d[:, n:]).all()
    np.testing.assert_array_equal(i[:, :4], i8)


def test_index_int8_audit_mode(trained, caplog, monkeypatch):
    """audit_rate samples int8 searches against an exact host fp32 top-k
    (VERDICT r3 item 8): clean searches audit clean; a corrupted candidate
    scan is caught, counted in audit_stats, and logged."""
    import logging

    cfg, save_dir, ds = trained
    idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model",
                                     quant="int8", audit_rate=0.5)
    idx.add_tiles(ds)
    q = np.random.default_rng(7).standard_normal(
        (5, cfg.model.features_dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    for _ in range(4):  # stride 2 -> audits searches 1 and 3
        idx.search_descriptors(q, k=3)
    assert idx.audit_stats["searches"] == 4
    assert idx.audit_stats["audited"] == 2
    assert idx.audit_stats["missed_rows"] == 0  # int8 parity holds here

    # corrupt the candidate scan: always return the WORST rows -> the true
    # top-k cannot be in the re-rank set, the audit must fire
    def bad_search(qq, k):
        d, i = PlaceIndex._search_int8(idx, qq, k)
        n = idx._n_rows
        host = idx._host_gallery()
        d2 = (np.einsum("qc,qc->q", qq, qq)[:, None]
              + np.einsum("nc,nc->n", host, host)[None] - 2.0 * qq @ host.T)
        worst = np.argsort(-d2, axis=1)[:, :k]
        wd = np.take_along_axis(d2, worst, axis=1).astype(np.float32)
        return wd, worst.astype(np.int64)

    monkeypatch.setattr(idx, "_search_impl", bad_search)
    with caplog.at_level(logging.WARNING):
        idx.search_descriptors(q, k=3)  # search 5: stride hits it
    assert idx.audit_stats["audited"] == 3
    assert idx.audit_stats["miss_queries"] == 5
    assert idx.audit_stats["missed_rows"] > 0
    assert any("int8 audit" in r.message for r in caplog.records)

    # rate validation
    with pytest.raises(ValueError):
        PlaceIndex(cfg, None, None, quant="int8", audit_rate=1.5)


def test_gallery_persistence_and_model_free_search(trained, tmp_path):
    """save_gallery -> from_gallery round trip: a search-only index (no
    checkpoint, no towers) returns identical results, carries the tiles'
    UTM positions through locate_descriptors, and refuses to embed."""
    cfg, save_dir, ds = trained
    idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx.add_tiles(ds)
    path = str(tmp_path / "gallery.npz")
    idx.save_gallery(path)

    srv = PlaceIndex.from_gallery(path)
    assert len(srv) == len(idx) == ds.database_num
    q = np.random.default_rng(11).standard_normal(
        (4, cfg.model.features_dim)).astype(np.float32)
    d1, i1 = idx.search_descriptors(q, k=3)
    d2, i2, pos = srv.locate_descriptors(q, k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)
    # positions are the dataset's own tile east/north, row-for-row
    np.testing.assert_allclose(pos, ds.db_eastnorth[i2], atol=0)
    with pytest.raises(AssertionError, match="search-only"):
        srv.embed(np.zeros((1, 32, 32, 3), np.float32))

    # k > ntotal: -1 indices map to NaN positions
    _, i3, pos3 = srv.locate_descriptors(q, k=len(srv) + 2)
    assert (i3[:, -2:] == -1).all() and np.isnan(pos3[:, -2:]).all()

    # load_gallery appends (second copy doubles the rows); int8 works
    # model-free too and agrees with fp32 on the doubled gallery
    srv.load_gallery(path)
    assert len(srv) == 2 * ds.database_num
    srv8 = PlaceIndex.from_gallery(path, quant="int8")
    srv8.load_gallery(path)
    d4, i4 = srv.search_descriptors(q, k=3)
    d5, i5 = srv8.search_descriptors(q, k=3)
    np.testing.assert_allclose(d4, d5, rtol=1e-4, atol=1e-5)


def test_descriptors_without_positions_block_locate(trained):
    cfg, save_dir, ds = trained
    idx = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx.add_tiles(ds)  # with positions
    idx.add_descriptors(np.zeros((2, cfg.model.features_dim), np.float32))
    assert idx.positions is None
    q = np.random.default_rng(1).standard_normal(
        (2, cfg.model.features_dim)).astype(np.float32)
    with pytest.raises(AssertionError, match="positions"):
        idx.locate_descriptors(q, k=2)


def test_index_int8_sharded_matches_fp32(trained):
    """quant='int8' with a 2-way gallery mesh: the sharded int8 candidate
    scan + host re-rank returns the same results as the unsharded fp32
    index."""
    from agplace_tpu.parallel.mesh import make_mesh

    cfg, save_dir, ds = trained
    gmesh = make_mesh(MeshConfig(data_parallel=1, gallery_parallel=2),
                      devices=jax.devices()[:2])
    idx32 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model")
    idx8 = PlaceIndex.from_checkpoint(cfg, save_dir, "best_model",
                                      gallery_mesh=gmesh, quant="int8")
    idx32.add_tiles(ds)
    idx8.add_tiles(ds)
    q = np.random.default_rng(9).standard_normal(
        (6, cfg.model.features_dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    d32, i32 = idx32.search_descriptors(q, k=4)
    d8, i8 = idx8.search_descriptors(q, k=4)
    np.testing.assert_array_equal(i32, i8)
    np.testing.assert_allclose(d32, d8, rtol=1e-4, atol=1e-5)
    for _ in range(2):
        idx8.search_descriptors(q, k=4)
    assert idx8.upload_count == 1
