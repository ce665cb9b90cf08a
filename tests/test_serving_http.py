"""HTTP serving front-end (`agplace_tpu.serving_http`): JSON search/add
against an in-process server over a model-free descriptor index."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from agplace_tpu.serving import PlaceIndex
from agplace_tpu.serving_http import make_http_server


def _req(base, path, payload=None):
    if payload is None:
        r = urllib.request.urlopen(base + path, timeout=30)
    else:
        r = urllib.request.urlopen(urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}), timeout=30)
    return r.status, json.loads(r.read())


@pytest.fixture()
def server():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 32)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    pos = rng.uniform(0, 1000, (50, 2))
    idx = PlaceIndex(None, None, None)
    idx.add_descriptors(feats, positions=pos)
    srv = make_http_server(idx)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    try:
        yield f"http://{host}:{port}", idx, feats, pos
    finally:
        srv.shutdown()
        srv.server_close()


def test_healthz(server):
    base, idx, *_ = server
    code, body = _req(base, "/healthz")
    assert code == 200
    assert body == {"ok": True, "rows": 50, "quant": None,
                    "positions": True}


def test_search_matches_local_index(server):
    base, idx, feats, pos = server
    q = feats[:3] + 1e-3  # near-duplicates of rows 0..2
    code, body = _req(base, "/search", {"descriptors": q.tolist(), "k": 4})
    assert code == 200
    d_ref, i_ref, p_ref = idx.locate_descriptors(q, k=4)
    assert body["indices"] == i_ref.astype(int).tolist()
    assert [r[0] for r in body["indices"]] == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(body["sq_distances"]), d_ref,
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(body["east_north"]), p_ref)


def test_add_then_search_and_padding(server):
    base, idx, feats, pos = server
    new = feats[7:8] * 0.999
    code, body = _req(base, "/add", {"descriptors": new.tolist(),
                                     "positions": [[1.0, 2.0]]})
    assert code == 200 and body == {"rows": 51}
    code, body = _req(base, "/search",
                      {"descriptors": new.tolist(), "k": 2})
    assert body["indices"][0][0] == 50  # the freshly added row wins
    # k > rows: -1 indices, null distances and positions over the wire
    code, body = _req(base, "/search",
                      {"descriptors": new.tolist(), "k": 53})
    assert code == 200
    assert body["indices"][0][-2:] == [-1, -1]
    assert body["sq_distances"][0][-2:] == [None, None]
    assert body["east_north"][0][-1] == [None, None]


def test_bad_requests(server):
    base, *_ = server
    for path, payload in [
        ("/search", {"descriptors": "nope"}),
        ("/search", {"descriptors": [[1.0, float("nan")]]}),
        ("/search", {"k": 3}),
        ("/search", {"descriptors": [[1.0, 2.0]], "k": 1}),  # wrong dim
        ("/search", {"descriptors": [[1.0] * 32], "k": "five"}),
        ("/search", {"descriptors": [[1.0] * 32], "k": 10 ** 12}),
        ("/add", {"descriptors": [[1.0, 2.0]],
                  "positions": [[1.0]]}),  # shape mismatch
        ("/add", {"descriptors": [[1.0, 2.0]]}),  # dim != gallery dim
        ("/add", {"descriptors": [[1.0] * 32],
                  "positions": [[1.0], [2.0, 3.0]]}),  # ragged positions
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, path, payload)
        assert e.value.code == 400, path
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/nope")
    assert e.value.code == 404


def test_sharded_search_client_matches_flat_index():
    """ShardedSearchClient over two searcher nodes (each one row-range of
    the gallery) returns exactly the flat index's global results —
    distances, global indices, positions, and k>rows faiss padding."""
    from agplace_tpu.serving_http import ShardedSearchClient

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((60, 32)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    pos = rng.uniform(0, 1000, (60, 2))
    flat = PlaceIndex(None, None, None)
    flat.add_descriptors(feats, positions=pos)

    servers, urls, shards = [], [], []
    # two populated nodes (deliberately uneven) plus one still-empty node
    # awaiting its gallery — the client must skip it, not fail
    for lo, hi in [(0, 25), (25, 60), (60, 60)]:
        shard = PlaceIndex(None, None, None)
        if hi > lo:
            shard.add_descriptors(feats[lo:hi], positions=pos[lo:hi])
        srv = make_http_server(shard)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        shards.append(shard)
        urls.append("http://%s:%d" % srv.server_address)
    try:
        client = ShardedSearchClient(urls)
        assert len(client) == 60
        q = rng.standard_normal((5, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        d_ref, i_ref, p_ref = flat.locate_descriptors(q, k=7)
        d, i, p = client.search(q, k=7)
        np.testing.assert_array_equal(i, i_ref)
        np.testing.assert_allclose(d, d_ref, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(p, p_ref)
        # k beyond one shard's rows but below the global count
        d, i, _ = client.search(q, k=30)
        d_ref, i_ref = flat.search_descriptors(q, k=30)
        np.testing.assert_array_equal(i, i_ref)
        # k > global rows: +inf / -1 / NaN tail
        d, i, p = client.search(q, k=63)
        assert (i[:, 60:] == -1).all() and np.isinf(d[:, 60:]).all()
        assert np.isnan(p[:, 60:]).all()
        np.testing.assert_array_equal(i[:, :30], i_ref)

        # an /add to the FIRST node between searches shifts every later
        # node's global offsets — the per-search refresh must track it
        extra = rng.standard_normal((3, 32)).astype(np.float32)
        shards[0].add_descriptors(extra, positions=rng.uniform(
            0, 1000, (3, 2)))
        flat2 = PlaceIndex(None, None, None)
        flat2.add_descriptors(np.concatenate([feats[:25], extra,
                                              feats[25:]]),
                              positions=np.concatenate(
                                  [pos[:25], np.zeros((3, 2)), pos[25:]]))
        d2, i2, _ = client.search(q, k=7)
        assert len(client) == 63
        d2_ref, i2_ref = flat2.search_descriptors(q, k=7)
        np.testing.assert_array_equal(i2, i2_ref)
        np.testing.assert_allclose(d2, d2_ref, rtol=1e-6, atol=1e-9)
    finally:
        for srv in servers:
            srv.shutdown()
            srv.server_close()


def test_remove_rows_api_and_http(server):
    """remove_rows deletes gallery rows (indices shift down, device copy
    rebuilds lazily) and is reachable over POST /remove."""
    base, idx, feats, pos = server
    d0, i0 = idx.search_descriptors(feats[:1], k=1)
    assert i0[0, 0] == 0 and idx.upload_count == 1

    code, body = _req(base, "/remove", {"indices": [0, 7]})
    assert code == 200 and body == {"rows": 48}
    # a fresh flat index over the surviving rows is the oracle
    keep = np.ones(50, bool)
    keep[[0, 7]] = False
    oracle = PlaceIndex(None, None, None)
    oracle.add_descriptors(feats[keep], positions=pos[keep])
    q = feats[[1, 9]] + 1e-4  # old rows 1 and 9 -> new rows 0 and 7
    d1, i1, p1 = idx.locate_descriptors(q, k=2)
    d2, i2, p2 = oracle.locate_descriptors(q, k=2)
    np.testing.assert_array_equal(i1, i2)
    assert list(i1[:, 0]) == [0, 7]
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    np.testing.assert_allclose(p1, p2)
    assert idx.upload_count == 2  # one lazy rebuild after the delete

    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/remove", {"indices": [1000]})
    assert e.value.code == 400
