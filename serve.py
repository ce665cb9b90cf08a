"""Serving entry — build, persist, and query a deployable place index.

The reference stops at per-epoch evaluation; this CLI turns a trained
checkpoint into a production artifact (no reference counterpart — a
beyond-parity surface over ``agplace_tpu.serving.PlaceIndex``):

    # embed the database tiles once and persist the gallery
    python serve.py build --dataset kitti360 --resume best_model \
        --gallery_out gallery.npz

    # answer queries against a saved gallery; --resume embeds raw query
    # images+clouds, or pass pre-computed descriptors (.npy [Q, C])
    python serve.py search --gallery gallery.npz --queries q.npy --k 5

``search`` without ``--resume`` runs model-free (a searcher node needs no
weights); results print one JSON line per query with distances, gallery
indices, and UTM east/north when the gallery carries positions.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np


def _split_argv(argv):
    """First token is the subcommand; the rest is forwarded to the main
    flag parser (``agplace_tpu.config.parse_arguments``) plus the few
    serve-only flags below."""
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("command", choices=["build", "search", "http"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--gallery_out", default="gallery.npz",
                   help="build: output .npz path")
    p.add_argument("--gallery", default=None,
                   help="search: saved gallery .npz (repeatable via comma)")
    p.add_argument("--queries", default=None,
                   help="search: .npy of [Q, C] query descriptors; omit to "
                        "embed the dataset's query split (needs --resume)")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--quant", default=None, choices=["int8"],
                   help="int8 device gallery with exact fp32 re-rank")
    own, rest = p.parse_known_args(argv)
    return own, rest


def _build(own, rest) -> None:
    from agplace_tpu.config import parse_arguments
    from agplace_tpu.serving import PlaceIndex
    from agplace_tpu.utils.common import setup_logging
    from train import build_datasets

    cfg = parse_arguments(rest)
    setup_logging(cfg.train.save_dir)
    log = logging.getLogger("serve")
    _, test_ds = build_datasets(cfg)
    assert cfg.train.resume, "build needs --resume <checkpoint-name>"
    idx = PlaceIndex.from_checkpoint(cfg, cfg.train.save_dir,
                                     cfg.train.resume)
    n = idx.add_tiles(test_ds)
    idx.save_gallery(own.gallery_out)
    log.info("gallery: %d tiles -> %s", n, own.gallery_out)
    print(json.dumps({"gallery": own.gallery_out, "rows": n,
                      "positions": idx.positions is not None}))


def _print_rows(d, i, pos) -> None:
    """One JSON line per query; non-finite values (k > rows padding)
    become null so the output stays strict JSON."""
    for r in range(d.shape[0]):
        row = {"query": r,
               "indices": [int(v) for v in i[r]],
               "sq_distances": [None if not np.isfinite(v)
                                else round(float(v), 6) for v in d[r]]}
        if pos is not None:
            row["east_north"] = [
                [None, None] if not np.isfinite(e)
                else [round(float(e), 3), round(float(n), 3)]
                for e, n in pos[r]]
        print(json.dumps(row))


def _search(own, rest) -> None:
    from agplace_tpu.serving import PlaceIndex

    assert own.gallery, "search needs --gallery <file.npz or http://node,..>"
    if own.gallery.startswith(("http://", "https://")):
        # scatter-gather across searcher nodes (`serve.py http` instances)
        from agplace_tpu.serving_http import ShardedSearchClient

        assert own.queries is not None, \
            "node search takes pre-computed --queries descriptors"
        assert own.quant is None, \
            "--quant applies node-side (serve.py http), not to the client"
        client = ShardedSearchClient(own.gallery.split(","))
        q = np.load(own.queries).astype(np.float32)
        _print_rows(*client.search(q, k=own.k))
        return
    if own.queries is not None:
        # model-free path: pre-computed descriptors against saved gallery
        idx = PlaceIndex.from_gallery(own.gallery.split(",")[0],
                                      quant=own.quant)
        for extra in own.gallery.split(",")[1:]:
            idx.load_gallery(extra)
        q = np.load(own.queries).astype(np.float32)
        if idx.positions is not None:
            d, i, pos = idx.locate_descriptors(q, k=own.k)
        else:
            d, i = idx.search_descriptors(q, k=own.k)
            pos = None
    else:
        from agplace_tpu.config import parse_arguments
        from agplace_tpu.embed import batched_embed_q
        from train import build_datasets

        cfg = parse_arguments(rest)
        assert cfg.train.resume, \
            "search without --queries needs --resume to embed the query split"
        idx = PlaceIndex.from_checkpoint(cfg, cfg.train.save_dir,
                                         cfg.train.resume, quant=own.quant)
        for g in own.gallery.split(","):
            idx.load_gallery(g)
        _, test_ds = build_datasets(cfg)
        q = batched_embed_q(test_ds, list(range(test_ds.queries_num)),
                            idx._embed_q, idx.params, idx.batch_stats,
                            cfg.train.infer_batch_size, cfg)
        if idx.positions is not None:
            d, i, pos = idx.locate_descriptors(q, k=own.k)
        else:
            d, i = idx.search_descriptors(q, k=own.k)
            pos = None
    _print_rows(d, i, pos)


def _http(own, rest) -> None:
    """Model-free JSON search service over a saved gallery
    (``agplace_tpu.serving_http``)."""
    from agplace_tpu.serving import PlaceIndex
    from agplace_tpu.serving_http import serve_forever

    assert own.gallery, "http needs --gallery <file.npz>"
    paths = own.gallery.split(",")
    idx = PlaceIndex.from_gallery(paths[0], quant=own.quant)
    for extra in paths[1:]:
        idx.load_gallery(extra)
    print(json.dumps({"serving": f"http://{own.host}:{own.port}",
                      "rows": len(idx)}), flush=True)
    serve_forever(idx, own.host, own.port)


def main(argv=None) -> None:
    own, rest = _split_argv(sys.argv[1:] if argv is None else argv)
    if own.command == "build":
        _build(own, rest)
    elif own.command == "http":
        _http(own, rest)
    else:
        _search(own, rest)


if __name__ == "__main__":
    main()
