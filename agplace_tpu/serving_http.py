"""HTTP front-end for :class:`agplace_tpu.serving.PlaceIndex`.

Stdlib-only (``http.server``) JSON API so a trained index can serve
queries without any web-framework dependency (no reference counterpart —
the reference stops at per-epoch eval; beyond-parity serving surface):

    GET  /healthz            -> {"ok": true, "rows": N, ...}
    POST /search             <- {"descriptors": [[...]], "k": 5}
                             -> {"sq_distances": [[...]], "indices": [[...]],
                                 "east_north": [[[e,n], ...], ...]?}
    POST /add                <- {"descriptors": [[...]],
                                 "positions": [[e,n], ...]?}
                             -> {"rows": N}

Descriptors travel as JSON float lists — the embedding halves live on
embedder nodes (``PlaceIndex.embed`` with model weights); searcher nodes
run model-free over a saved gallery (``PlaceIndex.from_gallery``).  A
single lock serialises index access: searches are compiled device scans
(~ms), so one in-flight request per index is the right concurrency unit.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


def make_http_server(index, host: str = "127.0.0.1", port: int = 0
                     ) -> ThreadingHTTPServer:
    """Wrap a :class:`PlaceIndex` in a ready-to-``serve_forever`` HTTP
    server.  ``port=0`` binds an ephemeral port (``server.server_address``
    has the real one)."""
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; callers own logging
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> Optional[dict]:
            try:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n))
            except (ValueError, json.JSONDecodeError):
                return None

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "not found"})
            with lock:
                self._reply(200, {
                    "ok": True, "rows": len(index),
                    "quant": index.quant,
                    "positions": index.positions is not None})

        def do_POST(self):
            if self.path == "/search":
                return self._search()
            if self.path == "/add":
                return self._add()
            self._reply(404, {"error": "not found"})

        def _parse_desc(self, req: dict) -> Tuple[Optional[np.ndarray], str]:
            try:
                q = np.asarray(req["descriptors"], np.float32)
            except (KeyError, TypeError, ValueError):
                return None, "descriptors must be a [n][C] float list"
            if q.ndim != 2 or not np.isfinite(q).all():
                return None, "descriptors must be a finite [n][C] matrix"
            return q, ""

        def _search(self):
            req = self._body()
            if req is None:
                return self._reply(400, {"error": "invalid JSON body"})
            q, err = self._parse_desc(req)
            if q is None:
                return self._reply(400, {"error": err})
            try:
                k = int(req.get("k", 5))
            except (TypeError, ValueError):
                return self._reply(400, {"error": "k must be an integer"})
            if k < 1:
                return self._reply(400, {"error": "k must be >= 1"})
            with lock:
                if len(index) == 0:
                    return self._reply(409, {"error": "empty index"})
                if q.shape[1] != index.dim:
                    return self._reply(400, {
                        "error": f"descriptor dim {q.shape[1]} != "
                                 f"gallery dim {index.dim}"})
                out = {}
                if index.positions is not None:
                    d, i, pos = index.locate_descriptors(q, k=k)
                    out["east_north"] = [
                        [[None, None] if np.isnan(e) else
                         [float(e), float(n)] for e, n in row]
                        for row in pos]
                else:
                    d, i = index.search_descriptors(q, k=k)
            out["sq_distances"] = [
                [None if np.isinf(v) else float(v) for v in row]
                for row in d]
            out["indices"] = i.astype(int).tolist()
            self._reply(200, out)

        def _add(self):
            req = self._body()
            if req is None:
                return self._reply(400, {"error": "invalid JSON body"})
            feats, err = self._parse_desc(req)
            if feats is None:
                return self._reply(400, {"error": err})
            pos = req.get("positions")
            try:
                if pos is not None:
                    pos = np.asarray(pos, np.float64)
                with lock:
                    n = index.add_descriptors(feats, positions=pos)
            except ValueError as e:
                return self._reply(400, {"error": str(e)})
            self._reply(200, {"rows": n})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(index, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking entry used by ``serve.py http``."""
    srv = make_http_server(index, host, port)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
