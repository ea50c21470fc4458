"""HTTP serving endpoint for saved indexes — the live-query surface the
reference delegates to its OpenSearch node (README.md:10-15; queries go to
`POST /{index}/_search` with a `neural_sparse` body, utils.py:104-136).

A client written against the reference's OpenSearch usage can point here
instead: the search endpoint accepts the same `neural_sparse` query DSL
(token->weight map, or raw text encoded server-side inference-free/full) and
answers with an OpenSearch-shaped hits envelope.

    python -m ...cli.serve --index synth=out/idx_dir [--model ckpt] \
        [--port 9201] [--arch mini]

Endpoints:
    GET  /                      cluster-info stub
    GET  /_health               {"status": "green"}
    POST /{index}/_search       {"query": {"neural_sparse": {"text_sparse":
                                  {"query_tokens": {tok: w}} |
                                  {"query_text": "...", "inf_free": bool}}},
                                 "size": k, "query_prune": p,
                                 "two_phase": bool}
    POST /_encode               {"texts": [...], "inf_free": bool}

Implementation notes: stdlib-only (ThreadingHTTPServer). Searches take a
process-wide lock — the device executes one query batch at a time anyway;
concurrency should come from batching client-side or sharding the corpus
over a mesh, not from racing dispatches.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class ServingState:
    """Model + named indexes + the device lock."""

    def __init__(self, model, indexes: Dict[str, object], max_length: int = 512):
        from ..models.sparse_encoder import BatchEncoder

        self.model = model
        self.indexes = indexes
        self.encoder = BatchEncoder(model, max_length=max_length, do_count=False)
        self.lock = threading.Lock()

    def encode(self, texts, inf_free: bool = True):
        with self.lock:
            return self.encoder.encode(texts, inf_free=inf_free)

    def search(self, index_name: str, body: dict) -> dict:
        index = self.indexes[index_name]
        k = int(body.get("size", 10))
        prune = float(body.get("query_prune", 0.0))
        two_phase = bool(body.get("two_phase", False))
        ns = body["query"]["neural_sparse"]
        field = next(iter(ns))
        spec = ns[field]
        t0 = time.time()
        with self.lock:
            if "query_tokens" in spec:
                tw = spec["query_tokens"]
                tok = self.model.tokenizer
                ids = [tok.vocab.get(t, -1) for t in tw]
                pairs = [(i, float(w)) for i, w in zip(ids, tw.values()) if i >= 0]
                q_tok = np.zeros((1, max(len(pairs), 1)), np.int32)
                q_w = np.zeros((1, max(len(pairs), 1)), np.float32)
                for j, (i, w) in enumerate(pairs):
                    q_tok[0, j], q_w[0, j] = i, w
                hits = index.search_tokens(
                    q_tok, q_w, k=k, query_prune=prune, two_phase=two_phase
                )
            else:
                text = spec["query_text"]
                inf_free = bool(spec.get("inf_free", True))
                reps = self.encoder.encode_batch_device([text], inf_free=inf_free)
                hits = index.search(
                    reps, k=k, query_prune=prune, two_phase=two_phase,
                    full_forward=not inf_free,
                )
        took_ms = int((time.time() - t0) * 1000)
        ranked = sorted(hits[0].items(), key=lambda kv: -kv[1])
        return {
            "took": took_ms,
            "timed_out": False,
            "hits": {
                "total": {"value": len(ranked), "relation": "eq"},
                "max_score": ranked[0][1] if ranked else None,
                "hits": [
                    {"_index": index_name, "_id": did, "_score": score}
                    for did, score in ranked
                ],
            },
        }


def make_handler(state: ServingState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("%s " + fmt, self.client_address[0], *args)

        def do_GET(self):
            if self.path in ("/", ""):
                self._send(200, {
                    "name": "opensearch-sparse-model-tuning-sample-tpu",
                    "version": {"distribution": "tpu-native", "number": "2"},
                    "indexes": {n: i.n_docs for n, i in state.indexes.items()},
                })
            elif self.path == "/_health":
                self._send(200, {"status": "green"})
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                parts = [p for p in self.path.split("/") if p]
                if parts == ["_encode"]:
                    body = self._body()
                    out = state.encode(
                        body["texts"], inf_free=body.get("inf_free", True)
                    )
                    self._send(200, {"embeddings": out})
                elif len(parts) == 2 and parts[1] == "_search":
                    if parts[0] not in state.indexes:
                        self._send(404, {"error": f"no index {parts[0]}"})
                        return
                    self._send(200, state.search(parts[0], self._body()))
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as e:  # noqa: BLE001 — serving surface
                logger.exception("request failed")
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(state: ServingState, host: str = "127.0.0.1", port: int = 9201):
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    logger.info(
        "serving %d index(es) on http://%s:%d", len(state.indexes), host, port
    )
    return httpd


def main(argv=None):
    from ..index.engine import SparseIndex
    from ..models import sparse_encoder as se

    p = argparse.ArgumentParser()
    p.add_argument("--index", action="append", required=True,
                   help="name=path of a SparseIndex.save() dir (repeatable)")
    p.add_argument("--model", default=None, help="checkpoint dir")
    p.add_argument("--arch", default="mini")
    p.add_argument("--idf", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9201)
    p.add_argument("--max-length", type=int, default=512)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    model = se.build_model(
        model_name_or_path=args.model, arch=args.arch,
        idf_path=args.idf or os.path.join(repo, "assets", "idf.npz"),
    )
    indexes = {}
    for spec in args.index:
        name, path = spec.split("=", 1)
        indexes[name] = SparseIndex.load(path)
    state = ServingState(model, indexes, max_length=args.max_length)
    serve(state, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
