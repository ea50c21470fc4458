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
    PUT  /{index}               create index (settings.index may carry
                                l_max/engine/block_docs overrides; the
                                reference's shards/replicas are accepted
                                and ignored — sharding is the mesh's job)
    DELETE /{index}             delete index
    POST /_bulk                 NDJSON: {"index": {"_index", "_id"}} action
                                lines + doc lines {"text_sparse": {tok: w}}
                                or {"text": "..."} (encoded server-side) —
                                the reference's ingest wire format
                                (ingest.py:88-106)
    POST /{index}/_refresh      make buffered docs searchable (finalize)
    PUT  /_search/pipeline/{p}  ack the two-phase pipeline install
                                (reference search.py:27-42); searches sent
                                with ?search_pipeline={p} run two-phase
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

    def __init__(self, model, indexes: Dict[str, object], max_length: int = 512,
                 index_cfg=None):
        from ..index.engine import IndexConfig
        from ..models.sparse_encoder import BatchEncoder

        self.model = model
        self.indexes = indexes
        self.encoder = BatchEncoder(model, max_length=max_length, do_count=False)
        self.lock = threading.Lock()
        self.index_cfg = index_cfg or IndexConfig()
        self.pipelines: Dict[str, dict] = {}

    def encode(self, texts, inf_free: bool = True):
        with self.lock:
            return self.encoder.encode(texts, inf_free=inf_free)

    # ------------------------------------------------------- write path
    def create_index(self, name: str, body: dict):
        """PUT /{index}: reference ingest.py:66-82 creates a rank_features
        index; settings.index here may override l_max/engine/block_docs."""
        import dataclasses

        from ..index.engine import SparseIndex

        settings = (body or {}).get("settings", {}).get("index", {})
        overrides = {
            k: settings[k]
            for k in ("l_max", "engine", "block_docs", "postings_cap",
                      "query_batch")
            if k in settings
        }
        cfg = dataclasses.replace(self.index_cfg, **overrides)
        with self.lock:
            if name in self.indexes:
                raise KeyError(f"index {name} already exists")
            self.indexes[name] = SparseIndex(self.model.vocab_size, cfg)

    def delete_index(self, name: str) -> bool:
        with self.lock:
            return self.indexes.pop(name, None) is not None

    def bulk(self, raw: bytes) -> dict:
        """POST /_bulk (NDJSON): action line + source line per doc, with
        `text_sparse` token->weight maps (the reference's encode-client-side
        path) or raw `text` encoded here. Docs land in the in-memory buffer;
        a _refresh (or the next search) makes them visible."""
        t0 = time.time()
        lines = [json.loads(l) for l in raw.splitlines() if l.strip()]
        if len(lines) % 2:
            raise ValueError("bulk body must be action/source line pairs")
        per_index: Dict[str, list] = {}
        items = []
        for action, source in zip(lines[::2], lines[1::2]):
            op = next(iter(action))
            if op != "index":
                raise ValueError(f"unsupported bulk op {op!r}")
            idx_name = action[op]["_index"]
            doc_id = str(action[op].get("_id", ""))
            per_index.setdefault(idx_name, []).append((doc_id, source))
            items.append({"index": {"_index": idx_name, "_id": doc_id,
                                    "status": 201, "result": "created"}})
        vocab = self.model.tokenizer.vocab
        with self.lock:
            for idx_name, docs in per_index.items():
                if idx_name not in self.indexes:
                    raise KeyError(f"no index {idx_name}")
                index = self.indexes[idx_name]
                index.reopen()
                # a batch may mix pre-encoded text_sparse docs and raw text
                # docs — split per doc, not per batch
                enc_docs = [(d, s) for d, s in docs if s.get("text_sparse") is None]
                sp_docs = [(d, s["text_sparse"]) for d, s in docs
                           if s.get("text_sparse") is not None]
                if sp_docs:
                    L = max(max((len(tw) for _, tw in sp_docs), default=1), 1)
                    toks = np.zeros((len(sp_docs), L), np.int32)
                    ws = np.zeros((len(sp_docs), L), np.float32)
                    for r, (_, tw) in enumerate(sp_docs):
                        pairs = sorted(
                            ((vocab[t], float(w)) for t, w in tw.items()
                             if t in vocab),
                            key=lambda p: -p[1],
                        )
                        for c, (i, w) in enumerate(pairs):
                            toks[r, c], ws[r, c] = i, w
                    index.add_topk([d for d, _ in sp_docs], toks, ws)
                if enc_docs:
                    texts = [s.get("text", "") for _, s in enc_docs]
                    toks, ws = self.encoder.encode_batch_sparse(
                        texts, l_max=index.cfg.l_max
                    )
                    index.add_topk([d for d, _ in enc_docs], toks, ws)
        return {
            "took": int((time.time() - t0) * 1000),
            "errors": False,
            "items": items,
        }

    def refresh(self, name: str):
        with self.lock:
            self.indexes[name].finalize()

    # -------------------------------------------------------- read path
    def search(self, index_name: str, body: dict, two_phase_param: bool = False) -> dict:
        k = int(body.get("size", 10))
        prune = float(body.get("query_prune", 0.0))
        two_phase = bool(body.get("two_phase", False)) or two_phase_param
        ns = body["query"]["neural_sparse"]
        field = next(iter(ns))
        spec = ns[field]
        t0 = time.time()
        with self.lock:
            index = self.indexes[index_name]
            if not index._finalized:
                # near-real-time semantics: search refreshes. Inside the lock:
                # finalize concatenates + clears the ingest buffers and must
                # not race a concurrent _bulk's reopen()/add_topk()
                index.finalize()
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
                # full_forward: True for full-forward queries; None for
                # inf-free so the engine still checks the active-term count
                # (a long inf-free query can exceed the inverted engine's
                # query_terms lookup budget too)
                hits = index.search(
                    reps, k=k, query_prune=prune, two_phase=two_phase,
                    full_forward=True if not inf_free else None,
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

        def _split(self):
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            return [p for p in u.path.split("/") if p], parse_qs(u.query)

        def do_POST(self):
            try:
                parts, params = self._split()
                if parts == ["_encode"]:
                    body = self._body()
                    out = state.encode(
                        body["texts"], inf_free=body.get("inf_free", True)
                    )
                    self._send(200, {"embeddings": out})
                elif parts == ["_bulk"]:
                    n = int(self.headers.get("Content-Length", 0))
                    self._send(200, state.bulk(self.rfile.read(n)))
                elif len(parts) == 2 and parts[1] == "_refresh":
                    if parts[0] not in state.indexes:
                        self._send(404, {"error": f"no index {parts[0]}"})
                        return
                    state.refresh(parts[0])
                    self._send(200, {"_shards": {"successful": 1, "failed": 0}})
                elif len(parts) == 2 and parts[1] == "_search":
                    if parts[0] not in state.indexes:
                        self._send(404, {"error": f"no index {parts[0]}"})
                        return
                    two_phase = "search_pipeline" in params
                    self._send(
                        200,
                        state.search(parts[0], self._body(),
                                     two_phase_param=two_phase),
                    )
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as e:  # noqa: BLE001 — serving surface
                logger.exception("request failed")
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def do_PUT(self):
            try:
                parts, _ = self._split()
                if len(parts) == 3 and parts[:2] == ["_search", "pipeline"]:
                    state.pipelines[parts[2]] = self._body()
                    self._send(200, {"acknowledged": True})
                elif len(parts) == 1:
                    state.create_index(parts[0], self._body())
                    self._send(200, {"acknowledged": True, "index": parts[0]})
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except KeyError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving surface
                logger.exception("request failed")
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def do_DELETE(self):
            parts, _ = self._split()
            if len(parts) == 1:
                if state.delete_index(parts[0]):
                    self._send(200, {"acknowledged": True})
                else:
                    self._send(404, {"error": f"no index {parts[0]}"})
            else:
                self._send(404, {"error": f"no route {self.path}"})

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
