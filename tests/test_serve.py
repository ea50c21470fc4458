"""HTTP serving endpoint: OpenSearch-shaped neural_sparse search over a
saved index (the reference's `POST /{index}/_search` usage,
reference utils.py:104-136)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.cli.serve import ServingState, serve
from opensearch_sparse_model_tuning_sample_tpu.index.engine import (
    IndexConfig,
    SparseIndex,
)


@pytest.fixture(scope="module")
def server(request):
    tiny_model = request.getfixturevalue("tiny_model")
    V = tiny_model.vocab_size
    rng = np.random.default_rng(0)
    idx = SparseIndex(V, IndexConfig(engine="sparse", l_max=16, block_docs=32,
                                     query_batch=4))
    tok = tiny_model.tokenizer
    the_id = tok.vocab["the"]
    reps = np.zeros((64, V), np.float32)
    for i in range(64):
        reps[i, rng.choice(V, 5, replace=False)] = rng.uniform(0.5, 2.0, 5)
    reps[7, the_id] = 9.0  # doc "7" is THE doc for the token "the"
    idx.add([str(i) for i in range(64)], reps)
    idx.finalize()

    state = ServingState(tiny_model, {"testidx": idx}, max_length=32)
    httpd = serve(state, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def test_health_and_info(server):
    assert _get(f"{server}/_health")["status"] == "green"
    info = _get(f"{server}/")
    assert info["indexes"] == {"testidx": 64}


def test_neural_sparse_query_tokens(server):
    res = _post(f"{server}/testidx/_search", {
        "query": {"neural_sparse": {"text_sparse": {
            "query_tokens": {"the": 3.0}}}},
        "size": 3,
    })
    hits = res["hits"]["hits"]
    assert hits and hits[0]["_id"] == "7"
    assert hits[0]["_score"] == pytest.approx(27.0, rel=0.01)  # 3.0 * 9.0
    assert res["hits"]["max_score"] == hits[0]["_score"]


def test_neural_sparse_query_text(server):
    res = _post(f"{server}/testidx/_search", {
        "query": {"neural_sparse": {"text_sparse": {
            "query_text": "the", "inf_free": True}}},
        "size": 3,
    })
    assert res["hits"]["hits"][0]["_id"] == "7"


def test_encode_endpoint(server):
    res = _post(f"{server}/_encode", {"texts": ["the quick fox"],
                                      "inf_free": True})
    emb = res["embeddings"][0]
    assert "the" in emb and emb["the"] > 0


def test_unknown_index_404(server):
    req = urllib.request.Request(
        f"{server}/nope/_search", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_bad_body_is_400_not_crash(server):
    req = urllib.request.Request(
        f"{server}/testidx/_search", data=b'{"query": {}}',
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # server still alive
    assert _get(f"{server}/_health")["status"] == "green"
