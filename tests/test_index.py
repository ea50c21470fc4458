"""Index engine: sparse engine vs dense oracle vs numpy brute force,
sharded vs single-device, persistence, pruning."""

import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.core.mesh import make_mesh
from opensearch_sparse_model_tuning_sample_tpu.index.engine import (
    IndexConfig,
    SparseIndex,
)

V = 512
N_DOCS = 300
N_Q = 7
rng = np.random.default_rng(42)


def make_sparse_reps(n, nnz=20, seed=0):
    r = np.random.default_rng(seed)
    reps = np.zeros((n, V), dtype=np.float32)
    for i in range(n):
        idx = r.choice(V, size=nnz, replace=False)
        reps[i, idx] = r.uniform(0.1, 3.0, size=nnz)
    return reps


DOCS = make_sparse_reps(N_DOCS, seed=1)
QS = make_sparse_reps(N_Q, nnz=8, seed=2)
BRUTE = QS @ DOCS.T  # [N_Q, N_DOCS] exact scores


def brute_topk(k, prune=0.0):
    q = QS.copy()
    if prune > 0:
        thresh = q.max(axis=1, keepdims=True) * prune
        q = np.where(q > thresh, q, 0.0)
    scores = q @ DOCS.T
    out = []
    for row in scores:
        idx = np.argsort(-row)[:k]
        out.append({str(i): float(row[i]) for i in idx if row[i] > 0})
    return out


def build(engine, mesh=None, **cfg_kw):
    cfg = IndexConfig(engine=engine, l_max=32, block_docs=64, query_batch=4, **cfg_kw)
    idx = SparseIndex(V, cfg, mesh)
    for s in range(0, N_DOCS, 100):
        batch = DOCS[s : s + 100]
        idx.add([str(i) for i in range(s, s + batch.shape[0])], batch)
    idx.finalize()
    return idx


@pytest.mark.parametrize("engine", ["dense", "sparse"])
def test_topk_matches_bruteforce(engine):
    idx = build(engine)
    got = idx.search(QS, k=10)
    want = brute_topk(10)
    for g, w in zip(got, want):
        assert set(g.keys()) == set(w.keys())
        for d in g:
            assert g[d] == pytest.approx(w[d], rel=2e-2)  # bf16 storage


def test_sparse_engine_exactness_fp32():
    idx = build("sparse", weight_dtype="float32")
    got = idx.search(QS, k=10)
    want = brute_topk(10)
    for g, w in zip(got, want):
        assert set(g.keys()) == set(w.keys())
        for d in g:
            assert g[d] == pytest.approx(w[d], rel=1e-5)


def test_query_prune():
    idx = build("sparse", weight_dtype="float32")
    got = idx.search(QS, k=10, query_prune=0.5)
    want = brute_topk(10, prune=0.5)
    for g, w in zip(got, want):
        assert set(g.keys()) == set(w.keys())


def test_sharded_matches_single_device(mesh8):
    idx1 = build("sparse", weight_dtype="float32")
    idx8 = build("sparse", mesh=mesh8, weight_dtype="float32")
    got1 = idx1.search(QS, k=10)
    got8 = idx8.search(QS, k=10)
    for a, b in zip(got1, got8):
        assert set(a.keys()) == set(b.keys())
        for d in a:
            assert a[d] == pytest.approx(b[d], rel=1e-5)


def test_exclude_self_hit():
    idx = build("sparse")
    # query = doc 0's rep: doc 0 would be its own top hit
    got = idx.search(DOCS[:1], k=5, exclude_self=["0"])
    assert "0" not in got[0]
    assert len(got[0]) == 5


def test_count_statistics():
    idx = build("sparse")
    expect = (DOCS > 0).sum(axis=0) / N_DOCS
    np.testing.assert_allclose(idx.avg_doc_activation, expect)


def test_save_load_roundtrip(tmp_path):
    idx = build("sparse")
    want = idx.search(QS, k=5)
    idx.save(str(tmp_path / "idx"))
    idx2 = SparseIndex.load(str(tmp_path / "idx"))
    got = idx2.search(QS, k=5)
    for a, b in zip(want, got):
        assert set(a.keys()) == set(b.keys())
    np.testing.assert_array_equal(idx.count_tensor, idx2.count_tensor)


def test_save_load_preserves_full_config(tmp_path):
    """The whole build-time IndexConfig survives persistence — weight_dtype,
    rescore and budget knobs are contracts, not per-process tuning. A
    float32 index (the exactness mode) must also keep fp32 weights on disk
    rather than being silently truncated to fp16."""
    cfg = IndexConfig(engine="sparse", l_max=8, block_docs=64, query_batch=4,
                      weight_dtype="float32", two_phase_terms=5,
                      two_phase_expand=3, inverted_rescore=False,
                      full_query_terms=24, full_merge_shifts=7)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    idx.save(str(tmp_path / "full"))
    blob = np.load(str(tmp_path / "full" / "index.npz"))
    assert blob["weights"].dtype == np.float32
    idx2 = SparseIndex.load(str(tmp_path / "full"))
    for f in ("weight_dtype", "two_phase_terms", "two_phase_expand",
              "inverted_rescore", "full_query_terms", "full_merge_shifts",
              "l_max", "block_docs"):
        assert getattr(idx2.cfg, f) == getattr(cfg, f), f
    np.testing.assert_array_equal(
        np.asarray(idx2._docs_dev), np.asarray(idx._docs_dev)
    )


def test_save_load_preserves_exact_escalate(tmp_path):
    """exact_escalate is a semantic contract, not a tuning knob — a saved
    index must keep it on load (a served index silently losing escalation
    would return uncertified approximate results)."""
    cfg = IndexConfig(engine="inverted", l_max=8, block_docs=64,
                      query_batch=4, postings_cap=32, query_terms=8,
                      exact_escalate=True)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    idx.save(str(tmp_path / "esc"))
    idx2 = SparseIndex.load(str(tmp_path / "esc"))
    assert idx2.cfg.exact_escalate is True
    idx2.search(QS, k=5)
    assert bool(np.all(idx2.last_certified))


def test_l_max_truncation_keeps_top_weights():
    cfg = IndexConfig(engine="sparse", l_max=4, block_docs=64, query_batch=4)
    idx = SparseIndex(V, cfg)
    rep = np.zeros((1, V), np.float32)
    rep[0, :10] = np.arange(1, 11, dtype=np.float32)  # weights 1..10
    idx.add(["d"], rep)
    idx.finalize()
    q = np.zeros((1, V), np.float32)
    q[0, :10] = 1.0
    got = idx.search(q, k=1)[0]
    # only the top-4 weights (7+8+9+10) survive l_max truncation
    assert got["d"] == pytest.approx(34.0, rel=1e-3)


def test_empty_query_returns_empty():
    idx = build("sparse")
    got = idx.search(np.zeros((1, V), np.float32), k=5)
    assert got[0] == {}


def test_k_larger_than_corpus():
    cfg = IndexConfig(engine="sparse", l_max=8, block_docs=16, query_batch=2)
    idx = SparseIndex(V, cfg)
    idx.add(["a", "b"], make_sparse_reps(2, nnz=5, seed=3))
    idx.finalize()
    got = idx.search(make_sparse_reps(1, nnz=5, seed=3), k=50)
    assert len(got[0]) <= 2


def test_add_topk_matches_add():
    """The on-device top-k ingest path must index identically to dense add."""
    cfg = IndexConfig(engine="sparse", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32")
    a = SparseIndex(V, cfg)
    b = SparseIndex(V, cfg)
    a.add([str(i) for i in range(N_DOCS)], DOCS)
    # emulate encode_batch_sparse: top-k extraction with zero padding
    k = 32
    idxs = np.argsort(-DOCS, axis=1)[:, :k].astype(np.int32)
    vals = np.take_along_axis(DOCS, idxs, axis=1)
    idxs = np.where(vals > 0, idxs, 0)
    vals = np.where(vals > 0, vals, 0.0)
    b.add_topk([str(i) for i in range(N_DOCS)], idxs, vals)
    a.finalize(); b.finalize()
    ra = a.search(QS, k=10)
    rb = b.search(QS, k=10)
    for x, y in zip(ra, rb):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            assert x[d] == pytest.approx(y[d], rel=1e-5)
    np.testing.assert_array_equal(a.count_tensor, b.count_tensor)


def test_search_accepts_device_arrays():
    import jax.numpy as jnp

    idx = build("sparse", weight_dtype="float32")
    got_np = idx.search(QS, k=5)
    got_dev = idx.search(jnp.asarray(QS), k=5)
    for a, b in zip(got_np, got_dev):
        assert set(a.keys()) == set(b.keys())


def test_two_phase_matches_exact_on_easy_corpus():
    """With docs whose mass concentrates in their top-impact terms (the
    SPLADE regime), two-phase must recover the exact top-k."""
    cfg = IndexConfig(engine="sparse", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32", two_phase_mode="doc",
                      two_phase_terms=8, two_phase_expand=8)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    exact = idx.search(QS, k=5)
    two_phase = idx.search(QS, k=5, two_phase=True)
    hits = 0
    total = 0
    for a, b in zip(exact, two_phase):
        total += len(a)
        hits += len(set(a) & set(b))
        for d in set(a) & set(b):
            # phase-2 rescoring is exact
            assert b[d] == pytest.approx(a[d], rel=1e-5)
    assert hits / total > 0.9, f"two-phase recall {hits/total}"


def test_two_phase_sharded(mesh8):
    cfg = IndexConfig(engine="sparse", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32", two_phase_mode="doc",
                      two_phase_terms=16, two_phase_expand=8)
    idx = SparseIndex(V, cfg, mesh8)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    res = idx.search(QS, k=5, two_phase=True)
    exact = build("sparse", weight_dtype="float32").search(QS, k=5)
    hits = sum(len(set(a) & set(b)) for a, b in zip(exact, res))
    total = sum(len(a) for a in exact)
    assert hits / total > 0.9


def test_query_two_phase_scan_semantics():
    """Query-mode two-phase (the reference's OpenSearch processor,
    /root/reference/scripts/search.py:27-42): phase 1 scores only query
    tokens with weight >= ratio * max, phase 2 exactly rescores the
    candidate pool with the FULL query. Pinned: (a) returned scores are the
    exact full-query scores; (b) every returned doc sits in the phase-1
    (pruned-query) candidate pool; (c) ratio=0 degenerates to exact."""
    k, expand = 5, 3
    idx = build("sparse", weight_dtype="float32", two_phase_ratio=0.4,
                two_phase_expand=expand)
    got = idx.search(QS, k=k, two_phase=True)
    k1 = max(min(expand * k, idx.cfg.block_docs), k)
    thresh = QS.max(axis=1, keepdims=True) * 0.4
    pruned_scores = np.where(QS >= thresh, QS, 0.0) @ DOCS.T
    for qi, hits in enumerate(got):
        kth_pruned = np.sort(pruned_scores[qi])[::-1][k1 - 1]
        for d, s in hits.items():
            # (a) exact full-query score
            assert s == pytest.approx(BRUTE[qi, int(d)], rel=1e-5)
            # (b) candidate came from the phase-1 pool
            assert pruned_scores[qi, int(d)] >= kth_pruned - 1e-5
    # 2p results contain the phase-1 top-k (reference containment: phase 2
    # only ADDS the low-weight tokens' mass to candidates already found)
    exact = brute_topk(k)
    agree = sum(len(set(a) & set(b)) for a, b in zip(exact, got))
    assert agree / sum(len(a) for a in exact) > 0.6  # sanity, not exactness
    # (c) ratio=0: nothing pruned -> exact results
    idx0 = build("sparse", weight_dtype="float32", two_phase_ratio=0.0)
    got0 = idx0.search(QS, k=k, two_phase=True)
    for g, w in zip(got0, exact):
        assert set(g.keys()) == set(w.keys())
        for d in g:
            assert g[d] == pytest.approx(w[d], rel=1e-5)


def test_query_two_phase_inverted_certified_and_never_escalates():
    """Query-mode two-phase on the inverted engine: the pruned-out terms'
    mass rides the exactness bound (sound certificates), returned scores
    are exact for the returned docs, and 2p NEVER escalates even with
    exact_escalate pinned on (it is the explicit approximate speed knob)."""
    idx = build("inverted", weight_dtype="float32", postings_cap=8,
                query_terms=8, exact_escalate=True, two_phase_ratio=0.4)
    got = idx.search(QS, k=5, two_phase=True)
    assert idx.last_certified is not None
    assert idx.last_escalated is None  # never escalated
    exact = brute_topk(5)
    for qi, hits in enumerate(got):
        for d, s in hits.items():
            # rescore is exact for whatever was returned
            assert s == pytest.approx(BRUTE[qi, int(d)], rel=1e-5)
        if idx.last_certified[qi]:
            # certified: provably the true top-k despite pruning+cap
            assert set(hits.keys()) == set(exact[qi].keys())
    # the certificate must not be vacuous on a fat-cap index: with the
    # full postings depth and ratio=0 every query certifies
    idx2 = build("inverted", weight_dtype="float32", postings_cap=N_DOCS,
                 query_terms=16, two_phase_ratio=0.0)
    idx2.search(QS, k=5, two_phase=True)
    assert idx2.last_certified.all()


def test_inverted_engine_exact_with_large_cap():
    """postings_cap >= longest posting list -> inverted results are exact."""
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32", postings_cap=N_DOCS, query_terms=16)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    got = idx.search(QS, k=10)
    want = brute_topk(10)
    for g, w in zip(got, want):
        assert set(g.keys()) == set(w.keys())
        for d in g:
            assert g[d] == pytest.approx(w[d], rel=1e-5)


def test_inverted_engine_truncated_cap_high_recall():
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32", postings_cap=32, query_terms=16)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    got = idx.search(QS, k=10)
    want = brute_topk(10)
    hits = sum(len(set(g) & set(w)) for g, w in zip(got, want))
    total = sum(len(w) for w in want)
    assert hits / total > 0.6, hits / total
    # rescored scores are exact for retrieved docs
    for g, w in zip(got, want):
        for d in set(g) & set(w):
            assert g[d] == pytest.approx(w[d], rel=1e-5)


def test_inverted_engine_no_rescore():
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32", postings_cap=N_DOCS,
                      query_terms=16, inverted_rescore=False)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    got = idx.search(QS, k=10)
    want = brute_topk(10)
    for g, w in zip(got, want):
        assert set(g.keys()) == set(w.keys())


def test_inverted_small_corpus_no_duplicates():
    """When the finite candidate pool is smaller than the top-k expansion
    (k1 = 4k), -inf merge slots carry real doc ids; selecting them must not
    resurrect a doc twice (regression: duplicate candidates survived the
    exact rescore and crowded true hits out of the top-k)."""
    n = 8
    docs = make_sparse_reps(n, nnz=10, seed=11)
    for rescore in (True, False):
        cfg = IndexConfig(engine="inverted", l_max=16, block_docs=8,
                          query_batch=4, weight_dtype="float32",
                          postings_cap=n, query_terms=16,
                          inverted_rescore=rescore)
        idx = SparseIndex(V, cfg)
        idx.add([str(i) for i in range(n)], docs)
        idx.finalize()
        qs = make_sparse_reps(4, nnz=8, seed=12)
        brute = qs @ docs.T
        for qi, h in enumerate(idx.search(qs, k=10)):
            matching = set(map(str, np.nonzero(brute[qi] > 0)[0]))
            assert set(h.keys()) == matching, (rescore, qi)


def test_inverted_build_postings_ordering():
    from opensearch_sparse_model_tuning_sample_tpu.index.inverted import (
        build_postings,
    )

    toks = np.array([[1, 2, 0], [1, 3, 0]], dtype=np.int32)
    ws = np.array([[0.5, 2.0, 0.0], [3.0, 1.0, 0.0]], dtype=np.float32)
    pd, pw = build_postings(toks, ws, vocab_size=8, postings_cap=4)
    # token 1 appears in doc0 (0.5) and doc1 (3.0) -> impact order doc1 first
    assert pd[1, 0] == 1 and pw[1, 0] == 3.0
    assert pd[1, 1] == 0 and pw[1, 1] == 0.5
    assert pd[2, 0] == 0 and pw[2, 0] == 2.0
    assert pw[4].sum() == 0  # unused token


def test_auto_engine_resolution():
    cfg_small = IndexConfig(engine="auto", auto_threshold=1000, l_max=16,
                            block_docs=32, query_batch=2)
    small = SparseIndex(V, cfg_small)
    small.add(["a", "b"], make_sparse_reps(2, nnz=5, seed=9))
    small.finalize()
    assert small._engine == "sparse"

    cfg_big = IndexConfig(engine="auto", auto_threshold=2, l_max=16,
                          block_docs=32, query_batch=2, postings_cap=8,
                          query_terms=8)
    big = SparseIndex(V, cfg_big)
    big.add(["a", "b", "c"], make_sparse_reps(3, nnz=5, seed=9))
    big.finalize()
    assert big._engine == "inverted"
    # both still answer queries
    q = make_sparse_reps(1, nnz=5, seed=9)
    assert isinstance(small.search(q, k=1)[0], dict)
    assert isinstance(big.search(q, k=1)[0], dict)


def test_inverted_sharded_matches_single_device(mesh8):
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=16, query_batch=4,
                      weight_dtype="float32", postings_cap=N_DOCS, query_terms=16)
    single = SparseIndex(V, cfg)
    single.add([str(i) for i in range(N_DOCS)], DOCS)
    single.finalize()
    sharded = SparseIndex(V, cfg, mesh8)
    sharded.add([str(i) for i in range(N_DOCS)], DOCS)
    sharded.finalize()
    a = single.search(QS, k=10)
    b = sharded.search(QS, k=10)
    for x, y in zip(a, b):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            assert x[d] == pytest.approx(y[d], rel=1e-5)


def test_inverted_full_forward_sharded_matches_single(mesh8):
    """Full-forward mode under the 8-way corpus shard must agree with the
    single-device full-forward path."""
    kw = dict(postings_cap=N_DOCS, query_terms=4, weight_dtype="float32",
              full_query_terms=64, full_postings_cols=N_DOCS,
              full_rescore_expand=16)
    single = build("inverted", **kw)
    sharded = build("inverted", mesh=mesh8, **kw)
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    a = single.search(dense_q, k=10)
    b = sharded.search(dense_q, k=10)
    for x, y in zip(a, b):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            assert x[d] == pytest.approx(y[d], rel=1e-5)


def test_native_postings_matches_numpy():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    if not inverted._load_native():
        pytest.skip("native postings builder unavailable")
    rng2 = np.random.default_rng(7)
    toks = rng2.integers(0, V, size=(500, 16)).astype(np.int32)
    ws = rng2.gamma(2.0, 0.5, size=(500, 16)).astype(np.float32)
    ws[rng2.random((500, 16)) < 0.2] = 0.0
    pd_c, pw_c = inverted.build_postings(toks, ws, V, 8)
    pd_n, pw_n = inverted._build_postings_np(toks, ws, V, 8)
    np.testing.assert_array_equal(pw_c, pw_n)
    # doc ids may differ only where weights tie (none with random floats)
    np.testing.assert_array_equal(pd_c, pd_n)


def _exact_full_forward_want(dense_q, k=10):
    scores = dense_q @ DOCS.T
    want = []
    for row in scores:
        top = np.argsort(-row)[:k]
        want.append({str(i): float(row[i]) for i in top if row[i] > 0})
    return want


def test_inverted_full_forward_mode_is_exact_when_uncapped():
    """Full-forward queries route to the wide-but-shallow inverted lookup +
    exact rescore. With postings uncapped and enough term slots, candidate
    generation misses nothing and rescore makes scores EXACT — the
    reference's OpenSearch scores every query token (search.py:59-70)."""
    idx = build("inverted", postings_cap=N_DOCS, query_terms=4,
                weight_dtype="float32", full_query_terms=64,
                full_postings_cols=N_DOCS, full_rescore_expand=16)
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    got = idx.search(dense_q, k=10)
    assert idx._engine == "inverted"
    assert any(k[2] == "inverted_full" for k in idx._search_fns)
    for h, want in zip(got, _exact_full_forward_want(dense_q)):
        assert set(h) == set(want)
        for d in want:
            assert h[d] == pytest.approx(want[d], rel=1e-5)


def test_inverted_full_forward_scan_escape_hatch():
    """full_fallback_scan=True preserves the old exact doc-major scan."""
    idx = build("inverted", postings_cap=N_DOCS, query_terms=4,
                weight_dtype="float32", full_fallback_scan=True)
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    got = idx.search(dense_q, k=10)
    assert any(k[2] == "sparse" for k in idx._search_fns)
    for h, want in zip(got, _exact_full_forward_want(dense_q)):
        assert set(h) == set(want)
        for d in want:
            assert h[d] == pytest.approx(want[d], rel=1e-5)


def test_inverted_full_forward_recall_with_truncated_postings():
    """Production knobs (capped postings, sliced lookup columns, truncated
    merge shifts): recall@10 vs the exact scan must stay >= 0.99 on a
    SPLADE-like corpus — the contract VERDICT round-2 set for replacing the
    22 q/s scan fallback."""
    r = np.random.default_rng(11)
    n, v, l = 4000, 512, 48
    reps = np.zeros((n, v), dtype=np.float32)
    for i in range(n):
        sel = r.choice(v, size=l, replace=False)
        reps[i, sel] = r.gamma(2.0, 0.5, size=l)
    cfg = IndexConfig(engine="inverted", l_max=64, block_docs=64,
                      query_batch=4, weight_dtype="float32",
                      postings_cap=256, query_terms=4,
                      full_query_terms=64, full_postings_cols=128,
                      full_rescore_expand=16, full_merge_shifts=8)
    idx = SparseIndex(v, cfg)
    idx.add([str(i) for i in range(n)], reps)
    idx.finalize()
    # full-forward-ish queries: ~100 active terms
    nq = 16
    qs = np.zeros((nq, v), dtype=np.float32)
    for i in range(nq):
        sel = r.choice(v, size=100, replace=False)
        qs[i, sel] = r.gamma(2.0, 0.5, size=100)
    got = idx.search(qs, k=10)
    exact = qs @ reps.T
    hits = total = 0
    for row, h in zip(exact, got):
        want = set(np.argsort(-row)[:10])
        hits += len(want & {int(d) for d in h})
        total += 10
    assert hits / total >= 0.99, f"recall@10 {hits/total:.3f}"


def test_full_forward_does_not_inherit_exact_escalate():
    """Wide queries must NOT inherit `exact_escalate`: the wide-query bound
    is loose by construction (tails over full_query_terms selected terms +
    the unselected remainder), so on realistic corpora ~no wide query
    certifies and escalation would re-run the corpus-linear scan for every
    one — forfeiting the full-forward path's corpus-size-independence.
    Default contract: exact-rescored candidates + honest flags."""
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    # cramped budgets so candidate generation provably can't certify
    kw = dict(postings_cap=8, query_terms=4, weight_dtype="float32",
              full_query_terms=8, full_postings_cols=4,
              full_rescore_expand=2, exact_escalate=True)
    idx = build("inverted", **kw)
    idx.search(dense_q, k=10)
    assert idx.last_escalated is None  # no escalation pass ran
    assert idx.last_certified is not None
    assert not idx.last_certified.all()  # flags stay honest


def test_full_exact_escalate_pins_exact_wide_results():
    """full_exact_escalate=True buys back provably exact wide-query results
    (at scan cost for the uncertified ones)."""
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    idx = build("inverted", postings_cap=8, query_terms=4,
                weight_dtype="float32", full_query_terms=8,
                full_postings_cols=4, full_rescore_expand=2,
                full_exact_escalate=True)
    got = idx.search(dense_q, k=10)
    assert idx.last_certified.all()
    assert idx.last_escalated.any()  # the cramped budget forced re-runs
    for h, want in zip(got, _exact_full_forward_want(dense_q)):
        assert set(h) == set(want)
        for d in want:
            assert h[d] == pytest.approx(want[d], rel=1e-5)


def test_full_exact_escalate_flip_on_live_index():
    """Flipping cfg.full_exact_escalate between searches on a LIVE index
    takes effect: the search-fn cache keys on the resolved flag
    (engine._get_search_fn), so no stale compiled fn answers the new
    contract. This is also how A/B perf jobs measure both contracts on
    one multi-GB build instead of building twice."""
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    idx = build("inverted", postings_cap=8, query_terms=4,
                weight_dtype="float32", full_query_terms=8,
                full_postings_cols=4, full_rescore_expand=2,
                full_exact_escalate=False)
    idx.search(dense_q, k=10)
    assert not idx.last_certified.all()  # approximate contract, honest flags
    assert idx.last_escalated is None
    idx.cfg.full_exact_escalate = True
    got = idx.search(dense_q, k=10)
    assert idx.last_certified.all()
    assert idx.last_escalated.any()
    for h, want in zip(got, _exact_full_forward_want(dense_q)):
        assert set(h) == set(want)
        for d in want:
            assert h[d] == pytest.approx(want[d], rel=1e-5)


def test_inverted_inf_free_skips_fallback():
    """Queries within the term budget stay on the inverted path."""
    idx = build("inverted", postings_cap=N_DOCS, query_terms=16,
                weight_dtype="float32")
    got = idx.search(QS, k=10, full_forward=False)
    want = brute_topk(10)
    for g, w in zip(got, want):
        assert set(g) == set(w)


def test_search_fn_cache_holds_multiple_entries():
    """Alternating k / two_phase between calls must not rebuild (the round-1
    cache held one entry and recompiled every call)."""
    idx = build("sparse")
    r1 = idx.search(QS, k=10)
    idx.search(QS, k=5, two_phase=True)
    r3 = idx.search(QS, k=10)
    assert len(idx._search_fns) == 2
    assert r1 == r3


def test_merge_saved_matches_single_index(tmp_path):
    """Per-rank shard indexes (multi-host ingest) concatenate into one index
    equivalent to single-host ingest (global string doc ids ARE the merge
    key, reference ingest.py:88-106)."""
    full = build("sparse", weight_dtype="float32")
    cfg = IndexConfig(engine="sparse", l_max=32, block_docs=64, query_batch=4,
                      weight_dtype="float32")
    paths = []
    for r in range(2):
        sh = SparseIndex(V, cfg)
        sel = [i for i in range(N_DOCS) if i % 2 == r]
        sh.add([str(i) for i in sel], DOCS[sel])
        sh.finalize()
        p = str(tmp_path / f"shard{r}")
        sh.save(p)
        paths.append(p)
    merged = SparseIndex.merge_saved(paths)
    assert merged.n_docs == N_DOCS
    np.testing.assert_array_equal(merged.count_tensor, full.count_tensor)
    got = merged.search(QS, k=10)
    want = full.search(QS, k=10)
    for g, w in zip(got, want):
        # saved shards round through fp16 weights; ranks at the top must hold
        overlap = len(set(g) & set(w))
        assert overlap >= 8, (g, w)
        best = max(w, key=w.get)
        assert best in g


def test_load_with_mesh_inverted_matches_single(mesh8, tmp_path):
    """SparseIndex.load(path, mesh) with an inverted-engine index must build
    per-shard postings (regression: load() previously built unsharded
    global-index postings that the sharded search path cannot use)."""
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=16, query_batch=4,
                      weight_dtype="float32", postings_cap=N_DOCS, query_terms=16)
    single = SparseIndex(V, cfg)
    single.add([str(i) for i in range(N_DOCS)], DOCS)
    single.finalize()
    p = str(tmp_path / "inv_idx")
    single.save(p)
    want = single.search(QS, k=10)

    loaded = SparseIndex.load(p, mesh=mesh8)
    got = loaded.search(QS, k=10)
    for x, y in zip(want, got):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            # save() stores weights fp16: worst-case rounding over l_max
            # terms of weight <=3.0 is ~l_max * 3 * 2^-11 ~ 0.05 absolute
            assert x[d] == pytest.approx(y[d], rel=1e-2)


def test_two_phase_small_block_docs():
    """two_phase with block_docs < k must not crash (regression: the phase-2
    candidate pool was capped at block_docs, breaking top_k(s2, k))."""
    cfg = IndexConfig(engine="sparse", l_max=32, block_docs=8, query_batch=4,
                      weight_dtype="float32")
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    got = idx.search(QS, k=20, two_phase=True)
    assert all(len(h) > 0 for h in got)


@pytest.mark.parametrize("engine", ["sparse", "inverted", "dense"])
def test_query_sharded_matches_single_device(mesh8, engine):
    """shard_by="queries": replicated index, query batch sharded over the
    mesh — results must match the unsharded engine exactly (fp32)."""
    kw = dict(weight_dtype="float32")
    if engine == "inverted":
        kw.update(postings_cap=N_DOCS, query_terms=16)
    single = build(engine, **kw)
    qsharded = build(engine, mesh=mesh8, shard_by="queries", **kw)
    assert qsharded._shard_queries
    # the rounded width lives on the index; the caller's cfg stays untouched
    assert qsharded._query_batch % 8 == 0
    assert qsharded.cfg.query_batch == 4
    a = single.search(QS, k=10)
    b = qsharded.search(QS, k=10)
    for x, y in zip(a, b):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            assert x[d] == pytest.approx(y[d], rel=1e-5)


def test_query_sharded_full_forward(mesh8):
    """Full-forward (wide-query) inverted search under query sharding."""
    kw = dict(postings_cap=N_DOCS, query_terms=4, weight_dtype="float32",
              full_query_terms=64, full_postings_cols=N_DOCS,
              full_rescore_expand=16)
    single = build("inverted", **kw)
    qsharded = build("inverted", mesh=mesh8, shard_by="queries", **kw)
    dense_q = make_sparse_reps(N_Q, nnz=64, seed=3)
    a = single.search(dense_q, k=10)
    b = qsharded.search(dense_q, k=10)
    for x, y in zip(a, b):
        assert set(x.keys()) == set(y.keys())
        for d in x:
            assert x[d] == pytest.approx(y[d], rel=1e-5)


def test_query_sharded_save_load_roundtrip(mesh8, tmp_path):
    idx = build("sparse", mesh=mesh8, shard_by="queries",
                weight_dtype="float32")
    want = idx.search(QS, k=5)
    idx.save(str(tmp_path / "qidx"))
    idx2 = SparseIndex.load(str(tmp_path / "qidx"))  # no mesh: single-device
    got = idx2.search(QS, k=5)
    for a, b in zip(want, got):
        assert set(a.keys()) == set(b.keys())


def test_merge_postings_matches_oneshot():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    r = np.random.default_rng(11)
    C = 8
    toks = r.integers(0, 64, size=(400, 12)).astype(np.int32)
    ws = r.gamma(2.0, 0.5, size=(400, 12)).astype(np.float32)
    ws[r.random((400, 12)) < 0.3] = 0.0
    want_d, want_w = inverted._build_postings_np(toks, ws, 64, C)
    a_d, a_w = inverted._build_postings_np(toks[:150], ws[:150], 64, C)
    b_d, b_w = inverted._build_postings_np(toks[150:], ws[150:], 64, C)
    b_d = np.where(b_d != inverted._PAD_ID, b_d + 150, b_d)
    got_d, got_w = inverted.merge_postings(a_d, a_w, b_d, b_w, row_chunk=7)
    np.testing.assert_allclose(got_w, want_w)
    np.testing.assert_array_equal(got_d, want_d)


def test_incremental_builder_matches_oneshot():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    r = np.random.default_rng(12)
    C = 16
    toks = r.integers(0, V, size=(900, 10)).astype(np.int32)
    ws = r.gamma(2.0, 0.5, size=(900, 10)).astype(np.float32)
    ws[r.random((900, 10)) < 0.2] = 0.0
    want_d, want_w = inverted.build_postings(toks, ws, V, C)
    b = inverted.IncrementalPostingsBuilder(V, C, unit=250)
    for s in range(0, 900, 250):
        b.feed(toks[s:s + 250], ws[s:s + 250], s)
    got_d, got_w = b.finish()
    np.testing.assert_allclose(got_w, want_w)
    np.testing.assert_array_equal(got_d, want_d)


def test_native_merge_matches_numpy_merge():
    """The C++ row-merge (incl. b_doc_offset) must match the numpy merge."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    lib = inverted._load_native()
    if not lib or getattr(lib, "merge_postings", None) is None:
        import pytest

        pytest.skip("native merge unavailable")
    r = np.random.default_rng(13)
    C = 8
    toks = r.integers(0, 64, size=(300, 12)).astype(np.int32)
    ws = r.gamma(2.0, 0.5, size=(300, 12)).astype(np.float32)
    ws[r.random((300, 12)) < 0.3] = 0.0
    a_d, a_w = inverted._build_postings_np(toks[:100], ws[:100], 64, C)
    b_d, b_w = inverted._build_postings_np(toks[100:], ws[100:], 64, C)
    # native path (applies the offset itself)
    got_d, got_w = inverted.merge_postings(a_d, a_w, b_d, b_w, b_doc_offset=100)
    # numpy oracle: offset applied by hand, native path disabled
    b_off = np.where(b_d != inverted._PAD_ID, b_d + 100, b_d)
    saved = inverted._native_lib
    inverted._native_lib = False
    try:
        want_d, want_w = inverted.merge_postings(a_d, a_w, b_off, b_w)
    finally:
        inverted._native_lib = saved
    np.testing.assert_allclose(got_w, want_w)
    np.testing.assert_array_equal(got_d, want_d)


def test_incremental_index_build_during_ingest():
    """Postings built on the background thread during add() produce the
    same search results as the synchronous finalize-time build."""
    kw = dict(postings_cap=64, query_terms=16, weight_dtype="float32")
    cfg_inc = IndexConfig(engine="inverted", l_max=32, block_docs=64,
                          query_batch=4, incremental_postings=True,
                          incremental_unit=64, **kw)
    cfg_sync = IndexConfig(engine="inverted", l_max=32, block_docs=64,
                           query_batch=4, incremental_postings=False, **kw)
    inc, sync = SparseIndex(V, cfg_inc), SparseIndex(V, cfg_sync)
    for idx in (inc, sync):
        for s in range(0, N_DOCS, 50):
            batch = DOCS[s:s + 50]
            idx.add([str(i) for i in range(s, s + batch.shape[0])], batch)
    assert inc._inc is not None and inc._inc_fed >= 256  # fed during ingest
    assert sync._inc is None
    inc.finalize()
    sync.finalize()
    np.testing.assert_array_equal(
        np.asarray(inc._post_docs), np.asarray(sync._post_docs)
    )
    a = inc.search(QS, k=10)
    b = sync.search(QS, k=10)
    for x, y in zip(a, b):
        assert x == y


def test_incremental_activates_on_auto_threshold():
    cfg = IndexConfig(engine="auto", auto_threshold=150, l_max=32,
                      block_docs=64, query_batch=4, incremental_postings=True,
                      incremental_unit=64, postings_cap=64,
                      weight_dtype="float32")
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(100)], DOCS[:100])
    assert idx._inc is None  # below threshold: engine could still be sparse
    idx.add([str(i) for i in range(100, 300)], DOCS[100:300])
    assert idx._inc is not None  # crossed: all accumulated rows fed
    idx.finalize()
    assert idx._engine == "inverted"
    got = idx.search(QS, k=10)
    oracle = build("inverted", postings_cap=64, weight_dtype="float32")
    want = oracle.search(QS, k=10)
    for x, y in zip(got, want):
        assert set(x.keys()) == set(y.keys())


def test_reopen_preserves_postings_delta():
    """Serving NRT loop (_bulk -> _refresh): reopen() seeds the next
    builder with the already-merged postings, so re-finalize feeds only the
    NEW rows (refresh cost ∝ delta, not corpus) and results match a
    from-scratch build of the full corpus."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    kw = dict(postings_cap=64, query_terms=16, weight_dtype="float32")
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=64,
                      query_batch=4, incremental_postings=True,
                      incremental_unit=64, **kw)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(200)], DOCS[:200])
    idx.finalize()
    idx.reopen()
    assert idx._inc is not None and idx._inc_fed == 200  # seeded, delta-only

    fed = []
    orig = inverted.build_postings

    def spy(toks, ws, vocab, cap):
        fed.append(toks.shape[0])
        return orig(toks, ws, vocab, cap)

    inverted.build_postings = spy
    try:
        idx.add([str(i) for i in range(200, N_DOCS)], DOCS[200:])
        idx.finalize()
    finally:
        inverted.build_postings = orig
    assert sum(fed) == N_DOCS - 200, fed  # only the delta went through

    want = build("inverted", postings_cap=64, weight_dtype="float32").search(QS, k=10)
    got = idx.search(QS, k=10)
    for x, y in zip(got, want):
        assert x == y

    # refresh with NO new docs: postings carry over without any rebuild
    idx.reopen()
    inverted.build_postings = spy
    fed.clear()
    try:
        idx.finalize()
    finally:
        inverted.build_postings = orig
    assert fed == [], fed
    got = idx.search(QS, k=10)
    for x, y in zip(got, want):
        assert x == y


def test_fetch_packed_roundtrips_scores_and_ids():
    """The packed single-fetch must round-trip doc ids bit-exactly. Ids
    bitcast to f32 are denormals and the TPU flushes them to zero in the
    fused concat (measured on v5e: every id came back 0) — the packing must
    therefore live in int space. This CPU test pins the host-side
    split/view logic; the TPU job tools/ jobs re-verify on hardware."""
    import jax.numpy as jnp

    from opensearch_sparse_model_tuning_sample_tpu.index.engine import (
        _fetch_packed,
    )

    s = jnp.asarray(np.linspace(0.1, 35.0, 48, dtype=np.float32).reshape(6, 8))
    ids = jnp.asarray(
        np.array([[0, 1, 2, 3, 4, 5, 550, 8_800_000]] * 6, dtype=np.int32)
    )
    s_np, i_np, b_np, e_np = _fetch_packed(s, ids, 5)
    assert b_np is None and e_np is None
    assert s_np.shape == (5, 8) and i_np.shape == (5, 8)
    np.testing.assert_array_equal(i_np, np.asarray(ids)[:5])
    np.testing.assert_array_equal(s_np, np.asarray(s)[:5])
    assert i_np.dtype == np.int32 and s_np.dtype == np.float32
    # with per-query bounds packed as a third segment
    bounds = jnp.asarray(np.linspace(0.0, 3.0, 6, dtype=np.float32))
    s2, i2, b2, e2 = _fetch_packed(s, ids, 5, bounds)
    assert e2 is None
    np.testing.assert_array_equal(i2, np.asarray(ids)[:5])
    np.testing.assert_array_equal(s2, np.asarray(s)[:5])
    np.testing.assert_array_equal(b2, np.asarray(bounds)[:5])
    # with fused-escalation stage codes packed as a fourth segment
    # (0 = shallow-certified, 1 = deep-tier re-run, 2 = exact-scan
    # fallthrough — int32 on the wire since the stage-code change)
    esc = jnp.asarray(np.array([0, 1, 2, 0, 1, 2], dtype=np.int32))
    s3, i3, b3, e3 = _fetch_packed(s, ids, 5, bounds, esc)
    np.testing.assert_array_equal(i3, np.asarray(ids)[:5])
    np.testing.assert_array_equal(b3, np.asarray(bounds)[:5])
    np.testing.assert_array_equal(e3, np.asarray(esc)[:5])
    assert e3.dtype == np.int32


# ------------------------------------------------- exactness certificate


def _diffuse_corpus(n_docs, vocab, l_max, seed=3):
    """Zipf-popular tokens, i.i.d. gamma weights, unique tokens per doc —
    the weight distribution where impact-ordered truncation fails."""
    r = np.random.default_rng(seed)
    pop = r.zipf(1.3, size=vocab).astype(np.float64)
    cdf = np.cumsum(pop / pop.sum())
    toks = np.searchsorted(cdf, r.random((n_docs, l_max))).astype(np.int32)
    ws = r.gamma(2.0, 0.5, size=(n_docs, l_max)).astype(np.float32)
    key = (toks.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - ws.view(np.uint32).astype(np.uint64)
    )
    order = np.argsort(key, axis=1, kind="stable")
    toks = np.take_along_axis(toks, order, axis=1)
    ws = np.take_along_axis(ws, order, axis=1)
    rep = np.zeros_like(ws, dtype=bool)
    rep[:, 1:] = toks[:, 1:] == toks[:, :-1]
    ws = np.where(rep, 0.0, ws)
    toks = np.where(ws > 0, toks, 0)
    order = np.argsort(-ws, axis=1)
    return (np.take_along_axis(toks, order, axis=1),
            np.take_along_axis(ws, order, axis=1))


def _rich_corpus(n_docs, vocab, l_max, seed=3):
    """Zipf-PMF (rank^-0.8) popularities — docs keep ~l_max UNIQUE tokens
    after dedupe, so queries sampled from a doc can actually be wide.
    (_diffuse_corpus draws zipf(1.3) SAMPLES as popularities — the
    infinite-mean draw concentrates ~all mass on one token and docs
    collapse to 1-3 unique terms; good for stressing truncation, useless
    for wide-query routing.)"""
    r = np.random.default_rng(seed)
    pop = np.arange(1, vocab + 1, dtype=np.float64) ** -0.8
    r.shuffle(pop)
    cdf = np.cumsum(pop / pop.sum())
    toks = np.searchsorted(cdf, r.random((n_docs, l_max))).astype(np.int32)
    ws = r.gamma(2.0, 0.5, size=(n_docs, l_max)).astype(np.float32)
    key = (toks.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - ws.view(np.uint32).astype(np.uint64)
    )
    order = np.argsort(key, axis=1, kind="stable")
    toks = np.take_along_axis(toks, order, axis=1)
    ws = np.take_along_axis(ws, order, axis=1)
    rep = np.zeros_like(ws, dtype=bool)
    rep[:, 1:] = toks[:, 1:] == toks[:, :-1]
    ws = np.where(rep, 0.0, ws)
    toks = np.where(ws > 0, toks, 0)
    order = np.argsort(-ws, axis=1)
    return (np.take_along_axis(toks, order, axis=1),
            np.take_along_axis(ws, order, axis=1))


def _corpus_queries(toks, ws, n_q, width, seed=4):
    r = np.random.default_rng(seed)
    q_tok = np.zeros((n_q, width), np.int32)
    q_w = np.zeros((n_q, width), np.float32)
    for i in range(n_q):
        row = toks[r.integers(0, toks.shape[0])]
        row = row[row > 0]
        pick = r.choice(row, size=min(width, len(row)), replace=False)
        q_tok[i, : len(pick)] = pick
        q_w[i, : len(pick)] = r.uniform(2.0, 10.0, size=len(pick))
    return q_tok, q_w


def _build_rows(engine, toks, ws, vocab, **cfg_kw):
    cfg = IndexConfig(engine=engine, l_max=toks.shape[1], block_docs=256,
                      query_batch=8, weight_dtype="float32", **cfg_kw)
    ix = SparseIndex(vocab, cfg)
    ix.doc_ids = [str(i) for i in range(toks.shape[0])]
    ix._tok_chunks = [toks]
    ix._w_chunks = [ws]
    ix.finalize()
    return ix


def test_certificate_certifies_and_is_sound_when_nothing_truncated():
    """With postings_cap >= every token's doc frequency nothing is ever
    truncated: the bound must certify (nearly) all queries, and every
    certified query's top-k must equal the exact scan's."""
    vocab = 700
    toks, ws = _diffuse_corpus(500, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=512, query_terms=8)
    scan = _build_rows("sparse", toks, ws, vocab)
    ih = inv.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    cert = inv.last_certified
    assert cert is not None and cert.sum() >= 14, cert
    for qi in np.flatnonzero(cert):
        assert set(ih[qi]) == set(sh[qi])
        for d, s in ih[qi].items():
            assert abs(s - sh[qi][d]) < 1e-3


def test_certificate_flags_truncation_and_escalation_restores_exact():
    """Small cap + popular-token queries on diffuse weights: candidate
    generation misses true winners. The certificate must NOT certify those
    queries, and exact_escalate must restore the exact top-k for all."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=64, query_terms=8)
    scan = _build_rows("sparse", toks, ws, vocab)
    ih = inv.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    wrong = [i for i, (a, b) in enumerate(zip(ih, sh)) if set(a) != set(b)]
    cert = inv.last_certified
    # soundness: every wrong query must be uncertified
    for qi in wrong:
        assert not cert[qi], f"query {qi} wrong but certified"
    esc = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=64, query_terms=8, exact_escalate=True)
    eh = esc.search_tokens(q_tok, q_w, k=5)
    for a, b in zip(eh, sh):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_certificate_on_doc_sharded_mesh(mesh8):
    """Sharded corpus: the global bound is the max of per-shard bounds;
    certified queries must match the exact sharded scan."""
    vocab = 700
    toks, ws = _diffuse_corpus(512, vocab, l_max=24, seed=7)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=8, width=5, seed=8)
    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=32,
                      query_batch=8, weight_dtype="float32",
                      postings_cap=512, query_terms=8)
    inv = SparseIndex(vocab, cfg, mesh8)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    scan = _build_rows("sparse", toks, ws, vocab)
    ih = inv.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    cert = inv.last_certified
    assert cert is not None and cert.sum() >= 6, cert
    for qi in np.flatnonzero(cert):
        assert set(ih[qi]) == set(sh[qi])


def test_escalation_skips_padding_rows_and_flags_read_exact():
    """Serve's pow2 micro-batcher and the eval chunk driver pad query
    batches with all-zero rows. Those rows are trivially exact (empty
    top-k): exact_escalate must not mark them escalated, and after
    escalation last_certified reads True for every row while
    last_escalated marks only the real re-runs. Single-device escalation
    is FUSED into the search dispatch (lax.cond exact-scan splice), so the
    host must issue exactly ONE dispatch — no second sparse pass."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=6, width=5)
    q_tok = np.concatenate([q_tok, np.zeros((2, 5), np.int32)])
    q_w = np.concatenate([q_w, np.zeros((2, 5), np.float32)])
    # tiny cap on a dense-df corpus: the REAL queries hit truncation and
    # genuinely escalate (with a full cap the zero-miss rule certifies
    # everything and no escalation would happen at all)
    inv = _build_rows("inverted", toks, ws, vocab, postings_cap=8,
                      query_terms=8, exact_escalate=True)
    calls = []
    orig = inv._dispatch_queries

    def spy(q, k, two_phase, engine=None):
        n = (q[0] if isinstance(q, tuple) else q).shape[0]
        calls.append((int(n), engine))
        return orig(q, k, two_phase, engine)

    inv._dispatch_queries = spy
    hits = inv.search_tokens(q_tok, q_w, k=5)
    assert hits[6] == {} and hits[7] == {}
    cert, esc = inv.last_certified, inv.last_escalated
    assert cert is not None and cert.all(), cert
    assert esc is not None and esc.any() and not esc[6] and not esc[7]
    # fused path: the whole thing — search + certify + escalate — is one
    # host dispatch; a separate "sparse" pass would betray the old
    # two-round-trip host escalation (these narrow slots ride the
    # round-5 token fast path)
    assert calls == [(8, "inverted_tokens")], calls
    # and the escalated rows really are exact
    scan = _build_rows("sparse", toks, ws, vocab)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    for qi in np.flatnonzero(esc):
        assert set(hits[qi]) == set(sh[qi])


def test_make_search_fn_validates_pool_vs_k():
    """k beyond the candidate pool (query_terms*postings_cols) raises a
    named ValueError instead of an opaque top_k trace error."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    pd = np.full((16, 2), -1, np.int32)
    pw = np.zeros((16, 2), np.float32)
    with pytest.raises(ValueError, match="candidate pool"):
        inverted.make_search_fn(pd, pw, np.zeros((4, 2), np.int32),
                                np.zeros((4, 2), np.float32),
                                query_terms=2, k=10)


def test_build_postings_rejects_out_of_range_ids():
    """Out-of-range token ids raise cleanly on BOTH the native and numpy
    paths (the C++ builder would otherwise corrupt the heap silently)."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    toks = np.array([[1, 99]], np.int32)  # 99 >= vocab_size=16
    ws = np.array([[1.0, 2.0]], np.float32)
    with pytest.raises((ValueError, IndexError)):
        inverted.build_postings(toks, ws, 16, 4)


def test_nonrescore_certificate_tolerates_fp_noise():
    """With rescore off and nothing truncated, the certificate must read
    certified even though total_ub and sel_max sum the same products in
    different f32 orders (a zero-tolerance test left every exact query
    uncertified and, under exact_escalate, re-running the full scan)."""
    rng = np.random.default_rng(3)
    V = 256
    reps = np.zeros((64, V), np.float32)
    for i in range(64):
        # many active terms so the [B,V] matvec vs masked [B,T] sum
        # reduction orders actually differ
        sel = rng.choice(V, 24, replace=False)
        reps[i, sel] = rng.uniform(0.1, 3.0, 24)
    cfg = IndexConfig(engine="inverted", l_max=32, block_docs=32,
                      query_batch=4, postings_cap=64, query_terms=32,
                      inverted_rescore=False)
    idx = SparseIndex(V, cfg)
    idx.add([str(i) for i in range(64)], reps)
    idx.finalize()
    q = np.zeros((4, V), np.float32)
    for i in range(4):
        sel = rng.choice(V, 16, replace=False)
        q[i, sel] = rng.uniform(0.5, 2.0, 16)
    idx.search(q, k=5)
    # cap=64 >= n_docs and T=32 >= active terms: nothing truncated anywhere
    assert bool(np.all(idx.last_certified)), idx.last_certified


def test_empty_query_batch_returns_empty_list():
    """A query set that filtered to nothing must not crash the batch
    driver (scan/dense) or the inverted width check."""
    for engine in ("sparse", "inverted"):
        idx = build(engine, postings_cap=32, query_terms=8)
        assert idx.search(np.zeros((0, V), np.float32), k=5) == []
        assert idx.last_certified is None


def test_finalize_does_not_mutate_callers_config(mesh8):
    """shard_by=queries rounds the batch width up internally; the caller's
    IndexConfig object must stay untouched (it may be shared across
    indexes and is what persistence snapshots)."""
    cfg = IndexConfig(engine="sparse", l_max=8, block_docs=32,
                      query_batch=3, shard_by="queries")
    idx = SparseIndex(V, cfg, mesh8)
    idx.add([str(i) for i in range(N_DOCS)], DOCS)
    idx.finalize()
    assert cfg.query_batch == 3  # caller's object untouched
    assert idx._query_batch % 8 == 0  # resolved width on the index
    got = idx.search(QS, k=5)
    assert len(got) == N_Q


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_cross_engine_parity(trial):
    """Randomized configs/shapes: the scan engine must match numpy brute
    force, and the inverted engine with exact_escalate must match the scan
    exactly — across cap/term/block/l_max corners a fixed-shape test never
    visits."""
    r = np.random.default_rng(1000 + trial)
    vocab = int(r.integers(64, 512))
    n_docs = int(r.integers(3, 200))
    nnz = int(r.integers(1, min(24, vocab)))
    l_max = int(r.integers(max(2, nnz // 2), 33))
    k = int(r.integers(1, 12))
    docs = np.zeros((n_docs, vocab), np.float32)
    for i in range(n_docs):
        sel = r.choice(vocab, size=nnz, replace=False)
        docs[i, sel] = r.uniform(0.05, 4.0, nnz)
    n_q = int(r.integers(1, 9))
    qs = np.zeros((n_q, vocab), np.float32)
    for i in range(n_q):
        sel = r.choice(vocab, size=int(r.integers(1, 9)), replace=False)
        qs[i, sel] = r.uniform(0.2, 2.0, len(sel))

    # truncate brute force the same way l_max does (top-l_max per doc)
    kept = np.zeros_like(docs)
    top = np.argsort(-docs, axis=1)[:, :l_max]
    np.put_along_axis(kept, top, np.take_along_axis(docs, top, axis=1), axis=1)
    brute = qs @ kept.T

    scan = SparseIndex(vocab, IndexConfig(
        engine="sparse", l_max=l_max, block_docs=int(r.integers(8, 65)),
        query_batch=int(r.integers(1, 9)), weight_dtype="float32"))
    scan.add([str(i) for i in range(n_docs)], docs)
    scan.finalize()
    got = scan.search(qs, k=k)
    for qi, hits in enumerate(got):
        want = {str(i): brute[qi, i] for i in np.argsort(-brute[qi])[:k]
                if brute[qi, i] > 0}
        assert set(hits.keys()) == set(want.keys()), (trial, qi)
        for d in hits:
            assert hits[d] == pytest.approx(want[d], rel=1e-4), (trial, qi, d)

    qt = int(r.integers(1, 17))
    cap = int(r.integers(1, n_docs + 8))
    if qt * max(cap, 1) < k:
        cap = k  # satisfy the candidate-pool validation by construction
    inv = SparseIndex(vocab, IndexConfig(
        engine="inverted", l_max=l_max, block_docs=int(r.integers(8, 65)),
        query_batch=int(r.integers(1, 9)), postings_cap=cap, query_terms=qt,
        weight_dtype="float32", exact_escalate=True))
    inv.add([str(i) for i in range(n_docs)], docs)
    inv.finalize()
    got_i = inv.search(qs, k=k)
    for a, b in zip(got_i, got):
        # exact escalation: same doc set and scores as the exact scan
        # (ties at the k-th score may swap members — compare score sets)
        sa = sorted(a.values(), reverse=True)
        sb = sorted(b.values(), reverse=True)
        assert sa == pytest.approx(sb, rel=1e-3), trial
    assert bool(np.all(inv.last_certified))


def test_zero_miss_certificate_with_fewer_than_k_matches():
    """A query matching FEWER than k docs has kth = -inf, which the
    kth >= bound rule alone can never certify — but when nothing was
    truncated the candidate pool provably holds every positive-scoring
    doc, so the engine must return bound = -inf and certify (the common
    rare-token regime: without this, exact_escalate re-runs a
    corpus-linear scan for queries that were already exact)."""
    vocab = 64
    n_docs = 40
    rng = np.random.default_rng(11)
    reps = np.zeros((n_docs, vocab), np.float32)
    for i in range(n_docs):
        sel = rng.choice(np.arange(8, vocab), 6, replace=False)
        reps[i, sel] = rng.uniform(0.5, 2.0, 6)
    reps[:3, 5] = [1.0, 2.0, 3.0]  # token 5: df=3 < k
    cfg = IndexConfig(engine="inverted", l_max=16, block_docs=32,
                      query_batch=4, weight_dtype="float32",
                      postings_cap=64, query_terms=8)
    idx = SparseIndex(vocab, cfg)
    idx.add([str(i) for i in range(n_docs)], reps)
    idx.finalize()
    q = np.zeros((1, vocab), np.float32)
    q[0, 5] = 1.0
    hits = idx.search(q, k=5)
    assert set(hits[0]) == {"0", "1", "2"}
    assert idx.last_certified is not None and bool(idx.last_certified[0])


def test_auto_resolved_inverted_escalates_by_default():
    """engine="auto" resolving to the inverted engine turns
    exact_escalate ON (auto keeps the scan's exact contract); explicitly
    chosen engines keep the approximate contract unless pinned."""
    vocab = 400
    toks, ws = _diffuse_corpus(600, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=12, width=5)
    # tiny cap: candidate generation genuinely misses docs -> escalation
    # is what restores exactness
    auto = _build_rows("auto", toks, ws, vocab, auto_threshold=10,
                       postings_cap=16, query_terms=8)
    assert auto._engine == "inverted" and auto._exact_escalate
    explicit = _build_rows("inverted", toks, ws, vocab,
                           postings_cap=16, query_terms=8)
    assert not explicit._exact_escalate
    scan = _build_rows("sparse", toks, ws, vocab)
    ah = auto.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    assert auto.last_certified is not None and auto.last_certified.all()
    for a, b in zip(ah, sh):
        assert sorted(a.values(), reverse=True) == pytest.approx(
            sorted(b.values(), reverse=True), rel=1e-3)
    # auto below the threshold still resolves to the exact scan: no flags
    small = _build_rows("auto", toks[:8], ws[:8], vocab, auto_threshold=100)
    assert small._engine == "sparse" and not small._exact_escalate


def test_auto_escalation_contract_survives_save_load(tmp_path):
    """An index built by auto-resolution (exact_escalate=None -> ON) must
    keep escalating after save/load, even though load pins the resolved
    engine name (which would re-resolve a None to OFF)."""
    vocab = 400
    toks, ws = _diffuse_corpus(300, vocab, l_max=24)
    auto = _build_rows("auto", toks, ws, vocab, auto_threshold=10,
                       postings_cap=16, query_terms=8)
    assert auto._exact_escalate
    auto.save(str(tmp_path / "ix"))
    loaded = SparseIndex.load(str(tmp_path / "ix"))
    assert loaded._engine == "inverted" and loaded._exact_escalate
    # and an explicitly-approximate index stays approximate through disk
    approx = _build_rows("inverted", toks, ws, vocab,
                         postings_cap=16, query_terms=8)
    approx.save(str(tmp_path / "ix2"))
    loaded2 = SparseIndex.load(str(tmp_path / "ix2"))
    assert not loaded2._exact_escalate


def test_packed_and_sorted_rescore_variants_match_base():
    """`packed_docs` (one int32 row packing bf16-weight-bits|int16-token)
    and `sort_candidates` are pure gather-layout experiments: scores, ids,
    and the certificate bound must be IDENTICAL to the two-array baseline
    when the baseline's doc weights are the same bf16-truncated values the
    pack stores."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    vocab = 600
    toks, ws = _diffuse_corpus(400, vocab, l_max=24)
    pd, pw = inverted.build_postings(toks, ws, vocab, 32)
    d_pd = jnp.asarray(pd)
    d_pw = jnp.asarray(pw, dtype=jnp.bfloat16)
    d_toks = jnp.asarray(toks.astype(np.int16))
    d_ws = jnp.asarray(ws, dtype=jnp.bfloat16)
    d_packed = jnp.asarray(inverted.pack_doc_rows(toks, ws))

    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    qs = np.zeros((16, vocab), np.float32)
    np.put_along_axis(qs, q_tok, q_w, axis=1)
    qs[:, 0] = 0.0

    def run(dt, dw, **kw):
        fn = inverted.make_search_fn(
            d_pd, d_pw, dt, dw, query_terms=8, k=5,
            with_bound=True, **kw)
        s, ids, bound = fn(jnp.asarray(qs), d_pd, d_pw, dt, dw)
        return np.asarray(s), np.asarray(ids), np.asarray(bound)

    s0, i0, b0 = run(d_toks, d_ws)
    for kw in (dict(sort_candidates=True),
               dict(packed_docs=True),
               dict(packed_docs=True, sort_candidates=True)):
        dt = d_packed if kw.get("packed_docs") else d_toks
        dw = None if kw.get("packed_docs") else d_ws
        s, ids, b = run(dt, dw, **kw)
        np.testing.assert_allclose(s, s0, rtol=1e-5, err_msg=str(kw))
        np.testing.assert_array_equal(ids, i0, err_msg=str(kw))
        np.testing.assert_allclose(b, b0, rtol=1e-5, err_msg=str(kw))


def test_pack_doc_rows_rejects_wide_vocab_and_roundtrips():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    toks = np.array([[1, 30521, 0]], np.int32)
    ws = np.array([[0.5, 3.25, 0.0]], np.float32)
    packed = inverted.pack_doc_rows(toks, ws)
    np.testing.assert_array_equal(packed & 0xFFFF, toks)
    wb = (packed.view(np.uint32) >> 16).astype(np.uint16)
    back = wb.view(np.dtype(jnp.bfloat16)).astype(np.float32)
    np.testing.assert_allclose(back, ws, rtol=2**-8)
    with pytest.raises(ValueError, match="2\\*\\*15"):
        inverted.pack_doc_rows(np.array([[2**15]], np.int32), ws[:, :1])


def test_escalation_on_doc_sharded_mesh_matches_scan(mesh8):
    """Sharded corpora still escalate through the HOST second pass (the
    fused lax.cond splice is single-device only): exact_escalate on a mesh
    must restore the exact top-k and set the same flags contract."""
    vocab = 400
    toks, ws = _diffuse_corpus(2048, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=8, width=5)
    # cap=2: per-SHARD postings (256 docs each) must still truncate hard
    # enough that candidate generation genuinely misses true winners
    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=32,
                      query_batch=8, weight_dtype="float32",
                      postings_cap=2, query_terms=8, exact_escalate=True)
    inv = SparseIndex(vocab, cfg, mesh8)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    scan = _build_rows("sparse", toks, ws, vocab)
    ih = inv.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified is not None and inv.last_certified.all()
    assert inv.last_escalated is not None and inv.last_escalated.any()
    for a, b in zip(ih, sh):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_fused_escalation_compact_and_full_branches():
    """The fused splice scans a compact 8-row slice when few rows escalate
    and the whole batch when many do — BOTH branches must restore the
    exact scan's results for every row."""
    vocab = 2000  # wide enough that the Zipf tail holds df<=cap tokens
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=256,
                      query_batch=16, weight_dtype="float32",
                      postings_cap=8, query_terms=8, exact_escalate=True)
    inv = SparseIndex(vocab, cfg)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    scan = _build_rows("sparse", toks, ws, vocab)

    df = np.bincount(toks[toks > 0].ravel(), minlength=vocab)
    rare = np.flatnonzero((df > 0) & (df <= cfg.postings_cap))
    assert rare.size >= 5, "corpus lacks rare tokens for the test"
    r = np.random.default_rng(9)
    # probe: wide queries of the highest-df tokens; their postings rows are
    # cut hardest at cap=8 so SOME rows fail to certify (which ones is
    # distribution-dependent — the probe finds one deterministically)
    top = np.argsort(-df)[:24]
    pr_tok = np.zeros((16, 8), np.int32)
    pr_w = np.zeros((16, 8), np.float32)
    for i2 in range(16):
        pr_tok[i2] = r.choice(top, size=8, replace=False)
        pr_w[i2] = r.uniform(2.0, 10.0, size=8)
    inv.search_tokens(pr_tok, pr_w, k=5)
    hard = np.flatnonzero(inv.last_escalated)
    assert hard.size >= 1, "probe produced no escalating query"
    hj = hard[0]  # one known-escalating query; duplicates escalate alike

    def rare_queries(n):
        q_tok = np.zeros((n, 8), np.int32)
        q_w = np.zeros((n, 8), np.float32)
        for i2 in range(n):
            pick = r.choice(rare, size=min(5, rare.size), replace=False)
            q_tok[i2, : len(pick)] = pick
            q_w[i2, : len(pick)] = r.uniform(2.0, 10.0, size=len(pick))
        return q_tok, q_w

    # load A: 3 copies of the hard query + 13 rare-token queries (zero-miss
    # certified) -> exactly 3 escalations, COMPACT branch
    ra_tok, ra_w = rare_queries(13)
    qa_tok = np.concatenate([np.tile(pr_tok[hj], (3, 1)), ra_tok])
    qa_w = np.concatenate([np.tile(pr_w[hj], (3, 1)), ra_w])
    ha = inv.search_tokens(qa_tok, qa_w, k=5)
    esc_a = inv.last_escalated
    assert inv.last_certified.all()
    assert esc_a is not None and list(np.flatnonzero(esc_a)) == [0, 1, 2]
    sa = scan.search_tokens(qa_tok, qa_w, k=5)
    for a, b in zip(ha, sa):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3

    # load B: 16 copies of the hard query -> every row escalates, FULL
    # branch (> E=8)
    qb_tok = np.tile(pr_tok[hj], (16, 1))
    qb_w = np.tile(pr_w[hj], (16, 1))
    hb = inv.search_tokens(qb_tok, qb_w, k=5)
    esc_b = inv.last_escalated
    assert inv.last_certified.all()
    assert esc_b is not None and esc_b.sum() == 16, esc_b.sum()
    sb = scan.search_tokens(qb_tok, qb_w, k=5)
    for a, b in zip(hb, sb):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_escalation_on_query_sharded_mesh(mesh8):
    """shard_by="queries" + exact_escalate: the host second pass re-runs
    uncertified rows through the query-sharded exact scan. Results must
    match the single-device scan; flags contract as usual."""
    vocab = 400
    toks, ws = _diffuse_corpus(2048, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=32,
                      query_batch=16, weight_dtype="float32",
                      postings_cap=2, query_terms=8, exact_escalate=True,
                      shard_by="queries")
    inv = SparseIndex(vocab, cfg, mesh8)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    scan = _build_rows("sparse", toks, ws, vocab)
    ih = inv.search_tokens(q_tok, q_w, k=5)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified is not None and inv.last_certified.all()
    assert inv.last_escalated is not None and inv.last_escalated.any()
    for a, b in zip(ih, sh):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_certified_mask_device_host_lockstep():
    """One certificate rule serves the device fused path (jnp) and the host
    path (np): they must agree everywhere, including the +-inf bound edge
    cases the zero-miss/truncation logic produces."""
    import jax.numpy as jnp

    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    kth = np.array([5.0, 5.0, 5.0, -np.inf, -np.inf, 0.0, 100.0],
                   np.float32)
    bound = np.array([4.0, 5.0, 5.0005, -np.inf, np.inf, 0.0, 100.02],
                     np.float32)
    host = inverted.certified_mask(kth, bound, xp=np)
    dev = np.asarray(inverted.certified_mask(jnp.asarray(kth),
                                             jnp.asarray(bound)))
    np.testing.assert_array_equal(host, dev)
    # semantics: clear win certifies, borderline tie does not, -inf bound
    # (zero-miss) certifies even a -inf kth, +inf bound never certifies
    assert list(host) == [True, False, False, True, False, True, False]


def test_pack_doc_rows_rejects_negative_ids_and_f32_postings():
    import jax.numpy as jnp

    from opensearch_sparse_model_tuning_sample_tpu.index import inverted

    with pytest.raises(ValueError, match=r"\[0, 2\*\*15\)"):
        inverted.pack_doc_rows(np.array([[-1]], np.int32),
                               np.array([[1.0]], np.float32))
    # packed_docs + f32 postings would compute the exactness bound from
    # untruncated weights while rescoring bf16-truncated ones
    toks = np.array([[1, 2]], np.int32)
    ws = np.array([[1.0, 2.0]], np.float32)
    pd, pw = inverted.build_postings(toks, ws, 16, 4)
    packed = jnp.asarray(inverted.pack_doc_rows(toks, ws))
    with pytest.raises(ValueError, match="bfloat16"):
        inverted.make_search_fn(
            jnp.asarray(pd), jnp.asarray(pw, dtype=jnp.float32), packed,
            None, query_terms=2, k=1, with_bound=True, packed_docs=True)


def test_fused_escalation_tier_ladder_bq64():
    """Every tier of the geometric compact-escalation ladder at
    query_batch=64 (tiers 8, 16, 32, then the full-width scan) must restore
    the exact scan's results: loads engineered to escalate ~3, ~12, ~25 and
    ~40 rows land in each band (ADVICE r3: the middle tiers were never
    exercised by CI at query_batch=16)."""
    vocab = 2000
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=256,
                      query_batch=64, weight_dtype="float32",
                      postings_cap=8, query_terms=8, exact_escalate=True)
    inv = SparseIndex(vocab, cfg)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    scan = _build_rows("sparse", toks, ws, vocab)

    df = np.bincount(toks[toks > 0].ravel(), minlength=vocab)
    rare = np.flatnonzero((df > 0) & (df <= cfg.postings_cap))
    r = np.random.default_rng(11)
    # probe for a deterministically escalating query (see the Bq=16 test)
    top = np.argsort(-df)[:24]
    pr_tok = np.zeros((64, 8), np.int32)
    pr_w = np.zeros((64, 8), np.float32)
    for i in range(64):
        pr_tok[i] = r.choice(top, size=8, replace=False)
        pr_w[i] = r.uniform(2.0, 10.0, size=8)
    inv.search_tokens(pr_tok, pr_w, k=5)
    hard = np.flatnonzero(inv.last_escalated)
    assert hard.size >= 1
    hj = hard[0]

    def rare_queries(n):
        q_tok = np.zeros((n, 8), np.int32)
        q_w = np.zeros((n, 8), np.float32)
        for i in range(n):
            pick = r.choice(rare, size=min(5, rare.size), replace=False)
            q_tok[i, : len(pick)] = pick
            q_w[i, : len(pick)] = r.uniform(2.0, 10.0, size=len(pick))
        return q_tok, q_w

    for n_esc in (3, 12, 25, 40):  # bands <=8, 9-16, 17-32, >32
        ra_tok, ra_w = rare_queries(64 - n_esc)
        q_tok = np.concatenate([np.tile(pr_tok[hj], (n_esc, 1)), ra_tok])
        q_w = np.concatenate([np.tile(pr_w[hj], (n_esc, 1)), ra_w])
        got = inv.search_tokens(q_tok, q_w, k=5)
        assert inv.last_certified.all()
        n_got = int(inv.last_escalated.sum())
        assert n_got == n_esc, (n_got, n_esc)
        want = scan.search_tokens(q_tok, q_w, k=5)
        for a, b in zip(got, want):
            assert set(a) == set(b)
            for d in a:
                assert abs(a[d] - b[d]) < 1e-3


# ------------------------------------------------- tiered adaptive depth


def test_split_postings_unit():
    from opensearch_sparse_model_tuning_sample_tpu.index.inverted import (
        _PAD_ID,
        build_postings,
        split_postings,
    )

    toks = np.array([[1, 2, 0], [1, 3, 0], [1, 0, 0], [2, 1, 0]], np.int32)
    ws = np.array([[3.0, 2.0, 0], [2.5, 1.0, 0], [2.0, 0, 0], [4.0, 1.5, 0]],
                  np.float32)
    pd, pw = build_postings(toks, ws, vocab_size=5, postings_cap=4)
    bd, bw, ed, ew, dm = split_postings(pd, pw, base_cap=2)
    # token 1 has 4 postings (> base 2) -> deep; tokens 2,3 have <= 2
    assert dm[1] == 0 and ed.shape == (2, 2)  # 1 deep token + pad row
    assert list(bw[1]) == [3.0, 2.5]  # impact-sorted base
    assert list(ew[0]) == [2.0, 1.5]  # extension continues the same list
    assert (ew[-1] == 0).all() and (ed[-1] == _PAD_ID).all()  # pad row
    for t in (0, 2, 3, 4):
        assert dm[t] == 1  # non-deep -> pad row


def test_tiered_ext_sound_and_improves_certification():
    """postings_ext_cap + deep_slots: certificates stay SOUND (certified =>
    exact-scan-identical) and the certified fraction strictly improves over
    the same base cap without the extension — the adaptive-depth analog of
    Lucene WAND's data-dependent visit depth (reference search.py:59-70)."""
    vocab = 400
    toks, ws = _diffuse_corpus(3000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5)
    scan = _build_rows("sparse", toks, ws, vocab)
    sh = scan.search_tokens(q_tok, q_w, k=5)

    base = _build_rows("inverted", toks, ws, vocab,
                       postings_cap=64, query_terms=8)
    base.search_tokens(q_tok, q_w, k=5)
    base_cert = base.last_certified.mean()

    ext = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=64, postings_ext_cap=3000, deep_slots=4,
                      query_terms=8)
    assert ext._ext_docs is not None and ext._ext_docs.shape[0] > 1
    eh = ext.search_tokens(q_tok, q_w, k=5)
    ext_cert = ext.last_certified
    assert ext_cert.mean() > base_cert, (ext_cert.mean(), base_cert)
    # full-depth extension on every queried term -> every query certifies
    # here (the deep set covers the popular tokens the queries draw)
    for qi in np.flatnonzero(ext_cert):
        assert set(eh[qi]) == set(sh[qi]), qi
        for d, s in eh[qi].items():
            assert abs(s - sh[qi][d]) < 1e-3


def test_tiered_ext_fused_escalation_exact():
    """ext + exact_escalate: the fused splice must restore exact results
    for whatever the (tighter) certificate still leaves uncertified."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    scan = _build_rows("sparse", toks, ws, vocab)
    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=32, postings_ext_cap=96, deep_slots=2,
                      query_terms=8, exact_escalate=True)
    got = inv.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified.all()
    want = scan.search_tokens(q_tok, q_w, k=5)
    for a, b in zip(got, want):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


@pytest.mark.parametrize("shard_by", ["docs", "queries"])
def test_tiered_ext_sharded_matches_single(mesh8, shard_by):
    """The extension arrays ride the mesh layouts: per-shard-split +
    stacked under doc sharding, replicated under query sharding — results
    must match the single-device tiered engine exactly (fp32)."""
    vocab = 400
    toks, ws = _diffuse_corpus(1024, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    kw = dict(postings_cap=32, postings_ext_cap=256, deep_slots=2,
              query_terms=8, exact_escalate=False)
    single = _build_rows("inverted", toks, ws, vocab, **kw)
    sh = single.search_tokens(q_tok, q_w, k=5)

    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=64,
                      query_batch=16, weight_dtype="float32",
                      shard_by=shard_by, **kw)
    idx = SparseIndex(vocab, cfg, mesh8)
    idx.doc_ids = [str(i) for i in range(toks.shape[0])]
    idx._tok_chunks = [toks]
    idx._w_chunks = [ws]
    idx.finalize()
    assert idx._ext_docs is not None
    got = idx.search_tokens(q_tok, q_w, k=5)
    for qi, (a, b) in enumerate(zip(got, sh)):
        # doc sharding changes the candidate POOL shape (per-shard top-k
        # then merge, so a shard can surface docs the global pool cut);
        # certified rows of both engines must agree exactly, and returned
        # scores are exact either way
        if shard_by == "queries":
            assert set(a) == set(b), qi
        for d in set(a) & set(b):
            assert abs(a[d] - b[d]) < 1e-3
    if idx.last_certified is not None and single.last_certified is not None:
        both = idx.last_certified & single.last_certified
        for qi in np.flatnonzero(both):
            assert set(got[qi]) == set(sh[qi])


def test_tiered_ext_save_load_roundtrip(tmp_path):
    vocab = 400
    toks, ws = _diffuse_corpus(800, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=8, width=5)
    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=32, postings_ext_cap=128, deep_slots=2,
                      query_terms=8)
    want = inv.search_tokens(q_tok, q_w, k=5)
    inv.save(str(tmp_path / "ix"))
    loaded = SparseIndex.load(str(tmp_path / "ix"))
    assert loaded.cfg.postings_ext_cap == 128
    assert loaded._ext_docs is not None
    got = loaded.search_tokens(q_tok, q_w, k=5)
    for a, b in zip(got, want):
        assert set(a) == set(b)


def test_tiered_ext_full_forward_wide_queries():
    """Wide queries (> query_terms active) route to the full-forward
    inverted mode, where the shallow read is narrowed (full_postings_cols <
    cap): deep slots must then read BOTH the rest of the base row and the
    extension (the middle-gap case), keep certificates sound, and improve
    candidate recall over the no-ext engine."""
    vocab = 400
    toks, ws = _rich_corpus(3000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=14, seed=6)
    assert (q_tok > 0).sum(axis=1).min() > 8  # actually wide (routes full)
    scan = _build_rows("sparse", toks, ws, vocab)
    sh = scan.search_tokens(q_tok, q_w, k=5)

    kw = dict(query_terms=8, full_query_terms=16, full_postings_cols=16,
              full_rescore_expand=16)
    base = _build_rows("inverted", toks, ws, vocab,
                       postings_cap=64, **kw)
    bh = base.search_tokens(q_tok, q_w, k=5)
    ext = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=64, postings_ext_cap=3000, deep_slots=4,
                      **kw)
    eh = ext.search_tokens(q_tok, q_w, k=5)
    cert = ext.last_certified

    def recall(hits):
        agree = sum(len(set(a) & set(b)) for a, b in zip(hits, sh))
        return agree / max(sum(len(b) for b in sh), 1)

    assert recall(eh) >= recall(bh)
    for qi in range(16):
        # full-forward rescore is exact for returned docs
        for d, s in eh[qi].items():
            assert s == pytest.approx(
                sh[qi].get(d, s), rel=1e-3
            ) or d not in sh[qi]
        if cert is not None and cert[qi]:
            assert set(eh[qi]) == set(sh[qi]), qi


# --------------------------------------------- deep re-lookup escalation


def test_refine_tier_certifies_cut_bound_rows():
    """CUT-REFINEMENT tier (inverted.make_search_fn refine_expand): with
    full-depth postings (zero tail) but a cramped rescore pool, the bound's
    cut term (k1-th run sum = the k1-th exact score at full depth) equals
    kth and every row fails certification — the refine tier re-rescores the
    SAME run sums at a deeper pool inside the dispatch and must certify
    every row with scan-exact results and NO escalation, where refine=0
    escalates instead."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5)
    scan = _build_rows("sparse", toks, ws, vocab)
    want = scan.search_tokens(q_tok, q_w, k=5)

    kw = dict(postings_cap=2000, query_terms=8, inverted_rescore_expand=1,
              exact_escalate=True, deep_escalate=False)
    base = _build_rows("inverted", toks, ws, vocab, refine_expand=0, **kw)
    got0 = base.search_tokens(q_tok, q_w, k=5)
    assert base.last_escalated.sum() > 0  # cut binds without refinement

    ref = _build_rows("inverted", toks, ws, vocab, refine_expand=512, **kw)
    got1 = ref.search_tokens(q_tok, q_w, k=5)
    assert ref.last_certified.all()
    assert ref.last_escalated.sum() == 0  # refined in-dispatch, no re-run
    for a, b, c in zip(got1, want, got0):
        assert set(a) == set(b) == set(c)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_refine_tier_keeps_certified_rows_unchanged():
    """A batch mixing certified and uncertified rows: the refine branch
    returns the whole batch from the deeper pool — rows the base pool
    already certified must come back with identical ids/scores (superset
    pool, same exact rescore), so refinement can never degrade a result."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5, seed=7)
    kw = dict(postings_cap=2000, query_terms=8, inverted_rescore_expand=8,
              exact_escalate=True, deep_escalate=False)
    base = _build_rows("inverted", toks, ws, vocab, refine_expand=0, **kw)
    got0 = base.search_tokens(q_tok, q_w, k=5)
    cert0 = base.last_certified.copy()
    ref = _build_rows("inverted", toks, ws, vocab, refine_expand=512, **kw)
    got1 = ref.search_tokens(q_tok, q_w, k=5)
    assert cert0.any()  # the premise: some rows certified at the base pool
    assert ref.last_certified[cert0].all()  # refinement preserves them
    for was_cert, a, b in zip(cert0, got0, got1):
        if was_cert:
            assert set(a) == set(b)
            for d in a:
                # same exact rescore up to XLA reduction order at the
                # wider pool shape (a few f32 ulps)
                assert abs(a[d] - b[d]) < 1e-4 * max(abs(b[d]), 1.0)


def test_deep_escalation_exact_and_certified():
    """postings_ext_cap + exact_escalate + deep_escalate: uncertified rows
    first re-run through the full-depth inverted re-lookup (every term reads
    base+extension, widened pool) — when the extension covers the full
    postings depth every row must come back provably exact, matching the
    exact scan, with last_certified all-True and the re-run rows flagged."""
    vocab = 400
    toks, ws = _diffuse_corpus(3000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5)
    scan = _build_rows("sparse", toks, ws, vocab)
    want = scan.search_tokens(q_tok, q_w, k=5)

    # tiny base cap so the shallow pass leaves rows uncertified; full-depth
    # extension so the deep tier can certify them
    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=16, postings_ext_cap=3000 - 16,
                      deep_slots=1, query_terms=8, exact_escalate=True,
                      deep_escalate=True)
    got = inv.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified.all()
    assert inv.last_escalated.sum() > 0  # the tier actually exercised
    for a, b in zip(got, want):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_stage_codes_split_deep_vs_scan_escalation():
    """`last_scan_escalated` observability: with a full-depth extension the
    deep tier certifies every re-run row (scan_escalated empty); with
    deep_escalate=False the same escalated rows all fall to the exact scan
    (scan_escalated == escalated). Certified rows are never flagged."""
    vocab = 400
    toks, ws = _diffuse_corpus(3000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5)
    kw = dict(postings_cap=16, postings_ext_cap=3000 - 16, deep_slots=1,
              query_terms=8, exact_escalate=True)

    deep = _build_rows("inverted", toks, ws, vocab, deep_escalate=True, **kw)
    deep.search_tokens(q_tok, q_w, k=5)
    assert deep.last_escalated.sum() > 0
    assert deep.last_scan_escalated.sum() == 0  # deep tier certified all

    scan = _build_rows("inverted", toks, ws, vocab, deep_escalate=False, **kw)
    scan.search_tokens(q_tok, q_w, k=5)
    assert scan.last_escalated.sum() > 0
    np.testing.assert_array_equal(
        scan.last_scan_escalated, scan.last_escalated
    )
    assert not scan.last_scan_escalated[~scan.last_escalated].any()


def test_deep_escalation_off_still_exact():
    """deep_escalate=False falls back to the scan-only ladder — results
    stay exact either way (the knob is perf-only)."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    kw = dict(postings_cap=16, postings_ext_cap=1984, deep_slots=1,
              query_terms=8, exact_escalate=True)
    on = _build_rows("inverted", toks, ws, vocab, deep_escalate=True, **kw)
    off = _build_rows("inverted", toks, ws, vocab, deep_escalate=False, **kw)
    a_hits = on.search_tokens(q_tok, q_w, k=5)
    b_hits = off.search_tokens(q_tok, q_w, k=5)
    for a, b in zip(a_hits, b_hits):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_full_forward_deep_escalation_exact():
    """Wide queries under full_exact_escalate: the hot path selects only
    full_query_terms terms (unselected mass keeps the bound open), the deep
    escalation tier widens selection to full_deep_query_terms AND reads the
    full postings depth — with the extension covering every list, escalated
    rows certify there and every result matches the exact scan (the scan
    ladder stays the backstop for queries wider than the deep slots)."""
    vocab = 400
    toks, ws = _rich_corpus(2500, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=14, seed=9)
    assert (q_tok > 0).sum(axis=1).min() > 8  # actually wide (routes full)
    scan = _build_rows("sparse", toks, ws, vocab)
    want = scan.search_tokens(q_tok, q_w, k=5)

    inv = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=32, postings_ext_cap=2500 - 32,
                      deep_slots=0, query_terms=8,
                      full_query_terms=8, full_postings_cols=16,
                      full_deep_query_terms=16,
                      full_exact_escalate=True, deep_escalate=True)
    got = inv.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified.all()
    assert inv.last_escalated.sum() > 0
    for a, b in zip(got, want):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_deep_escalation_tier_ladder_many_rows():
    """When most of a batch fails the shallow certificate (tiny cap), the
    geometric deep-tier ladder (8, 32, ..., Bq) must still certify every
    row through the full-depth re-lookup — no scan fallback needed — and
    results must match the exact scan."""
    vocab = 400
    toks, ws = _diffuse_corpus(2000, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=32, width=5, seed=12)
    scan = _build_rows("sparse", toks, ws, vocab)
    want = scan.search_tokens(q_tok, q_w, k=5)

    cfg = IndexConfig(engine="inverted", l_max=24, block_docs=256,
                      query_batch=32, weight_dtype="float32",
                      postings_cap=4, postings_ext_cap=1996, deep_slots=0,
                      query_terms=8, exact_escalate=True, deep_escalate=True)
    inv = SparseIndex(vocab, cfg)
    inv.doc_ids = [str(i) for i in range(toks.shape[0])]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()
    got = inv.search_tokens(q_tok, q_w, k=5)
    assert inv.last_certified.all()
    assert inv.last_escalated.sum() > 8  # past the first tier
    for a, b in zip(got, want):
        assert set(a) == set(b)
        for d in a:
            assert abs(a[d] - b[d]) < 1e-3


def test_refine_tier_ladder_bq64():
    """Every tier of the cut-refinement ladder (inverted.make_search_fn
    refine_slice: compact slices 8, 32, then the full batch at B=64) must
    certify its rows in-dispatch with scan-exact results. The existing
    refine tests run at query_batch=8, where the ladder collapses to the
    single full-batch branch — the compact-slice tiers were never exercised
    by CI (the same gap ADVICE r3 found for the scan ladder).

    Deterministic band construction (a purpose-built corpus with exact
    document frequencies): with postings deeper than every df a
    single-term query's run sums ARE its exact scores, so at rescore pool
    k1=k the bound's cut term equals the k-th score exactly and the margin
    rule rejects — every single-term query on a df=64 token fails the base
    certificate, while df=4 tokens (fewer matches than k1) certify via the
    zero-miss rule. Batches with 3 / 20 / 50 failing rows land in each
    ladder band; refine_expand=0 on the same batches pins the
    pre-refinement counts."""
    vocab = 2048
    n_docs = 2000
    r = np.random.default_rng(13)
    # doc i: [maybe one common token, two rare tokens] — common tokens
    # 1..8 each cover 64 docs (df=64), rare tokens 1000+i%500 /
    # 1500+i%500 each cover 4 docs (df=4), all unique within a doc
    toks = np.zeros((n_docs, 3), np.int32)
    ws = r.uniform(0.5, 3.0, size=(n_docs, 3)).astype(np.float32)
    for c in range(1, 9):
        lo = (c - 1) * 200
        toks[lo : lo + 64, 0] = c
    toks[:, 1] = 1000 + np.arange(n_docs) % 500
    toks[:, 2] = 1500 + np.arange(n_docs) % 500
    ws[:, 0] = np.where(toks[:, 0] > 0, ws[:, 0], 0.0)
    scan = _build_rows("sparse", toks, ws, vocab)
    common = np.arange(1, 9)
    rare = np.arange(1000, 2000)

    def single_term_batch(n_unc):
        q_tok = np.zeros((64, 8), np.int32)
        q_w = np.zeros((64, 8), np.float32)
        q_tok[:n_unc, 0] = r.choice(common, size=n_unc)
        q_tok[n_unc:, 0] = r.choice(rare, size=64 - n_unc)
        q_w[:, 0] = r.uniform(2.0, 10.0, size=64)
        return q_tok, q_w

    def build(refine):
        cfg = IndexConfig(engine="inverted", l_max=3, block_docs=256,
                          query_batch=64, weight_dtype="float32",
                          postings_cap=128, query_terms=8,
                          inverted_rescore_expand=1, refine_expand=refine,
                          exact_escalate=True, deep_escalate=False)
        ix = SparseIndex(vocab, cfg)
        ix.doc_ids = [str(i) for i in range(toks.shape[0])]
        ix._tok_chunks = [toks]
        ix._w_chunks = [ws]
        ix.finalize()
        return ix

    base = build(0)
    ref = build(512)
    for n_unc in (3, 20, 50):  # ladder bands <=8, 9-32, >32
        q_tok, q_w = single_term_batch(n_unc)
        base.search_tokens(q_tok, q_w, k=5)
        n_base = int(base.last_escalated.sum())
        assert n_base == n_unc, (n_base, n_unc)  # the band premise
        got = ref.search_tokens(q_tok, q_w, k=5)
        assert ref.last_certified.all()
        assert int(ref.last_escalated.sum()) == 0  # refined in-dispatch
        want = scan.search_tokens(q_tok, q_w, k=5)
        for a, b in zip(got, want):
            assert set(a) == set(b)
            for d in a:
                assert abs(a[d] - b[d]) < 1e-3


def test_deep_tier_ladder_bands_bq64():
    """Pinned per-band coverage of the geometric deep re-lookup ladder
    (engine body_fn d_tiers: 8, 32, then Bq at query_batch=64). The
    existing deep tests run at Bq=8/32 where at most two rungs exist, so
    the three-rung ladder's middle tier never ran with a pinned count.

    Deterministic construction: common tokens have df=64 but the base cap
    reads only 4 postings — a single-term query on one finds just 4
    candidates (< k), so its k-th score is -inf and the positive postings
    tail keeps the bound open: deterministically uncertified. Rare tokens
    have df=2 (< cap, < pool): tail 0, cut 0 — zero-miss certified. The
    deep tier reads base+extension = the full 128-deep postings, so every
    escalated row certifies there (scan_escalated stays empty) with
    scan-exact results."""
    vocab = 4096
    n_docs = 2000
    r = np.random.default_rng(17)
    toks = np.zeros((n_docs, 3), np.int32)
    ws = r.uniform(0.5, 3.0, size=(n_docs, 3)).astype(np.float32)
    for c in range(1, 9):  # df=64 common tokens
        lo = (c - 1) * 200
        toks[lo : lo + 64, 0] = c
    toks[:, 1] = 1000 + np.arange(n_docs) % 1000  # df=2
    toks[:, 2] = 2000 + np.arange(n_docs) % 1000  # df=2
    ws[:, 0] = np.where(toks[:, 0] > 0, ws[:, 0], 0.0)
    scan = _build_rows("sparse", toks, ws, vocab)
    common = np.arange(1, 9)
    rare = np.arange(1000, 3000)

    cfg = IndexConfig(engine="inverted", l_max=3, block_docs=256,
                      query_batch=64, weight_dtype="float32",
                      postings_cap=4, postings_ext_cap=124, deep_slots=0,
                      query_terms=8, exact_escalate=True,
                      deep_escalate=True)
    inv = SparseIndex(vocab, cfg)
    inv.doc_ids = [str(i) for i in range(n_docs)]
    inv._tok_chunks = [toks]
    inv._w_chunks = [ws]
    inv.finalize()

    for n_esc in (3, 20, 50):  # ladder bands <=8, 9-32, 33-64
        q_tok = np.zeros((64, 8), np.int32)
        q_w = np.zeros((64, 8), np.float32)
        q_tok[:n_esc, 0] = r.choice(common, size=n_esc)
        q_tok[n_esc:, 0] = r.choice(rare, size=64 - n_esc)
        q_w[:, 0] = r.uniform(2.0, 10.0, size=64)
        got = inv.search_tokens(q_tok, q_w, k=5)
        assert inv.last_certified.all()
        n_got = int(inv.last_escalated.sum())
        assert n_got == n_esc, (n_got, n_esc)
        assert inv.last_scan_escalated.sum() == 0  # deep tier covered all
        want = scan.search_tokens(q_tok, q_w, k=5)
        for a, b in zip(got, want):
            assert set(a) == set(b)
            for d in a:
                assert abs(a[d] - b[d]) < 1e-3


def test_full_exact_escalate_default_follows_deep_availability():
    """full_exact_escalate=None resolves ON exactly when deep escalation
    can absorb wide-query escalations at postings cost (postings_ext_cap >
    0 and deep_escalate); without the extension it resolves OFF and wide
    results keep honest certificates instead of paying the scan."""
    vocab = 400
    toks, ws = _rich_corpus(1500, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=14, seed=9)
    scan = _build_rows("sparse", toks, ws, vocab)
    want = scan.search_tokens(q_tok, q_w, k=5)

    with_ext = _build_rows("inverted", toks, ws, vocab,
                           postings_cap=32, postings_ext_cap=1468,
                           deep_slots=0, query_terms=8,
                           full_query_terms=8, full_postings_cols=16,
                           full_deep_query_terms=16)
    assert with_ext._escalate_for("inverted_full") is True
    got = with_ext.search_tokens(q_tok, q_w, k=5)
    assert with_ext.last_certified.all()
    for a, b in zip(got, want):
        assert set(a) == set(b)

    no_ext = _build_rows("inverted", toks, ws, vocab,
                         postings_cap=32, query_terms=8,
                         full_query_terms=8, full_postings_cols=16)
    assert no_ext._escalate_for("inverted_full") is False
    no_ext.search_tokens(q_tok, q_w, k=5)
    assert no_ext.last_escalated is None  # approximate contract, no scan


def test_incremental_build_with_extension_matches_sync():
    """incremental_postings + postings_ext_cap: the background builder runs
    at the full build depth (cap + ext) and finalize splits into base +
    extension exactly like the synchronous build."""
    kw = dict(postings_cap=16, postings_ext_cap=48, deep_slots=2,
              query_terms=16, weight_dtype="float32")
    cfg_inc = IndexConfig(engine="inverted", l_max=32, block_docs=64,
                          query_batch=4, incremental_postings=True,
                          incremental_unit=64, **kw)
    cfg_sync = IndexConfig(engine="inverted", l_max=32, block_docs=64,
                           query_batch=4, incremental_postings=False, **kw)
    inc, sync = SparseIndex(V, cfg_inc), SparseIndex(V, cfg_sync)
    for idx in (inc, sync):
        for s in range(0, N_DOCS, 50):
            batch = DOCS[s:s + 50]
            idx.add([str(i) for i in range(s, s + batch.shape[0])], batch)
    inc.finalize()
    sync.finalize()
    np.testing.assert_array_equal(
        np.asarray(inc._post_docs), np.asarray(sync._post_docs)
    )
    assert inc._ext_docs is not None
    np.testing.assert_array_equal(
        np.asarray(inc._ext_docs), np.asarray(sync._ext_docs)
    )
    np.testing.assert_array_equal(
        np.asarray(inc._deep_map), np.asarray(sync._deep_map)
    )
    a = inc.search(QS, k=10)
    b = sync.search(QS, k=10)
    for x, y in zip(a, b):
        assert x == y


# --------------------------------------- round-5: match rescore / token entry


def test_match_rescore_bit_identical_to_dense_gather():
    """match_rescore reconstructs each candidate token's query weight from
    the lookup slots instead of gathering the dense query row. When every
    active query term occupies a slot (the inf-free precondition), the
    reconstruction equals the gathered row element-for-element and the
    products sum in the same order — scores, ids AND bounds must be
    bit-identical, refine tier included."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    vocab = 600
    toks, ws = _diffuse_corpus(400, vocab, l_max=24)
    pd, pw = inverted.build_postings(toks, ws, vocab, 32)
    d_pd, d_pw = jnp.asarray(pd), jnp.asarray(pw)
    d_toks = jnp.asarray(toks.astype(np.int16))
    d_ws = jnp.asarray(ws)

    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    qs = np.zeros((16, vocab), np.float32)
    np.put_along_axis(qs, q_tok, q_w, axis=1)
    qs[:, 0] = 0.0

    def run(**kw):
        fn = inverted.make_search_fn(
            d_pd, d_pw, d_toks, d_ws, query_terms=8, k=5,
            with_bound=True, rescore_expand=2, refine_expand=6, **kw)
        s, ids, bound = fn(jnp.asarray(qs), d_pd, d_pw, d_toks, d_ws)
        return np.asarray(s), np.asarray(ids), np.asarray(bound)

    s0, i0, b0 = run()
    s1, i1, b1 = run(match_rescore=True)
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(b1, b0)


def test_match_rescore_rejects_slot_excluding_modes():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    pd = jnp.zeros((32, 4), jnp.int32)
    pw = jnp.zeros((32, 4), jnp.float32)
    dt = jnp.zeros((8, 4), jnp.int32)
    dw = jnp.zeros((8, 4), jnp.float32)
    for bad in (dict(select_by_impact=True), dict(phase1_ratio=0.4)):
        with pytest.raises(ValueError, match="match_rescore|token_entry"):
            inverted.make_search_fn(
                pd, pw, dt, dw, query_terms=4, k=2, match_rescore=True,
                **bad)
    with pytest.raises(ValueError, match="token_entry"):
        inverted.make_search_fn(
            pd, pw, dt, dw, query_terms=4, k=2, token_entry=True,
            postings_cols=2)


def test_token_entry_fn_matches_dense_entry():
    """The token-entry fn fed the same slots the dense path would select
    must return the same scores/ids and a bound that certifies the same
    rows (the dense path's bound adds a tiny fp-noise unselected term the
    token entry provably zeroes, so compare decisions, not bits)."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    vocab = 600
    toks, ws = _diffuse_corpus(500, vocab, l_max=24)
    pd, pw = inverted.build_postings(toks, ws, vocab, 512)
    d_pd, d_pw = jnp.asarray(pd), jnp.asarray(pw)
    d_toks = jnp.asarray(toks.astype(np.int16))
    d_ws = jnp.asarray(ws)

    T = 8
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    q_tok8 = np.zeros((16, T), np.int32)
    q_w8 = np.zeros((16, T), np.float32)
    q_tok8[:, :5], q_w8[:, :5] = q_tok, q_w
    qs = np.zeros((16, vocab), np.float32)
    np.put_along_axis(qs, q_tok, q_w, axis=1)
    qs[:, 0] = 0.0
    q_w8[q_tok8 == 0] = 0.0

    dense_fn = inverted.make_search_fn(
        d_pd, d_pw, d_toks, d_ws, query_terms=T, k=5, with_bound=True)
    tok_fn = inverted.make_search_fn(
        d_pd, d_pw, d_toks, d_ws, query_terms=T, k=5, with_bound=True,
        token_entry=True)
    s0, i0, b0 = dense_fn(jnp.asarray(qs), d_pd, d_pw, d_toks, d_ws)
    s1, i1, b1 = tok_fn(
        (jnp.asarray(q_tok8), jnp.asarray(q_w8)), d_pd, d_pw, d_toks, d_ws)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    c0 = inverted.certified_mask(np.asarray(s0)[:, -1], np.asarray(b0), np)
    c1 = inverted.certified_mask(np.asarray(s1)[:, -1], np.asarray(b1), np)
    assert c0.sum() >= 12  # the comparison must exercise certification
    np.testing.assert_array_equal(c1, c0)


def test_token_entry_rejects_wrong_slot_width():
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    pd = jnp.zeros((32, 4), jnp.int32)
    pw = jnp.zeros((32, 4), jnp.float32)
    dt = jnp.zeros((8, 4), jnp.int32)
    dw = jnp.zeros((8, 4), jnp.float32)
    fn = inverted.make_search_fn(
        pd, pw, dt, dw, query_terms=4, k=2, token_entry=True, jit=False)
    with pytest.raises(ValueError, match="slots"):
        fn((jnp.zeros((2, 6), jnp.int32), jnp.zeros((2, 6), jnp.float32)),
           pd, pw, dt, dw)


def _route_probe(idx, q_tok, q_w, k=5, **kw):
    """Results + flags from BOTH search_tokens (token fast path when
    eligible) and the dense search() entry on the same index."""
    ht = idx.search_tokens(q_tok, q_w, k=k, **kw)
    flags_t = (idx.last_certified, idx.last_escalated)
    V = idx.vocab_size
    qs = np.zeros((q_tok.shape[0], V), np.float32)
    act = q_w > 0
    rows = np.broadcast_to(np.arange(q_tok.shape[0])[:, None], q_tok.shape)
    # scatter-ADD, matching search_tokens' on-device dense build (duplicate
    # slots accumulate)
    np.add.at(qs, (rows[act], q_tok[act]), q_w[act])
    hd = idx.search(qs, k=k, **kw)
    flags_d = (idx.last_certified, idx.last_escalated)
    return ht, flags_t, hd, flags_d


@pytest.mark.parametrize("escalate", [False, True])
def test_search_tokens_fast_path_matches_dense_entry(escalate):
    """Engine-level parity: the token fast path must return the same hits
    and the same certificate/escalation flags as the dense entry, with and
    without the fused escalation ladder, extension tiers included."""
    vocab = 500
    toks, ws = _diffuse_corpus(1500, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=12, width=5)
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=48, postings_ext_cap=64, deep_slots=2,
                      query_terms=8, exact_escalate=escalate)
    ht, (ct, et), hd, (cd, ed) = _route_probe(idx, q_tok, q_w)
    assert ht == hd
    np.testing.assert_array_equal(ct, cd)
    if escalate:
        np.testing.assert_array_equal(et, ed)
        assert ct.all()
    else:
        assert et is None and ed is None


def test_search_tokens_fast_path_query_prune_parity():
    vocab = 500
    toks, ws = _diffuse_corpus(800, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=10, width=6)
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=256, query_terms=8, exact_escalate=True)
    ht, _, hd, _ = _route_probe(idx, q_tok, q_w, query_prune=0.4)
    assert ht == hd


def test_search_tokens_fast_path_ineligible_cases_fall_back():
    """Two-phase, wide slot lists, duplicate tokens, and full_forward=True
    must keep the dense path (identical results prove the routing is
    transparent either way)."""
    vocab = 500
    toks, ws = _diffuse_corpus(800, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=8, width=5)
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=256, query_terms=8, exact_escalate=True)
    # duplicates: slot 1 repeats slot 0's token — dense path merges them
    dup_tok, dup_w = q_tok.copy(), q_w.copy()
    dup_tok[:, 1] = dup_tok[:, 0]
    ht, _, hd, _ = _route_probe(idx, dup_tok, dup_w)
    assert ht == hd
    # wide slot axis (> query_terms): routes through the dense width check
    wide_tok = np.pad(q_tok, ((0, 0), (0, 8)))
    wide_w = np.pad(q_w, ((0, 0), (0, 8)))
    ht, _, hd, _ = _route_probe(idx, wide_tok, wide_w)
    assert ht == hd
    # exclude_self rides both paths
    ids = [str(i) for i in range(q_tok.shape[0])]
    ht, _, hd, _ = _route_probe(idx, q_tok, q_w, exclude_self=ids)
    assert ht == hd


def test_search_tokens_fast_path_all_zero_rows_certify():
    """Padding rows (all weights zero) must certify without escalating on
    the token path, exactly like the dense path."""
    vocab = 500
    toks, ws = _diffuse_corpus(800, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=6, width=5)
    q_w[3:] = 0.0
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=16, query_terms=8, exact_escalate=True)
    hits = idx.search_tokens(q_tok, q_w, k=5)
    assert all(not h for h in hits[3:])
    assert idx.last_certified.all()
    assert not idx.last_escalated[3:].any()


# ------------------------------------------------ round-5: block-max tail


def test_tail_blockmax_bound_is_sound_and_tighter():
    """The block-max tail bound must (a) still dominate the true score of
    every doc the search could have missed — the certificate's soundness
    contract — and (b) be no looser than the whole-tail bound (elementwise
    min against w_tail guarantees it analytically; this pins the wiring)."""
    from opensearch_sparse_model_tuning_sample_tpu.index import inverted
    import jax.numpy as jnp

    vocab = 500
    n_docs = 1200
    toks, ws = _diffuse_corpus(n_docs, vocab, l_max=24)
    cap = 24  # small: truncation is real
    pd, pw = inverted.build_postings(toks, ws, vocab, cap)
    bm, bmap = inverted.build_tail_blockmax(
        toks, ws, vocab, cap, n_docs, block_docs=64)
    d = dict(pd=jnp.asarray(pd), pw=jnp.asarray(pw),
             dt=jnp.asarray(toks.astype(np.int16)), dw=jnp.asarray(ws))
    q_tok, q_w = _corpus_queries(toks, ws, n_q=24, width=5)
    T = 8
    q_tok8 = np.zeros((24, T), np.int32)
    q_w8 = np.zeros((24, T), np.float32)
    q_tok8[:, :5], q_w8[:, :5] = q_tok, q_w
    q_w8[q_tok8 == 0] = 0.0
    qdev = (jnp.asarray(q_tok8), jnp.asarray(q_w8))

    def run(**kw):
        fn = inverted.make_search_fn(
            d["pd"], d["pw"], d["dt"], d["dw"], query_terms=T, k=5,
            with_bound=True, token_entry=True, **kw)
        args = (qdev, d["pd"], d["pw"], d["dt"], d["dw"])
        if kw.get("tail_blockmax"):
            args += (None, (jnp.asarray(bm), jnp.asarray(bmap)))
        s, ids, bound = fn(*args)
        return np.asarray(s), np.asarray(ids), np.asarray(bound)

    s0, i0, b0 = run()
    s1, i1, b1 = run(tail_blockmax=True)
    np.testing.assert_array_equal(i1, i0)  # bound never changes results
    # exact scores for soundness: dense query @ docs
    dense = np.zeros((24, vocab), np.float32)
    np.add.at(dense, (np.broadcast_to(np.arange(24)[:, None], q_tok8.shape),
                      q_tok8), np.where(q_w8 > 0, q_w8, 0))
    dense[:, 0] = 0.0
    docs_dense = np.zeros((n_docs, vocab), np.float32)
    rows = np.broadcast_to(np.arange(n_docs)[:, None], toks.shape)
    docs_dense[rows, toks] = ws
    true = dense @ docs_dense.T  # [24, n_docs]
    for b, tag in ((b0, "whole-tail"), (b1, "blockmax")):
        for qi in range(24):
            ret = set(int(x) for x in i1[qi] if x >= 0)
            missed = [true[qi, di] for di in range(n_docs) if di not in ret]
            if missed and np.isfinite(b[qi]):
                assert max(missed) <= b[qi] * (1 + 1e-4) + 1e-5, (
                    tag, qi, max(missed), b[qi])
    # tighter (or equal) everywhere, finite vs finite
    fin = np.isfinite(b0) & np.isfinite(b1)
    assert (b1[fin] <= b0[fin] * (1 + 1e-6)).all()
    c0 = inverted.certified_mask(s0[:, -1], b0, np)
    c1 = inverted.certified_mask(s1[:, -1], b1, np)
    assert c1.sum() >= c0.sum()


def test_tail_blockmax_engine_exact_and_fewer_escalations(tmp_path):
    """Engine level: with tail_block_docs the certified+escalated results
    must still match the exact scan, with no more escalations than the
    whole-tail bound; the knob must survive save/load."""
    vocab = 500
    toks, ws = _diffuse_corpus(2500, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=16, width=5)
    base = dict(postings_cap=32, query_terms=8, exact_escalate=True)
    plain = _build_rows("inverted", toks, ws, vocab, **base)
    bmx = _build_rows("inverted", toks, ws, vocab,
                      tail_block_docs=128, **base)
    assert bmx._bm is not None
    scan = _build_rows("sparse", toks, ws, vocab)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    hp = plain.search_tokens(q_tok, q_w, k=5)
    esc_plain = int(plain.last_escalated.sum())
    hb = bmx.search_tokens(q_tok, q_w, k=5)
    esc_bmx = int(bmx.last_escalated.sum())
    for got in (hb, hp):
        for a, b in zip(got, sh):
            assert sorted(a.values(), reverse=True) == pytest.approx(
                sorted(b.values(), reverse=True), rel=1e-3)
    assert esc_bmx <= esc_plain
    assert bmx.last_certified.all()
    # dense entry sees the same bound
    hb2, _, hd2, _ = _route_probe(bmx, q_tok, q_w)
    assert hb2 == hd2
    # save/load keeps the block-max contract
    bmx.save(str(tmp_path / "ix"))
    loaded = SparseIndex.load(str(tmp_path / "ix"))
    assert loaded._bm is not None
    hl = loaded.search_tokens(q_tok, q_w, k=5)
    assert hl == hb


def test_tail_blockmax_full_forward_sound_and_certifies():
    """Wide (full-forward) queries use the bm built at the narrow-read
    depth (full_postings_cols). Certified rows must match the exact scan;
    the block bound should certify at least as many rows as the whole-tail
    bound."""
    vocab = 500
    toks, ws = _rich_corpus(1500, vocab, l_max=32)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=12, width=24)
    base = dict(postings_cap=64, query_terms=8, full_query_terms=32,
                full_postings_cols=16, full_rescore_expand=8,
                exact_escalate=False, full_exact_escalate=False)
    plain = _build_rows("inverted", toks, ws, vocab, **base)
    bmx = _build_rows("inverted", toks, ws, vocab,
                      tail_block_docs=128, **base)
    scan = _build_rows("sparse", toks, ws, vocab)
    sh = scan.search_tokens(q_tok, q_w, k=5)
    hp = plain.search_tokens(q_tok, q_w, k=5)
    cp = plain.last_certified.copy()
    hb = bmx.search_tokens(q_tok, q_w, k=5)
    cb = bmx.last_certified.copy()
    assert cb.sum() >= cp.sum()
    # soundness: certified rows match the exact scan
    for qi in np.flatnonzero(cb):
        assert set(hb[qi]) == set(sh[qi]), qi
        for d, v in hb[qi].items():
            assert v == pytest.approx(sh[qi][d], rel=1e-3)


def test_search_tokens_async_pipelines_and_matches_sync():
    """search_tokens_async + resolve_hits must return exactly what the
    sync call returns (results AND flags), including the ineligible-path
    degradation, and allow many dispatches in flight before a resolve."""
    vocab = 500
    toks, ws = _diffuse_corpus(1200, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=12, width=5)
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=48, query_terms=8, exact_escalate=True)
    want = idx.search_tokens(q_tok, q_w, k=5)
    want_esc = idx.last_escalated.copy()
    handles = [idx.search_tokens_async(q_tok, q_w, k=5) for _ in range(3)]
    for h in handles:
        got = idx.resolve_hits(h)
        assert got == want
        np.testing.assert_array_equal(idx.last_escalated, want_esc)
        assert idx.last_certified.all()
    # ineligible (two_phase) degrades to sync inside the handle
    h = idx.search_tokens_async(q_tok, q_w, k=5, two_phase=True)
    got = idx.resolve_hits(h)
    want_2p = idx.search_tokens(q_tok, q_w, k=5, two_phase=True)
    assert got == want_2p


def test_resolve_hits_many_matches_individual_resolves():
    """resolve_hits_many must return exactly the per-handle resolve_hits
    results with ONE fetch, set the flags to the row concatenation, and
    tolerate mixed windows (sync-degraded handles, mismatched k)."""
    vocab = 500
    toks, ws = _diffuse_corpus(1200, vocab, l_max=24)
    q_tok, q_w = _corpus_queries(toks, ws, n_q=12, width=5)
    idx = _build_rows("inverted", toks, ws, vocab,
                      postings_cap=48, query_terms=8, exact_escalate=True)
    want = idx.search_tokens(q_tok, q_w, k=5)
    want_cert = idx.last_certified.copy()
    want_esc = idx.last_escalated.copy()

    handles = [idx.search_tokens_async(q_tok, q_w, k=5) for _ in range(4)]
    outs = idx.resolve_hits_many(handles)
    assert outs == [want] * 4
    np.testing.assert_array_equal(idx.last_certified,
                                  np.concatenate([want_cert] * 4))
    np.testing.assert_array_equal(idx.last_escalated,
                                  np.concatenate([want_esc] * 4))

    # mixed window: a sync-degraded handle (two_phase) + a different k
    want_2p = idx.search_tokens(q_tok, q_w, k=5, two_phase=True)
    want_k3 = idx.search_tokens(q_tok, q_w, k=3)
    cert_k3 = idx.last_certified.copy()
    handles = [
        idx.search_tokens_async(q_tok, q_w, k=5),
        idx.search_tokens_async(q_tok, q_w, k=5, two_phase=True),
        idx.search_tokens_async(q_tok, q_w, k=3),
    ]
    outs = idx.resolve_hits_many(handles)
    assert outs[0] == want
    assert outs[1] == want_2p
    assert outs[2] == want_k3
    # 2p path carries no exact certificate -> concatenated flags are None
    assert idx.last_certified is None or len(idx.last_certified) == 12 * 3

    # flag concat across homogeneous handles of different query sets
    handles = [
        idx.search_tokens_async(q_tok, q_w, k=3),
        idx.search_tokens_async(q_tok[:7], q_w[:7], k=3),
    ]
    outs = idx.resolve_hits_many(handles)
    assert outs[0] == want_k3
    assert outs[1] == [want_k3[i] for i in range(7)]
    assert len(idx.last_certified) == 12 + 7
    np.testing.assert_array_equal(
        idx.last_certified, np.concatenate([cert_k3, cert_k3[:7]])
    )
    assert idx.resolve_hits_many([]) == []
