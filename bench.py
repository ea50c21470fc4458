"""Benchmark: query throughput on the native on-device sparse index.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline: queries/sec over a 128K-doc synthetic SPLADE-like corpus (avg ~120
active terms/doc, vocab 30522) with inference-free queries, k=10 — the
workload the reference serves through a single-node OpenSearch instance
(north star in BASELINE.md: beat it by >10x on queries/sec). The first run
writes its result to BENCH_BASELINE.json; later runs report vs that anchor
so round-over-round progress is visible.

Extras: p50 query latency (per batch), ingest-side index build rate, and
encoder forward throughput.
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


_DIST_CACHE = {}


def token_dist(vocab):
    """Shared synthetic vocabulary statistics: zipf-PMF document frequency
    (pop ∝ rank^-0.8 under a fixed permutation) plus the matching idf-like
    weight vector (rare tokens weigh more — trained SPLADE models learn
    idf-anticorrelated term weights, which is exactly what makes
    impact-ordered postings effective on real data).

    The popularity→token assignment is seed-INDEPENDENT: corpora and query
    sets drawn with different seeds share one vocabulary distribution, the
    way every encoder output shares the model's vocab. (A previous version
    drew `rng.zipf(1.3)` SAMPLES as popularities — infinite-mean draws put
    ~all probability on one token, so "110-term" docs collapsed to ~2
    unique terms after dedupe and the benchmark corpus was degenerate; see
    PERFORMANCE.md "round-3 data-realism fix".)
    """
    if vocab not in _DIST_CACHE:
        pop = np.arange(1, vocab + 1, dtype=np.float64) ** -0.8
        np.random.default_rng(0x1DF).shuffle(pop)
        pop /= pop.sum()
        idf = np.log1p(0.01 / pop)  # ≈ ln(N/df): ~0.3 (stopword) .. ~7 (rare)
        _DIST_CACHE[vocab] = (np.cumsum(pop), idf.astype(np.float32))
    return _DIST_CACHE[vocab]


def make_corpus(n_docs, vocab, avg_terms, seed, l_max=128):
    """Vectorized synthetic SPLADE-like corpus: zipf-popular tokens,
    gamma-distributed weights scaled by the token's idf (popular tokens
    carry little weight, like a trained model's), per-doc lengths
    ~ Poisson(avg_terms). Tokens are UNIQUE within a doc (duplicates keep
    the max weight) — every rep the real encoder produces has unique
    tokens (lax.top_k indices), and the inverted engine's run-sum merge
    and exactness certificate assume it."""
    rng = np.random.default_rng(seed)
    cdf, idf = token_dist(vocab)
    toks = np.searchsorted(cdf, rng.random((n_docs, l_max))).astype(np.int32)
    ws = rng.gamma(2.0, 0.5, size=(n_docs, l_max)).astype(np.float32)
    ws *= idf[toks] / idf.mean()
    lens = rng.poisson(avg_terms, size=n_docs).clip(8, l_max)
    mask = np.arange(l_max)[None, :] < lens[:, None]
    ws = np.where(mask, ws, 0.0)
    toks = np.where(mask, toks, 0)
    # dedupe per row keeping the max weight: sort by (token asc, weight
    # desc) with one packed key, zero repeats, then impact-sort
    w_bits = ws.view(np.uint32).astype(np.uint64)
    key = (toks.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - w_bits
    )
    order = np.argsort(key, axis=1, kind="stable")
    toks = np.take_along_axis(toks, order, axis=1)
    ws = np.take_along_axis(ws, order, axis=1)
    rep = np.zeros_like(ws, dtype=bool)
    rep[:, 1:] = toks[:, 1:] == toks[:, :-1]
    ws = np.where(rep, 0.0, ws)
    toks = np.where(ws > 0, toks, 0)
    order = np.argsort(-ws, axis=1)  # impact-sorted
    return np.take_along_axis(toks, order, axis=1), np.take_along_axis(ws, order, axis=1)


def make_queries(n_queries, vocab, n_terms, seed, slots=8):
    """Inference-free-style queries: `n_terms` distinct tokens drawn from
    the SAME popularity distribution as the corpus (natural-language query
    terms are mostly common words — the long-postings-list case the
    inverted engine must survive), weighted by the token's idf exactly as
    the inf-free scoring scheme does (eval/beir.py query path)."""
    rng = np.random.default_rng(seed)
    cdf, idf = token_dist(vocab)
    # over-draw with replacement, keep the first n_terms unique per row
    draws = np.searchsorted(cdf, rng.random((n_queries, 6 * n_terms)))
    q_tok = np.zeros((n_queries, slots), dtype=np.int32)
    q_w = np.zeros((n_queries, slots), dtype=np.float32)
    for i in range(n_queries):
        _, first = np.unique(draws[i], return_index=True)
        u = draws[i][np.sort(first)][:n_terms]
        q_tok[i, : u.size] = u
        q_w[i, : u.size] = idf[u]
    return q_tok, q_w


def main():
    import jax

    from opensearch_sparse_model_tuning_sample_tpu.index.engine import (
        IndexConfig,
        SparseIndex,
    )

    vocab = 30522
    n_docs = 131072
    n_queries = 512
    k = 10
    qbatch = 128

    toks, ws = make_corpus(n_docs, vocab, avg_terms=110, seed=1)

    cfg = IndexConfig(
        # auto resolves to the inverted engine with exact-escalation at this
        # size (round-3 j40/j42: inverted 5.1K q/s vs scan 1.3K at 128K docs;
        # escalation keeps every result provably exact — certified queries
        # run at postings speed, the rare uncertified ones re-run at
        # postings cost through the deep re-lookup tier inside the timed
        # region, with the exact scan as the final backstop)
        engine="auto", l_max=128, block_docs=2048, query_batch=qbatch,
        weight_dtype="bfloat16", postings_cap=2048, query_terms=8,
        # round-5 winning shape (j71b/j72z sweeps, PERFORMANCE.md
        # "round-5 headline"): 8 query-term slots cover the 6-term inf-free
        # queries; rescore pool k1=8k; deep_slots=0 — with the token-entry
        # fast path + match rescore the base pool certifies 492/512 rows
        # and the in-dispatch deep tier recovers the remaining 20 cheaper
        # than paying a deep slot on every row (8 887-9 096 q/s certified
        # 1.0 vs 8 126 at the round-4 ds1 shape, vs 3 907 as measured in
        # round 4 before the token-entry path).
        inverted_rescore_expand=8,
        postings_ext_cap=14336, deep_slots=0, deep_escalate=True,
        # synchronous build: build_s measures the whole add->finalize cost,
        # not a finalize tail behind a background builder
        incremental_postings=False,
    )
    idx = SparseIndex(vocab, cfg)
    # ingestion of prebuilt sparse rows through the public top-k path
    # (isolates index perf from the encoder; encoder throughput is
    # reported separately)
    t0 = time.time()
    idx.add_topk([str(i) for i in range(n_docs)], toks, ws)
    idx.finalize()
    build_s = time.time() - t0

    # inference-free style queries: ~6 active idf-weighted terms drawn from
    # the corpus token distribution, entering through the serving path
    # (token ids + weights, dense built on device)
    q_tok, q_w = make_queries(n_queries, vocab, n_terms=6, seed=3)

    # warmup/compile (single-batch, full-set, and the 8-deep async window's
    # stacked-resolve shapes — warm the EXACT timed structure, CLAUDE.md)
    idx.search_tokens(q_tok[:qbatch], q_w[:qbatch], k=k)
    idx.search_tokens(q_tok, q_w, k=k)

    DEPTH = 8

    def search_window():
        handles = [
            idx.search_tokens_async(q_tok, q_w, k=k) for _ in range(DEPTH)
        ]
        idx.resolve_hits_many(handles)

    search_window()  # compile the async dispatch + 8-stack packed fetch

    # throughput: pipelined dispatch window + ONE packed resolve fetch —
    # the steady-state serving pattern (cli/serve.py resolve stage, and the
    # same methodology as the encoder segment below). Per-call fetch syncs
    # cost a fixed ~30 ms tunnel RTT; resolving a window through
    # resolve_hits_many pays it once per window instead of once per call
    # (round 5: 9.1K q/s sync-call vs ~20K device-side bound — the gap was
    # serialized fetch RTTs). Best-of-3 for session drift (PERFORMANCE.md).
    qps = 0.0
    for _ in range(3):
        t0 = time.time()
        search_window()
        qps = max(qps, DEPTH * n_queries / (time.time() - t0))
    # exactness bookkeeping for the headline run (inverted engines): flags
    # are per-call (the window concatenates its calls'), so capture them
    # before the latency loop overwrites them
    cert_frac = (
        None if idx.last_certified is None
        else round(float(idx.last_certified.mean()), 4)
    )
    n_escalated = (
        None if idx.last_escalated is None
        else int(idx.last_escalated.sum()) // DEPTH
    )

    # per-call (un-pipelined) throughput: one sync call over the query set —
    # the round-4-comparable number, carrying one full dispatch+fetch RTT
    sync_qps = 0.0
    for _ in range(3):
        t0 = time.time()
        idx.search_tokens(q_tok, q_w, k=k)
        sync_qps = max(sync_qps, n_queries / (time.time() - t0))

    # latency: single-batch round trips. The per-query number is the batch
    # round trip AMORTIZED over the batch (a throughput reciprocal); every
    # query in the batch actually experiences the full round trip, reported
    # separately — don't compare the amortized figure to a per-query p50.
    lat = []
    for s in range(0, min(8 * qbatch, n_queries), qbatch):
        tb = time.time()
        idx.search_tokens(q_tok[s : s + qbatch], q_w[s : s + qbatch], k=k)
        lat.append(time.time() - tb)
    batch_p50_ms = float(np.median(lat) * 1000)
    p50_ms = batch_p50_ms / qbatch

    # inverted engine at scale: corpus far beyond the auto-threshold, where
    # the scan engine degrades linearly but postings cost stays constant —
    # the Lucene-analog path that must hold the ">10x OpenSearch" north star
    # (BASELINE.md) at production corpus sizes. Carries the certified-exact
    # contract (round-4 j59 established it at cap4096+ds3 = 1 230 q/s;
    # round-5 j74 re-measured that shape at 1 808 with the token-entry path
    # and j78x's deep-base sweep moved it to cap8192+ds0 = 2 405 — see the
    # inv_cfg comment below)
    n_large = 1 << 21  # 2.1M docs (16x the headline corpus, 8x auto-threshold)
    ltoks, lws = make_corpus(n_large, vocab, avg_terms=80, seed=2, l_max=96)
    inv_cfg = IndexConfig(
        # round-5 winning 2M shape (j78x deep-BASE sweep, PERFORMANCE.md):
        # cap8192 + ds0 certifies 80% shallow and routes the remaining
        # 102/512 rows through the in-dispatch deep tier — 2 405 q/s
        # certified 1.0 vs 1 813 at the round-4 cap4096+ds3 ladder shape
        # (whose 3x28672 extension reads taxed EVERY row). Same corpus-
        # scale lesson as the 128K ds0 headline, one octave deeper base.
        engine="inverted", l_max=96, block_docs=4096, query_batch=qbatch,
        weight_dtype="bfloat16", postings_cap=8192, query_terms=8,
        inverted_rescore_expand=16, exact_escalate=True,
        postings_ext_cap=24576, deep_slots=0, deep_escalate=True,
        incremental_postings=False,
    )
    t0 = time.time()
    inv = SparseIndex(vocab, inv_cfg)
    inv.add_topk([str(i) for i in range(n_large)], ltoks, lws)
    inv.finalize()
    inv_build_s = time.time() - t0
    def inv_window():
        handles = [
            inv.search_tokens_async(q_tok, q_w, k=k) for _ in range(DEPTH)
        ]
        inv.resolve_hits_many(handles)

    inv.search_tokens(q_tok, q_w, k=k)  # warmup/compile (sync shape)
    inv_window()  # warm the exact timed structure (async + stacked fetch)
    inv_qps = 0.0
    for _ in range(3):
        t0 = time.time()
        inv_window()
        inv_qps = max(inv_qps, DEPTH * n_queries / (time.time() - t0))
    inv_cert = (
        None if inv.last_certified is None
        else round(float(inv.last_certified.mean()), 4)
    )
    inv_esc = (
        None if inv.last_escalated is None
        else int(inv.last_escalated.sum()) // DEPTH
    )
    del inv, ltoks, lws

    # encoder forward throughput (the ingest hot path)
    from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se

    model = se.build_model(arch="mini", idf_path=os.path.join(REPO, "assets/idf.npz"))
    enc = se.BatchEncoder(model, max_length=128, seq_buckets=[128], do_count=False)
    texts = ["a benchmark document about sparse retrieval on tensor units"] * 256
    # warm the EXACT timed structure (async dispatch + an 8-handle stacked
    # resolve): a sync-encode warmup leaves the async forward and the
    # window-sized concat program uncompiled, and a cold cache then charges
    # ~10 s of first-use compile to the timed region (measured: 198 vs
    # ~10K docs/s; a 2-handle warmup still leaves the 8-stack concat cold —
    # 2.1K). Timing is best-of-3, matching steady-state ingest.
    def enc_window():
        handles = [
            enc.encode_batch_sparse_async(texts, l_max=128) for _ in range(8)
        ]
        enc.resolve_sparse_many(handles, [256] * 8)

    enc_window()  # compile
    # pipelined dispatch, as eval/beir.py::ingest drives it: all batches in
    # flight before the first resolve, so per-call sync latency is hidden
    # behind device compute instead of serializing with it
    enc_dps = 0.0
    for _ in range(3):
        t0 = time.time()
        enc_window()
        enc_dps = max(enc_dps, 8 * 256 / (time.time() - t0))

    # train-step throughput (fwd+bwd+AdamW, mini, the config_infonce shape),
    # measured as a chain of steps inside one dispatch so remote-runtime
    # per-call latency doesn't pollute the number
    import jax.numpy as jnp

    from opensearch_sparse_model_tuning_sample_tpu.core.config import (
        DataArguments,
        ModelArguments,
        TrainingArguments,
    )
    from opensearch_sparse_model_tuning_sample_tpu.ops.losses import build_loss_specs
    from opensearch_sparse_model_tuning_sample_tpu.train import trainer as T

    ma = ModelArguments(inf_free=True, arch="mini")
    da = DataArguments(loss_types=["infonce"], use_in_batch_negatives=True,
                       flops_d_lambda=0.05, flops_d_T=200)
    ta = TrainingArguments(output_dir="/tmp/bench_train", max_steps=100,
                           warmup_steps=5, save_strategy="no")
    tx = T.make_optimizer(ma, da, ta)
    step_fn = T.make_train_step(model, build_loss_specs(da), ma, da, tx)
    B, G, L = 16, 3, 128
    tok = model.tokenizer
    qf = tok(["a typical retrieval query"] * B, max_length=L, pad_to=L)
    df = tok(["a longer document body resembling a web passage"] * (B * G),
             max_length=L, pad_to=L)
    tb = {k: jnp.asarray(v) for k, v in {
        "q_input_ids": qf["input_ids"], "q_attention_mask": qf["attention_mask"],
        "d_input_ids": df["input_ids"], "d_attention_mask": df["attention_mask"],
    }.items()}
    state = T.TrainState(
        params=jax.tree_util.tree_map(jnp.array, model.params),
        opt_state=tx.init(model.params), step=jnp.asarray(0, jnp.int32),
        loss_ma=jnp.asarray(0.0, jnp.float32),
    )
    N_CHAIN = 10

    @jax.jit
    def chain(state, batch, rng):
        metrics = None
        for _ in range(N_CHAIN):
            state, metrics = step_fn(state, batch, rng)
        return state, metrics

    rng = jax.random.PRNGKey(0)
    state, m0 = chain(state, tb, rng)
    float(m0["loss"])  # compile + settle
    train_dps = 0.0
    for _ in range(3):
        t0 = time.time()
        state, m1 = chain(state, tb, rng)
        float(m1["loss"])
        train_dps = max(train_dps, N_CHAIN * B * G / (time.time() - t0))

    anchor_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(anchor_path):
        anchor = json.load(open(anchor_path)).get("qps", qps)
    else:
        anchor = qps
        with open(anchor_path, "w") as f:
            json.dump({"qps": qps, "note": "round-1 anchor on this hardware"}, f)

    print(
        json.dumps(
            {
                "metric": "index_queries_per_sec_128k_docs",
                "value": round(qps, 1),
                "unit": "queries/s",
                # vs_baseline compares to this repo's own round-1 anchor on
                # the same hardware (BENCH_BASELINE.json), NOT to any measured
                # OpenSearch number — no OpenSearch node exists in this
                # environment. See BASELINE.md "OpenSearch comparison" for
                # how the north-star claim is (and isn't) derivable.
                "vs_baseline": round(qps / anchor, 3),
                "baseline_kind": "round-1 self-anchor (same hardware), not OpenSearch",
                "extra": {
                    "sync_call_qps": round(sync_qps, 1),
                    "pipeline_depth": DEPTH,
                    "per_query_amortized_ms": round(p50_ms, 3),
                    "batch64_p50_roundtrip_ms": round(batch_p50_ms, 2),
                    "inverted_qps_2m_docs": round(inv_qps, 1),
                    "certified_frac_2m": inv_cert,
                    "escalated_2m": inv_esc,
                    "inverted_build_s_2m_docs": round(inv_build_s, 1),
                    "index_build_s": round(build_s, 2),
                    "encoder_docs_per_sec_mini_L128": round(enc_dps, 1),
                    "train_docs_per_sec_mini_L128": round(train_dps, 1),
                    "n_docs": n_docs,
                    "k": k,
                    "engine": idx._engine,
                    # fraction certified + how many re-ran on the exact scan
                    # during the headline run (results are exact either way)
                    "certified_frac": cert_frac,
                    "escalated": n_escalated,
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
