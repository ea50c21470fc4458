"""Eval layer: trec metrics vs hand-computed values, ingest->search->evaluate
end-to-end on the synthetic corpus, mining loop, metrics sink."""

import json
import math
import os
import time

import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.eval import trec_eval
from opensearch_sparse_model_tuning_sample_tpu.eval.beir import (
    ingest,
    search,
    synthetic_beir,
)
from opensearch_sparse_model_tuning_sample_tpu.eval.metrics_sink import (
    emit_metrics,
    read_metrics,
)
from opensearch_sparse_model_tuning_sample_tpu.data.datasets import BEIRCorpusDataset
from opensearch_sparse_model_tuning_sample_tpu.index.engine import IndexConfig
from opensearch_sparse_model_tuning_sample_tpu.mine.hard_negatives import (
    mine_hard_negatives,
)


# ------------------------------------------------------------- trec metrics


def test_ndcg_hand_computed():
    qrels = {"q1": {"d1": 2, "d2": 1}}
    run = {"q1": {"d3": 3.0, "d1": 2.0, "d2": 1.0}}  # ranked: d3, d1, d2
    ndcg, _, _, _ = trec_eval.evaluate(qrels, run, [3])
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert ndcg["NDCG@3"] == pytest.approx(dcg / idcg, abs=1e-4)


def test_perfect_ranking_is_one():
    qrels = {"q": {"a": 3, "b": 2, "c": 1}}
    run = {"q": {"a": 9.0, "b": 8.0, "c": 7.0}}
    ndcg, m, r, p = trec_eval.evaluate(qrels, run, [3])
    assert ndcg["NDCG@3"] == 1.0
    assert m["MAP@3"] == 1.0
    assert r["Recall@3"] == 1.0
    assert p["P@3"] == 1.0


def test_missing_query_in_run_is_excluded():
    """pytrec_eval scores only run-present queries and BEIR divides by that
    count — a judged query absent from the run must not drag the average
    down as an implicit zero (it would diverge from the reference numbers
    for the identical run)."""
    qrels = {"q1": {"a": 1}, "q2": {"b": 1}}
    run = {"q1": {"a": 1.0}}
    ndcg, _, _, _ = trec_eval.evaluate(qrels, run, [1])
    assert ndcg["NDCG@1"] == 1.0


def test_recall_and_precision():
    qrels = {"q": {"a": 1, "b": 1, "c": 1, "d": 1}}
    run = {"q": {"a": 4.0, "x": 3.0, "b": 2.0, "y": 1.0}}
    _, _, r, p = trec_eval.evaluate(qrels, run, [4])
    assert r["Recall@4"] == pytest.approx(0.5)  # 2 of 4 relevant
    assert p["P@4"] == pytest.approx(0.5)


def test_hand_worked_example_all_metrics():
    """Fully hand-computed trec_eval oracle on a two-query example, including
    the case the old MAP definition got wrong: MAP@k with k < n_rel divides
    by n_rel (trec_eval `map_cut`), not min(n_rel, k)."""
    qrels = {
        "q1": {"d1": 2, "d2": 1, "d3": 0},  # 2 relevant docs
        "q2": {"da": 1},
    }
    run = {
        "q1": {"d2": 0.9, "d5": 0.8, "d1": 0.7, "d4": 0.1},  # d2,d5,d1,d4
        "q2": {"da": 0.5, "db": 0.4},
    }
    ndcg, m, r, p = trec_eval.evaluate(qrels, run, [1, 2, 10])

    # q1 NDCG@10: DCG = 1/log2(2) + 2/log2(4) = 2.0;
    # IDCG = 2/log2(2) + 1/log2(3)
    q1_ndcg10 = 2.0 / (2.0 + 1.0 / math.log2(3))
    assert ndcg["NDCG@10"] == pytest.approx((q1_ndcg10 + 1.0) / 2, abs=1e-4)

    # q1 MAP@10 = (1/1 + 2/3) / 2 ; q2 MAP@10 = 1
    assert m["MAP@10"] == pytest.approx(((1 + 2 / 3) / 2 + 1.0) / 2, abs=1e-4)
    # MAP@1: q1 top1=d2 -> (1/1)/2 = 0.5 (NOT 1.0 — divide by n_rel=2);
    # q2 -> 1.0
    assert m["MAP@1"] == pytest.approx((0.5 + 1.0) / 2, abs=1e-4)

    # Recall@2: q1 {d2,d5} hits 1 of 2 -> 0.5; q2 -> 1.0
    assert r["Recall@2"] == pytest.approx((0.5 + 1.0) / 2, abs=1e-4)
    # P@2: q1 1/2; q2 1/2 (db not relevant)
    assert p["P@2"] == pytest.approx(0.5, abs=1e-4)


def test_parity_with_pytrec_eval_definitions():
    """Cross-check NDCG/MAP/Recall/P against pytrec_eval on a random
    qrels/run (skipped where pytrec_eval isn't installed; the hand-worked
    example above pins the definitions regardless)."""
    pytrec_eval = pytest.importorskip("pytrec_eval")
    rng = np.random.default_rng(0)
    qrels = {f"q{i}": {f"d{j}": int(rng.integers(0, 3)) for j in range(20)}
             for i in range(5)}
    run = {f"q{i}": {f"d{j}": float(rng.normal()) for j in range(30)}
           for i in range(5)}
    ks = [1, 10]
    measures = {f"ndcg_cut.{k}" for k in ks} | {f"map_cut.{k}" for k in ks} | \
        {f"recall.{k}" for k in ks} | {f"P.{k}" for k in ks}
    ev = pytrec_eval.RelevanceEvaluator(qrels, measures)
    scores = ev.evaluate(run)
    ndcg, m, r, p = trec_eval.evaluate(qrels, run, ks)
    n = len(scores)
    for k in ks:
        assert ndcg[f"NDCG@{k}"] == pytest.approx(
            sum(s[f"ndcg_cut_{k}"] for s in scores.values()) / n, abs=1e-4)
        assert m[f"MAP@{k}"] == pytest.approx(
            sum(s[f"map_cut_{k}"] for s in scores.values()) / n, abs=1e-4)
        assert r[f"Recall@{k}"] == pytest.approx(
            sum(s[f"recall_{k}"] for s in scores.values()) / n, abs=1e-4)
        assert p[f"P@{k}"] == pytest.approx(
            sum(s[f"P_{k}"] for s in scores.values()) / n, abs=1e-4)


# --------------------------------------------------- end-to-end ingest/search


@pytest.fixture(scope="module")
def synth():
    return synthetic_beir(n_docs=120, n_queries=12, seed=0)


def test_ingest_search_evaluate_synthetic(tiny_model, synth, tmp_path):
    """Full pipeline with the idf-weighted lexical oracle (doc_inf_free):
    queries literally contain their relevant docs' topic words, so NDCG@10
    must be high; this exercises ingest, the sparse engine, FLOPS stats and
    the metric stack together."""
    corpus, queries, qrels = synth
    out = str(tmp_path)
    index = ingest(
        BEIRCorpusDataset(corpus), tiny_model, out, "synth",
        max_length=64, batch_size=32,
        index_cfg=IndexConfig(engine="sparse", l_max=32, block_docs=64, query_batch=8),
        doc_inf_free=True,
    )
    assert index.n_docs == len(corpus)
    res = search(
        queries, tiny_model, index, out, "synth",
        max_length=64, batch_size=32, result_size=10, inf_free=True,
    )
    ndcg, _, recall, _ = trec_eval.evaluate(qrels, res["run_res"], [1, 10])
    assert ndcg["NDCG@10"] > 0.55, ndcg
    assert res["flops"] > 0 and res["q_length"] > 0 and res["d_length"] > 0
    assert os.path.exists(os.path.join(out, "synth.corpus.npy"))


def test_flops_statistic_is_inner_product(tiny_model, synth, tmp_path):
    corpus, queries, qrels = synth
    out = str(tmp_path)
    index = ingest(
        BEIRCorpusDataset(corpus), tiny_model, out, "fl",
        max_length=64, batch_size=64, doc_inf_free=True,
        index_cfg=IndexConfig(l_max=32, block_docs=64, query_batch=8),
    )
    res = search(queries, tiny_model, index, out, "fl", max_length=64,
                 batch_size=64, inf_free=True)
    # q_length/d_length are the sums of the avg activation vectors
    count_d = np.load(os.path.join(out, "fl.corpus.npy"))
    assert res["d_length"] == pytest.approx(float(count_d.sum()))


def test_mining_produces_training_rows(tiny_model, synth, tmp_path):
    corpus, queries, qrels = synth
    rows = mine_hard_negatives(
        corpus, queries, qrels, tiny_model,
        out_dir=str(tmp_path), index_name="mine",
        save_path=str(tmp_path / "mined"),
        max_length=64, batch_size=32, result_size=10,
        index_cfg=IndexConfig(l_max=32, block_docs=64, query_batch=8),
    )
    assert len(rows) >= len(queries)  # one row per (query, positive)
    for r in rows[:5]:
        assert r["query"] and r["pos"]
        # positives must not appear among negatives
        assert r["pos"] not in r["negs"]
    import datasets as hfds

    ds = hfds.Dataset.load_from_disk(str(tmp_path / "mined"))
    assert len(ds) == len(rows)


# --------------------------------------------------------------- metrics sink


def test_metrics_sink_jsonl(tmp_path, monkeypatch):
    monkeypatch.setenv("METRICS_DIR", str(tmp_path))
    emit_metrics({"NDCG@10": 0.7, "flops": 3.2}, "beir_eval", "run_a")
    emit_metrics({"NDCG@10": 0.8}, "beir_eval", "run_b")
    rows = read_metrics("beir_eval")
    assert len(rows) == 2
    assert rows[0]["_id"] == "run_a" and rows[0]["NDCG@10"] == 0.7
    assert "timestamp" in rows[0]


def test_import_metrics_cli(tmp_path, monkeypatch):
    import json as _json

    monkeypatch.setenv("METRICS_DIR", str(tmp_path / "m"))
    run_dir = tmp_path / "output" / "run1" / "beir_eval_2p"
    run_dir.mkdir(parents=True)
    (run_dir / "avg_res.json").write_text(_json.dumps({"NDCG@10": 0.5}))
    nano_dir = tmp_path / "output" / "run1" / "nano_beir_eval"
    nano_dir.mkdir(parents=True)
    (nano_dir / "avg_res_step500.json").write_text(_json.dumps({"NDCG@10": 0.4}))

    from opensearch_sparse_model_tuning_sample_tpu.cli.import_metrics import main

    main([str(tmp_path / "output")])
    rows = read_metrics("beir_eval")
    assert any(r["NDCG@10"] == 0.5 and r["_id"].endswith("_2p") for r in rows)
    rows_n = read_metrics("nano_beir_eval")
    assert any(r["NDCG@10"] == 0.4 and r["_id"].endswith("_step500") for r in rows_n)


def test_multihost_ingest_reduces_counts(tiny_model, synth, tmp_path):
    """world_size=2 ingest: the corpus stat must be the GLOBAL average (per-
    rank counts reduced through out_dir, reference ingest.py:108-117), and
    the saved shard indexes must merge into the full corpus."""
    from concurrent.futures import ThreadPoolExecutor

    from opensearch_sparse_model_tuning_sample_tpu.index.engine import SparseIndex

    corpus, queries, qrels = synth
    ds = BEIRCorpusDataset(corpus)
    cfg = dict(max_length=64, batch_size=32,
               index_cfg=IndexConfig(engine="sparse", l_max=32, block_docs=64,
                                     query_batch=8))
    single_dir = str(tmp_path / "single")
    ingest(ds, tiny_model, single_dir, "mh", **cfg)
    want = np.load(os.path.join(single_dir, "mh.corpus.npy"))

    multi_dir = str(tmp_path / "multi")

    def run(rank):
        return ingest(ds, tiny_model, multi_dir, "mh", rank=rank,
                      world_size=2, barrier_timeout=120.0, **cfg)

    with ThreadPoolExecutor(2) as ex:  # ranks poll for each other's counts
        shards = list(ex.map(run, [0, 1]))

    got = np.load(os.path.join(multi_dir, "mh.corpus.npy"))
    np.testing.assert_allclose(got, want)

    paths = []
    for r, sh in enumerate(shards):
        p = os.path.join(multi_dir, f"shard{r}")
        sh.save(p)
        paths.append(p)
    merged = SparseIndex.merge_saved(paths)
    assert merged.n_docs == len(corpus)
    assert sorted(merged.doc_ids) == sorted(corpus.keys())


def test_synthetic_rich_presets_and_splits():
    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import load_synthetic

    c, q, r = load_synthetic("synthetic-rich-500x20", split="test")
    assert len(c) == 500 and len(q) == 20
    ct, qt, rt = load_synthetic("synthetic-rich-500x20", split="train")
    assert c == ct, "corpus shared across splits"
    assert not (set(q.values()) & set(qt.values())), "split queries disjoint"
    assert len(qt) >= len(q), "train split at least as large (coverage)"
    c2, q2, r2 = load_synthetic("synthetic-rich-500x20", split="test")
    assert q2 == q and r2 == r, "deterministic"
    # every query has its source doc at rel 2 and the noise word is common
    for qid, rel in r.items():
        assert 2 in rel.values()
    cn, qn, _ = load_synthetic("synthetic-nano")
    assert len(cn) == 2000 and len(qn) == 50


def test_multihost_ingest_rerun_same_outdir(tiny_model, synth, tmp_path):
    """Re-running a multi-host ingest into the SAME out_dir must produce the
    fresh global stat (regression: the existence-based barrier read the
    previous run's rank parts; each rank now clears its own stale part)."""
    from concurrent.futures import ThreadPoolExecutor

    corpus, _, _ = synth
    ds = BEIRCorpusDataset(corpus)
    cfg = dict(max_length=64, batch_size=32,
               index_cfg=IndexConfig(engine="sparse", l_max=32, block_docs=64,
                                     query_batch=8))
    out = str(tmp_path / "rerun")

    def run(rank):
        return ingest(ds, tiny_model, out, "mh", rank=rank,
                      world_size=2, barrier_timeout=120.0, **cfg)

    with ThreadPoolExecutor(2) as ex:
        list(ex.map(run, [0, 1]))
    first = np.load(os.path.join(out, "mh.corpus.npy"))
    with ThreadPoolExecutor(2) as ex:  # second run, same out_dir
        list(ex.map(run, [0, 1]))
    second = np.load(os.path.join(out, "mh.corpus.npy"))
    np.testing.assert_allclose(second, first)  # fresh stat, not doubled


def test_barrier_fails_fast_on_dead_rank(tmp_path):
    """A rank whose heartbeat exists but went stale past the grace period is
    presumed dead: the barrier raises a rank-naming error immediately
    instead of hanging until barrier_timeout."""
    import pytest

    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import (
        _Liveness,
        _reduce_counts,
    )

    out = str(tmp_path)
    # rank 1 "started" (heartbeat exists) but stopped beating long ago
    dead = _Liveness(out, "mh", 1, 2, grace=2.0)
    dead.beat(force=True)
    past = time.time() - 60
    os.utime(dead.paths[1], (past, past))

    live = _Liveness(out, "mh", 0, 2, grace=2.0)
    live.beat(force=True)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="rank 1.*stale"):
        _reduce_counts(out, "mh", 0, 2, np.zeros(8), 4,
                       timeout=600.0, liveness=live)
    assert time.time() - t0 < 30, "must fail fast, not wait out the timeout"


def test_barrier_missing_heartbeat_keeps_full_timeout(tmp_path):
    """A rank with NO heartbeat may just be slow to launch — that case must
    keep the normal timeout semantics (TimeoutError, not a death verdict)."""
    import pytest

    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import (
        _Liveness,
        _reduce_counts,
    )

    out = str(tmp_path)
    live = _Liveness(out, "mh", 0, 2, grace=2.0)
    live.beat(force=True)
    with pytest.raises(TimeoutError, match="never wrote"):
        _reduce_counts(out, "mh", 0, 2, np.zeros(8), 4,
                       timeout=1.0, liveness=live)


def test_harness_produces_recall_100(tiny_model, synth, tmp_path, monkeypatch):
    """The north-star metric (BASELINE.json recall@100) must come out of the
    standard harness: default eval_k_values=[1,10,100] widens result_size to
    100 and records Recall@100 in avg_res + the CSV."""
    import csv as _csv

    from opensearch_sparse_model_tuning_sample_tpu.core.config import parse_config
    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import evaluate_datasets

    corpus, queries, qrels = synth

    def loader(name):
        return corpus, queries, qrels

    monkeypatch.setenv("METRICS_DIR", str(tmp_path / "metrics"))
    ma, da, ta = parse_config({
        "output_dir": str(tmp_path), "beir_datasets": "synthetic",
        "max_steps": 1, "arch": "tiny", "eval_max_seq_length": 64,
        "per_device_eval_batch_size": 32,
    })
    eval_dir = str(tmp_path / "beir_eval")
    avg = evaluate_datasets(["synthetic"], loader, tiny_model, ma, da, ta, eval_dir)
    assert "Recall@100" in avg and 0.0 <= avg["Recall@100"] <= 1.0
    with open(os.path.join(eval_dir, "beir_statistics.csv")) as f:
        header = next(_csv.reader(f))
    assert "Recall@100" in header

    # the reference's exact [1,10]/15 surface stays available
    ma2, da2, ta2 = parse_config({
        "output_dir": str(tmp_path), "beir_datasets": "synthetic",
        "max_steps": 1, "arch": "tiny", "eval_max_seq_length": 64,
        "per_device_eval_batch_size": 32, "eval_k_values": "1,10",
        "eval_result_size": 15, "skip_ingest": True,
    })
    avg2 = evaluate_datasets(["synthetic"], loader, tiny_model, ma2, da2, ta2, eval_dir)
    assert "Recall@100" not in avg2


def test_skip_ingest_reuses_saved_index(tiny_model, synth, tmp_path, monkeypatch):
    """skip_ingest: true must reuse the index persisted by a previous eval
    run (reference evaluate_beir.py:158 — the OpenSearch index persists)."""
    from opensearch_sparse_model_tuning_sample_tpu.core.config import parse_config
    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import evaluate_datasets

    corpus, queries, qrels = synth

    def loader(name):
        return corpus, queries, qrels

    base = {"output_dir": str(tmp_path), "beir_datasets": "synthetic",
            "max_steps": 1, "arch": "tiny", "eval_max_seq_length": 64,
            "per_device_eval_batch_size": 32}
    monkeypatch.setenv("METRICS_DIR", str(tmp_path / "metrics"))
    ma, da, ta = parse_config(dict(base))
    eval_dir = str(tmp_path / "beir_eval")
    first = evaluate_datasets(["synthetic"], loader, tiny_model, ma, da, ta, eval_dir)
    ma2, da2, ta2 = parse_config(dict(base, skip_ingest=True))
    second = evaluate_datasets(["synthetic"], loader, tiny_model, ma2, da2, ta2, eval_dir)
    assert second["NDCG@10"] == pytest.approx(first["NDCG@10"], abs=0.02)


def test_search_reports_certificate_stats(tiny_model, synth, tmp_path):
    """Inverted-engine eval search surfaces the exactness-certificate tally
    (certified_frac / escalated_frac over real queries, excluding chunk
    padding); exact-by-construction engines omit the keys."""
    corpus, queries, qrels = synth
    out = str(tmp_path)
    index = ingest(
        BEIRCorpusDataset(corpus), tiny_model, out, "cert",
        max_length=64, batch_size=32, doc_inf_free=True,
        index_cfg=IndexConfig(engine="inverted", l_max=32, block_docs=64,
                              query_batch=8, postings_cap=128, query_terms=8,
                              exact_escalate=True),
    )
    res = search(queries, tiny_model, index, out, "cert", max_length=64,
                 batch_size=32, inf_free=True)
    # escalation on: every query is exact, so the whole tally certifies
    assert res["certified_frac"] == 1.0
    assert 0.0 <= res["escalated_frac"] <= 1.0

    scan = ingest(
        BEIRCorpusDataset(corpus), tiny_model, out, "certscan",
        max_length=64, batch_size=32, doc_inf_free=True,
        index_cfg=IndexConfig(engine="sparse", l_max=32, block_docs=64,
                              query_batch=8),
    )
    res2 = search(queries, tiny_model, scan, out, "certscan", max_length=64,
                  batch_size=32, inf_free=True)
    assert "certified_frac" not in res2


def test_harness_surfaces_certificate_stats(tiny_model, synth, tmp_path, monkeypatch):
    """The certificate tally must land where eval results land: YAML knobs
    (index_engine/index_exact_escalate) select the inverted engine, and
    certified_frac/escalated_frac come out in avg_res and the CSV."""
    import csv as _csv

    from opensearch_sparse_model_tuning_sample_tpu.core.config import parse_config
    from opensearch_sparse_model_tuning_sample_tpu.eval.beir import evaluate_datasets

    corpus, queries, qrels = synth

    def loader(name):
        return corpus, queries, qrels

    monkeypatch.setenv("METRICS_DIR", str(tmp_path / "metrics"))
    ma, da, ta = parse_config({
        "output_dir": str(tmp_path), "beir_datasets": "synthetic",
        "max_steps": 1, "arch": "tiny", "eval_max_seq_length": 64,
        "per_device_eval_batch_size": 32, "index_engine": "inverted",
        "index_l_max": 32, "index_postings_cap": 128, "index_query_terms": 8,
        "index_exact_escalate": True,
    })
    eval_dir = str(tmp_path / "beir_eval")
    avg = evaluate_datasets(["synthetic"], loader, tiny_model, ma, da, ta, eval_dir)
    assert avg["certified_frac"] == 1.0  # escalation on => all exact
    assert 0.0 <= avg["escalated_frac"] <= 1.0
    with open(os.path.join(eval_dir, "beir_statistics.csv")) as f:
        header = next(_csv.reader(f))
    assert "certified_frac" in header and "escalated_frac" in header


def test_trec_eval_tie_break_and_run_coverage():
    """trec_eval conventions: score ties break by DESCENDING doc id, and
    metrics average only over queries present in the run (pytrec_eval /
    BEIR divide by the run-covered count, not the qrels count)."""
    from opensearch_sparse_model_tuning_sample_tpu.eval import trec_eval

    # tie: d1 and d9 share the score; only d9 is relevant. Descending-docid
    # tie-break ranks d9 first -> NDCG@1 = 1.0 (ascending would give 0).
    qrels = {"q1": {"d9": 1}}
    run = {"q1": {"d1": 3.25, "d9": 3.25}}
    ndcg, _, _, _ = trec_eval.evaluate(qrels, run, [1])
    assert ndcg["NDCG@1"] == 1.0

    # coverage: q2 is judged but absent from the run -> excluded from the
    # average, not scored as zero
    qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
    run = {"q1": {"d1": 1.0}}
    ndcg, _, recall, _ = trec_eval.evaluate(qrels, run, [1])
    assert ndcg["NDCG@1"] == 1.0
    assert recall["Recall@1"] == 1.0
