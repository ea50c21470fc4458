"""Precompute teacher scores for a mined posnegs dataset -> kd dataset.

The reference's kd recipes consume {query, docs, scores} rows whose scores
were precomputed offline (e.g. opensearch-project/msmarco-hard-negatives,
reference prepare_msmarco_hard_negatives.py + dataset.py:151-217). With zero
egress this tool plays that role: it scores each (query, doc) pair with a
local teacher checkpoint (sparse bi-encoder semantics: full-forward doc rep
x inf-free or full query rep) and writes an HF save_to_disk dataset.

    python tools/make_kd_scores.py --posnegs data/synthetic-rich_train \
        --teacher output/infonce_synthetic/checkpoint-2000 \
        --out data/synthetic-rich_kd --docs-per-query 8
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--posnegs", required=True, help="mined posnegs dataset dir")
    p.add_argument("--teacher", required=True, help="teacher checkpoint dir")
    p.add_argument("--out", required=True)
    p.add_argument("--docs-per-query", type=int, default=8,
                   help="pos + (n-1) negs kept per row")
    p.add_argument("--random-negs", type=int, default=0,
                   help="of the docs-per-query-1 negatives, draw this many "
                        "uniformly from OTHER queries' docs instead of the "
                        "row's mined hard negatives. Real KD score sets "
                        "(msmarco-hard-negatives) mix systems of very "
                        "different strength, so their negative pools span "
                        "easy docs too; pure top-k mined negatives teach "
                        "nothing about separating relevant docs from the "
                        "rest of the corpus, and kldiv-only training then "
                        "loses that separation (measured: NDCG@10 0.97 -> "
                        "0.71 on the synthetic task at 0 random negs).")
    p.add_argument("--max-length", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--query-inf-free", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="score teacher queries inference-free (idf-weighted "
                        "bag); --no-query-inf-free uses the full forward")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import datasets as hfds

    from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se

    model = se.build_model(model_name_or_path=args.teacher)
    enc = se.BatchEncoder(model, max_length=args.max_length, do_count=False)

    src = hfds.Dataset.load_from_disk(args.posnegs)
    rng = np.random.default_rng(args.seed)
    pool = []  # all docs across rows, for --random-negs draws
    if args.random_negs:
        for r in src:
            pool.append(r["pos"])
            pool.extend(r["negs"])
    rows = []
    flat_q, flat_docs, spans = [], [], []
    for r in src:
        n_hard = args.docs_per_query - 1 - args.random_negs
        docs = [r["pos"]] + list(r["negs"])[: max(n_hard, 0)]
        if pool:
            # draw from OTHER queries' docs (the help text's contract): a
            # draw colliding with this row's own pos/negs would duplicate
            # the positive into the negative slots with an identical score
            own = set(docs)
            need, attempts = args.random_negs, 0
            while need and attempts < 50 * args.random_negs:
                attempts += 1
                cand = pool[int(rng.integers(0, len(pool)))]
                if cand in own:
                    continue  # tiny corpora may exhaust; bounded attempts
                docs.append(cand)
                own.add(cand)
                need -= 1
        if len(docs) < 2:
            continue
        spans.append((len(flat_docs), len(docs)))
        flat_q.append(r["query"])
        flat_docs.extend(docs)
        rows.append({"query": r["query"], "docs": docs})

    # teacher scores: q_rep . d_rep, scored in document batches
    q_reps = []
    for s in range(0, len(flat_q), args.batch_size):
        q_reps.append(enc.encode_batch(flat_q[s : s + args.batch_size],
                                       inf_free=args.query_inf_free))
    q_reps = np.concatenate(q_reps, axis=0)
    d_reps = []
    for s in range(0, len(flat_docs), args.batch_size):
        d_reps.append(enc.encode_batch(flat_docs[s : s + args.batch_size]))
    d_reps = np.concatenate(d_reps, axis=0)

    for i, (start, n) in enumerate(spans):
        scores = d_reps[start : start + n] @ q_reps[i]
        # rank-order docs by teacher score: KnowledgeDistillDataset's strided
        # grouping (datasets.py:61-106, reference dataset.py:193-196) assumes
        # rank-ordered rows, as real KD score sets are
        order = np.argsort(-scores)
        rows[i]["docs"] = [rows[i]["docs"][j] for j in order]
        rows[i]["scores"] = [float(scores[j]) for j in order]

    hfds.Dataset.from_list(rows).save_to_disk(args.out)
    print(f"wrote {len(rows)} kd rows -> {args.out}")


if __name__ == "__main__":
    main()
