"""Query a saved index from the command line (the serving utility the
reference delegates to OpenSearch).

Build an index once (e.g. via cli/evaluate_beir with skip-search, or
programmatically with SparseIndex.save), then:

    python -m ...cli.search --index out/idx --model <ckpt-or-arch> \
        --queries queries.txt --k 10 [--trec run.txt] [--two-phase]

`queries.txt`: one query per line, or TSV `qid\ttext`. Output: JSON lines
{qid, hits: {doc_id: score}} to stdout, optionally a TREC run file.
"""

from __future__ import annotations

import argparse
import json

from ..index.engine import SparseIndex
from ..models import sparse_encoder as se


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="SparseIndex.save() dir")
    p.add_argument("--model", default=None, help="checkpoint dir (default: inf-free with bundled idf)")
    p.add_argument("--arch", default="mini")
    p.add_argument("--idf", default=None, help="idf asset path (default bundled)")
    p.add_argument("--queries", required=True, help="text file: query per line or qid\\ttext")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max-length", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--query-prune", type=float, default=0.0)
    p.add_argument("--two-phase", action="store_true")
    p.add_argument("--full-encode", action="store_true",
                   help="full model forward for queries instead of inf-free")
    p.add_argument("--trec", default=None, help="also write a TREC run file")
    args = p.parse_args(argv)

    import os

    model = se.build_model(
        model_name_or_path=args.model, arch=args.arch,
        idf_path=args.idf or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "assets", "idf.npz",
        ),
    )
    index = SparseIndex.load(args.index)
    encoder = se.BatchEncoder(model, max_length=args.max_length, do_count=False)

    qids, texts = [], []
    with open(args.queries, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line:
                continue
            if "\t" in line:
                qid, text = line.split("\t", 1)
            else:
                qid, text = f"q{i}", line
            qids.append(qid)
            texts.append(text)

    trec_f = open(args.trec, "w") if args.trec else None
    for s in range(0, len(texts), args.batch_size):
        reps = encoder.encode_batch_device(
            texts[s : s + args.batch_size], inf_free=not args.full_encode
        )
        hits = index.search(
            reps, k=args.k, query_prune=args.query_prune, two_phase=args.two_phase
        )
        for qid, h in zip(qids[s : s + args.batch_size], hits):
            print(json.dumps({"qid": qid, "hits": h}))
            if trec_f:
                for rank, (did, score) in enumerate(
                    sorted(h.items(), key=lambda kv: -kv[1]), 1
                ):
                    trec_f.write(f"{qid} Q0 {did} {rank} {score:.6f} sparse-tpu\n")
    if trec_f:
        trec_f.close()


if __name__ == "__main__":
    main()
