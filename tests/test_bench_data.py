"""The synthetic benchmark corpus must be realistic enough to exercise the
engines: zipf-PMF token popularity shared across seeds, idf-anticorrelated
weights, and docs whose unique-term count tracks `avg_terms`.

Regression for the round-3 data-realism fix: the original generator used
`rng.zipf(1.3)` SAMPLES as token popularities — infinite-mean draws put
~all probability mass on one token, so "110-term" docs collapsed to ~2
unique terms after dedupe, every postings list but a handful was empty,
and corpora/queries drawn with different seeds had disjoint support.
"""

import numpy as np

from bench import make_corpus, make_queries, token_dist

V = 30522


def test_docs_keep_their_term_count():
    toks, ws = make_corpus(500, V, avg_terms=110, seed=1)
    active = (ws > 0).sum(axis=1)
    assert active.mean() > 0.85 * 110, f"degenerate corpus: {active.mean():.1f}"
    # unique tokens per row (the engines' run-merge precondition)
    for i in range(0, 500, 50):
        live = toks[i][ws[i] > 0]
        assert len(np.unique(live)) == live.size


def test_corpus_and_queries_share_vocabulary_distribution():
    """Different seeds must draw from ONE token popularity assignment —
    otherwise query terms never hit corpus postings (the old failure:
    recall comparisons returned empty results on both engines)."""
    toks, ws = make_corpus(2000, V, avg_terms=110, seed=1)
    q_tok, q_w = make_queries(64, V, n_terms=6, seed=3)
    doc_tokens = set(np.unique(toks[ws > 0]))
    q_live = q_tok[q_w > 0]
    hit = np.mean([t in doc_tokens for t in q_live.ravel()])
    assert hit > 0.5, f"query/corpus support overlap only {hit:.2f}"


def test_weights_anticorrelate_with_popularity():
    """SPLADE-like: popular (stopword-ish) tokens carry little weight.
    This is what makes impact-ordered postings + the WAND bound workable,
    so the benchmark must reproduce it."""
    _, idf = token_dist(V)
    toks, ws = make_corpus(2000, V, avg_terms=110, seed=1)
    live = ws > 0
    r = np.corrcoef(idf[toks[live]], ws[live])[0, 1]
    assert r > 0.3, f"weight/idf correlation {r:.2f}"


def test_queries_are_idf_weighted():
    _, idf = token_dist(V)
    q_tok, q_w = make_queries(32, V, n_terms=6, seed=3)
    live = q_w > 0
    np.testing.assert_allclose(q_w[live], idf[q_tok[live]], rtol=1e-6)
    assert (live.sum(axis=1) == 6).all()
