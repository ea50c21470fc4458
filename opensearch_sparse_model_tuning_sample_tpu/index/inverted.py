"""Impact-ordered inverted index: token-major postings with sort-merge
scoring.

This is the true Lucene-replacement layout (the reference's OpenSearch
`rank_features` index is exactly an impact-ordered inverted index,
SURVEY.md #22): per token, the top `postings_cap` (doc, weight) pairs by
weight. Query cost is INDEPENDENT of corpus size — it scales with
(query terms x postings_cap) — unlike the doc-major scan, whose cost is
linear in the corpus.

Scoring (all on device, static shapes):
  1. gather the query terms' posting rows            [B, T, C]
  2. partial scores  q_w * posting_w                 [B, T, C]
  3. flatten, sort by doc id per query row           [B, T*C]
  4. run-merge equal doc ids with a segment-sum      (exact sum over the
     query terms whose top-C postings contain the doc)
  5. optional exact rescore of the top candidates against the doc-major
     rows (removes the truncation underestimate entirely)
  6. top-k

Approximation contract: a doc can only be missed if NONE of the query's
terms rank it in their top-C postings — the classic impact-ordered
early-termination guarantee. With `postings_cap` >= the longest posting
list the result is exact.
"""

from __future__ import annotations

import logging
import threading
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_PAD_ID = np.iinfo(np.int32).max


_native_lib = None
_native_lock = threading.Lock()


def _load_native():
    """native/postings.cpp: parallel counting-bucket build (~10x the numpy
    packed-key argsort at 1e9 nnz). Auto-built by native/build.sh.

    Lock-guarded: the ingest background thread (IncrementalPostingsBuilder)
    and the main thread can race the lazy first load; without the lock one
    of them could CDLL a half-written .so during an auto-build and pin this
    process to the 10x-slower numpy path for its whole lifetime. A stale
    pre-round-2 .so (no merge_postings symbol) triggers one rebuild."""
    global _native_lib
    if _native_lib is not None:
        return _native_lib
    with _native_lock:
        if _native_lib is not None:
            return _native_lib
        _native_lib = _load_native_locked()
    return _native_lib


def _load_native_locked():
    import ctypes
    import os
    import subprocess

    if os.environ.get("OSSMT_NO_NATIVE"):
        return False
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lib_path = os.path.join(repo, "native", "build", "libpostings.so")
    script = os.path.join(repo, "native", "build.sh")

    def rebuild() -> bool:
        try:
            subprocess.run(["bash", script], check=True, capture_output=True,
                           timeout=120)
            return os.path.exists(lib_path)
        except Exception:
            return False

    if not os.path.exists(lib_path) and not rebuild():
        return False
    for attempt in (0, 1):
        try:
            lib = ctypes.CDLL(lib_path)
            lib.build_postings.restype = ctypes.c_int
            lib.build_postings.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
            ]
            # merge_postings was added after round 2: a cached older .so
            # lacks it — rebuild once rather than silently degrading
            lib.merge_postings.restype = ctypes.c_int
            lib.merge_postings.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
            ]
            return lib
        except (OSError, AttributeError) as e:
            if attempt == 0 and rebuild():
                continue
            logger.info("native postings unavailable (%s); numpy path", e)
            return False
    return False


def build_postings(
    toks: np.ndarray,  # [N, L] int32 doc-major token ids (0-padded via w=0)
    ws: np.ndarray,  # [N, L] f32 weights (0 = inactive)
    vocab_size: int,
    postings_cap: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side build: (post_docs [V, C] int32 (_PAD_ID padded),
    post_w [V, C] f32), impact-(weight-)sorted per token.

    Uses the parallel C++ builder when available; numpy fallback below."""
    lib = _load_native()
    if lib and toks.size:
        import ctypes

        N, L = toks.shape
        t = np.ascontiguousarray(toks, dtype=np.int32)
        w = np.ascontiguousarray(ws, dtype=np.float32)
        # the C++ builder indexes counts[tok] with no bounds check — an
        # out-of-range id would be silent heap corruption in a background
        # thread, where the numpy path raises cleanly. Keep both failure
        # modes identical. (~ms per 1e8 nnz, noise next to the build.)
        tmin, tmax = int(t.min()), int(t.max())
        if tmin < 0 or tmax >= vocab_size:
            raise ValueError(
                f"token ids out of range [0, {vocab_size}): min={tmin} "
                f"max={tmax}"
            )
        post_docs = np.empty((vocab_size, postings_cap), dtype=np.int32)
        post_w = np.empty((vocab_size, postings_cap), dtype=np.float32)
        rc = lib.build_postings(
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            N, L, vocab_size, postings_cap,
            post_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            post_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            0,
        )
        if rc == 0:
            return post_docs, post_w
        logger.warning("native postings build failed (rc=%d); numpy fallback", rc)
    return _build_postings_np(toks, ws, vocab_size, postings_cap)


def _build_postings_np(
    toks: np.ndarray,
    ws: np.ndarray,
    vocab_size: int,
    postings_cap: int,
) -> Tuple[np.ndarray, np.ndarray]:
    N, L = toks.shape
    flat_tok = toks.reshape(-1)
    flat_w = ws.reshape(-1).astype(np.float32)
    flat_doc = np.repeat(np.arange(N, dtype=np.int32), L)
    active = flat_w > 0
    flat_tok, flat_w, flat_doc = flat_tok[active], flat_w[active], flat_doc[active]

    # group by token, weight-descending within each group. Single packed-key
    # argsort (~3x faster than lexsort at 1e9 entries): weights are positive,
    # so their float32 bit patterns are monotonic — complementing them gives
    # descending order within the token group.
    w_bits = flat_w.view(np.uint32).astype(np.uint64)
    packed = (flat_tok.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - w_bits
    )
    order = np.argsort(packed, kind="stable")
    flat_tok, flat_w, flat_doc = flat_tok[order], flat_w[order], flat_doc[order]

    counts = np.bincount(flat_tok, minlength=vocab_size)
    starts = np.zeros(vocab_size + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(flat_tok.shape[0], dtype=np.int64) - starts[flat_tok]
    keep = rank < postings_cap

    post_docs = np.full((vocab_size, postings_cap), _PAD_ID, dtype=np.int32)
    post_w = np.zeros((vocab_size, postings_cap), dtype=np.float32)
    rows = flat_tok[keep]
    cols = rank[keep].astype(np.int64)
    post_docs[rows, cols] = flat_doc[keep]
    post_w[rows, cols] = flat_w[keep]
    truncated = int((counts > postings_cap).sum())
    if truncated:
        logger.info(
            "inverted build: %d/%d tokens truncated at cap %d "
            "(impact-ordered truncation)",
            truncated, int((counts > 0).sum()), postings_cap,
        )
    return post_docs, post_w


def merge_postings(
    a_docs: np.ndarray, a_w: np.ndarray,  # [V, C]
    b_docs: np.ndarray, b_w: np.ndarray,  # [V, C]
    row_chunk: int = 4096,
    b_doc_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token top-C of the union of two impact-sorted postings sets
    (`b_doc_offset` is added to b's doc ids — chunk builds emit LOCAL ids).

    Any global top-C posting for a token is in its source set's top-C, so
    merging per-chunk partials this way reproduces the one-shot build's
    posting SET exactly — EXCEPT when equal weights tie across the cap
    boundary: each chunk's top-C drops an arbitrary subset of the tied
    docs before the merge sees them, so the merged set can swap tied docs
    vs the one-shot build (scores and the w_tail certificate bound are
    identical either way; only set-identity comparisons notice).
    C++ row-merge when available; numpy fallback processes vocab
    row-chunks to bound the transient to row_chunk x 2C."""
    lib = _load_native()
    if lib and getattr(lib, "merge_postings", None) is not None:
        import ctypes

        a_docs = np.ascontiguousarray(a_docs, dtype=np.int32)
        a_w = np.ascontiguousarray(a_w, dtype=np.float32)
        b_docs = np.ascontiguousarray(b_docs, dtype=np.int32)
        b_w = np.ascontiguousarray(b_w, dtype=np.float32)
        V, C = a_docs.shape
        out_docs = np.empty_like(a_docs)
        out_w = np.empty_like(a_w)
        rc = lib.merge_postings(
            a_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            V, C, b_doc_offset,
            out_docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            0,
        )
        if rc == 0:
            return out_docs, out_w
        logger.warning("native postings merge failed (rc=%d); numpy fallback", rc)
    if b_doc_offset:
        b_docs = np.where(b_docs != _PAD_ID, b_docs + b_doc_offset, b_docs)
    V, C = a_docs.shape
    out_docs = np.empty_like(a_docs)
    out_w = np.empty_like(a_w)
    for s in range(0, V, row_chunk):
        e = min(s + row_chunk, V)
        w = np.concatenate([a_w[s:e], b_w[s:e]], axis=1)  # [v, 2C]
        d = np.concatenate([a_docs[s:e], b_docs[s:e]], axis=1)
        part = np.argpartition(-w, C - 1, axis=1)[:, :C]
        pw = np.take_along_axis(w, part, axis=1)
        order = np.argsort(-pw, axis=1, kind="stable")
        sel = np.take_along_axis(part, order, axis=1)
        out_w[s:e] = np.take_along_axis(w, sel, axis=1)
        out_docs[s:e] = np.take_along_axis(d, sel, axis=1)
    # entries with w == 0 are padding wherever they came from
    out_docs[out_w <= 0] = _PAD_ID
    return out_docs, out_w


class IncrementalPostingsBuilder:
    """Chunked postings build on a background HOST thread DURING ingest:
    each fed chunk runs the parallel C++ builder (LOCAL doc ids) and the
    C++ top-C row-merge folds it into the running state, so finalize()
    pays only the in-flight tail instead of a blocking corpus-sized build.
    The reference never pays a finalize cost at all (OpenSearch indexes
    server-side during _bulk, ingest.py:88-106); this restores that
    index-while-ingesting contract.

    Why HOST and not device: during ingest the device is saturated by the
    encoder forward — the host is the idle resource. The device variant
    (one lax.sort per chunk + row-sort merge, see git history) measured
    119.9 s vs 8.6 s one-shot C++ at 1M docs on the tunnelled TPU (the
    128 MB/chunk re-upload dominates) and 26x slower than C++ on the CPU
    backend — a negative result recorded in PERFORMANCE.md. The C++ build
    releases the GIL, so the ingest loop keeps feeding the device."""

    def __init__(self, vocab_size: int, postings_cap: int, unit: int = 131072,
                 seed: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        import queue
        import threading

        self.vocab_size = vocab_size
        self.cap = postings_cap
        self.unit = unit
        # `seed`: resume from an already-merged (docs, w) postings state —
        # the serving reopen() path seeds the previous finalize's postings
        # so a _bulk -> refresh cycle merges only the newly added rows
        # instead of refeeding the whole corpus. Seeded doc ids are GLOBAL
        # (merge treats the seed as the running state, offset 0).
        self._docs: Optional[np.ndarray] = None
        self._w: Optional[np.ndarray] = None
        if seed is not None:
            self._docs = np.ascontiguousarray(seed[0], dtype=np.int32)
            self._w = np.ascontiguousarray(seed[1], dtype=np.float32)
        self.fed_docs = 0
        self._err: Optional[BaseException] = None
        # bounded queue: caps host memory at ~4 in-flight chunks and
        # back-pressures the ingest loop if the builder falls behind
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        self._thread = threading.Thread(
            target=self._run, name="postings-builder", daemon=True
        )
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue  # drain without work after a failure
            toks, ws, off = item
            try:
                pd, pw = build_postings(toks, ws, self.vocab_size, self.cap)
                if self._docs is None:
                    if off:
                        pd = np.where(pd != _PAD_ID, pd + off, pd)
                    self._docs, self._w = pd, pw
                else:
                    self._docs, self._w = merge_postings(
                        self._docs, self._w, pd, pw, b_doc_offset=off
                    )
            except BaseException as e:  # noqa: BLE001 — re-raised at finish
                self._err = e

    def feed(self, toks: np.ndarray, ws: np.ndarray, doc_offset: int):
        """Enqueue a chunk. CONTRACT: the caller must not mutate/reuse the
        passed arrays afterwards — ascontiguousarray aliases an
        already-contiguous buffer, and the builder thread reads it
        asynchronously (queue depth 4). engine._slice_rows always passes
        fresh np.concatenate outputs."""
        if self._err is not None:
            raise RuntimeError("postings builder thread failed") from self._err
        n = toks.shape[0]
        if n == 0:
            return
        self._q.put((
            np.ascontiguousarray(toks, dtype=np.int32),
            np.ascontiguousarray(ws, dtype=np.float32),
            doc_offset,
        ))
        self.fed_docs = doc_offset + n

    def finish(self) -> Tuple[np.ndarray, np.ndarray]:
        """Join the builder thread and return the final (docs, w). The
        builder is single-use: discard after finish()."""
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise RuntimeError("postings builder thread failed") from self._err
        if self._docs is None:
            return (
                np.full((self.vocab_size, self.cap), _PAD_ID, np.int32),
                np.zeros((self.vocab_size, self.cap), np.float32),
            )
        return self._docs, self._w


def split_postings(
    post_docs: np.ndarray,  # [V, C_total] from build_postings
    post_w: np.ndarray,
    base_cap: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split a full-depth postings build into (base [V, base_cap],
    extension [n_deep+1, C_total-base_cap], deep_map [V]) for tiered
    adaptive read depths.

    Only the "deep" tokens — those whose impact-sorted postings extend past
    base_cap — get an extension row; everything else maps to the final
    all-padding row. On zipf-distributed corpora the deep set is a few
    hundred to a few thousand tokens (131K docs @ cap 1024: 1 793 of
    30 522), so storing [V, C_total] densely (750 MB at C_total=4096) drops
    to base + a small dense extension. At query time the search fn reads
    the extension only for the few terms whose tail dominates the exactness
    bound (make_search_fn deep_slots), making the certificate's read depth
    ADAPTIVE per term while every shape stays static."""
    V, C_total = post_docs.shape
    if base_cap >= C_total:
        raise ValueError(
            f"split_postings: base_cap={base_cap} >= C_total={C_total}"
        )
    base_d = np.ascontiguousarray(post_docs[:, :base_cap])
    base_w = np.ascontiguousarray(post_w[:, :base_cap])
    deep = np.flatnonzero(post_w[:, base_cap] > 0)
    Ce = C_total - base_cap
    ext_d = np.full((deep.size + 1, Ce), _PAD_ID, dtype=np.int32)
    ext_w = np.zeros((deep.size + 1, Ce), dtype=np.float32)
    if deep.size:
        ext_d[:-1] = post_docs[deep, base_cap:]
        ext_w[:-1] = post_w[deep, base_cap:]
    deep_map = np.full(V, deep.size, dtype=np.int32)  # pad row by default
    deep_map[deep] = np.arange(deep.size, dtype=np.int32)
    return base_d, base_w, ext_d, ext_w, deep_map


def build_tail_blockmax(
    toks: np.ndarray,  # [N, L] int32 doc-major token ids
    ws: np.ndarray,  # [N, L] f32 weights (0 = inactive)
    vocab_size: int,
    read_cap: int,  # the shallow read depth the bound must cover beyond
    n_pad: int,  # padded corpus size (blocks partition [0, n_pad))
    block_docs: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token, per-doc-id-block maxima over the postings TAIL (impact
    rank >= read_cap) — the Lucene block-max-WAND analog for the exactness
    certificate.

    The whole-tail bound charges every query term's full tail weight to ONE
    hypothetical missed doc: bound_tail = sum_t q_w[t] * w_tail[t]. But a
    missed doc d can only carry, per term, the max tail weight within ITS
    doc-id block: score_missed(d) <= sum_t q_w[t] * bm[t, block(d)], so

        tail_bound = max_b sum_t q_w[t] * min(bm[t, b], w_tail[t])

    is sound and usually far tighter — one block rarely holds near-tail-max
    weights for every query term at once (Lucene's per-block maxima bound
    missed docs locally for exactly this reason, reference search.py:59-70
    via OpenSearch). The min() keeps per-slot ADAPTIVE read depths sound:
    a slot that read deeper than read_cap (deep_slots extensions) has a
    smaller actual tail, and bm — built at read_cap — stays an upper bound.

    Returns (bm [R+1, NB] f32, bmap [V] int32): R = tokens with any tail
    mass, row R all-zero, non-tail tokens map to it. Built from the same
    doc-major rows as the postings, so it covers mass beyond the STORED
    postings depth too (rank >= build cap) — the bound needs no
    "beyond-storage" fudge term."""
    return build_tail_blockmax_multi(
        toks, ws, vocab_size, (read_cap,), n_pad, block_docs
    )[0]


def build_tail_blockmax_multi(
    toks: np.ndarray,
    ws: np.ndarray,
    vocab_size: int,
    read_caps,  # sequence of read depths, one (bm, bmap) each
    n_pad: int,
    block_docs: int,
):
    """Several read depths from ONE impact sort (see build_tail_blockmax):
    the engine needs maxima at both the inf-free base depth (postings_cap)
    and the full-forward narrow-read depth (full_postings_cols), and the
    packed-key argsort over all nnz dominates the build."""
    NB = -(-max(n_pad, 1) // block_docs)
    flat_tok = toks.reshape(-1)
    flat_w = ws.reshape(-1).astype(np.float32)
    N, L = toks.shape
    flat_doc = np.repeat(np.arange(N, dtype=np.int64), L)
    keep = flat_w > 0
    flat_tok, flat_w, flat_doc = flat_tok[keep], flat_w[keep], flat_doc[keep]
    # impact order within each token group (same packed-key trick as
    # _build_postings_np)
    w_bits = flat_w.view(np.uint32).astype(np.uint64)
    packed = (flat_tok.astype(np.uint64) << np.uint64(32)) | (
        np.uint64(0xFFFFFFFF) - w_bits
    )
    order = np.argsort(packed, kind="stable")
    flat_tok, flat_w, flat_doc = flat_tok[order], flat_w[order], flat_doc[order]
    counts = np.bincount(flat_tok, minlength=vocab_size)
    starts = np.zeros(vocab_size + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(flat_tok.shape[0], dtype=np.int64) - starts[flat_tok]
    out = []
    for read_cap in read_caps:
        tail = rank >= read_cap
        t_tok, t_w, t_doc = flat_tok[tail], flat_w[tail], flat_doc[tail]
        tail_tokens = np.unique(t_tok)
        R = int(tail_tokens.size)
        bmap = np.full(vocab_size, R, dtype=np.int32)
        bmap[tail_tokens] = np.arange(R, dtype=np.int32)
        bm = np.zeros((R + 1, NB), dtype=np.float32)
        if t_tok.size:
            key = bmap[t_tok].astype(np.int64) * NB + t_doc // block_docs
            # entries are weight-DESCENDING within each token, so the first
            # occurrence of each (token, block) key is that cell's max
            uk, ui = np.unique(key, return_index=True)
            bm.reshape(-1)[uk] = t_w[ui]
        out.append((bm, bmap))
    return out


CERT_MARGIN = 1e-4  # relative fp-reorder tolerance of the certificate


def certified_mask(kth, bound, xp=jnp):
    """The certificate decision: certify a query when its k-th exact score
    clears the missed-score bound by a small relative margin (the bound's
    cut term and the rescore sum the same f32 products in different orders,
    so they can disagree by a few ulps near an exact tie — see
    make_search_fn). ONE implementation serves both the device fused
    escalation (xp=jnp, engine._build_search_fn) and the host certificate
    check (xp=np, engine.search): if the two rules drifted apart, a fused
    single-device index would escalate a different query set than a
    doc/query-sharded index over the same corpus."""
    def rule():
        margin = CERT_MARGIN * xp.maximum(xp.abs(bound), xp.abs(kth))
        margin = xp.where(xp.isfinite(margin), margin, 0.0)
        return kth >= bound + margin

    if xp is np:
        with np.errstate(invalid="ignore"):
            return rule()
    return rule()


def pack_doc_rows(toks: np.ndarray, ws: np.ndarray) -> np.ndarray:
    """Pack doc-major rows into ONE int32 array: bf16 weight bits in the
    high half, int16 token id in the low half. The rescore gather then
    fetches half the indices (TPU gathers price per index, not per byte).
    Only valid for bf16-weight engines (the pack IS a bf16 truncation) and
    vocab < 2**15. Unpacked on device by make_search_fn(packed_docs=True)."""
    if toks.max(initial=0) >= 2**15 or toks.min(initial=0) < 0:
        # negatives would wrap through uint32 and clobber the weight half
        raise ValueError("pack_doc_rows needs token ids in [0, 2**15)")
    wb = np.asarray(ws, dtype=np.dtype(jnp.bfloat16)).view(np.uint16)
    return (
        (wb.astype(np.uint32) << np.uint32(16))
        | toks.astype(np.uint32)
    ).view(np.int32)


def make_search_fn(
    post_docs: jax.Array,  # [V, C] int32
    post_w: jax.Array,  # [V, C] (weight dtype)
    doc_toks: Optional[jax.Array],  # [N_pad, L] int32 (for exact rescore)
    doc_ws: Optional[jax.Array],  # [N_pad, L]
    query_terms: int,  # T: query term slots used for lookup
    k: int,
    rescore: bool = True,
    jit: bool = True,
    postings_cols: Optional[int] = None,  # use only the top-C' postings/term
    merge_shifts: Optional[int] = None,  # None = T-1 (exact run sums)
    rescore_expand: int = 4,  # candidate pool = expand * k
    refine_expand: int = 0,  # cut-refinement pool = expand * k (see below)
    select_by_impact: bool = False,  # term selection by q_w * max posting w
    phase1_ratio: Optional[float] = None,  # query-side two-phase (see below)
    deep_slots: int = 0,  # tiered adaptive depth (see below)
    with_bound: bool = False,  # also return the missed-doc score bound
    sort_candidates: bool = False,  # gather rescore rows in doc-id order
    packed_docs: bool = False,  # doc_toks holds pack_doc_rows() output
    token_entry: bool = False,  # q = (q_tok, q_w) slots, no dense query
    match_rescore: bool = False,  # rescore by slot matching (see below)
    tail_blockmax: bool = False,  # per-block tail bound (see below)
):
    """Build the inverted search: dense q [B, V] -> (scores, ids).

    `jit=False` returns the raw pure function for embedding inside a
    shard_map region (sharded corpora, see engine._build_search_fn).

    Two operating points share this code:

      * **inf-free** (default): T = a handful of term slots, all C postings
        per term, exact run sums. Queries have ~2-10 active terms, so the
        T slots cover them all and the sort-merge score is the exact
        postings-visible score.
      * **full-forward** (`postings_cols`/`select_by_impact` set): hundreds
        of active query terms. Candidate generation widens to the top-T
        terms by impact upper bound (q_w x that term's max posting weight,
        the WAND bound — post_w[:, 0] since postings are impact-sorted) but
        reads only the top-C' postings per term, keeping the sort size
        T*C' ~ constant. The sort-merge sums are then only a candidate
        ranking; `rescore` recovers EXACT scores because the rescore dot
        product uses the full dense query against each candidate's stored
        doc-major row. This replaces the reference's Lucene WAND traversal
        for wide queries (/root/reference/scripts/search.py:59-70) with a
        TPU-shaped gather/sort pipeline whose cost stays independent of
        corpus size.

    `merge_shifts` < T-1 truncates per-run sums (a doc appearing in more
    than merge_shifts+1 of the looked-up postings lists gets a partial
    candidate score) — only meaningful with rescore on.

    `deep_slots` > 0 enables TIERED ADAPTIVE READ DEPTHS: the search fn then
    takes an extra `ext` tuple (ext_docs, ext_w, deep_map) from
    split_postings. Per query, the `deep_slots` terms whose bound
    contribution (q_w x tail-at-the-shallow-read) is largest ALSO read the
    rest of their base row (full-forward, where Cq < C) and their extension
    row — so the exactness certificate's read depth adapts per term (fat
    zipf-head tokens read deep, everything else stays narrow) while all
    shapes stay static. A doc still appears at most once per term across
    the base+extension slices (they partition one impact-sorted list), so
    the run-merge bound on run length — and the exact-sum guarantee — are
    unchanged. The tail bound uses each term's ACTUAL read depth: shallow
    terms pay tail-at-Cq, deep terms pay the extension's last read weight
    (zero when the extension exhausts the postings).

    `phase1_ratio` implements the reference's QUERY-side two-phase
    (OpenSearch neural_sparse_two_phase_processor, search.py:27-42): term
    LOOKUP considers only tokens with weight >= ratio * max weight; the
    exact rescore — and the exactness bound's unselected-mass term — still
    see the full query, so the returned scores are exact for the returned
    docs and the certificate stays sound (pruned-out terms contribute
    q_w * w_max to the bound, exactly like terms that lost a lookup slot).
    Requires rescore=True (without it the visible sums would silently drop
    the pruned terms' mass).

    `with_bound` additionally returns, per query, an upper bound on the
    true score of ANY doc the search could have missed (a WAND-flavored
    exactness certificate; Lucene reaches exactness by visiting more
    postings, we reach a *certificate* with static shapes):

        bound = cut + Σ_selected q_w[t]·w_tail[t] + Σ_unselected q[t]·w_max[t]

    where w_tail[t] is the smallest posting weight actually read for term t
    (any doc absent from the read slice of t's impact-sorted row weighs no
    more), w_max[t] = post_w[t, 0] bounds terms that never won a lookup
    slot, and cut bounds docs dropped at the k1 candidate cut (their exact
    run sums are known ≤ s1[k1-1]). When the missed mass is ~0 and the cut
    dropped nothing positive the bound is returned as -inf directly (the
    candidate pool provably holds every positive-scoring doc — certifiable
    even when fewer than k docs match and the k-th score is -inf).
    Otherwise: if the k-th returned exact score ≥
    bound, the top-k is PROVABLY exact — up to f32 summation order: the
    cut term bounds dropped candidates by their sorted-merge run sums,
    while the rescore/exact scan sums the same products doc-major, so the
    two can differ by a few ulps near an exact tie. The consumer
    (engine.search) therefore certifies only when kth clears the bound by
    a small relative margin, which keeps the certificate sound under fp
    reordering (at worst a borderline tie is left uncertified).
    Preconditions: tokens unique per doc row (true for every rep produced
    by the encoder's top-k sparsification) and exact run sums; with
    `merge_shifts` < T-1 the cut term is not sound, so the bound
    degenerates to +inf (never certifies).
    Without rescore the returned scores are postings-visible sums, so the
    bound degenerates to -inf when nothing was truncated (certified) and
    +inf otherwise.

    `match_rescore` replaces the exact-rescore's dense-query gather with
    `query_terms` masked vector compares against the selected (q_tok, q_w)
    slots. The dense gather `take_along_axis(q, cand_toks)` prices
    B x k1 x l_max indices on TPU (~1.3M at the headline shape — 57% of
    the whole hot path, PERFORMANCE.md round-4 breakdown); the match path
    prices T fused compare+selects over the same [B, k1, L] tile and NO
    gather. The two are BIT-IDENTICAL when every active query term
    occupies a lookup slot (each candidate token matches at most one slot,
    so the reconstructed per-token weights equal the dense row exactly,
    summed in the same order): that holds for inf-free queries with
    <= query_terms active terms — the precondition the engine's
    full-forward width routing already enforces. NOT valid with
    select_by_impact / phase1_ratio (the slots then deliberately exclude
    query mass the rescore must see) — rejected at build.

    `token_entry` changes the query input from a dense [B, V] matrix to
    the pair (q_tok [B, T] int32, q_w [B, T] f32) — the serving-path
    representation (engine.search_tokens). The query IS the slot list by
    definition, so term selection (top_k over [B, 30522]), the bound's
    [B, V] total-mass matvec, and the dense scatter all disappear:
    total_ub = sum_t q_w[t] * w_max[q_tok[t]] with NO unselected term,
    and the rescore runs the match path above (exact by construction).
    Duplicate tokens across slots are allowed and score like a dense
    scatter-add would (each slot contributes independently everywhere).
    Implies match_rescore; same incompatibilities.

    `tail_blockmax` (with_bound only) tightens the certificate's tail term
    with per-doc-block maxima (build_tail_blockmax): the search fn then
    takes a trailing `bmx = (bm [R+1, NB], bmap [V])` argument and replaces
    sum_t q_w*w_tail with max_b sum_t q_w*min(bm[t_b], w_tail) — the
    block-max-WAND bound. CALLER CONTRACT: bm must be built at a read_cap
    <= the shallowest read any selected term performs (postings_cols when
    narrowed, else the base postings width) — engine.finalize builds one
    bm per entry mode accordingly. One [B, T] row gather + a [B, T, NB]
    reduction — cheap next to the postings sort for NB up to a few
    thousand blocks.

    `refine_expand` > rescore_expand (rescore + with_bound only) adds a
    CUT-REFINEMENT tier inside the search fn: when any row in the batch
    fails the certificate at the base pool, the SAME sorted run sums are
    exact-rescored at a pool of refine_expand*k candidates. At multi-M-doc
    scale the bound's binding term is the cut (the k1-th run sum), not the
    postings tail — deepening the pool shrinks the cut at the cost of one
    wider top_k + doc-row gather, with no postings re-read and no re-sort,
    so rows the base pool can't certify usually certify here instead of
    falling to the engine's deep re-lookup / exact-scan escalation ladder.
    """
    C = post_docs.shape[1]
    Cq = C if postings_cols is None else min(postings_cols, C)
    TC = query_terms * Cq
    shifts = (query_terms - 1) if merge_shifts is None else min(
        merge_shifts, query_terms - 1
    )
    if not rescore and (shifts < query_terms - 1 or Cq < C):
        raise ValueError(
            "approximate candidate generation (merge_shifts/postings_cols) "
            "requires rescore=True — without rescore the returned scores "
            "would be truncated"
        )
    if Cq < 1:
        raise ValueError(f"postings_cols={postings_cols} must be >= 1")
    if rescore and rescore_expand < 1:
        raise ValueError(f"rescore_expand={rescore_expand} must be >= 1")
    if phase1_ratio is not None and not rescore:
        raise ValueError(
            "phase1_ratio (query-side two-phase) requires rescore=True — "
            "phase-1 sums drop the pruned terms' mass"
        )
    if packed_docs and post_w.dtype != jnp.bfloat16:
        # the pack IS a bf16 truncation of the doc weights: rescoring
        # truncated weights against an untruncated-f32 postings bound could
        # CERTIFY results that differ from the exact scan by more than the
        # certificate margin — sound only when postings weights are the
        # same bf16 values
        raise ValueError(
            "packed_docs requires bfloat16 postings weights (got "
            f"{post_w.dtype}); the packed rescore is a bf16 truncation and "
            "the exactness bound must be computed from the same values"
        )
    if TC < k:
        raise ValueError(
            f"k={k} exceeds the candidate pool query_terms*postings_cols="
            f"{query_terms}*{Cq}={TC} — raise query_terms/postings_cap or "
            "lower k (otherwise top_k fails inside jit with an opaque error)"
        )
    if token_entry:
        match_rescore = rescore  # no dense query exists to gather from
        if select_by_impact or phase1_ratio is not None or Cq < C:
            raise ValueError(
                "token_entry is the inf-free fast path: incompatible with "
                "select_by_impact / phase1_ratio / postings_cols (those "
                "modes need the dense query the token entry elides)"
            )
    if match_rescore and (select_by_impact or phase1_ratio is not None):
        raise ValueError(
            "match_rescore reconstructs the query from the lookup slots — "
            "unsound when select_by_impact/phase1_ratio deliberately "
            "exclude query mass from them"
        )
    if tail_blockmax and not with_bound:
        raise ValueError("tail_blockmax only affects the with_bound path")
    deep_slots = min(max(int(deep_slots), 0), query_terms)

    def search(q, post_docs, post_w, doc_toks, doc_ws, ext=None, bmx=None):
        if token_entry:
            # q = (q_tok [B, T] int32, q_w [B, T] f32): the slots ARE the
            # query — no [B, V] top_k, no dense scatter (see docstring)
            q_tok, q_w = q
            q_tok = q_tok.astype(jnp.int32)
            q_w = jnp.maximum(q_w.astype(jnp.float32), 0.0)
            B = q_tok.shape[0]
            if q_tok.shape[1] != query_terms:  # trace-time shape contract
                raise ValueError(
                    f"token_entry: q_tok has {q_tok.shape[1]} slots, the "
                    f"search fn was built for query_terms={query_terms} — "
                    "pad/truncate the slot axis at the caller"
                )
        else:
            B = q.shape[0]
            if phase1_ratio is not None:
                # query-side two-phase: lookup sees only high-weight tokens.
                # `q` (full) still feeds the rescore and the bound's total_ub.
                thresh = jnp.max(q, axis=1, keepdims=True) * phase1_ratio
                q_sel = jnp.where(q >= thresh, q, 0.0)
            else:
                q_sel = q
            if select_by_impact:
                # impact upper bound per term: q_w * max posting weight.
                # Postings are impact-sorted so column 0 is each token's max
                # weight; terms with empty postings get bound 0 and never
                # win a slot.
                ub = q_sel * jnp.maximum(
                    post_w[:, 0].astype(jnp.float32), 0.0
                )[None, :]
                _, q_tok = jax.lax.top_k(ub, query_terms)  # [B, T]
                q_w = jnp.take_along_axis(q_sel, q_tok, axis=1)
            else:
                # top-T terms by weight (inference-free queries have ~2-10
                # active terms; T slots cover them)
                q_w, q_tok = jax.lax.top_k(q_sel, query_terms)  # [B, T]
        term_valid = q_w > 0

        if Cq < C:
            # narrow gather: only the top-Cq impact columns per term (the
            # slice composes with the row gather into one [B, T, Cq] fetch)
            docs = post_docs[:, :Cq][q_tok]
            pw = post_w[:, :Cq][q_tok].astype(jnp.float32)
        else:
            docs = post_docs[q_tok]  # [B, T, C] row gather
            pw = post_w[q_tok].astype(jnp.float32)
        part = pw * q_w[:, :, None]
        valid = (docs != _PAD_ID) & term_valid[:, :, None] & (pw > 0)

        ids = jnp.where(valid, docs, _PAD_ID).reshape(B, TC)
        part = jnp.where(valid, part, 0.0).reshape(B, TC)

        w_tail = pw[:, :, -1]  # [B, T] smallest weight read per term
        if deep_slots:
            # tiered adaptive depth (see docstring): the deep_slots terms
            # whose bound contribution q_w * tail is largest also read (a)
            # the rest of their base row when the shallow read is narrowed
            # (full-forward Cq < C) and (b) their extension row. Base,
            # middle and extension slices partition one impact-sorted
            # postings list, so a doc still appears at most once per term.
            ext_docs_a, ext_w_a, deep_map_a = ext
            contrib = jnp.where(term_valid, q_w * w_tail, -1.0)
            _, dpos = jax.lax.top_k(contrib, deep_slots)  # [B, S] slot pos
            d_tok = jnp.take_along_axis(q_tok, dpos, axis=1)
            d_qw = jnp.take_along_axis(q_w, dpos, axis=1)
            extra_ids, extra_part = [], []
            if Cq < C:
                m_docs = post_docs[:, Cq:][d_tok]  # [B, S, C-Cq]
                m_w = post_w[:, Cq:][d_tok].astype(jnp.float32)
                m_valid = (
                    (m_docs != _PAD_ID) & (d_qw > 0)[:, :, None] & (m_w > 0)
                )
                extra_ids.append(
                    jnp.where(m_valid, m_docs, _PAD_ID).reshape(B, -1)
                )
                extra_part.append(
                    jnp.where(m_valid, m_w * d_qw[:, :, None], 0.0).reshape(
                        B, -1
                    )
                )
            rows = deep_map_a[d_tok]  # pad row for non-deep tokens
            e_docs = ext_docs_a[rows]  # [B, S, Ce]
            e_w = ext_w_a[rows].astype(jnp.float32)
            e_valid = (e_docs != _PAD_ID) & (d_qw > 0)[:, :, None] & (e_w > 0)
            extra_ids.append(jnp.where(e_valid, e_docs, _PAD_ID).reshape(B, -1))
            extra_part.append(
                jnp.where(e_valid, e_w * d_qw[:, :, None], 0.0).reshape(B, -1)
            )
            ids = jnp.concatenate([ids] + extra_ids, axis=1)
            part = jnp.concatenate([part] + extra_part, axis=1)
            # deep terms now pay the extension's last READ weight as their
            # tail (zero when the extension exhausted the postings — then
            # nothing was missed for that term at all)
            w_tail = w_tail.at[
                jnp.arange(B, dtype=jnp.int32)[:, None], dpos
            ].set(e_w[:, :, -1])

        if with_bound:
            # missed-mass bound (see docstring): tails of the read postings
            # slices + terms that never won a lookup slot. One [B,V] matvec
            # + two masked [B,T] reductions — negligible next to the sort.
            sel_max = jnp.sum(
                jnp.where(
                    term_valid,
                    q_w * jnp.maximum(pw[:, :, 0], 0.0), 0.0,
                ), axis=1
            )
            if token_entry:
                # every active term IS a slot: no unselected mass, and the
                # total upper bound needs no [B, V] matvec
                total_ub = sel_max
                unsel = jnp.zeros((B,), jnp.float32)
            else:
                w_max = jnp.maximum(post_w[:, 0].astype(jnp.float32), 0.0)
                total_ub = q @ w_max  # [B]
                unsel = jnp.maximum(total_ub - sel_max, 0.0)
            tail = jnp.sum(
                jnp.where(term_valid, q_w * w_tail, 0.0), axis=1
            )
            if tail_blockmax:
                # block-max-WAND tail: a missed doc carries at most its own
                # block's tail max per term (see build_tail_blockmax). The
                # min() keeps deeper-than-read_cap slots (deep_slots) sound;
                # the whole-tail term above remains an upper bound, so take
                # the tighter of the two.
                bm_a, bmap_a = bmx
                bmr = bm_a[bmap_a[q_tok]].astype(jnp.float32)  # [B, T, NB]
                per = jnp.where(
                    term_valid[:, :, None],
                    q_w[:, :, None] * jnp.minimum(bmr, w_tail[:, :, None]),
                    0.0,
                )
                tail = jnp.minimum(tail, jnp.max(jnp.sum(per, axis=1), axis=1))
            miss = tail + unsel

        # sort-merge by doc id per query row: one two-operand sort carries
        # the partial scores along with the ids (no argsort + gathers). A doc
        # id appears at most once per term's postings list, so each sorted
        # id-run has length <= T: the per-doc sums are computed EXACTLY with
        # T-1 masked shifted adds read at each run's last element (a global
        # cumsum-difference would carry rounding proportional to the whole
        # row's running total, ~1e-2 absolute at TC=32768 — enough to flip
        # near-tie rankings when rescore is off). No scatter/segment ops
        # anywhere, so XLA lowers the merge to sort + T fused vector ops.
        sid, sp = jax.lax.sort((ids, part), dimension=1, num_keys=1)
        is_end = jnp.concatenate(
            [sid[:, 1:] != sid[:, :-1], jnp.ones((B, 1), bool)], axis=1
        )
        run_sum = sp
        for j in range(1, shifts + 1):
            same = jnp.concatenate(
                [jnp.zeros((B, j), bool), sid[:, j:] == sid[:, :-j]], axis=1
            )
            shifted = jnp.concatenate(
                [jnp.zeros((B, j), sp.dtype), sp[:, :-j]], axis=1
            )
            run_sum = run_sum + jnp.where(same, shifted, 0.0)
        sums = jnp.where(is_end & (sid != _PAD_ID), run_sum, -jnp.inf)
        rid = sid

        # positions that are not a run end hold a real doc id with a -inf
        # sum — any top_k selection of a -inf slot must be masked to PAD or
        # it would duplicate that doc downstream
        if not rescore:
            s, sel = jax.lax.top_k(sums, k)
            i = jnp.where(
                jnp.isfinite(s), jnp.take_along_axis(rid, sel, axis=1), _PAD_ID
            )
            i = jnp.where(i == _PAD_ID, -1, i)
            if with_bound:
                # postings-visible sums are the TRUE scores only when no
                # row was truncated at the read width — certified (-inf)
                # exactly then, never otherwise (+inf). `miss` compares the
                # same products summed in two f32 orders (a [B,V] matvec vs
                # a masked [B,T] sum), so an exact query can read a few
                # ulps positive: compare against a relative margin (same
                # 1e-4 the rescore consumer uses) instead of exact zero,
                # or every exact query would be left uncertified — and
                # with exact_escalate, re-run the corpus-linear scan
                bound = jnp.where(
                    miss > 1e-4 * jnp.maximum(total_ub, 1e-30),
                    jnp.inf, -jnp.inf,
                )
                return s, i, bound
            return s, i

        # exact rescore of the top candidate pool against doc-major rows.
        # `qv` is the per-row query view: the dense [B, V] matrix, or with
        # match_rescore the (q_tok, q_w) slot pair (see docstring).
        def pool_rescore(k1, sums, rid, qv, miss, total_ub):
            """Exact-rescore the top-k1 run-sum pool (row-sliceable: all
            per-row tensors enter as arguments); returns the top-k
            (scores, ids) and the missed-score bound for THIS pool width
            (None without with_bound). Called once at the base width over
            the whole batch and — when rows fail certification — again at
            refine_expand*k over a compacted slice of just those rows:
            deepening the pool shrinks the bound's cut term (s1[k1-1]
            decreases in k1) without re-reading postings or re-sorting."""
            B = (qv[0] if match_rescore else qv).shape[0]
            s1, sel = jax.lax.top_k(sums, k1)
            cand = jnp.where(
                jnp.isfinite(s1), jnp.take_along_axis(rid, sel, axis=1),
                _PAD_ID,
            )  # [B, k1]
            if sort_candidates:
                # gather rows in ascending doc-id order (PAD sorts last) — a
                # locality experiment for huge corpora. Scores are unchanged;
                # on an EXACT rescore-score tie the returned id can differ
                # from the unsorted path (top_k keeps the first occurrence,
                # which is now doc-id order instead of run-sum order)
                cand = jnp.take_along_axis(
                    cand, jnp.argsort(cand, axis=1), axis=1
                )
            safe = jnp.clip(cand, 0, doc_toks.shape[0] - 1)
            if packed_docs:
                # one packed int32 row per doc (pack_doc_rows: bf16 weight
                # bits high, int16 token id low): HALF the gather indices of
                # the two-array fetch — TPU gathers price per index, not per
                # byte
                pk = doc_toks[safe]  # [B, k1, L] int32
                ct = jnp.bitwise_and(pk, 0xFFFF)
                cw = jax.lax.bitcast_convert_type(
                    jnp.right_shift(pk, 16).astype(jnp.uint16), jnp.bfloat16
                ).astype(jnp.float32)
            else:
                ct = doc_toks[safe].astype(jnp.int32)  # [B, k1, L]
                cw = doc_ws[safe].astype(jnp.float32)
            if match_rescore:
                # reconstruct each candidate token's query weight by slot
                # matching: T fused compare+selects over the [B, k1, L]
                # tile replace the B x k1 x L-INDEX dense gather (TPU
                # gathers price per index — this was 57% of the hot path).
                # Each candidate token matches at most one distinct slot
                # (duplicate slots both fire, exactly like a dense
                # scatter-add would), so `g` is BIT-IDENTICAL to the
                # gathered dense row and `exact` sums in the same order.
                mt, mw = qv
                g = jnp.zeros(ct.shape, jnp.float32)
                for t in range(query_terms):
                    g = g + jnp.where(
                        (ct == mt[:, t][:, None, None])
                        & (mw[:, t] > 0)[:, None, None],
                        mw[:, t][:, None, None], 0.0,
                    )
            else:
                g = jnp.take_along_axis(
                    qv, ct.reshape(B, -1), axis=1
                ).reshape(B, k1, -1)
            exact = jnp.sum(g * cw, axis=-1)
            exact = jnp.where(cand == _PAD_ID, -jnp.inf, exact)
            s, sel2 = jax.lax.top_k(exact, k)
            i = jnp.take_along_axis(cand, sel2, axis=1)
            i = jnp.where(i == _PAD_ID, -1, i)
            if not with_bound:
                return s, i, None
            if shifts < query_terms - 1:
                # truncated run sums under-rank candidates at the k1 cut:
                # the cut term is unsound, so never certify
                return s, i, jnp.full((B,), jnp.inf, jnp.float32)
            if k1 < int(ids.shape[1]):
                # the pool is narrower than the (possibly
                # extension-widened) sort: dropped candidates are
                # bounded by the k1-th run sum
                cut = jnp.where(
                    jnp.isfinite(s1[:, -1]),
                    jnp.maximum(s1[:, -1], 0.0), 0.0,
                )
            else:
                cut = jnp.zeros((B,), jnp.float32)
            bound = cut + miss
            # zero-miss certificate: when the missed mass is ~0 (no
            # posting row truncated at the read width, every active
            # term won a lookup slot) AND the k1 cut dropped nothing
            # with a positive run sum, EVERY doc with a positive score
            # is in the candidate pool — the result is provably exact
            # even when fewer than k docs match (kth = -inf, which the
            # kth >= bound rule alone can never certify; scores <= 0
            # are not results: both this engine and the exact scan drop
            # them). `miss` re-sums the same f32 products two ways, so
            # compare against the same relative margin the consumer
            # uses rather than exact zero.
            bound = jnp.where(
                (cut <= 0.0)
                & (miss <= 1e-4 * jnp.maximum(total_ub, 1e-30)),
                -jnp.inf, bound,
            )
            return s, i, bound

        qv = (q_tok, q_w) if match_rescore else q
        k1 = min(rescore_expand * k, ids.shape[1])
        s, i, bound = pool_rescore(k1, sums, rid, qv, miss, total_ub)
        if not with_bound:
            return s, i
        k2 = min(max(int(refine_expand), 0) * k, ids.shape[1])
        if k2 > k1 and shifts >= query_terms - 1:
            # CUT-REFINEMENT tier: at multi-M-doc scale the bound's binding
            # term is the cut, not the postings tail (8.8M-doc analysis:
            # uniform depth 8192 tail-certifies 475/512 queries, yet the
            # k1=80 cut left only 106 certified; at 2M the measured 40
            # escalations match the cut requirement k1<=80 exactly). Rows
            # that fail the certificate are COMPACTED to the front
            # (argsort of the certified mask) and re-rescored from the SAME
            # sorted run sums at a deeper pool — no postings re-gather, no
            # re-sort, just a wider top_k + doc-row gather over the slice.
            # The rescore gather is the cost driver (~k2*l_max fetched
            # elements per row), so the slice sizes form a geometric ladder
            # like the engine's escalation tiers: a batch with few
            # uncertified rows pays only the smallest covering tier.
            # Refined rows' pool is a superset of the base pool, so splicing
            # their results back can only improve them; certified rows are
            # never touched.
            cert0 = certified_mask(s[:, -1], bound)
            n_unc = jnp.sum(~cert0)

            def refine_slice(E):
                def f():
                    idx = jnp.argsort(cert0)[:E]  # uncertified rows first
                    s2, i2, b2 = pool_rescore(
                        k2, jnp.take(sums, idx, axis=0),
                        jnp.take(rid, idx, axis=0),
                        jax.tree.map(
                            lambda a: jnp.take(a, idx, axis=0), qv
                        ),
                        jnp.take(miss, idx), jnp.take(total_ub, idx),
                    )
                    m = jnp.take(~cert0, idx)
                    s3 = s.at[idx].set(jnp.where(
                        m[:, None], s2, jnp.take(s, idx, axis=0)))
                    i3 = i.at[idx].set(jnp.where(
                        m[:, None], i2, jnp.take(i, idx, axis=0)))
                    b3 = bound.at[idx].set(jnp.where(
                        m, b2, jnp.take(bound, idx)))
                    return s3, i3, b3

                return f

            tiers = []
            t = 8
            while t < B:
                tiers.append(t)
                t *= 4
            branch = refine_slice(B)
            for E in reversed(tiers):
                def branch(E=E, wider=branch):
                    return jax.lax.cond(n_unc <= E, refine_slice(E), wider)

            s, i, bound = jax.lax.cond(
                n_unc > 0, branch, lambda: (s, i, bound)
            )
        return s, i, bound

    return jax.jit(search) if jit else search
