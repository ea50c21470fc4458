"""On-device sparse retrieval engine — the OpenSearch/Lucene replacement.

The reference outsources its entire index/score/top-k layer to an external
OpenSearch node (`rank_features` index + `neural_sparse` query,
/root/reference/scripts/ingest.py:59-83, search.py:59-70, utils.py:71-136).
Here the corpus lives in TPU HBM and scoring is XLA/Pallas:

  * **sparse engine** (default): a doc-major forward index — per doc, up to
    L_max (token_id, weight) pairs, impact-(weight-)sorted. Scoring scans doc
    blocks under `lax.scan`, gathers the query columns for each block's
    token ids, contracts against the block weights on the VPU/MXU, and
    maintains a running top-k on chip. Memory ∝ nnz, works for multi-million
    doc corpora; exact for any weight distribution.
  * **inverted engine**: impact-ordered token-major postings (the true
    Lucene-analog layout, index/inverted.py) — query cost independent of
    corpus size: gather the query terms' top-C postings, sort-merge partial
    scores by doc id, exact-rescore the candidates against the doc-major
    rows.
  * **dense engine**: exact Q @ Dᵀ on the MXU over the dense [N, V] matrix —
    the correctness oracle and the fastest path for small corpora.

Multi-chip: the corpus shards over the mesh's `data` axis under `shard_map`;
each device computes its local top-k and the shards merge with one
all-gather (SURVEY.md §5 comm design). Query-prune and two-phase search
(reference search.py:27-42, sparse_encoders.py:184-194) are engine knobs.

The engine also keeps the per-token activation-count statistics the FLOPS
metric needs (reference ingest.py:108-117, search.py:82-93).
"""

from __future__ import annotations

import itertools
import json
import logging
import os
from dataclasses import asdict, dataclass, fields
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.mesh import DATA_AXIS

logger = logging.getLogger(__name__)


def _pack_cols(s_dev, i_dev, b_dev=None, e_dev=None):
    """Device half of the packed fetch: one int32 matrix holding scores
    (bitcast), ids, and optionally the missed-score bound (bitcast) and
    escalation stage codes.

    The packing must live in INT space: doc ids bitcast to f32 are
    denormals (any id < ~8M has a zero exponent), and the TPU flushes
    denormals to zero in the fused concat/copy — measured: every id came
    back 0 while a pure int concat round-trips bit-exactly. Scores are
    normal floats, so their int32 bit patterns survive unchanged.

    `e_dev` (fused-escalation engines only, requires `b_dev`): per-query
    escalation stage codes (0 = shallow-certified, 1 = deep-tier re-run,
    2 = fell through to the exact scan), all inside the same dispatch."""
    cols = [
        jax.lax.bitcast_convert_type(s_dev, jnp.int32),
        i_dev.astype(jnp.int32),
    ]
    if b_dev is not None:
        cols.append(
            jax.lax.bitcast_convert_type(
                b_dev.astype(jnp.float32)[:, None], jnp.int32
            )
        )
    if e_dev is not None:
        assert b_dev is not None, "escalation flags require the bound column"
        cols.append(e_dev.astype(jnp.int32)[:, None])
    return jnp.concatenate(cols, axis=1)


def _split_packed(arr, n_q, k, has_b, has_e):
    """Host half of the packed fetch: slice a fetched int32 block back into
    (scores f32, ids int32, bounds f32|None, stage codes int32|None).
    `arr` rows must be C-contiguous (row slices of the fetched matrix are)."""
    s_np, i_np = arr[:n_q, :k].view(np.float32), arr[:n_q, k : 2 * k]
    if not has_b:
        return s_np, i_np, None, None
    b_np = arr[:n_q, 2 * k : 2 * k + 1].view(np.float32)[:, 0]
    if not has_e:
        return s_np, i_np, b_np, None
    return s_np, i_np, b_np, arr[:n_q, 2 * k + 1]


def _fetch_packed(s_dev, i_dev, n_q, b_dev=None, e_dev=None):
    """Fetch (scores f32, ids int32, missed-score bounds f32|None,
    escalation stage codes int32|None) with ONE host transfer: floats
    bitcast to int32 and packed next to the ids (see _pack_cols), split +
    viewed back on the host. Per-array syncs cost ~30 ms each over a
    tunnelled runtime — one packed fetch halves the fixed cost of every
    search call."""
    arr = np.asarray(_pack_cols(s_dev, i_dev, b_dev, e_dev))
    return _split_packed(
        arr, n_q, s_dev.shape[1], b_dev is not None, e_dev is not None
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _load_weights(blob) -> np.ndarray:
    """Weight array from a saved index blob, as float32.

    bfloat16 indexes store their raw bit pattern under "weights_bf16"
    (lossless; fp16 would overflow values > 65504); everything else — and
    every legacy index — stores a float array under "weights"."""
    if "weights_bf16" in blob:
        return blob["weights_bf16"].view(np.dtype(jnp.bfloat16)).astype(np.float32)
    return blob["weights"].astype(np.float32)


@dataclass
class IndexConfig:
    # "sparse": doc-major scan (cost ~ corpus size; exact for any distribution)
    # "inverted": impact-ordered token-major postings + sort-merge + exact
    #             rescore (cost ~ query terms x postings_cap, independent of
    #             corpus size; see index/inverted.py for the recall contract)
    # "dense": exact MXU matmul oracle (small corpora)
    # "auto": sparse below auto_threshold docs, inverted above, with
    #         exact_escalate resolving ON (see below) so auto keeps the
    #         scan's exact-results contract at every size. Threshold from
    #         the round-3 single-dispatch measurements (v5e, job j40):
    #         scan 4.0K q/s @32K docs, 2.5K @65K, 1.3K @128K (linear
    #         decay) vs inverted ~5K q/s at EVERY size — the crossover
    #         sits just below 32K; 65536 keeps the scan where its build
    #         is free and the gap is < 2x. (The pre-single-dispatch
    #         near-tie note — 1052 vs 1112 q/s @128K — measured driver
    #         sync overhead, not engine cost.)
    engine: str = "auto"
    auto_threshold: int = 65536
    l_max: int = 256  # max stored (token, weight) pairs per doc
    block_docs: int = 1024  # docs scored per scan step
    query_batch: int = 16  # queries scored together
    weight_dtype: str = "bfloat16"
    # two-phase search (reference use_two_phase installs OpenSearch's
    # neural_sparse_two_phase_processor, search.py:27-42):
    #   "query" (default, the REFERENCE mechanism): phase 1 scores only the
    #     high-weight query tokens (weight >= two_phase_ratio * max weight);
    #     phase 2 exactly rescores the candidate pool with the FULL query.
    #     On the inverted engine the pruned-out terms' mass rides the
    #     exactness bound, so certificates stay sound (approximate contract,
    #     honest flags; never escalated — 2p is the explicit speed knob).
    #   "doc": the TPU-native doc-side analog — phase 1 scans each doc's
    #     top `two_phase_terms` impact-ordered terms, phase 2 rescores
    #     (cuts the scan's gather volume by ~l_max/two_phase_terms).
    two_phase_mode: str = "query"
    two_phase_ratio: float = 0.4  # OpenSearch processor prune_ratio default
    two_phase_terms: int = 32  # doc mode: phase-1 top-impact terms per doc
    two_phase_expand: int = 8  # phase-1 candidate pool = expand * k
    postings_cap: int = 2048  # inverted: top-C postings kept per token
    query_terms: int = 16  # inverted: query term slots per lookup
    inverted_rescore: bool = True  # inverted: exact rescore of candidates
    # candidate-pool depth for the exact rescore: k1 = expand * k. Deeper
    # pools shrink the certificate's CUT term (the k1-th run sum bounds
    # every dropped candidate): on the realistic 128K bench corpus the
    # certified fraction at cap 2048 is 85.4% at expand 4 vs 98.0% at 16 —
    # the cut, not the postings tail, was the binding term (round-4 sim +
    # CPU engine measurement). Cost: a wider rescore gather (k1 rows of
    # l_max), small next to the postings sort.
    inverted_rescore_expand: int = 16
    # CUT-REFINEMENT pool: when a row fails the certificate at the base
    # rescore pool, the search fn re-rescores the SAME sorted run sums at
    # refine_expand * k candidates inside the same dispatch (no postings
    # re-read, no re-sort — one wider top_k + doc-row gather). At multi-M
    # scale the cut is the binding certificate term (8.8M analysis: depth
    # 8192 tail-certifies 475/512 but the k1=80 cut leaves 106) and the
    # deep re-lookup tier re-reads and re-sorts postings, so this tier can
    # recover certified rows more cheaply when few rows fail (the failing
    # rows are compacted to the front and only a geometric slice pays the
    # wider gather). Applies to both inf-free and full-forward paths;
    # 0 disables (default). Measured at 2M docs on TPU (j59 A/B, 512
    # zipf queries): the COMPACTED refine cuts deep-tier escalations
    # 28 -> 1 (refine256) / 40 -> 7 (refine128) but every batch with any
    # uncertified row pays the slice's k2*l_max doc-row gather, which
    # outweighs the rare deep-tier re-lookups it saves — 1 230 q/s
    # without refine vs 1 157 (refine64) / 1 008 (x16 refine256). Enable
    # only where deep re-lookups are the dominant cost (very deep
    # postings) after measuring on your corpus shape.
    refine_expand: int = 0
    # Tiered ADAPTIVE read depths (inverted engines): store the top
    # `postings_cap + postings_ext_cap` postings per token, but keep the
    # extension rows only for the "deep" tokens whose lists extend past
    # postings_cap (a few hundred zipf-head tokens). At query time the
    # `deep_slots` terms with the largest bound contribution (q_w x tail)
    # also read their extension, so fat-tailed common terms get deep,
    # certifiable reads while everything else stays narrow — the
    # static-shape analog of Lucene WAND's data-dependent visit depth.
    # 0 disables (exact round-3 behavior).
    postings_ext_cap: int = 0
    deep_slots: int = 2
    # Per-doc-block maxima over each token's postings TAIL (block-max WAND,
    # inverted.build_tail_blockmax): tightens the certificate's tail term
    # from "one doc carries every term's whole tail" to "a doc carries at
    # most its own block's per-term maxima" — the Lucene BMW analog the
    # whole-tail bound lacks. Value of the knob = docs per block (4096 is
    # a good default at multi-M scale: [T, n_blocks] stays small and the
    # per-block joint-tail mass is what certifies shallow reads). 0
    # disables. Single-device inverted engines only (inf-free + token
    # paths; the full-forward narrow read can't use it — see
    # make_search_fn tail_blockmax).
    tail_block_docs: int = 0
    # With postings_ext_cap > 0 and exact_escalate, uncertified rows first
    # re-run through a DEEP re-lookup (every query term reads its full
    # base+extension postings, candidate pool widened to
    # deep_escalate_expand * k) instead of the corpus-linear compact scan —
    # a full-depth inverted query reads ~|postings| entries per term where
    # the scan reads the whole corpus, so the common ~1%-escalation regime
    # stays at postings speed (the scan ladder remains the backstop for
    # rows the deep pass still can't certify). False = scan-only ladder.
    deep_escalate: bool = True
    deep_escalate_expand: int = 64
    # full-forward deep escalation widens term selection to this many slots
    # so queries with more than full_query_terms active terms can still
    # zero the bound's unselected-mass term and certify (queries wider than
    # THIS still fall through to the exact-scan ladder)
    full_deep_query_terms: int = 128
    # full-forward (non-inf-free) queries on the inverted engine: candidate
    # generation widens to the top `full_query_terms` terms by WAND impact
    # bound but reads only the top `full_postings_cols` postings per term
    # (sort volume stays ~ query_terms * postings_cap); exact rescore over a
    # `full_rescore_expand * k` pool recovers exact scores. Replaces the old
    # wholesale scan fallback (corpus-linear, 22 q/s @ 8.8M docs) with a
    # corpus-size-independent path (reference Lucene WAND,
    # /root/reference/scripts/search.py:59-70).
    # Wide-query certification guidance (round-5 j78w sweep, trained-rep
    # workload @20K docs with a full-depth extension): the CUT term binds
    # for wide queries — full_rescore_expand=32 + full_postings_cols=512
    # certified 99.2% of rows pre-escalation (vs 90.2% at these defaults)
    # and ran the exact contract within ~3% of the approximate floor
    # (291 vs 297 q/s). The defaults stay conservative because
    # full_postings_cols scales per-term gather volume with every corpus;
    # raise both where the exact contract on full-forward queries matters.
    full_query_terms: int = 64
    full_postings_cols: int = 256
    full_rescore_expand: int = 16
    full_merge_shifts: Optional[int] = None  # None = exact run sums (T-1)
    full_fallback_scan: bool = False  # escape hatch: old exact-scan behavior
    # Escalation for FULL-FORWARD queries, separate from `exact_escalate`
    # below. The exactness bound is loose by construction for wide queries
    # (it sums tails over `full_query_terms` selected terms plus the
    # unselected remainder): on a trained encoder's reps (mean ~30 active
    # terms, decaying weights) ~56% certify in the hot path; flat-idf
    # synthetic 74-term queries ~0% — even when the returned top-k is
    # exact (measured recall 0.994-1.000). Default None resolves to ON
    # exactly when DEEP escalation is available (postings_ext_cap > 0 and
    # deep_escalate): the uncertified minority then re-runs at postings
    # cost instead of the corpus-linear scan — measured 11% end-to-end
    # (598 -> 530 q/s, recall -> 1.000, trained reps @ 20K docs), so every
    # query width carries the provably-exact contract the reference gets
    # from Lucene WAND (search.py:59-70). Without the extension it
    # resolves to OFF (escalation would re-run the scan for nearly every
    # wide query, forfeiting corpus-size-independence); wide queries then
    # return exact-rescored candidates with honest `last_certified` flags.
    # Pin True/False to force either behavior.
    full_exact_escalate: Optional[bool] = None
    # multi-device layout. "docs": corpus stripes per device, per-shard
    # top-k merged with one all-gather — required when the corpus doesn't
    # fit one device. "queries": the index is REPLICATED and the query
    # batch shards over the mesh — zero collectives on the hot path, ideal
    # for the inverted engine (8.8M docs x l_max=128 int16+bf16 + postings
    # ~5.3 GB fits a single v5e chip; postings lookups are gather-bound, so
    # N chips answer N query slices at full speed).
    shard_by: str = "docs"
    # build postings incrementally DURING ingest on a background host
    # thread (chunks of incremental_unit docs through the parallel C++
    # builder + C++ top-C row merge) so finalize() pays only the in-flight
    # tail instead of a blocking corpus-sized build — while the device is
    # saturated by the encoder forward, the host is the idle resource.
    # None = auto: enabled when the default backend is a TPU (on the CPU
    # backend the build would contend with XLA for the same cores).
    # True/False force it. Applies to single-shard postings (incl.
    # shard_by="queries"); doc-sharded postings keep the synchronous
    # per-stripe build.
    incremental_postings: Optional[bool] = None
    incremental_unit: int = 131072
    # Exactness certificate + escalation (inverted engines). Every inverted
    # search also computes, per query, an upper bound on the score of any
    # doc it could have missed (inverted.make_search_fn docstring); a query
    # whose k-th returned score beats the bound is PROVABLY exact — the
    # machine-checkable analog of Lucene WAND's exactness the reference
    # gets from OpenSearch. `SparseIndex.last_certified` exposes the
    # per-query flags. With exact_escalate=True, uncertified queries are
    # transparently re-run through the exact doc-major scan (corpus-linear,
    # but only for the queries that need it — all-zero padding rows are
    # trivially exact and are never escalated): results become exact for
    # every query, at speed for the certified ones, and last_certified
    # reads True everywhere (last_escalated marks the re-run rows).
    # On a single device the certify+escalate pass is FUSED into the
    # search dispatch (a lax.cond exact-scan splice per query batch): only
    # batches containing an uncertified row execute the scan branch, and
    # the host pays zero extra round trips. Sharded corpora / sharded
    # queries escalate through a host-side second pass.
    # None = resolve at finalize(): ON when engine="auto" picks the
    # inverted engine (auto promises the exact contract the scan would
    # have given — certified queries run at postings speed, the rest
    # escalate, so auto is never worse than the scan it replaced), OFF
    # for explicitly chosen engines (the approximate contract + visible
    # flags). Pass True/False to pin either behavior.
    exact_escalate: Optional[bool] = None

    def __post_init__(self):
        valid = ("sparse", "inverted", "dense", "auto")
        if self.engine not in valid:
            raise ValueError(
                f"IndexConfig.engine={self.engine!r} — must be one of {valid}"
            )
        if self.shard_by not in ("docs", "queries"):
            raise ValueError(
                f"IndexConfig.shard_by={self.shard_by!r} — must be 'docs' or 'queries'"
            )
        if self.two_phase_mode not in ("query", "doc"):
            raise ValueError(
                f"IndexConfig.two_phase_mode={self.two_phase_mode!r} — "
                "must be 'query' or 'doc'"
            )


class SparseIndex:
    """Host-facing index: accumulate sparse doc reps, finalize to device
    arrays, search.

    Typical flow (mirrors reference ingest -> search):
        idx = SparseIndex(vocab_size, cfg, mesh)
        idx.add(ids, reps)            # per encoded batch
        idx.finalize()
        ids, scores = idx.search(q_reps, k=10)
    """

    def __init__(
        self,
        vocab_size: int,
        cfg: Optional[IndexConfig] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.vocab_size = vocab_size
        self.cfg = cfg or IndexConfig()
        self.mesh = mesh
        self.doc_ids: List[str] = []
        self._tok_chunks: List[np.ndarray] = []
        self._w_chunks: List[np.ndarray] = []
        self._dense_chunks: List[np.ndarray] = []
        self.count_tensor = np.zeros((vocab_size,), dtype=np.int64)
        self._finalized = False
        self._search_fns: Dict[tuple, object] = {}
        self._q_builder = None
        self._warned_fallback = False
        self._shard_queries = False  # resolved at finalize()
        self._query_batch = self.cfg.query_batch  # ditto
        self._exact_escalate = bool(self.cfg.exact_escalate)  # ditto
        # tiered-depth extension postings (postings_ext_cap > 0): device
        # arrays from inverted.split_postings, else None
        self._ext_docs = None
        self._ext_w = None
        self._deep_map = None
        # block-max tail bound arrays (tail_block_docs > 0): device arrays
        # from inverted.build_tail_blockmax, else None
        self._bm = None
        self._bmap = None
        self._bm_full = None
        self._bmap_full = None
        self._inc = None  # async device postings builder (inverted engines)
        self._inc_fed = 0
        # doc-id object-array cache for vectorized result collection
        # (rebuilt whenever doc_ids grows; see _collect_results)
        self._ids_arr: Optional[np.ndarray] = None
        # per-query exactness flags from the LAST inverted search (None for
        # scan/dense searches, which are exact by construction — EXCEPT with
        # two_phase=True on a scan engine, whose phase-1 candidate pool is
        # approximate with no bound; None there means "no certificate", not
        # "exact". Query-mode two-phase on the inverted engine DOES return
        # sound flags: the pruned terms' mass rides the bound.)
        # After an exact_escalate pass the escalated rows read
        # certified=True (their results came from the exact scan);
        # `last_escalated` marks which.
        self.last_certified: Optional[np.ndarray] = None
        self.last_escalated: Optional[np.ndarray] = None
        # of the escalated rows, which fell past the deep re-lookup tier to
        # the corpus-linear exact scan (fused-escalation engines only)
        self.last_scan_escalated: Optional[np.ndarray] = None

    # ------------------------------------------------------------- ingest
    def add(self, doc_ids: Sequence[str], reps: np.ndarray):
        """Add a batch of sparse doc representations [B, V] (fp32)."""
        assert not self._finalized, "index already finalized"
        assert reps.shape[1] == self.vocab_size
        self.doc_ids.extend(map(str, doc_ids))
        self.count_tensor += (reps > 0).sum(axis=0).astype(np.int64)
        if self.cfg.engine == "dense":
            self._dense_chunks.append(reps.astype(np.float32))
            return
        L = self.cfg.l_max
        reps = np.asarray(reps, dtype=np.float32)
        # keep the top-L_max activations per doc (impact order), vectorized
        # over the batch: one argpartition + one argsort on [B, L]
        if reps.shape[1] > L:
            part = np.argpartition(reps, -L, axis=1)[:, -L:]  # [B, L] unordered
        else:
            part = np.broadcast_to(
                np.arange(reps.shape[1], dtype=np.int64), reps.shape
            )
        vals = np.take_along_axis(reps, part, axis=1)
        order = np.argsort(-vals, axis=1)  # impact-sorted per row
        toks = np.take_along_axis(part, order, axis=1).astype(np.int32)
        ws = np.take_along_axis(vals, order, axis=1)
        inactive = ws <= 0
        toks[inactive] = 0
        ws[inactive] = 0.0
        if toks.shape[1] < L:  # corpus vocab narrower than l_max
            pad = L - toks.shape[1]
            toks = np.pad(toks, ((0, 0), (0, pad)))
            ws = np.pad(ws, ((0, 0), (0, pad)))
        self._tok_chunks.append(toks)
        self._w_chunks.append(ws)
        self._feed_incremental()

    def add_topk(self, doc_ids: Sequence[str], token_idx: np.ndarray, weights: np.ndarray):
        """Add pre-sparsified rows (from BatchEncoder.encode_batch_sparse):
        token_idx/weights [B, k] already impact-sorted, zero-padded."""
        assert not self._finalized, "index already finalized"
        assert self.cfg.engine in ("sparse", "inverted", "auto"), "add_topk needs a sparse-format engine"
        self.doc_ids.extend(map(str, doc_ids))
        active = weights > 0
        self.count_tensor += np.bincount(
            token_idx[active].reshape(-1), minlength=self.vocab_size
        ).astype(np.int64)
        L = self.cfg.l_max
        B, k = token_idx.shape
        toks = np.zeros((B, L), dtype=np.int32)
        ws = np.zeros((B, L), dtype=np.float32)
        m = min(k, L)
        toks[:, :m] = token_idx[:, :m]
        ws[:, :m] = np.where(active, weights, 0.0)[:, :m]
        self._tok_chunks.append(toks)
        self._w_chunks.append(ws)
        self._feed_incremental()

    # ------------------------------------------- incremental postings build
    def _incremental_applicable(self) -> bool:
        inc = self.cfg.incremental_postings
        if inc is None:  # auto: device sorts only pay off on TPU
            inc = jax.default_backend() == "tpu"
        if not inc:
            return False
        if (self.mesh is not None and self.mesh.devices.size > 1
                and self.cfg.shard_by != "queries"):
            return False  # per-stripe postings build stays synchronous
        if self.cfg.engine == "inverted":
            return True
        return (self.cfg.engine == "auto"
                and self.n_docs >= self.cfg.auto_threshold)

    def _slice_rows(self, start: int, count: int):
        """Rows [start, start+count) of the accumulated chunk stream."""
        toks_parts, w_parts = [], []
        lo, hi, pos = start, start + count, 0
        for t, w in zip(self._tok_chunks, self._w_chunks):
            n = t.shape[0]
            if pos + n > lo and pos < hi:
                s, e = max(lo - pos, 0), min(hi - pos, n)
                toks_parts.append(t[s:e])
                w_parts.append(w[s:e])
            pos += n
            if pos >= hi:
                break
        return (
            np.concatenate(toks_parts, axis=0),
            np.concatenate(w_parts, axis=0),
        )

    def _feed_incremental(self, flush: bool = False):
        """Stream accumulated rows to the device postings builder in
        incremental_unit batches (flush=True sends the tail too). Activated
        lazily: explicit "inverted" from the first add; "auto" once the doc
        count crosses the engine-resolution threshold (all accumulated rows
        are fed at activation)."""
        if self._inc is None:
            if not self._incremental_applicable():
                return
            from . import inverted

            self._inc = inverted.IncrementalPostingsBuilder(
                self.vocab_size, self._build_cap,
                unit=max(self.cfg.incremental_unit, 1),
            )
            self._inc_fed = 0
        unit = self._inc.unit
        while True:
            unfed = self.n_docs - self._inc_fed
            if unfed <= 0 or (unfed < unit and not flush):
                return
            take = min(unfed, unit)
            toks, ws = self._slice_rows(self._inc_fed, take)
            self._inc.feed(toks, ws, self._inc_fed)
            self._inc_fed += take

    def _discard_incremental(self):
        if self._inc is not None:
            try:
                self._inc.finish()
            except Exception:  # noqa: BLE001 — builder is being discarded
                pass
            self._inc = None
        self._inc_fed = 0

    @property
    def n_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def _build_cap(self) -> int:
        """Postings depth of the host-side build: base cap + the tiered
        extension depth (split into base + extension at finalize)."""
        return self.cfg.postings_cap + max(int(self.cfg.postings_ext_cap), 0)

    @property
    def avg_doc_activation(self) -> np.ndarray:
        """Average per-token activation count (the `{index}.corpus.bin`
        statistic, reference ingest.py:108-117)."""
        return self.count_tensor.astype(np.float64) / max(self.n_docs, 1)

    # ----------------------------------------------------------- finalize
    def finalize(self):
        if self._finalized:
            return
        # resolve "auto" by corpus size (scan wins below the crossover,
        # postings win above)
        self._engine = self.cfg.engine
        if self._engine == "auto":
            self._engine = (
                "sparse" if self.n_docs < self.cfg.auto_threshold else "inverted"
            )
        # exact_escalate=None resolves here: auto-picked inverted engines
        # escalate (auto keeps the scan's exact contract); everything else
        # defaults off (see IndexConfig)
        self._exact_escalate = (
            self.cfg.engine == "auto" and self._engine == "inverted"
            if self.cfg.exact_escalate is None
            else bool(self.cfg.exact_escalate)
        )
        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        # query sharding replicates the index: every device holds the full
        # corpus and answers its slice of the query batch (cfg.shard_by docs)
        self._shard_queries = n_shards > 1 and self.cfg.shard_by == "queries"
        # resolved batch width lives on the INDEX: writing the rounded value
        # back into cfg would mutate the caller's dataclass (shared across
        # indexes, persisted by asdict) as a side effect of finalize()
        self._query_batch = self.cfg.query_batch
        if self._shard_queries:
            if self._query_batch % n_shards:
                self._query_batch = _round_up(self._query_batch, n_shards)
                logger.info(
                    "shard_by=queries: query_batch rounded up to %d "
                    "(multiple of %d devices)",
                    self._query_batch, n_shards,
                )
            n_shards = 1  # doc layout below is the single-device one
        blk = self.cfg.block_docs
        n = self.n_docs
        n_pad = _round_up(max(n, 1), blk * n_shards)

        if self._engine == "dense":
            D = (
                np.concatenate(self._dense_chunks, axis=0)
                if self._dense_chunks
                else np.zeros((0, self.vocab_size), np.float32)
            )
            pad = np.zeros((n_pad - n, self.vocab_size), np.float32)
            D = np.concatenate([D, pad], axis=0)
            self._docs_dev = jnp.asarray(D, dtype=jnp.dtype(self.cfg.weight_dtype))
            self._tok_dev = None
        else:
            toks = (
                np.concatenate(self._tok_chunks, axis=0)
                if self._tok_chunks
                else np.zeros((0, self.cfg.l_max), np.int32)
            )
            ws = (
                np.concatenate(self._w_chunks, axis=0)
                if self._w_chunks
                else np.zeros((0, self.cfg.l_max), np.float32)
            )
            toks = np.concatenate(
                [toks, np.zeros((n_pad - n, self.cfg.l_max), np.int32)], axis=0
            )
            ws = np.concatenate(
                [ws, np.zeros((n_pad - n, self.cfg.l_max), np.float32)], axis=0
            )
            # token ids < 32768 fit int16 — halves the dominant index array
            tok_dtype = jnp.int16 if self.vocab_size < 2**15 else jnp.int32
            self._tok_dev = jnp.asarray(toks.astype(tok_dtype))
            self._docs_dev = jnp.asarray(ws, dtype=jnp.dtype(self.cfg.weight_dtype))

            if self._engine == "inverted":
                from . import inverted

                ext_cap = max(int(self.cfg.postings_ext_cap), 0)
                wdt = jnp.dtype(self.cfg.weight_dtype)

                def split(pd, pw):
                    """Base device arrays + (ext device arrays or None):
                    tiered adaptive depth splits the full-depth build at
                    postings_cap (inverted.split_postings)."""
                    if not ext_cap:
                        return pd, pw, None
                    bd, bw, ed, ew, dm = inverted.split_postings(
                        pd, pw, self.cfg.postings_cap
                    )
                    return bd, bw, (ed, jnp.asarray(ew, dtype=wdt), dm)

                if n_shards > 1:
                    # per-shard postings over the local doc stripe (LOCAL doc
                    # indices) — each device answers from its own corpus
                    # shard, merged with one all-gather at search time
                    shard_n = n_pad // n_shards
                    pds, pws, exts = [], [], []
                    for s in range(n_shards):
                        sl = slice(s * shard_n, (s + 1) * shard_n)
                        pd, pw = inverted.build_postings(
                            toks[sl], ws[sl], self.vocab_size,
                            self._build_cap,
                        )
                        pd, pw, ext = split(pd, pw)
                        pds.append(pd)
                        pws.append(pw)
                        exts.append(ext)
                    self._post_docs = jnp.asarray(np.stack(pds))
                    self._post_w = jnp.asarray(
                        np.stack(pws), dtype=wdt
                    )
                    if ext_cap:
                        # shards have different deep-set sizes: pad each
                        # shard's extension to the max row count (extra rows
                        # are all-padding; each shard's deep_map still points
                        # its non-deep tokens at its own zero pad row)
                        rows = max(e[0].shape[0] for e in exts)
                        eds = np.full(
                            (n_shards, rows, ext_cap), inverted._PAD_ID,
                            np.int32,
                        )
                        ews = np.zeros((n_shards, rows, ext_cap), np.float32)
                        dms = np.zeros(
                            (n_shards, self.vocab_size), np.int32
                        )
                        for s, (ed, ew, dm) in enumerate(exts):
                            eds[s, : ed.shape[0]] = ed
                            ews[s, : ed.shape[0]] = np.asarray(
                                ew, dtype=np.float32
                            )
                            dms[s] = dm
                        self._ext_docs = jnp.asarray(eds)
                        self._ext_w = jnp.asarray(ews, dtype=wdt)
                        self._deep_map = jnp.asarray(dms)
                else:
                    if self._inc is not None:
                        # overlap path: the builder consumed chunks during
                        # ingest; pay only the tail + final merge here.
                        # (If nothing was ever fed — rows injected without
                        # add(), e.g. load()/bench — the one-shot build
                        # below is strictly faster than chunk+merge.)
                        self._feed_incremental(flush=True)
                        pd, pw = self._inc.finish()
                        self._inc = None
                        self._inc_fed = 0
                    else:
                        pd, pw = inverted.build_postings(
                            toks[:n] if n else toks, ws[:n] if n else ws,
                            self.vocab_size, self._build_cap,
                        )
                    pd, pw, ext = split(pd, pw)
                    self._post_docs = jnp.asarray(pd)
                    self._post_w = jnp.asarray(pw, dtype=wdt)
                    if ext is not None:
                        ed, ew, dm = ext
                        self._ext_docs = jnp.asarray(ed)
                        self._ext_w = ew
                        self._deep_map = jnp.asarray(dm)

                if (self.cfg.tail_block_docs > 0 and n_shards == 1
                        and not self._shard_queries):
                    # block-max tail bounds (single-device engines; see
                    # IndexConfig.tail_block_docs), one per entry mode's
                    # shallowest read: base postings_cap for the inf-free /
                    # token paths, full_postings_cols for the full-forward
                    # narrow read (both from ONE impact sort). f32 on
                    # purpose: a nearest-rounding bf16 cast could round a
                    # block max DOWN and unsoundly tighten the certificate.
                    (bm, bmap), (bmf, bmapf) = (
                        inverted.build_tail_blockmax_multi(
                            toks[:n] if n else toks, ws[:n] if n else ws,
                            self.vocab_size,
                            (self.cfg.postings_cap,
                             min(self.cfg.full_postings_cols,
                                 self.cfg.postings_cap)),
                            n_pad, self.cfg.tail_block_docs,
                        )
                    )
                    self._bm = jnp.asarray(bm)
                    self._bmap = jnp.asarray(bmap)
                    self._bm_full = jnp.asarray(bmf)
                    self._bmap_full = jnp.asarray(bmapf)

        if self.mesh is not None:
            sh = NamedSharding(
                self.mesh, P() if self._shard_queries else P(DATA_AXIS)
            )
            if (self._engine != "inverted" or self.mesh.devices.size > 1
                    or self._shard_queries):
                self._docs_dev = jax.device_put(self._docs_dev, sh)
                if self._tok_dev is not None:
                    self._tok_dev = jax.device_put(self._tok_dev, sh)
            if self._engine == "inverted" and self.mesh.devices.size > 1:
                self._post_docs = jax.device_put(self._post_docs, sh)
                self._post_w = jax.device_put(self._post_w, sh)
                if self._ext_docs is not None:
                    self._ext_docs = jax.device_put(self._ext_docs, sh)
                    self._ext_w = jax.device_put(self._ext_w, sh)
                    self._deep_map = jax.device_put(self._deep_map, sh)

        self._n_pad = n_pad
        self._tok_chunks, self._w_chunks, self._dense_chunks = [], [], []
        self._finalized = True
        logger.info(
            "index finalized: %d docs (padded %d) engine=%s shards=%d",
            n, n_pad, self._engine, n_shards,
        )

    def reopen(self):
        """Back to ingest mode after finalize(): recover the host-side rows
        from the device arrays so more docs can be added, then finalize()
        again. This is the add -> _refresh -> search -> add-more loop the
        OpenSearch serving surface speaks (reference ingest.py:88-106 bulk +
        implicit refresh). Weights round-trip through the configured device
        dtype (bf16 by default), which is the same precision search uses."""
        if not self._finalized:
            return
        # Keep the merged postings as the next builder's seed: the serving
        # _bulk -> refresh loop then merges only the delta rows instead of
        # refeeding the whole corpus (NRT refresh cost ∝ new docs). Only the
        # single-[V,C] layout seeds (per-shard stacked postings rebuild).
        seed = None
        if (self._engine == "inverted" and self._post_docs is not None
                and self._post_docs.ndim == 2
                and not self.cfg.postings_ext_cap
                and self._incremental_applicable()):
            seed = (
                np.asarray(self._post_docs, dtype=np.int32),
                np.asarray(jnp.asarray(self._post_w, jnp.float32)),
            )
        self._discard_incremental()
        n = self.n_docs
        if self._tok_dev is not None:
            if n:
                self._tok_chunks = [np.asarray(self._tok_dev)[:n].astype(np.int32)]
                self._w_chunks = [
                    np.asarray(jnp.asarray(self._docs_dev[:n], jnp.float32))
                ]
        else:  # dense engine: _docs_dev is the padded [n_pad, V] matrix
            if n:
                self._dense_chunks = [
                    np.asarray(jnp.asarray(self._docs_dev[:n], jnp.float32))
                ]
        self._docs_dev = None
        self._tok_dev = None
        self._post_docs = None
        self._post_w = None
        self._ext_docs = None
        self._ext_w = None
        self._deep_map = None
        self._bm = None
        self._bmap = None
        self._bm_full = None
        self._bmap_full = None
        self._search_fns = {}
        self._q_builder = None
        self._finalized = False
        if seed is not None:
            from . import inverted

            self._inc = inverted.IncrementalPostingsBuilder(
                self.vocab_size, self.cfg.postings_cap,
                unit=max(self.cfg.incremental_unit, 1), seed=seed,
            )
            self._inc_fed = n

    def delete(self):
        """Release all index state, device and host (the analog of OpenSearch
        `indices.delete`, reference search.py:95-97). The object returns to
        the empty-ingest state and may be reused."""
        self._docs_dev = None
        self._tok_dev = None
        self._post_docs = None
        self._post_w = None
        self._ext_docs = None
        self._ext_w = None
        self._deep_map = None
        self._bm = None
        self._bmap = None
        self._bm_full = None
        self._bmap_full = None
        self._search_fns = {}
        self._q_builder = None
        self._finalized = False
        self.doc_ids = []
        self._tok_chunks, self._w_chunks, self._dense_chunks = [], [], []
        self.count_tensor = np.zeros((self.vocab_size,), dtype=np.int64)
        self._discard_incremental()

    # ------------------------------------------------------------- search
    def _build_search_fn(self, k: int, two_phase: bool = False,
                         engine: Optional[str] = None):
        cfg = self.cfg
        blk = cfg.block_docs
        engine = engine or self._engine

        def make_scan_topk(scan_engine: str, kk: int, tp):
            """Build the block-scan top-k body (the "sparse"/"dense" engine
            core). Parameterized so the inverted branch below can embed an
            EXACT scan (tp=None) for fused escalation alongside the main
            path's (engine, k, two_phase) instantiation.

            `tp`: None (exact), "doc" or "query" — the two two-phase
            mechanisms (IndexConfig.two_phase_mode):
              * "doc": phase 1 scans only each doc's top-impact l1 terms
                (rows are impact-sorted at ingest) — cuts the dominant
                gather volume by ~l_max/l1;
              * "query" (the reference's OpenSearch processor, search.py:
                27-42): phase 1 scores only query tokens with weight >=
                two_phase_ratio * max weight.
            Both rescore the k1 candidate pool exactly with the full query
            and all doc terms."""
            l1 = min(cfg.two_phase_terms, cfg.l_max) if tp == "doc" else None
            # candidate-pool size: never below kk (blk can be < kk — the
            # final top_k(s2, kk) needs k1 >= kk columns), capped at blk+kk
            # so the per-block top_k(cat_s[k1+blk], k1) selection stays
            # meaningful
            k1 = max(min(cfg.two_phase_expand * kk, blk), kk) if tp else kk

            def local_topk(q, docs, toks, base_offset):
                """Top-k over one shard's docs. q [Bq, V] f32; docs
                [N_loc, ...]; returns (scores [Bq,kk], idx [Bq,kk]) global
                ids."""
                Bq = q.shape[0]
                n_loc = docs.shape[0]
                nb = n_loc // blk
                if tp == "query":
                    # phase-1 query: high-weight tokens only; `q` (full)
                    # still feeds the phase-2 rescore below
                    thresh = jnp.max(q, axis=1, keepdims=True) * cfg.two_phase_ratio
                    q1 = jnp.where(q >= thresh, q, 0.0)
                else:
                    q1 = q
                qc = q1.astype(docs.dtype)

                if scan_engine == "dense":
                    blocks = docs.reshape(nb, blk, docs.shape[-1])

                    def body(carry, block):
                        best_s, best_i, bidx = carry
                        s = jnp.dot(
                            qc, block.T, preferred_element_type=jnp.float32
                        )  # [Bq, blk]
                        gidx = base_offset + bidx * blk + jnp.arange(
                            blk, dtype=jnp.int32
                        )
                        cat_s = jnp.concatenate([best_s, s], axis=1)
                        cat_i = jnp.concatenate(
                            [best_i, jnp.broadcast_to(gidx, (Bq, blk))],
                            axis=1,
                        )
                        ns, sel = jax.lax.top_k(cat_s, kk)
                        ni = jnp.take_along_axis(cat_i, sel, axis=1)
                        return (ns, ni, bidx + 1), None

                    init = (
                        jnp.full((Bq, kk), -jnp.inf, jnp.float32),
                        jnp.full((Bq, kk), -1, jnp.int32),
                        jnp.asarray(0, jnp.int32),
                    )
                    (best_s, best_i, _), _ = jax.lax.scan(body, init, blocks)
                    return best_s, best_i

                L = toks.shape[-1]
                Ls = l1 if tp == "doc" else L  # phase-1 terms per doc
                tok_blocks = toks[:, :Ls].reshape(nb, blk, Ls)
                w_blocks = docs[:, :Ls].reshape(nb, blk, Ls)

                def body(carry, block):
                    best_s, best_i, bidx = carry
                    tok, w = block
                    # gather the phase-1 query columns for this block's
                    # token ids: [Bq, blk*Ls] <- q1[:, tok]
                    g = jnp.take(
                        q1, tok.reshape(-1).astype(jnp.int32), axis=1
                    ).reshape(Bq, blk, Ls)
                    s = jnp.einsum(
                        "qjl,jl->qj", g, w.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                    )
                    gidx = base_offset + bidx * blk + jnp.arange(
                        blk, dtype=jnp.int32
                    )
                    cat_s = jnp.concatenate([best_s, s], axis=1)
                    cat_i = jnp.concatenate(
                        [best_i, jnp.broadcast_to(gidx, (Bq, blk))], axis=1
                    )
                    ns, sel = jax.lax.top_k(cat_s, k1)
                    ni = jnp.take_along_axis(cat_i, sel, axis=1)
                    return (ns, ni, bidx + 1), None

                init = (
                    jnp.full((Bq, k1), -jnp.inf, jnp.float32),
                    jnp.full((Bq, k1), -1, jnp.int32),
                    jnp.asarray(0, jnp.int32),
                )
                (best_s, best_i, _), _ = jax.lax.scan(
                    body, init, (tok_blocks, w_blocks)
                )

                if not tp:
                    return best_s, best_i

                # phase 2: exact rescore of the candidate pool with all L
                # terms
                local_idx = jnp.clip(best_i - base_offset, 0, n_loc - 1)
                cand_tok = jnp.take(toks, local_idx, axis=0).astype(
                    jnp.int32
                )  # [Bq, k1, L]
                cand_w = jnp.take(docs, local_idx, axis=0).astype(jnp.float32)
                g = jnp.take_along_axis(
                    q, cand_tok.reshape(Bq, -1), axis=1
                ).reshape(Bq, k1, L)
                s2 = jnp.sum(g * cand_w, axis=-1)
                s2 = jnp.where(best_i >= 0, s2, -jnp.inf)
                ns, sel = jax.lax.top_k(s2, kk)
                ni = jnp.take_along_axis(best_i, sel, axis=1)
                return ns, ni

            return local_topk

        if engine in ("inverted", "inverted_full", "inverted_tokens"):
            from . import inverted

            # "inverted_tokens": the serving-path fast entry — queries are
            # (q_tok, q_w) slot pairs, never a dense [B, V] matrix (no
            # scatter, no [B, V] top_k / matvec, match-path rescore; see
            # inverted.make_search_fn token_entry). Single-device only;
            # search_tokens routes here when the slot width fits
            # cfg.query_terms.
            is_tok = engine == "inverted_tokens"
            if engine == "inverted_full":
                # full-forward mode: wide-but-shallow lookup + exact rescore
                # (see IndexConfig.full_* and inverted.make_search_fn docs)
                inv_kw = dict(
                    query_terms=cfg.full_query_terms, k=k,
                    rescore=True,
                    postings_cols=cfg.full_postings_cols,
                    merge_shifts=cfg.full_merge_shifts,
                    rescore_expand=cfg.full_rescore_expand,
                    refine_expand=cfg.refine_expand,
                    select_by_impact=True,
                    with_bound=True,
                )
            else:
                inv_kw = dict(
                    query_terms=cfg.query_terms, k=k,
                    rescore=cfg.inverted_rescore,
                    rescore_expand=cfg.inverted_rescore_expand,
                    refine_expand=cfg.refine_expand,
                    with_bound=True,
                    token_entry=is_tok,
                )
            ext_args = None
            if self._ext_docs is not None:
                # tiered adaptive depth: the search fn reads the extension
                # rows for the deep_slots largest bound contributors
                inv_kw["deep_slots"] = cfg.deep_slots
                ext_args = (self._ext_docs, self._ext_w, self._deep_map)
            if two_phase and cfg.two_phase_mode == "query":
                # reference two-phase (search.py:27-42): term lookup only
                # considers tokens >= ratio * max weight; the rescore and
                # the exactness bound still see the full query (the
                # pruned-out terms' mass rides the bound's unselected term,
                # so certificates remain sound). Requires rescore. Token
                # entry never two-phases (search_tokens routes 2p calls
                # through the dense path — with static slot shapes there is
                # no phase-1 work to save).
                if inv_kw["rescore"] and not is_tok:
                    inv_kw["phase1_ratio"] = cfg.two_phase_ratio
            bmx_args = None
            if self._bm is not None:
                # block-max tail bound (IndexConfig.tail_block_docs): the
                # full-forward narrow read uses the bm built at its own
                # read depth (full_postings_cols); single-device only, so
                # the sharded branches below never see it
                inv_kw["tail_blockmax"] = True
                bmx_args = (
                    (self._bm_full, self._bmap_full)
                    if engine == "inverted_full"
                    else (self._bm, self._bmap)
                )
            if (engine == "inverted" and inv_kw["rescore"]
                    and "phase1_ratio" not in inv_kw):
                # dense-entry inf-free path: the engine's width routing
                # (search()'s full_forward check) guarantees every active
                # query term wins a lookup slot, which is exactly the
                # match-rescore precondition — the rescore then runs T
                # compares instead of the B*k1*l_max-index dense gather
                # (57% of the round-4 hot path). Callers that pass
                # full_forward=False assert that width contract (search()
                # docstring).
                inv_kw["match_rescore"] = True

            post_docs, post_w = self._post_docs, self._post_w
            n_shards = self.mesh.devices.size if self.mesh is not None else 1
            # qb-shape helpers: the token entry's query batch is the pair
            # (q_tok, q_w) instead of a dense [Bq, V] matrix. `_densify`
            # scatters the slots to dense — only the exact-scan escalation
            # branch needs it, and only for its compacted row slice.
            V = self.vocab_size
            if is_tok:
                def _nrows(qb):
                    return qb[0].shape[0]

                def _activity(qb):
                    return jnp.sum(qb[1] > 0, axis=1)

                def _take_rows(qb, idx):
                    return tuple(jnp.take(a, idx, axis=0) for a in qb)

                def _densify(qb):
                    tok, w = qb
                    bq = tok.shape[0]
                    bi = jnp.broadcast_to(
                        jnp.arange(bq, dtype=jnp.int32)[:, None], tok.shape
                    )
                    return jnp.zeros((bq, V), jnp.float32).at[bi, tok].add(
                        jnp.where(w > 0, w, 0.0), mode="drop"
                    )
            else:
                def _nrows(qb):
                    return qb.shape[0]

                def _activity(qb):
                    return jnp.sum(qb > 0, axis=1)

                def _take_rows(qb, idx):
                    return jnp.take(qb, idx, axis=0)

                def _densify(qb):
                    return qb
            if self._shard_queries:
                assert not is_tok, "token entry is single-device only"
                # replicated index, query batch sharded over the mesh: each
                # device answers its query slice against the FULL corpus —
                # no collective on the hot path at all
                body = inverted.make_search_fn(
                    post_docs, post_w, None, None, jit=False, **inv_kw
                )
                # replicated index + extension; only the query batch shards
                in_specs = (P(DATA_AXIS), P(), P(), P(), P()) + (
                    (P(),) if ext_args is not None else ()
                )
                smfn = jax.jit(
                    shard_map(
                        body, mesh=self.mesh,
                        in_specs=in_specs,
                        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                        check_vma=False,
                    )
                )

                def inverted_search_qsharded(q, docs, toks):
                    args = (q, post_docs, post_w, toks, docs)
                    if ext_args is not None:
                        args += (ext_args,)
                    return smfn(*args)

                return inverted_search_qsharded, None
            if n_shards == 1:
                # multi-batch driver: ONE dispatch + ONE fetch for a whole
                # query set (lax.map over [nb, Bq, V]); per-dispatch/sync
                # latency otherwise multiplies by the batch count — on a
                # tunnelled runtime (~30 ms each way) that dominated the
                # measured QPS (1.2K q/s end-to-end vs 4.8K q/s device-only
                # at 2M docs). Postings enter as runtime args, NOT closure
                # captures: a captured array would be baked into the
                # compiled payload as a constant.
                raw = inverted.make_search_fn(
                    post_docs, post_w, self._tok_dev, self._docs_dev,
                    jit=False, **inv_kw
                )

                if self._escalate_for(engine, two_phase):
                    # FUSED exact-escalation: certify and (conditionally)
                    # re-run the exact doc-major scan for uncertified rows
                    # inside the SAME dispatch, so the host never pays the
                    # extra active-count sync + scan dispatch/fetch round
                    # trips of a second pass (~170 ms over the tunnel even
                    # when one query in 512 escalates — measured 2 531 q/s
                    # host-escalated vs 5 100 q/s uncertified at 128K docs).
                    # Only batches containing an uncertified row execute the
                    # lax.cond scan branch; certified batches pay ~nothing,
                    # and when at most E rows escalate the scan runs on a
                    # COMPACT [E, V] slice instead of the whole [Bq, V]
                    # batch (the scan's einsum cost is proportional to its
                    # query rows; at 128K docs the whole-batch splice left
                    # the common 1-of-512 regime at 3.7K q/s vs the bare
                    # inverted engine's 5.1K — j48). The margin rule mirrors
                    # engine.search's host certificate check (see
                    # inverted.make_search_fn docs).
                    exact_topk = make_scan_topk("sparse", k, None)
                    zero = jnp.asarray(0, jnp.int32)

                    deep_raw = None
                    if ext_args is not None and cfg.deep_escalate:
                        # deep re-lookup escalation tier: EVERY query term
                        # reads its full base+extension postings and the
                        # candidate pool widens, so rows the shallow pass
                        # couldn't certify usually certify here at postings
                        # cost (~|postings| reads per term) instead of the
                        # corpus-linear compact scan
                        deep_kw = dict(inv_kw)
                        if engine == "inverted_full":
                            # wide queries: widen term selection so the
                            # bound's unselected-mass term can reach zero
                            # (full-depth reads already zero the tails)
                            deep_kw["query_terms"] = max(
                                cfg.full_deep_query_terms,
                                inv_kw["query_terms"],
                            )
                        deep_kw["deep_slots"] = deep_kw["query_terms"]
                        deep_kw["rescore_expand"] = max(
                            cfg.deep_escalate_expand,
                            deep_kw.get("rescore_expand", 4),
                        )
                        deep_raw = inverted.make_search_fn(
                            post_docs, post_w, self._tok_dev, self._docs_dev,
                            jit=False, **deep_kw
                        )

                    def body_fn(qb, pd, pw, toks, docs, ext=None,
                                bmx=None):
                        s, i, b = raw(qb, pd, pw, toks, docs, ext, bmx)
                        Bq = _nrows(qb)
                        kth = s[:, -1]
                        cert = inverted.certified_mask(kth, b)
                        # all-zero padding rows (serve's pow2 micro-batcher,
                        # eval's chunk driver) never certify (kth=-inf) but
                        # are trivially exact: don't scan for phantoms
                        cert = cert | (_activity(qb) == 0)
                        esc = ~cert
                        n_esc = jnp.sum(esc)
                        esc0 = esc  # reported flags: rows that re-ran at all

                        if deep_raw is not None:
                            def deep_pass(E):
                                # escalated rows first (argsort of ~esc),
                                # deep re-lookup on that compact slice, then
                                # splice back the rows it CERTIFIED — the
                                # certificate rule makes those provably
                                # exact; the rest stay escalated for the
                                # scan ladder below
                                def f():
                                    idx = jnp.argsort(~esc)[:E]
                                    ds, di, db = deep_raw(
                                        _take_rows(qb, idx), pd, pw,
                                        toks, docs, ext, bmx,
                                    )
                                    dcert = inverted.certified_mask(
                                        ds[:, -1], db
                                    )
                                    m = jnp.take(esc, idx)
                                    fix = (m & dcert)[:, None]
                                    s2 = s.at[idx].set(jnp.where(
                                        fix, ds, jnp.take(s, idx, axis=0)
                                    ))
                                    i2 = i.at[idx].set(jnp.where(
                                        fix, di, jnp.take(i, idx, axis=0)
                                    ))
                                    esc2 = esc.at[idx].set(m & ~dcert)
                                    return s2, i2, esc2

                                return f

                            # geometric tier ladder (x4): high-escalation
                            # regimes (fat-tailed corpora at the multi-M-doc
                            # scale certify <50% in the shallow pass) keep a
                            # proportional deep budget instead of cliffing
                            # to the corpus-linear scan past 8 rows; the
                            # deep pass costs ~|postings| per term, so even
                            # a full-width tier stays corpus-independent
                            d_tiers = []
                            t = 8
                            while t < Bq:
                                d_tiers.append(t)
                                t *= 4
                            d_tiers.append(Bq)
                            branch = deep_pass(d_tiers[-1])
                            for E in reversed(d_tiers[:-1]):
                                def branch(E=E, wider=branch):
                                    return jax.lax.cond(
                                        n_esc <= E, deep_pass(E), wider
                                    )

                            s, i, esc = jax.lax.cond(
                                n_esc > 0, branch, lambda: (s, i, esc)
                            )
                            n_esc = jnp.sum(esc)

                        def full_scan():
                            es, ei = exact_topk(_densify(qb), docs, toks, zero)
                            return (
                                jnp.where(esc[:, None], es, s),
                                jnp.where(esc[:, None], ei, i),
                            )

                        def small_scan(E):
                            # escalated rows first (argsort of ~esc: False
                            # sorts ahead), scan only those E rows, scatter
                            # the exact results back over the escalated ones
                            def f():
                                idx = jnp.argsort(~esc)[:E]
                                es, ei = exact_topk(
                                    _densify(_take_rows(qb, idx)), docs,
                                    toks, zero,
                                )
                                m = jnp.take(esc, idx)[:, None]
                                s2 = s.at[idx].set(
                                    jnp.where(m, es, jnp.take(s, idx, axis=0))
                                )
                                i2 = i.at[idx].set(
                                    jnp.where(m, ei, jnp.take(i, idx, axis=0))
                                )
                                return s2, i2

                            return f

                        # tiered compact budgets: the scan's einsum cost is
                        # proportional to its query rows, so pay for the
                        # smallest tier that covers this batch's escalation
                        # count (realistic zipf corpora escalate ~10-15% of
                        # inf-free queries — 6-12 rows of a 64-batch — and a
                        # single 8-row budget sent nearly every batch to the
                        # full-width scan: measured 1 122 q/s vs 5 161 bare
                        # inverted at 128K docs). Each tier is one more
                        # lax.cond branch (compiled once per (engine, k)).
                        # geometric ladder 8, 16, ..., < Bq: large serving
                        # batches keep proportional compact budgets instead
                        # of cliffing to the full-width scan past a
                        # hardcoded top tier (each tier is one lax.cond
                        # branch, compiled once per (engine, k))
                        tiers = []
                        t = 8
                        while t < Bq:
                            tiers.append(t)
                            t *= 2
                        branch = full_scan
                        for E in reversed(tiers):
                            def branch(E=E, wider=branch):
                                return jax.lax.cond(
                                    n_esc <= E, small_scan(E), wider
                                )

                        s3, i3 = jax.lax.cond(
                            n_esc > 0, branch, lambda: (s, i)
                        )
                        # stage code per row: 0 = certified by the shallow
                        # pass, 1 = re-ran and certified by the deep
                        # re-lookup tier, 2 = fell through to the exact scan
                        # (`esc` at this point marks the scan rows)
                        stage = esc0.astype(jnp.int32) + esc.astype(jnp.int32)
                        return s3, i3, b, stage
                else:
                    body_fn = raw

                fn = jax.jit(body_fn)

                def inverted_search(q, docs, toks):
                    return fn(q, post_docs, post_w, toks, docs, ext_args,
                              bmx_args)

                @jax.jit
                def minv(qs, pd, pw, toks, docs, ext=None, bmx=None):
                    return jax.lax.map(
                        lambda qb: body_fn(qb, pd, pw, toks, docs, ext, bmx),
                        qs,
                    )

                def inverted_multi(qs, docs, toks):
                    return minv(qs, post_docs, post_w, toks, docs, ext_args,
                                bmx_args)

                return inverted_search, inverted_multi

            # sharded: each device searches its local corpus stripe with its
            # local postings (LOCAL doc indices), then one all-gather merges
            assert not is_tok, "token entry is single-device only"
            shard_n = self._n_pad // n_shards
            body = inverted.make_search_fn(
                post_docs[0], post_w[0], None, None, jit=False, **inv_kw
            )

            def sharded_inverted(q, pd, pw, toks, docs, ext=None):
                local_ext = None
                if ext is not None:
                    # stacked per-shard extension arrays arrive as [1, ...]
                    local_ext = tuple(e[0] for e in ext)
                s, i, b = body(q, pd[0], pw[0], toks, docs, local_ext)
                me = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
                gi = jnp.where(i >= 0, i + me * shard_n, -1)
                all_s = jax.lax.all_gather(s, DATA_AXIS)
                all_i = jax.lax.all_gather(gi, DATA_AXIS)
                # a missed doc lives in exactly one stripe, so the global
                # missed-score bound is the max of the per-shard bounds
                all_b = jax.lax.all_gather(b, DATA_AXIS)
                Bq = q.shape[0]
                cat_s = jnp.moveaxis(all_s, 0, 1).reshape(Bq, n_shards * k)
                cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Bq, n_shards * k)
                ns, sel = jax.lax.top_k(cat_s, k)
                return (
                    ns,
                    jnp.take_along_axis(cat_i, sel, axis=1),
                    jnp.max(all_b, axis=0),
                )

            in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                        P(DATA_AXIS)) + (
                (P(DATA_AXIS),) if ext_args is not None else ()
            )
            smfn = jax.jit(
                shard_map(
                    sharded_inverted, mesh=self.mesh,
                    in_specs=in_specs,
                    out_specs=(P(), P(), P()), check_vma=False,
                )
            )

            def inverted_search_sharded(q, docs, toks):
                args = (q, post_docs, post_w, toks, docs)
                if ext_args is not None:
                    args += (ext_args,)
                return smfn(*args)

            return inverted_search_sharded, None

        if engine == "dense" and two_phase:
            two_phase = False  # dense engine is already one exact matmul
        local_topk = make_scan_topk(
            engine, k, cfg.two_phase_mode if two_phase else None
        )

        if self._shard_queries:
            # replicated corpus, query batch sharded (see inverted branch)
            def qsharded(q, docs, toks):
                return local_topk(q, docs, toks, jnp.asarray(0, jnp.int32))

            in_specs = (P(DATA_AXIS), P(), P())
            return jax.jit(
                shard_map(
                    qsharded, mesh=self.mesh, in_specs=in_specs,
                    out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False,
                )
            ), None

        if self.mesh is None or self.mesh.devices.size == 1:

            @jax.jit
            def search_fn(q, docs, toks):
                return local_topk(q, docs, toks, jnp.asarray(0, jnp.int32))

            @jax.jit
            def scan_multi(qs, docs, toks):
                return jax.lax.map(
                    lambda qb: local_topk(
                        qb, docs, toks, jnp.asarray(0, jnp.int32)
                    ),
                    qs,
                )

            return search_fn, scan_multi

        mesh = self.mesh
        n_shards = mesh.devices.size
        shard_n = self._n_pad // n_shards

        def sharded(q, docs, toks):
            me = jax.lax.axis_index(DATA_AXIS)
            s, i = local_topk(q, docs, toks, me.astype(jnp.int32) * shard_n)
            all_s = jax.lax.all_gather(s, DATA_AXIS)  # [n_shards, Bq, k]
            all_i = jax.lax.all_gather(i, DATA_AXIS)
            Bq = q.shape[0]
            cat_s = jnp.moveaxis(all_s, 0, 1).reshape(Bq, n_shards * k)
            cat_i = jnp.moveaxis(all_i, 0, 1).reshape(Bq, n_shards * k)
            ns, sel = jax.lax.top_k(cat_s, k)
            ni = jnp.take_along_axis(cat_i, sel, axis=1)
            return ns, ni

        in_specs = (P(), P(DATA_AXIS), P(DATA_AXIS) if self._tok_dev is not None else P())
        fn = shard_map(
            sharded, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn), None

    def _escalate_for(self, engine: Optional[str],
                      two_phase: bool = False) -> bool:
        """Resolved exact-escalation flag for a search-path engine string:
        full-forward lookups follow `cfg.full_exact_escalate` (None = ON
        exactly when deep escalation can absorb the wide-query bound's
        looseness at postings cost, see IndexConfig), all other inverted
        paths follow the finalize()-resolved flag. Query-side two-phase
        never escalates: it is the explicit approximate speed knob
        (reference parity — OpenSearch's processor trades exactness for
        speed); certificates are still computed and exposed."""
        if two_phase and self.cfg.two_phase_mode == "query":
            return False
        if engine == "inverted_full":
            if self.cfg.full_exact_escalate is None:
                return bool(
                    self.cfg.postings_ext_cap and self.cfg.deep_escalate
                )
            return bool(self.cfg.full_exact_escalate)
        return self._exact_escalate

    def _get_search_fn(self, k: int, two_phase: bool = False,
                       engine: Optional[str] = None):
        """Returns (per-batch fn, multi-batch fn-or-None); the multi form
        takes q of shape [nb, Bq, V] and answers a whole query set in one
        dispatch (single-device engines only)."""
        eng = engine or self._engine
        key = (k, two_phase, eng, self._escalate_for(eng, two_phase))
        fns = self._search_fns.get(key)
        if fns is None:
            fns = self._search_fns[key] = self._build_search_fn(
                k, two_phase, engine
            )
        return fns

    def _run_queries(self, q, k_eff: int, two_phase: bool,
                     engine: Optional[str]):
        """Dispatch a device query batch through the chosen engine and fetch
        (scores, ids, bounds-or-None, escalated-or-None) as numpy. `q` is a
        [n_q, V] dense matrix, or for engine="inverted_tokens" the slot pair
        (q_tok [n_q, T], q_w [n_q, T]).
        Inverted engines return per-query missed-score bounds; scan/dense
        return None. Fused-escalation engines (single-device inverted with
        exact_escalate) additionally return the per-query escalated flags —
        their scores/ids are already exact everywhere."""
        parts, n_q = self._dispatch_queries(q, k_eff, two_phase, engine)
        return _fetch_packed(
            parts[0], parts[1], n_q,
            parts[2] if len(parts) > 2 else None,
            parts[3] if len(parts) > 3 else None,
        )

    def _dispatch_queries(self, q, k_eff: int, two_phase: bool,
                          engine: Optional[str]):
        """Dispatch-only half of _run_queries: returns (device result
        tuple, n_q) WITHOUT the host fetch, so callers can pipeline many
        dispatches before paying the ~30 ms tunnel sync each (the async
        serving/bench pattern — see search_tokens_async)."""
        Bq = self._query_batch
        leaves = q if isinstance(q, tuple) else (q,)
        n_q = leaves[0].shape[0]

        def _pad_rows(x, pad):
            return jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
                ),
                x,
            )

        fn, multi_fn = self._get_search_fn(k_eff, two_phase, engine)
        toks_arg = (
            self._tok_dev if self._tok_dev is not None
            else jnp.zeros((), jnp.int32)
        )

        if multi_fn is not None and n_q > Bq:
            # whole query set in ONE dispatch (lax.map over batches inside
            # one jit) and ONE host fetch — per-call dispatch/sync latency
            # (~30 ms each over a tunnelled runtime) otherwise multiplies
            # by 2*n_batches and dominates end-to-end QPS
            nb = -(-n_q // Bq)
            pad_rows = nb * Bq - n_q
            if pad_rows:
                q = _pad_rows(q, pad_rows)
            qs = jax.tree.map(
                lambda a: a.reshape((nb, Bq) + a.shape[1:]), q
            )
            out = multi_fn(qs, self._docs_dev, toks_arg)
            parts = (
                out[0].reshape(nb * Bq, -1),
                out[1].reshape(nb * Bq, -1),
            )
            if len(out) > 2:
                parts += (out[2].reshape(nb * Bq),)
            if len(out) > 3:
                parts += (out[3].reshape(nb * Bq),)
            return parts, n_q

        # dispatch ALL batches before blocking (async dispatch pipelines
        # the per-call latency), then stack on device and fetch ONCE
        pending = []
        for start in range(0, n_q, Bq):
            qb = jax.tree.map(lambda a: a[start : start + Bq], q)
            pad = Bq - (qb[0] if isinstance(qb, tuple) else qb).shape[0]
            if pad:
                qb = _pad_rows(qb, pad)
            pending.append(fn(qb, self._docs_dev, toks_arg))
        if len(pending) == 1:
            parts = pending[0]
        else:
            parts = tuple(
                jnp.concatenate([p[j] for p in pending])
                for j in range(len(pending[0]))
            )
        # per-batch pad rows only ever occur in the LAST batch (starts
        # step by Bq), so the first n_q stacked rows are the queries
        return parts, n_q

    def search(
        self,
        q_reps: np.ndarray,  # [B, V] fp32 sparse query reps
        k: int = 10,
        query_prune: float = 0.0,
        exclude_self: Optional[Sequence[str]] = None,
        two_phase: bool = False,
        full_forward: Optional[bool] = None,
    ) -> List[Dict[str, float]]:
        """Top-k search; returns per-query {doc_id: score} maps.

        `query_prune`: drop query tokens with weight <= prune * max weight
        (reference sparse_embedding_to_query, sparse_encoders.py:184-194).
        `exclude_self`: per-query id whose hit is dropped (search.py:78-80).
        `two_phase`: approximate phase 1 + exact rescore (reference
        use_two_phase, search.py:27-42). cfg.two_phase_mode picks the
        mechanism: "query" (the reference's processor: phase 1 = tokens
        with weight >= two_phase_ratio * max) or "doc" (TPU-native analog:
        phase 1 = each doc's top-impact terms).
        `full_forward`: queries come from the full encoder forward (hundreds
        of active terms) rather than the inf-free path. The inverted engine's
        inf-free lookup covers `cfg.query_terms` terms; wider queries route
        to the full-forward inverted mode (top `cfg.full_query_terms` terms
        by WAND impact bound, top `cfg.full_postings_cols` postings each,
        exact rescore) whose cost stays corpus-size-independent — or to the
        exact doc-major scan when `cfg.full_fallback_scan` is set. None =
        decide from the query batch (one scalar device sync); pass False to
        skip the check on known inf-free queries (the reference's OpenSearch
        scores every query token at speed regardless of width via Lucene
        WAND, search.py:59-70 — the full mode preserves that contract).
        full_forward=False is a WIDTH ASSERTION: every query row has at
        most cfg.query_terms active terms. The inverted engine's exact
        rescore reconstructs the query from its lookup slots under that
        guarantee (inverted.make_search_fn match_rescore); a wider query
        passed with False gets slot-truncated scores and an uncertified
        flag (escalation restores exactness where enabled) instead of the
        full-forward routing it should have had.
        """
        assert self._finalized, "call finalize() first"
        if self.n_docs == 0:
            return [dict() for _ in range(q_reps.shape[0])]
        if q_reps.shape[0] == 0:
            # a query set that filtered to nothing: the batch driver and the
            # inverted width check both assume >= 1 row
            self.last_certified = None
            self.last_escalated = None
            self.last_scan_escalated = None
            return []
        # stay on device when the caller hands us a device array (no D2H/H2D
        # round-trip between encoder and index)
        q = q_reps if isinstance(q_reps, jax.Array) else jnp.asarray(
            np.asarray(q_reps, dtype=np.float32)
        )
        q = q.astype(jnp.float32)
        if query_prune > 0:
            thresh = jnp.max(q, axis=1, keepdims=True) * query_prune
            q = jnp.where(q > thresh, q, 0.0)

        engine = None
        active_counts = None  # per-row active-term counts, fetched at most once
        if self._engine == "inverted":
            if full_forward is None:
                # one [n_q] fetch serves BOTH the width check here and the
                # escalation branch's has_mass below (each scalar sync costs
                # ~30 ms on the tunnelled runtime)
                active_counts = np.asarray(jnp.sum(q > 0, axis=1))
                full_forward = int(active_counts.max()) > self.cfg.query_terms
            if full_forward:
                if self.cfg.full_fallback_scan:
                    engine = "sparse"  # exact doc-major scan, corpus-linear
                    if not self._warned_fallback:
                        self._warned_fallback = True
                        logger.warning(
                            "inverted engine: full_fallback_scan set; wide "
                            "queries use the exact doc-major scan",
                        )
                else:
                    engine = "inverted_full"

        k_eff = min(k + (1 if exclude_self is not None else 0), self.n_docs)
        s_np, i_np, b_np, esc_np = self._run_queries(q, k_eff, two_phase, engine)
        n_q = q.shape[0]

        # exactness certificate (inverted engines): a query whose k-th
        # returned exact score beats the missed-doc bound provably has the
        # true top-k (inverted.make_search_fn docstring). Flags exposed via
        # `last_certified`; with exact_escalate the uncertified minority
        # transparently re-runs through the exact doc-major scan.
        self.last_certified = None
        self.last_escalated = None
        self.last_scan_escalated = None
        if esc_np is not None:
            # fused escalation (single-device inverted + exact_escalate):
            # the device already certified every row and re-ran the
            # uncertified ones through the exact scan inside the search
            # dispatch — results are exact everywhere, no second pass.
            # esc_np carries the per-row STAGE code (0 shallow-certified,
            # 1 deep-tier certified, 2 exact scan).
            self.last_escalated = esc_np != 0
            self.last_scan_escalated = esc_np >= 2
            self.last_certified = np.ones(n_q, dtype=bool)
            if self.last_escalated.any():
                logger.debug(
                    "exact_escalate (fused): %d/%d queries re-ran "
                    "in-dispatch (%d on the exact scan)",
                    int(self.last_escalated.sum()), n_q,
                    int(self.last_scan_escalated.sum()),
                )
        elif b_np is not None:
            kth = s_np[:, -1] if s_np.shape[1] else np.full(n_q, -np.inf)
            # the SAME rule the device fused path applies
            # (inverted.certified_mask docstring explains the margin)
            from . import inverted

            cert = inverted.certified_mask(kth, b_np, xp=np)
            n_unc = int((~cert).sum())
            if n_unc and self._escalate_for(engine, two_phase):
                # all-zero rows (batch/chunk padding from serve's pow2
                # micro-batcher and eval's chunk driver) have kth=-inf and
                # would never certify — but their true top-k is empty, so
                # they are trivially exact. Escalating them would re-run a
                # corpus-linear scan per padded batch for phantom queries.
                if active_counts is None:
                    active_counts = np.asarray(jnp.sum(q > 0, axis=1))
                cert = cert | (active_counts == 0)
                idx = np.flatnonzero(~cert)
                if idx.size:
                    qs = jnp.take(q, jnp.asarray(idx, dtype=jnp.int32), axis=0)
                    # two_phase=False: the escalation target is the EXACT scan
                    es, ei, _, _ = self._run_queries(qs, k_eff, False, "sparse")
                    # single-batch fetches arrive as read-only zero-copy
                    # views of the device buffer (ascontiguousarray would
                    # no-op on them) — copy before splicing
                    if not s_np.flags.writeable:
                        s_np, i_np = s_np.copy(), i_np.copy()
                    s_np[idx], i_np[idx] = es, ei
                    logger.debug(
                        "exact_escalate: %d/%d queries re-ran on the exact scan",
                        idx.size, n_q,
                    )
                # escalated rows now hold exact-scan results: certified by
                # construction. `last_escalated` records which rows they were.
                esc = np.zeros(n_q, dtype=bool)
                esc[idx] = True
                self.last_escalated = esc
                self.last_scan_escalated = esc.copy()
                cert = cert | esc
            self.last_certified = cert

        return self._collect_results(s_np, i_np, n_q, k, exclude_self)

    def _collect_results(
        self, s_np, i_np, n_q: int, k: int,
        exclude_self: Optional[Sequence[str]],
    ) -> List[Dict[str, float]]:
        """Score/id arrays -> per-query {doc_id: score} maps (drops pad ids,
        non-positive scores, and the per-query self hit).

        Vectorized filters + batched scalar conversion: the per-element
        python loop (list index + float() per hit) cost 10.9 ms/512q on
        this host — ~40% of the device-side hot-path time once the window
        resolve amortized the fetch RTT (round 5)."""
        if self._ids_arr is None or len(self._ids_arr) != len(self.doc_ids):
            # doc_ids is append-only across reopen(); rebuild on growth
            self._ids_arr = np.asarray(self.doc_ids, dtype=object)
        valid = (i_np[:n_q] >= 0) & (i_np[:n_q] < self.n_docs) & (
            s_np[:n_q] > 0
        )
        # ONE fancy index + ONE scalar-conversion pass over all valid hits,
        # then cheap python-list slicing per row
        ends = np.cumsum(valid.sum(axis=1)).tolist()
        flat_ids = self._ids_arr[i_np[:n_q][valid]].tolist()
        flat_scores = s_np[:n_q][valid].tolist()
        results: List[Dict[str, float]] = []
        start = 0
        for qi in range(n_q):
            end = ends[qi]
            pairs = zip(flat_ids[start:end], flat_scores[start:end])
            if exclude_self is not None:
                self_id = str(exclude_self[qi])
                pairs = (p for p in pairs if p[0] != self_id)
            results.append(dict(itertools.islice(pairs, k)))
            start = end
        return results

    def search_tokens(
        self,
        q_tokens: np.ndarray,  # [B, q_len] int32 token ids (0-padded)
        q_weights: np.ndarray,  # [B, q_len] f32 weights (0 = inactive)
        k: int = 10,
        **kw,
    ) -> List[Dict[str, float]]:
        """Search from (token, weight) pairs — the serving-path entry point.
        This is the analog of the reference's `neural_sparse` query body of
        token->weight maps (sparse_encoders.py:184-194).

        Single-device inverted indexes whose slot width fits
        cfg.query_terms take the TOKEN-ENTRY fast path: the slots feed the
        postings lookup directly (inverted.make_search_fn token_entry) —
        no dense scatter, no [B, 30522] term top_k, no bound matvec, and
        the exact rescore runs the match path. Everything else (scan/dense
        engines, sharded meshes, two-phase, wide slot lists) builds the
        dense query matrix on device with one scatter, so only ~q_len*8
        bytes/query cross the host boundary either way.
        """
        q_tokens = np.ascontiguousarray(q_tokens, dtype=np.int32)
        q_weights = np.ascontiguousarray(q_weights, dtype=np.float32)
        if self._tokens_fast_eligible(q_tokens, q_weights, kw):
            return self._search_tokens_fast(
                q_tokens, q_weights, k,
                query_prune=kw.get("query_prune", 0.0),
                exclude_self=kw.get("exclude_self"),
            )
        if "full_forward" not in kw and q_tokens.shape[1] <= self.cfg.query_terms:
            # at most q_len active terms, all within the lookup budget — skip
            # the per-call device check
            kw["full_forward"] = False
        if self._q_builder is None:
            V = self.vocab_size

            @jax.jit
            def build(tok, w):
                B = tok.shape[0]
                q = jnp.zeros((B, V), jnp.float32)
                b_idx = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], tok.shape
                )
                return q.at[b_idx, tok].add(jnp.where(w > 0, w, 0.0), mode="drop")

            self._q_builder = build
        q = self._q_builder(
            jnp.asarray(q_tokens, dtype=jnp.int32),
            jnp.asarray(q_weights, dtype=jnp.float32),
        )
        return self.search(q, k=k, **kw)

    def _tokens_fast_eligible(self, q_tokens: np.ndarray,
                              q_weights: np.ndarray, kw: dict) -> bool:
        """Routing predicate for the token-entry fast path (see
        search_tokens): single-device inverted index, slot width within
        the lookup budget, no two-phase, no unknown kwargs, and no
        duplicate active token ids per row (duplicates score identically
        on both paths, but query_prune thresholds per-slot here vs
        post-merge on the dense path — one semantics wins)."""
        if not (
            self._finalized
            and self._engine == "inverted"
            and not self._shard_queries
            and (self.mesh is None or self.mesh.devices.size == 1)
            and q_tokens.shape[1] <= self.cfg.query_terms
            and not kw.get("two_phase", False)
            and kw.get("full_forward", None) in (None, False)
            and not set(kw) - {"query_prune", "exclude_self", "two_phase",
                               "full_forward"}
            and self.n_docs > 0
            and q_tokens.shape[0] > 0
        ):
            return False
        srt = np.sort(np.where(q_weights > 0, q_tokens, -1), axis=1)
        return not bool(
            ((srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)).any()
        )

    def _search_tokens_fast(
        self,
        q_tok: np.ndarray,  # [B, S<=T] int32, no duplicate active ids/row
        q_w: np.ndarray,  # [B, S] f32
        k: int,
        query_prune: float = 0.0,
        exclude_self: Optional[Sequence[str]] = None,
    ) -> List[Dict[str, float]]:
        """Token-entry search (see search_tokens). Same results and
        certificate/escalation contract as the dense path — pinned by
        tests/test_index.py token-entry parity tests."""
        return self.resolve_hits(self._search_tokens_dispatch(
            q_tok, q_w, k, query_prune, exclude_self
        ))

    def _search_tokens_dispatch(self, q_tok, q_w, k, query_prune,
                                exclude_self) -> dict:
        T = self.cfg.query_terms
        n_q, S = q_tok.shape
        if query_prune > 0:
            thresh = q_w.max(axis=1, keepdims=True) * query_prune
            q_w = np.where(q_w > thresh, q_w, 0.0)
        if S < T:  # pad the slot axis to the fn's static width
            q_tok = np.pad(q_tok, ((0, 0), (0, T - S)))
            q_w = np.pad(q_w, ((0, 0), (0, T - S)))
        dev = (jnp.asarray(q_tok), jnp.asarray(q_w))
        k_eff = min(k + (1 if exclude_self is not None else 0), self.n_docs)
        parts, _ = self._dispatch_queries(dev, k_eff, False, "inverted_tokens")
        return {
            "parts": parts, "n_q": n_q, "k": k,
            "exclude_self": exclude_self,
            "n_active": (q_w > 0).sum(axis=1),
        }

    def search_tokens_async(
        self,
        q_tokens: np.ndarray,
        q_weights: np.ndarray,
        k: int = 10,
        **kw,
    ) -> dict:
        """Dispatch a search_tokens call WITHOUT fetching: returns an
        opaque handle for resolve_hits(). Pipelining N dispatches before
        the first resolve hides the per-call device sync (~30 ms over a
        tunnelled runtime) behind device compute — the same pattern the
        ingest path uses (BatchEncoder.encode_batch_sparse_async). When
        the token fast path is ineligible (see search_tokens) the call
        degrades to a SYNCHRONOUS search whose results ride the handle,
        so callers never need two code paths."""
        q_tokens = np.ascontiguousarray(q_tokens, dtype=np.int32)
        q_weights = np.ascontiguousarray(q_weights, dtype=np.float32)
        if self._tokens_fast_eligible(q_tokens, q_weights, kw):
            return self._search_tokens_dispatch(
                q_tokens, q_weights, k,
                kw.get("query_prune", 0.0), kw.get("exclude_self"),
            )
        results = self.search_tokens(q_tokens, q_weights, k=k, **kw)
        return {
            "sync_results": results,
            "flags": (self.last_certified, self.last_escalated,
                      self.last_scan_escalated),
        }

    def _finish_resolve(self, s_np, i_np, b_np, esc_np, handle):
        """Flags + results from fetched arrays (the post-fetch half of
        resolve_hits). Returns (results, certified, escalated,
        scan_escalated) without touching the last_* attributes."""
        n_q, k = handle["n_q"], handle["k"]
        cert = esc = scan = None
        if esc_np is not None:
            # fused escalation: results exact everywhere (see search())
            esc = esc_np != 0
            scan = esc_np >= 2
            cert = np.ones(n_q, dtype=bool)
        elif b_np is not None:
            kth = s_np[:, -1] if s_np.shape[1] else np.full(n_q, -np.inf)
            from . import inverted

            cert = inverted.certified_mask(kth, b_np, xp=np)
            # all-zero padding rows are trivially exact (see search()).
            # No host escalation branch: single-device + exact_escalate
            # always builds the FUSED ladder, so b_np-without-esc_np only
            # occurs when escalation is off.
            cert = cert | (handle["n_active"] == 0)
        results = self._collect_results(
            s_np, i_np, n_q, k, handle["exclude_self"]
        )
        return results, cert, esc, scan

    @staticmethod
    def _handle_parts(handle):
        parts = handle["parts"]
        return (parts[0], parts[1],
                parts[2] if len(parts) > 2 else None,
                parts[3] if len(parts) > 3 else None)

    def resolve_hits(self, handle: dict) -> List[Dict[str, float]]:
        """Fetch + post-process a search_tokens_async handle. Sets the
        last_certified/last_escalated flags exactly like the sync call."""
        if "sync_results" in handle:
            (self.last_certified, self.last_escalated,
             self.last_scan_escalated) = handle["flags"]
            return handle["sync_results"]
        s_dev, i_dev, b_dev, e_dev = self._handle_parts(handle)
        s_np, i_np, b_np, esc_np = _fetch_packed(
            s_dev, i_dev, handle["n_q"], b_dev, e_dev
        )
        results, cert, esc, scan = self._finish_resolve(
            s_np, i_np, b_np, esc_np, handle
        )
        self.last_certified = cert
        self.last_escalated = esc
        self.last_scan_escalated = scan
        return results

    def resolve_hits_many(
        self, handles: Sequence[dict]
    ) -> List[List[Dict[str, float]]]:
        """Resolve N search_tokens_async handles with ONE packed host fetch.

        Over a tunnelled runtime every host fetch costs a fixed ~30 ms
        round trip; resolving a deep dispatch window handle-by-handle
        serializes those RTTs after device compute drains (measured round
        5 at the 128K headline shape: 8-deep window sustained 8.8K q/s vs
        ~20K device-side). Stacking every handle's packed matrix into one
        device concat and one fetch pays the RTT once per window — the
        result-side analog of BatchEncoder.resolve_sparse_many.

        Returns the per-handle result lists, in order. The last_certified/
        last_escalated/last_scan_escalated flags are set to the row-wise
        concatenation across all handles (None if any handle lacks them).
        Handles with mismatched packed widths (different k or flag
        columns) and sync-degraded handles resolve individually — same
        results, just without the shared fetch."""
        if not handles:
            self.last_certified = None
            self.last_escalated = None
            self.last_scan_escalated = None
            return []
        metas = []  # (out_slot, handle, n_pad, width, has_b, has_e)
        packs = []
        out: List[Optional[List[Dict[str, float]]]] = [None] * len(handles)
        flags: List[tuple] = [()] * len(handles)
        shape0 = None
        for j, h in enumerate(handles):
            if "sync_results" in h:
                out[j] = h["sync_results"]
                flags[j] = h["flags"]
                continue
            s_dev, i_dev, b_dev, e_dev = self._handle_parts(h)
            shape = (s_dev.shape[1], b_dev is not None, e_dev is not None)
            if shape0 is None:
                shape0 = shape
            if shape != shape0:
                # heterogeneous window: per-handle fetch, still correct
                out[j] = self.resolve_hits(h)
                flags[j] = (self.last_certified, self.last_escalated,
                            self.last_scan_escalated)
                continue
            packs.append(_pack_cols(s_dev, i_dev, b_dev, e_dev))
            metas.append((j, h, packs[-1].shape[0]) + shape)
        if packs:
            arr = np.asarray(
                jnp.concatenate(packs) if len(packs) > 1 else packs[0]
            )
            row = 0
            for j, h, n_pad, k, has_b, has_e in metas:
                block = arr[row : row + n_pad]
                row += n_pad
                s_np, i_np, b_np, esc_np = _split_packed(
                    block, h["n_q"], k, has_b, has_e
                )
                out[j], cert, esc, scan = self._finish_resolve(
                    s_np, i_np, b_np, esc_np, h
                )
                flags[j] = (cert, esc, scan)

        def _cat(col):
            vals = [f[col] if len(f) > col else None for f in flags]
            if any(v is None for v in vals):
                return None
            return np.concatenate(vals)

        self.last_certified = _cat(0)
        self.last_escalated = _cat(1)
        self.last_scan_escalated = _cat(2)
        return out

    # -------------------------------------------------------- persistence
    def save(self, path: str):
        assert self._finalized
        os.makedirs(path, exist_ok=True)
        # store weights losslessly for every dtype: float32 as fp32 (an
        # exactness-mode index must not be truncated), bfloat16 as its raw
        # bit pattern (fp16 would overflow bf16 values > 65504 to inf and
        # lose low-exponent bits), float16 as fp16
        arrs = {"count_tensor": self.count_tensor}
        w_np = np.asarray(self._docs_dev)
        if w_np.dtype == np.dtype(jnp.bfloat16):
            arrs["weights_bf16"] = w_np.view(np.uint16)
        else:
            arrs["weights"] = w_np
        if self._tok_dev is not None:
            arrs["tokens"] = np.asarray(self._tok_dev)
        np.savez_compressed(os.path.join(path, "index.npz"), **arrs)
        meta = {
            # format 2: bfloat16 weights stored as raw bits ("weights_bf16");
            # readers older than this field expect a "weights" float array
            # and fail with a KeyError on bf16 indexes (fp32/fp16 indexes
            # remain readable by them)
            "format": 2,
            "vocab_size": self.vocab_size,
            "n_docs": self.n_docs,
            "engine": self._engine,
            "l_max": self.cfg.l_max,
            "block_docs": self.cfg.block_docs,
            "postings_cap": self.cfg.postings_cap,
            "query_terms": self.cfg.query_terms,
            "full_query_terms": self.cfg.full_query_terms,
            "full_postings_cols": self.cfg.full_postings_cols,
            "full_rescore_expand": self.cfg.full_rescore_expand,
            # semantic knob, not a tuning knob: a loaded index must keep the
            # exact-results contract it was built with — the RESOLVED flag
            # (a None in cfg resolved at finalize)
            "exact_escalate": self._exact_escalate,
            # the FULL config: a loaded index keeps every contract it was
            # built with (weight_dtype, inverted_rescore, two-phase and
            # full-forward budgets). The flat keys above stay for indexes
            # readers older than this field. engine inside cfg may be
            # "auto"; the resolved engine is the top-level "engine" key.
            "cfg": asdict(self.cfg),
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, "doc_ids.json"), "w") as f:
            json.dump(self.doc_ids, f)

    @classmethod
    def merge_saved(
        cls,
        paths: Sequence[str],
        mesh: Optional[Mesh] = None,
        cfg: Optional[IndexConfig] = None,
    ) -> "SparseIndex":
        """Concatenate per-rank shard indexes (multi-host ingest, where each
        host saved its corpus stripe) into one searchable index. Doc ids are
        the global string ids, so concatenation IS the merge — the analog of
        all ranks bulk-writing into one OpenSearch index (ingest.py:88-106).
        """
        metas = [json.load(open(os.path.join(p, "meta.json"))) for p in paths]
        v = metas[0]["vocab_size"]
        assert all(m["vocab_size"] == v for m in metas), "vocab mismatch"
        if cfg is None:
            cfg = cls._cfg_from_meta(metas[0])
            # escalation is a promise to the caller: keep it if ANY shard
            # was built with it
            cfg.exact_escalate = any(
                cls._cfg_from_meta(m).exact_escalate for m in metas
            )
        idx = cls(v, cfg, mesh)
        for p, meta in zip(paths, metas):
            blob = np.load(os.path.join(p, "index.npz"))
            assert "tokens" in blob, "merge_saved needs sparse-format shards"
            ids = json.load(open(os.path.join(p, "doc_ids.json")))
            n = len(ids)
            idx.doc_ids.extend(ids)
            idx.count_tensor += blob["count_tensor"]
            toks = blob["tokens"][:n].astype(np.int32)
            ws = _load_weights(blob)[:n]
            L = cfg.l_max
            if toks.shape[1] != L:  # re-cap shards built with a different l_max
                if toks.shape[1] > L:
                    toks, ws = toks[:, :L], ws[:, :L]
                else:
                    pad = L - toks.shape[1]
                    toks = np.pad(toks, ((0, 0), (0, pad)))
                    ws = np.pad(ws, ((0, 0), (0, pad)))
            idx._tok_chunks.append(toks)
            idx._w_chunks.append(ws)
        idx.finalize()
        return idx

    @staticmethod
    def _cfg_from_meta(meta: dict) -> IndexConfig:
        """Reconstruct the build-time IndexConfig from saved metadata.

        New-format metas carry the full dataclass under "cfg" (unknown keys
        from future fields are dropped; the resolved engine overrides a
        possible "auto"); legacy metas fall back to the flat keys."""
        if "cfg" in meta:
            known = {f.name for f in fields(IndexConfig)}
            kw = {k: v for k, v in meta["cfg"].items() if k in known}
            kw["engine"] = meta["engine"]
            # the saved cfg may hold exact_escalate=None (auto); the flat
            # key is the flag RESOLVED at the original finalize — and with
            # the engine pinned above, a None would re-resolve to False
            if "exact_escalate" in meta:
                kw["exact_escalate"] = meta["exact_escalate"]
            return IndexConfig(**kw)
        return IndexConfig(
            engine=meta["engine"], l_max=meta["l_max"],
            block_docs=meta["block_docs"],
            postings_cap=meta.get("postings_cap", 2048),
            query_terms=meta.get("query_terms", 16),
            full_query_terms=meta.get("full_query_terms", 64),
            full_postings_cols=meta.get("full_postings_cols", 256),
            full_rescore_expand=meta.get("full_rescore_expand", 16),
            exact_escalate=meta.get("exact_escalate", False),
        )

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None) -> "SparseIndex":
        meta = json.load(open(os.path.join(path, "meta.json")))
        blob = np.load(os.path.join(path, "index.npz"))
        cfg = cls._cfg_from_meta(meta)
        idx = cls(meta["vocab_size"], cfg, mesh)
        idx.doc_ids = json.load(open(os.path.join(path, "doc_ids.json")))
        idx.count_tensor = blob["count_tensor"]
        # route through finalize(): it owns padding for the mesh size,
        # per-shard postings with LOCAL doc indices, weight-dtype casts and
        # device placement — duplicating that here previously left
        # load(mesh=...) + inverted with unsharded global-index postings
        # that the sharded search path cannot use
        n = len(idx.doc_ids)
        w = _load_weights(blob)[:n]
        if "tokens" in blob:
            idx._tok_chunks = [blob["tokens"][:n].astype(np.int32)]
            idx._w_chunks = [w]
        else:
            idx._dense_chunks = [w]
        idx.finalize()
        return idx
