"""Inverted-engine hot-path cost breakdown (PERFORMANCE.md "round-4 addendum", job j70).

Stages (each probe = previous stages + one more, all mirroring
inverted.make_search_fn's real ops at 131K docs / cap 2048 / qt8 / Bq128):
  topk_gather : per-row top-T term select + [B,T,C] postings row gather
  sort        : + two-operand lax.sort by doc id
  merge       : + T-1 shifted-add run merge + top_k(k1=80)
  rescore     : + packed doc-row gather + exact rescore + top_k(k)
  bound       : full make_search_fn(with_bound, rescore_expand=8) no ext
  tiered      : full fn with deep_slots=1 + 14336-deep extension (headline
                hot path, escalation ladder excluded)
Timing: one jit per probe, lax.map over the 512-query set (4x128), scalar
reduce; warm the EXACT structure; best-of-3 over 8 pipelined dispatches,
every handle value-fetched (tunnel sync rules, CLAUDE.md).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from bench import make_corpus, make_queries
from opensearch_sparse_model_tuning_sample_tpu.index import inverted

def _env(name, default):
    return int(os.environ.get(name, default))


# headline bench shape by default; BD_* env overrides let the test suite
# smoke this harness at tiny shapes on CPU
vocab = _env("BD_VOCAB", 30522)
n_docs = _env("BD_DOCS", 131072)
cap = _env("BD_CAP", 2048)
T, k = 8, 10
Bq = _env("BD_BQ", 128)
n_q = _env("BD_NQ", 512)
ext_cap = _env("BD_EXT", 14336)
avg_terms = _env("BD_AVG_TERMS", 110)
if n_q % Bq:
    raise SystemExit(f"BD_NQ={n_q} must be a multiple of BD_BQ={Bq}")
# rescore pool: headline 8*k, clamped so tiny BD_CAP overrides keep the
# lax.top_k(sums, k1) inside jit valid (k1 <= T*cap candidate columns)
k1 = min(8 * k, T * cap)
if T * cap < k:
    raise SystemExit(f"BD_CAP={cap} too small: T*cap={T*cap} < k={k}")
PAD = np.iinfo(np.int32).max

toks, ws = make_corpus(n_docs, vocab, avg_terms=avg_terms, seed=1)
t0 = time.time()
pd_full, pw_full = inverted.build_postings(toks, ws, vocab, cap + ext_cap)
bd, bw, ed, ew, dm = inverted.split_postings(pd_full, pw_full, cap)
print(f"postings built+split in {time.time()-t0:.1f}s deep={ed.shape[0]-1}",
      flush=True)
pd_d = jnp.asarray(bd)
pw_d = jnp.asarray(bw.astype(np.dtype(jnp.bfloat16)))
ext_dev = (jnp.asarray(ed), jnp.asarray(ew.astype(np.dtype(jnp.bfloat16))),
       jnp.asarray(dm))
packed = jnp.asarray(inverted.pack_doc_rows(toks, ws))

q_tok, q_w = make_queries(n_q, vocab, n_terms=6, seed=3)
q = np.zeros((n_q, vocab), np.float32)
# scatter only ACTIVE slots: padding slots are (token 0, weight 0) and a
# blanket q[:, 0] = 0 would also drop genuinely drawn token-0 terms that the
# headline engine path (search_tokens' on-device scatter) keeps
act = q_w > 0
rows = np.broadcast_to(np.arange(n_q)[:, None], q_tok.shape)
q[rows[act], q_tok[act]] = q_w[act]
qs = jnp.asarray(q).reshape(n_q // Bq, Bq, vocab)

TC = T * cap


def stage_body(stage):
    def body(qb, pd, pw, pk, e):
        B = qb.shape[0]
        q_w_, q_tok_ = jax.lax.top_k(qb, T)
        term_valid = q_w_ > 0
        docs = pd[q_tok_]
        pwg = pw[q_tok_].astype(jnp.float32)
        part = pwg * q_w_[:, :, None]
        valid = (docs != PAD) & term_valid[:, :, None] & (pwg > 0)
        ids = jnp.where(valid, docs, PAD).reshape(B, TC)
        part = jnp.where(valid, part, 0.0).reshape(B, TC)
        if stage == "topk_gather":
            return jnp.sum(part) + jnp.sum(ids.astype(jnp.float32)) * 1e-9
        sid, sp = jax.lax.sort((ids, part), dimension=1, num_keys=1)
        if stage == "sort":
            return jnp.sum(sp) + jnp.sum(sid.astype(jnp.float32)) * 1e-9
        is_end = jnp.concatenate(
            [sid[:, 1:] != sid[:, :-1], jnp.ones((B, 1), bool)], axis=1)
        run_sum = sp
        for j in range(1, T):
            same = jnp.concatenate(
                [jnp.zeros((B, j), bool), sid[:, j:] == sid[:, :-j]], axis=1)
            shifted = jnp.concatenate(
                [jnp.zeros((B, j), sp.dtype), sp[:, :-j]], axis=1)
            run_sum = run_sum + jnp.where(same, shifted, 0.0)
        sums = jnp.where(is_end & (sid != PAD), run_sum, -jnp.inf)
        s1, sel = jax.lax.top_k(sums, k1)
        cand = jnp.where(jnp.isfinite(s1),
                         jnp.take_along_axis(sid, sel, axis=1), PAD)
        if stage == "merge":
            return jnp.sum(jnp.where(jnp.isfinite(s1), s1, 0.0)) + \
                jnp.sum(cand.astype(jnp.float32)) * 1e-9
        safe = jnp.clip(cand, 0, pk.shape[0] - 1)
        pk = pk[safe]
        ct = jnp.bitwise_and(pk, 0xFFFF)
        cw = jax.lax.bitcast_convert_type(
            jnp.right_shift(pk, 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
        g = jnp.take_along_axis(qb, ct.reshape(B, -1), axis=1).reshape(
            B, k1, -1)
        exact = jnp.sum(g * cw, axis=-1)
        exact = jnp.where(cand == PAD, -jnp.inf, exact)
        s, sel2 = jax.lax.top_k(exact, k)
        i = jnp.take_along_axis(cand, sel2, axis=1)
        return jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)) + \
            jnp.sum(i.astype(jnp.float32)) * 1e-9
    return body


def fn_probe(raw, with_ext):
    def body(qb, pd, pw, pk, e):
        out = raw(qb, pd, pw, pk, None, e if with_ext else None)
        s, i = out[0], out[1]
        acc = jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)) + \
            jnp.sum(i.astype(jnp.float32)) * 1e-9
        if len(out) > 2:
            b = out[2]
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(b), b, 0.0)) * 1e-9
        return acc
    return body


def timed(body, label):
    @jax.jit
    def f(qss, pd, pw, pk, e):
        return jnp.sum(jax.lax.map(lambda qb: body(qb, pd, pw, pk, e), qss))
    float(f(qs, pd_d, pw_d, packed, ext_dev))  # warm the exact structure
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        hs = [f(qs, pd_d, pw_d, packed, ext_dev) for _ in range(8)]
        for h in hs:
            float(h)
        best = min(best, (time.time() - t0) / 8)
    print(f"{label:12s} {best*1e3:8.2f} ms/512q  {n_q/best:8.0f} q/s",
          flush=True)
    return best


res = {}
for st in ("topk_gather", "sort", "merge", "rescore"):
    res[st] = timed(stage_body(st), st)

kw = dict(query_terms=T, k=k, rescore=True, rescore_expand=8,
          with_bound=True, packed_docs=True, jit=False)
res["bound"] = timed(
    fn_probe(inverted.make_search_fn(pd_d, pw_d, packed, None, **kw), False),
    "bound")
res["tiered"] = timed(
    fn_probe(inverted.make_search_fn(pd_d, pw_d, packed, None,
                                     deep_slots=1, **kw), True),
    "tiered")

print("--- deltas (stage cost within the hot path) ---")
prev = 0.0
for st in ("topk_gather", "sort", "merge", "rescore"):
    print(f"{st:12s} +{(res[st]-prev)*1e3:7.2f} ms", flush=True)
    prev = res[st]
print(f"{'cert bound':12s} +{(res['bound']-res['rescore'])*1e3:7.2f} ms")
print(f"{'ext reads':12s} +{(res['tiered']-res['bound'])*1e3:7.2f} ms")
