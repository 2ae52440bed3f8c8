"""Per-segment vectorized scoring with Block-Max pruning.

Spark-first restatement of the reference's query execution
(search/WANDScorer.cpp, search/MaxScoreBulkScorer.cpp,
codecs/lucene104/Lucene104PostingsReader.h:146-241 impacts): instead of a
doc-at-a-time iterator heap, we exploit that posting blocks carry
(first_doc, last_doc, max_tf, max_norm) impact metadata:

1. compute every block's BM25 upper bound vectorized (bm25.max_score);
2. sweep block boundaries into *elementary docID intervals*; each
   interval's upper bound = Σ of the covering blocks' bounds (each term
   has ≤1 block covering any doc);
3. visit intervals in DESCENDING upper-bound order, decoding + exact-
   scoring candidates (per-block decode memoized), maintaining a running
   top-k threshold θ;
4. stop as soon as the next interval's bound < θ — every unvisited doc
   is provably non-competitive. Blocks in skipped intervals are never
   decoded: that is Block-Max WAND's skipping, restated batch-style.

All pruning state is per-segment-partition (no global heap), which is the
scalable compromise SURVEY.md §7 calls out: correct, slightly less
pruning than a shared heap.

Posting lists are keyed by (field, term) tuples — multi-field postings
(document/Field.h:24); the functions are agnostic to key shape.

`banned` (tombstoned doc ids of THIS segment, supplied by the searcher's
cogrouped delete table) is masked out of the candidate stream BEFORE
top-k selection — the live-docs bitmap applied at scorer level
(codecs/LiveDocsFormat.h:18-47), so k needs no inflation and pruning
thresholds stay tight.

`stats_out` (optional dict) receives {"total": n, "exact": bool} — the
match count this scorer SAW. Exact except for the pruned disjunction
path, where it is a lower bound (Lucene's TotalHits.Relation
GREATER_THAN_OR_EQUAL_TO, TopScoreDocCollector.cpp:143-151).

Float32 evaluation order matches the reference: per-term scores are
float32 (bm25.SimScorer) and are accumulated doc-wise in *clause order*
(ConjunctionScorer/DisjunctionScorer sum sub-scores in order,
search/BooleanQuery.cpp:119-124). A float64 mode exists for the DuckDB
oracle harness (scores reproducible in ANSI SQL).

`eval_tree` evaluates ARBITRARY nested query trees (boolean-of-phrase,
boolean-of-boolean, range/match-all clauses via aux doc sets) — the
composable Query execution of search/BooleanQuery.cpp:557 /
Lucene104QueryTest.cpp. It returns every matching doc with its exact
score (no top-k pruning inside the tree; the flat fast paths above keep
the pruned strategies), but leaf decode is *candidate-range restricted*:
once required clauses fix a candidate span, remaining leaves decode only
blocks overlapping it (the advance() skipping of ConjunctionScorer).
"""

from __future__ import annotations

import numpy as np

from diagon_spark.index import codec
from diagon_spark.index.norms import decode_norm_to_length
from diagon_spark.search import bm25


class TermScorerParams:
    """Driver-computed per-term scoring constants (idf already boosted).

    Carries both float32 constants (reference-bit-identical scoring) and
    float64 ones (`idf64`/`avg64`, computed in full double precision) so
    the f64 mode is reproducible by an ANSI-SQL oracle: every f64 op below
    maps 1:1 to `LN/SQRT/*/+` on DOUBLEs.
    """

    __slots__ = ("idf_boost", "avg_len", "idf64", "avg64")

    def __init__(self, idf_boost: float, avg_len: float,
                 idf64: float | None = None, avg64: float | None = None):
        self.idf_boost = idf_boost
        self.avg_len = avg_len
        self.idf64 = float(idf64 if idf64 is not None else idf_boost)
        self.avg64 = float(avg64 if avg64 is not None else avg_len)

    def score(self, tfs, norms, f64: bool):
        if not f64:
            return bm25.SimScorer(np.float32(self.idf_boost),
                                  np.float32(self.avg_len)).score(tfs, norms)
        freq = np.asarray(tfs, dtype=np.float64)
        # norm decode natively in f64: (127.0/norm)^2, {0,127} -> 1.0
        n = np.asarray(norms).astype(np.float64)
        special = (n == 0.0) | (n == 127.0)
        with np.errstate(divide="ignore"):
            inv = 127.0 / np.where(special, 1.0, n)
        length = np.where(special, 1.0, inv * inv)
        k = 1.2 * (1.0 - 0.75 + 0.75 * length / self.avg64)
        return self.idf64 * freq / (freq + k)


class _SegmentPostings:
    """Decoded-on-demand postings of one (field, term) within one segment."""

    def __init__(self, rows: list[dict]):
        # rows sorted by chunk; blocks across chunks are docID-ordered
        self.rows = sorted(rows, key=lambda r: r["chunk"])
        self.block_index: list[tuple[int, int]] = []  # (row_i, block_i)
        firsts, lasts, max_tf, max_norm = [], [], [], []
        for ri, r in enumerate(self.rows):
            bf = np.asarray(r["block_first"], dtype=np.int64)
            for bi in range(len(bf)):
                self.block_index.append((ri, bi))
            firsts.append(bf)
            lasts.append(np.asarray(r["block_last"], dtype=np.int64))
            max_tf.append(np.asarray(r["block_max_tf"], dtype=np.int64))
            max_norm.append(np.asarray(r["block_max_norm"], dtype=np.int64))
        z = np.zeros(0, dtype=np.int64)
        self.first = np.concatenate(firsts) if firsts else z
        self.last = np.concatenate(lasts) if lasts else z
        self.max_tf = np.concatenate(max_tf) if max_tf else z
        self.max_norm = np.concatenate(max_norm) if max_norm else z
        self._cache: dict[int, tuple] = {}

    @property
    def df(self) -> int:
        return int(sum(int(r["df"]) for r in self.rows))

    def decode_block(self, b: int, want_positions: bool = False):
        key = (b, want_positions)
        if key not in self._cache:
            ri, bi = self.block_index[b]
            self._cache[key] = codec.decode_block(self.rows[ri], bi, want_positions)
        return self._cache[key]

    def decode_block_flat(self, b: int):
        """(docs, tfs, norms, flat absolute positions) — phrase fast path."""
        key = (b, "flat")
        if key not in self._cache:
            ri, bi = self.block_index[b]
            self._cache[key] = codec.decode_block_flat(self.rows[ri], bi)
        return self._cache[key]

    def decode_all(self, want_positions: bool = False):
        outs = [self.decode_block(b, want_positions)
                for b in range(len(self.block_index))]
        z = np.zeros(0, dtype=np.int64)
        docs = np.concatenate([o[0] for o in outs]) if outs else z
        tfs = np.concatenate([o[1] for o in outs]) if outs else z
        norms = np.concatenate([o[2] for o in outs]) if outs else z.astype(np.uint8)
        if want_positions:
            pos: list = []
            for o in outs:
                pos.extend(o[3])
            return docs, tfs, norms, pos
        return docs, tfs, norms

    def docs_at(self, cands: np.ndarray):
        """Decode only blocks CONTAINING at least one candidate docID
        (cands sorted asc) — the advance(target) skipping of
        ConjunctionScorer/MaxScore at block granularity; with k
        candidates at most k blocks decode regardless of list length."""
        if len(cands) == 0 or len(self.first) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z.astype(np.uint8)
        i = np.searchsorted(cands, self.first)
        ok = (i < len(cands)) & \
            (cands[np.minimum(i, len(cands) - 1)] <= self.last)
        dl, tl, nl = [], [], []
        for b in np.flatnonzero(ok):
            d, t, nn = self.decode_block(int(b))
            m = np.isin(d, cands, assume_unique=True)
            if m.any():
                dl.append(d[m]); tl.append(t[m]); nl.append(nn[m])
        z = np.zeros(0, dtype=np.int64)
        if not dl:
            return z, z, z.astype(np.uint8)
        return np.concatenate(dl), np.concatenate(tl), np.concatenate(nl)

    def docs_in_range(self, lo: int, hi: int):
        """Decode only blocks overlapping [lo, hi] -> (docs, tfs, norms) clipped."""
        bsel = np.flatnonzero((self.first <= hi) & (self.last >= lo))
        dl, tl, nl = [], [], []
        for b in bsel:
            d, t, nn = self.decode_block(int(b))
            m = (d >= lo) & (d <= hi)
            if m.any():
                dl.append(d[m]); tl.append(t[m]); nl.append(nn[m])
        z = np.zeros(0, dtype=np.int64)
        if not dl:
            return z, z, z.astype(np.uint8)
        return np.concatenate(dl), np.concatenate(tl), np.concatenate(nl)


def _accumulate(cands: np.ndarray, per_term: list[tuple[np.ndarray, np.ndarray]],
                f64: bool):
    """Sum per-term scores onto sorted candidate docids, in clause order."""
    dtype = np.float64 if f64 else np.float32
    acc = np.zeros(len(cands), dtype=dtype)
    nmatch = np.zeros(len(cands), dtype=np.int32)
    for docs, scores in per_term:
        idx = np.searchsorted(cands, docs)
        hit = (idx < len(cands))
        hit[hit] &= cands[idx[hit]] == docs[hit]
        acc[idx[hit]] = (acc[idx[hit]] + scores[hit].astype(dtype)).astype(dtype)
        nmatch[idx[hit]] += 1
    return acc, nmatch


def _after_filter(docs: np.ndarray, scores: np.ndarray, after):
    """searchAfter predicate: keep hits strictly after (score, doc) in
    collector order (score desc, doc asc) — TopScoreDocCollector.h:22."""
    if after is None or len(docs) == 0:
        return docs, scores
    a_score, a_doc = after
    keep = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
    return docs[keep], scores[keep]


def _mask_banned(docs: np.ndarray, banned):
    """Live-docs mask: boolean keep-array over `docs`."""
    if banned is None or len(banned) == 0 or len(docs) == 0:
        return None
    return ~np.isin(docs, banned)


def _fill_block_stats(stats_out: dict | None, postings: dict,
                      terms) -> None:
    """Pruning observability: how many posting blocks the query's terms
    HAVE vs how many actually DECODED (the Block-Max skip counter the
    reference exposes via its query profiler). Decoded = distinct blocks
    in each list's decode cache after scoring."""
    if stats_out is None:
        return
    tot = dec = 0
    # dedupe: a term repeated across occur lists (must+should,
    # must+must_not) has ONE postings list — count its blocks once
    for t in dict.fromkeys(terms):
        sp = postings.get(t)
        if sp is None:
            continue
        tot += len(sp.block_index)
        dec += len({k[0] for k in sp._cache})
    stats_out["blocks_total"] = stats_out.get("blocks_total", 0) + tot
    stats_out["blocks_decoded"] = stats_out.get("blocks_decoded", 0) + dec


def wand_disjunction(postings: dict, params: dict,
                     terms: list, k: int, msm: int = 0,
                     f64: bool = False, after=None, banned=None,
                     stats_out: dict | None = None,
                     n_docs_hint: int | None = None):
    """Pure-disjunction top-k with block-max interval pruning.

    Returns (doc_ids, scores) of the local (per-segment) top-k. `after`
    = (score, doc_id) enables searchAfter pagination; it also seeds the
    pruning threshold (the reference seeds minCompetitiveScore the same
    way for deep paging).
    """
    terms = [t for t in terms if t in postings]
    if not terms:
        if stats_out is not None:
            stats_out.update(total=0, exact=True)
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    # Strategy selection (the reference picks WANDScorer vs
    # MaxScoreBulkScorer the same way, BooleanQuery.cpp:376-480): for
    # DENSE disjunctions — most of the segment matches — block-max
    # pruning cannot skip much and the interval sweep's python loop
    # dominates; bulk-decode + one vectorized accumulation wins.
    total_df = sum(postings[t].df for t in terms)
    firsts = [postings[t].first[0] for t in terms if len(postings[t].first)]
    lasts = [postings[t].last[-1] for t in terms if len(postings[t].last)]
    doc_range = (max(lasts) - min(firsts) + 1) if firsts else 1
    # density = postings volume vs how many docs the segment can hold:
    # the docID span over-estimates wildly for strided/sparse id schemes,
    # so the planner supplies ~maxDoc/numSegments as a second bound.
    # Bulk when dense, when k covers everything, or when the TOTAL posting
    # volume is tiny relative to k (tiny segments make the interval sweep
    # pure overhead).
    denom = min(doc_range, n_docs_hint * 2) if n_docs_hint else doc_range
    dense = total_df >= 0.25 * denom
    trivial = k >= total_df or total_df <= 8 * max(k, 1)

    # per-term block upper bounds (vectorized impact math; cheap — the
    # impact arrays are already in memory)
    ubs, starts_all, ends_all = [], [], []
    for t in terms:
        sp = postings[t]
        p = params[t]
        if f64:
            ub = p.score(sp.max_tf, sp.max_norm, True)
        else:
            ub = bm25.SimScorer(np.float32(p.idf_boost), np.float32(p.avg_len)) \
                .max_score(sp.max_tf, sp.max_norm).astype(np.float64)
        ubs.append(ub)
        starts_all.append(sp.first)
        ends_all.append(sp.last)

    # MAXSCORE (MaxScoreBulkScorer.cpp:28-90 essential/non-essential
    # split): θ = k-th exact score of the highest-upper-bound term; the
    # smallest ub-descending prefix whose excluded suffix sums below θ is
    # ESSENTIAL — docs matching only non-essential terms provably can't
    # reach the top k, so their postings decode only at blocks holding a
    # candidate (docs_at). Tried BEFORE the dense-bulk path: a rare
    # high-idf clause can skip heavy low-idf lists that density metrics
    # call "dense". Skipped for searchAfter paging, msm>1 (θ would be
    # unsound), and when the probe term itself is heavy.
    if not trivial and after is None and msm <= 1 and len(terms) >= 3:
        g_ub = [float(u.max()) if len(u) else 0.0 for u in ubs]
        order = sorted(range(len(terms)), key=lambda i: -g_ub[i])
        t0 = terms[order[0]]
        if postings[t0].df <= max(8 * k, total_df // 4):
            d0, tf0, nn0 = postings[t0].decode_all()
            s0 = np.asarray(params[t0].score(tf0, nn0, f64),
                            dtype=np.float64)
            keep0 = _mask_banned(d0, banned)
            if keep0 is not None:
                s0 = s0[keep0]  # θ must bound LIVE docs only
            if len(s0) >= k:
                theta = float(np.partition(s0, len(s0) - k)[len(s0) - k])
                suffix = 0.0
                essential = list(order)
                # Upward-rounded suffix bound (MathUtil.sumUpperBound
                # analogue): returned scores accumulate in FLOAT32, so a
                # doc matching only non-essential terms can round to a
                # value >= theta even when the f64 sum of the per-term
                # f32 upper bounds is a hair below it. Inflate by the
                # worst-case relative error of an n-term f32 sum
                # (n ulps of 2^-24 each; 2^-23 per term is conservative)
                # before the suffix < theta pruning test.
                fudge = 1.0 + (len(terms) + 1) * 2.0 ** -23
                for i in reversed(order):
                    if (len(essential) > 1
                            and (suffix + g_ub[i]) * fudge < theta):
                        suffix += g_ub[i]
                        essential.remove(i)
                    else:
                        break
                if len(essential) < len(terms):
                    ess_terms = [terms[i] for i in essential]
                    cand_parts = [postings[t].decode_all()[0]
                                  for t in ess_terms]
                    cands = np.unique(np.concatenate(cand_parts))
                    keep = _mask_banned(cands, banned)
                    if keep is not None:
                        cands = cands[keep]
                    if len(cands):
                        per_term = []
                        for t in terms:  # clause order (f32 accumulation)
                            if t in ess_terms:
                                d, tf, nn = postings[t].decode_all()
                                m = np.isin(d, cands, assume_unique=True)
                                d, tf, nn = d[m], tf[m], nn[m]
                            else:
                                # block-granular advance: only blocks
                                # holding a candidate decode
                                d, tf, nn = postings[t].docs_at(cands)
                            per_term.append(
                                (d, params[t].score(tf, nn, f64)))
                        acc, _nm = _accumulate(cands, per_term, f64)
                        if stats_out is not None:
                            # docs matching only non-essential terms are
                            # not enumerated: lower bound (GTE relation)
                            stats_out.update(total=int(len(cands)),
                                             exact=False)
                            _fill_block_stats(stats_out, postings, terms)
                        return _topk(cands, acc.astype(np.float64), k)

    if dense or trivial:
        per_term = []
        cand_parts = []
        for t in terms:
            d, tf, nn = postings[t].decode_all()
            per_term.append((d, params[t].score(tf, nn, f64)))
            cand_parts.append(d)
        cands = np.unique(np.concatenate(cand_parts))
        keep = _mask_banned(cands, banned)
        if keep is not None:
            cands = cands[keep]
        acc, nmatch = _accumulate(cands, per_term, f64)
        if msm > 1:
            keep = nmatch >= msm
            cands, acc = cands[keep], acc[keep]
        if stats_out is not None:
            stats_out.update(total=int(len(cands)), exact=True)
            _fill_block_stats(stats_out, postings, terms)
        cands, acc = _after_filter(cands, acc.astype(np.float64), after)
        return _topk(cands, acc, k)

    # elementary interval sweep over block boundaries
    ev_pos = np.concatenate([np.concatenate(starts_all),
                             np.concatenate(ends_all) + 1])
    ev_delta = np.concatenate([np.concatenate(ubs), -np.concatenate(ubs)])
    order = np.argsort(ev_pos, kind="stable")
    ev_pos, ev_delta = ev_pos[order], ev_delta[order]
    bounds, inv = np.unique(ev_pos, return_inverse=True)
    delta_per_bound = np.zeros(len(bounds))
    np.add.at(delta_per_bound, inv, ev_delta)
    active = np.cumsum(delta_per_bound)[:-1]  # bound i..i+1 interval
    int_lo = bounds[:-1]
    int_hi = bounds[1:] - 1
    live = active > 0
    int_lo, int_hi, active = int_lo[live], int_hi[live], active[live]

    # visit intervals by descending upper bound; stop when bound < θ
    visit = np.argsort(-active, kind="stable")
    all_docs: list[np.ndarray] = []
    all_scores: list[np.ndarray] = []
    all_nmatch: list[np.ndarray] = []
    theta = -np.inf
    n_collected = 0
    pruned = False
    for vi in visit:
        if n_collected >= k and active[vi] < theta:
            pruned = True
            break  # Block-Max skip: every remaining doc is non-competitive
        lo, hi = int(int_lo[vi]), int(int_hi[vi])
        per_term = []
        cand_parts = []
        for t in terms:
            d, tf, nn = postings[t].docs_in_range(lo, hi)
            sc = params[t].score(tf, nn, f64)
            per_term.append((d, sc))
            cand_parts.append(d)
        cands = np.unique(np.concatenate(cand_parts)) if cand_parts else \
            np.zeros(0, np.int64)
        keep = _mask_banned(cands, banned)
        if keep is not None:
            cands = cands[keep]
        if len(cands) == 0:
            continue
        acc, nmatch = _accumulate(cands, per_term, f64)
        if after is not None:
            keep = (acc < after[0]) | ((acc == after[0]) & (cands > after[1]))
            cands, acc, nmatch = cands[keep], acc[keep], nmatch[keep]
            if len(cands) == 0:
                continue
        all_docs.append(cands)
        all_scores.append(acc.astype(np.float64))
        all_nmatch.append(nmatch)
        n_collected += len(cands)
        if n_collected >= k:
            flat = np.concatenate(all_scores)
            if msm > 1:
                flat = flat[np.concatenate(all_nmatch) >= msm]
            if len(flat) >= k:
                theta = np.partition(flat, len(flat) - k)[len(flat) - k]

    if not all_docs:
        if stats_out is not None:
            stats_out.update(total=0, exact=not pruned)
            _fill_block_stats(stats_out, postings, terms)
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    if msm > 1:
        keep = np.concatenate(all_nmatch) >= msm
        docs, scores = docs[keep], scores[keep]
    if stats_out is not None:
        # lower bound when pruning stopped early (TotalHits GTE relation)
        stats_out.update(total=int(len(docs)), exact=not pruned)
        _fill_block_stats(stats_out, postings, terms)
    return _topk(docs, scores, k)


def conjunction(postings: dict, params: dict,
                must: list, should: list, must_not: list,
                filters: list, k: int, f64: bool = False, after=None,
                msm: int = 0, banned=None, stats_out: dict | None = None):
    """AND/mixed boolean: lead-term candidate pruning + block-range skip.

    ConjunctionScorer analogue (BooleanQuery.cpp:23-135): the rarest MUST
    term leads; other terms only decode blocks overlapping surviving
    candidates.
    """
    def _none():
        if stats_out is not None:
            stats_out.update(total=0, exact=True)
            # block counters still reported: blocks visited before the
            # candidate set emptied are real work (profiler soundness for
            # fully-pruned segments)
            _fill_block_stats(stats_out, postings,
                              [*must, *should, *must_not, *filters])
        return np.zeros(0, np.int64), np.zeros(0, np.float64)

    # required clauses = MUST + FILTER (BooleanWeight: the filter scorer
    # becomes a required scorer — it can establish the candidate set by
    # itself, and SHOULD clauses then become purely optional/score-only,
    # exactly as the tree path's `req` list does in eval_tree)
    if any(t not in postings for t in (*must, *filters)):
        return _none()
    required = sorted((*must, *filters), key=lambda t: postings[t].df)
    if required:
        cand, _, _ = postings[required[0]].decode_all()
        for t in required[1:]:
            if len(cand) == 0:
                break
            d, _, _ = postings[t].docs_in_range(int(cand.min()),
                                                int(cand.max()))
            cand = np.intersect1d(cand, d, assume_unique=True)
    elif should:
        # no required clauses: candidates = union of optional matches
        # (a boolean needs >=1 positive clause to match, Query semantics)
        parts = [postings[t].decode_all()[0] for t in should
                 if t in postings]
        if not parts:
            return _none()
        cand = np.unique(np.concatenate(parts))
    else:
        return _none()
    for t in must_not:
        if t in postings and len(cand):
            d, _, _ = postings[t].docs_in_range(int(cand.min()), int(cand.max()))
            cand = np.setdiff1d(cand, d, assume_unique=True)
    keep = _mask_banned(cand, banned)
    if keep is not None:
        cand = cand[keep]
    if len(cand) == 0:
        return _none()

    per_term = []
    n_should = np.zeros(len(cand), dtype=np.int32)
    lo, hi = int(cand.min()), int(cand.max())
    # clause order for float32 accumulation; occur tag distinguishes a
    # term present in BOTH lists (it scores once per clause, but counts
    # toward minShouldMatch only for its SHOULD occurrence — the
    # `t in should` membership test double-counted it on the must pass)
    for occ, t in [*(("must", t) for t in must),
                   *(("should", t) for t in should)]:
        if t not in postings:
            continue
        d, tf, nn = postings[t].docs_in_range(lo, hi)
        m = np.isin(d, cand, assume_unique=True)
        per_term.append((d[m], params[t].score(tf[m], nn[m], f64)))
        if occ == "should":
            idx = np.searchsorted(cand, d[m])
            n_should[idx] += 1
    acc, _ = _accumulate(cand, per_term, f64)
    if msm >= 1 and should:  # minShouldMatch over SHOULD clauses
        keep = n_should >= msm
        cand, acc = cand[keep], acc[keep]
    if stats_out is not None:
        stats_out.update(total=int(len(cand)), exact=True)
        _fill_block_stats(stats_out, postings,
                          [*must, *should, *must_not, *filters])
    cand, acc = _after_filter(cand, acc.astype(np.float64), after)
    return _topk(cand, acc, k)


def _unordered_feasible(terms: list, pos: dict, w: int, slop: int,
                        fixed0: int) -> bool:
    """One anchor-window feasibility check for the repeated-terms
    unordered path: offset i may use positions in [w+i, w+i+slop];
    offsets of the SAME term need distinct positions (Lucene repeats
    rule), distinct terms may share. Offset 0 is pinned to `fixed0`.
    Greedy in ascending offset order (ascending interval upper bound),
    smallest available position — the exact interval-matching greedy."""
    used: dict = {}
    for i, t in enumerate(terms):
        taken = used.setdefault(t, set())
        if i == 0:
            taken.add(fixed0)
            continue
        lo, hi = w + i, w + i + slop
        j = int(np.searchsorted(pos[t], lo))
        c = None
        while j < len(pos[t]) and pos[t][j] <= hi:
            if int(pos[t][j]) not in taken:
                c = int(pos[t][j])
                break
            j += 1
        if c is None:
            return False
        taken.add(c)
    return True


def _unordered_repeat_freqs(terms: list, skeys: dict, slop: int) -> dict:
    """Unordered sloppy freqs when the phrase REPEATS a term — per-doc
    anchor enumeration (rare query shape; exact). skeys: unique term ->
    sorted composite keys. Returns {cand_idx: freq} where freq counts
    distinct offset-0 positions participating in >=1 valid assignment."""
    by_doc: dict = {t: {} for t in skeys}
    for t, a in skeys.items():
        dpart = a >> np.int64(32)
        ppart = a & np.int64(0xFFFFFFFF)
        cuts = np.flatnonzero(np.diff(dpart)) + 1
        for d_arr, p_arr in zip(np.split(dpart, cuts),
                                np.split(ppart, cuts)):
            by_doc[t][int(d_arr[0])] = p_arr
    docs_all = set.intersection(*(set(by_doc[t]) for t in by_doc))
    freqs: dict = {}
    for d in sorted(docs_all):
        pos = {t: by_doc[t][d] for t in by_doc}
        anchors = sorted({int(p) - i for i, t in enumerate(terms)
                          for p in pos[t]})
        starts: set = set()
        for w in anchors:
            for p0 in pos[terms[0]]:
                p0 = int(p0)
                if p0 < w or p0 > w + slop or p0 in starts:
                    continue
                if _unordered_feasible(terms, pos, w, slop, p0):
                    starts.add(p0)
        if starts:
            freqs[d] = len(starts)
    return freqs


def phrase_matches(postings: dict, terms: list,
                   restrict: tuple[int, int] | None = None,
                   slop: int = 0, ordered: bool = True):
    """All docs matching the phrase → (docs asc, phrase freqs, norms).
    PhraseQuery.cpp:28-225: conjunction on docID, then position verify;
    tf = #start positions.

    slop=0 (reference scorer semantics): pos(term_i) == pos(term_0)+i.
    Vectorized verification: flatten each term's (doc, pos) pairs over
    the candidates into composite keys
    (dense-candidate-index << 32 | position); a phrase start survives
    term i iff key+i exists in term i's key set — one np.isin per term
    instead of a python loop per candidate doc.

    slop>0, ordered=False (unordered Lucene-transposition-style match,
    see query.Phrase): shifted-key window cover — anchors at every
    shifted key, one searchsorted per query offset; repeated terms take
    the exact per-doc interval-matching path (_unordered_repeat_freqs).

    slop>0 (ordered near-match, see query.Phrase): greedy chaining over
    the same composite keys — for each surviving start, the minimal key
    of term i strictly greater than the chain's current key (same doc),
    then a final span check (p_last - p_0) - (n-1) <= slop. Greedy
    minimal-next is exact for existence: it minimizes p_last per start,
    so a start matches iff its greedy chain does. One vectorized
    searchsorted per term — no per-candidate python loop either way."""
    z = np.zeros(0, np.int64)
    if any(t not in postings for t in terms):
        return z, z, z
    # candidates via conjunction
    order = sorted(set(terms), key=lambda t: postings[t].df)
    if restrict is not None:
        cand, _, _ = postings[order[0]].docs_in_range(restrict[0], restrict[1])
    else:
        cand, _, _ = postings[order[0]].decode_all()
    for t in order[1:]:
        if len(cand) == 0:
            return z, z, z
        d, _, _ = postings[t].docs_in_range(int(cand.min()), int(cand.max()))
        cand = np.intersect1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return z, z, z

    lo, hi = int(cand.min()), int(cand.max())
    keys: dict = {}
    norm_docs, norm_vals = [], []
    for t in dict.fromkeys(terms):
        sp = postings[t]
        dl, pl = [], []
        bsel = np.flatnonzero((sp.first <= hi) & (sp.last >= lo))
        for b in bsel:
            d, tf, nn, flat = sp.decode_block_flat(int(b))
            m = np.isin(d, cand, assume_unique=True)
            if not m.any():
                continue
            tf = np.asarray(tf)
            dl.append(np.repeat(d[m], tf[m]))
            pl.append(flat[np.repeat(m, tf)])
            if t == terms[0]:
                norm_docs.append(d[m])
                norm_vals.append(nn[m])
        if not dl:
            return z, z, z
        idx = np.searchsorted(cand, np.concatenate(dl)).astype(np.int64)
        keys[t] = (idx << np.int64(32)) + np.concatenate(pl)

    doc_idx = freqs = None
    if slop == 0:
        surv = keys[terms[0]]
        for i, t in enumerate(terms[1:], start=1):
            surv = surv[np.isin(surv + np.int64(i), keys[t])]
            if len(surv) == 0:
                return z, z, z
    elif ordered:
        # keys are naturally ascending (blocks in doc order, positions
        # ascending within a doc) but greedy chaining REQUIRES sorted
        # lookup arrays — sort defensively (near-sorted, cheap)
        skeys = {t: np.sort(a) for t, a in keys.items()}
        starts = skeys[terms[0]]
        cur = starts
        for t in terms[1:]:
            nxt = skeys[t]
            ins = np.searchsorted(nxt, cur + np.int64(1))
            ok = ins < len(nxt)
            nxt_val = nxt[np.minimum(ins, len(nxt) - 1)]
            ok &= (nxt_val >> np.int64(32)) == (cur >> np.int64(32))
            starts, cur = starts[ok], nxt_val[ok]
            if len(starts) == 0:
                return z, z, z
        surv = starts[(cur - starts) <= np.int64(len(terms) - 1 + slop)]
        if len(surv) == 0:
            return z, z, z
    else:
        # UNORDERED near-match (query.Phrase ordered=False): an
        # assignment of one position per query offset matches iff its
        # SHIFTED positions p_i - i all fit in a window of width slop —
        # Lucene's SloppyPhraseMatcher condition. Anchor candidate
        # windows at every shifted key (every assignment's minimum IS
        # one), keep anchors whose [w, w+slop] covers a key of every
        # offset (one searchsorted per offset); a start p_0 participates
        # iff some surviving anchor's window contains it.
        skeys = {t: np.sort(a) for t, a in keys.items()}
        sl = np.int64(slop)
        if len(skeys) < len(terms):  # repeated term: distinct-position
            fr = _unordered_repeat_freqs(terms, skeys, slop)
            if not fr:
                return z, z, z
            doc_idx = np.array(sorted(fr), np.int64)
            freqs = np.array([fr[int(i)] for i in doc_idx], np.int64)
        else:
            off = np.int64(len(terms))  # keep shifted values positive
            shifted = [skeys[t] - np.int64(i) + off
                       for i, t in enumerate(terms)]
            anchors = np.unique(np.concatenate(shifted))
            okw = np.ones(len(anchors), bool)
            for si in shifted:
                ins = np.searchsorted(si, anchors)
                has = ins < len(si)
                v = si[np.minimum(ins, len(si) - 1)]
                okw &= (has & (v <= anchors + sl)
                        & ((v >> np.int64(32)) == (anchors >> np.int64(32))))
            wins = anchors[okw]
            if len(wins) == 0:
                return z, z, z
            s0 = shifted[0]
            j = np.searchsorted(wins, s0, side="right") - 1
            wj = wins[np.maximum(j, 0)]
            okp = ((j >= 0) & (wj >= s0 - sl)
                   & ((wj >> np.int64(32)) == (s0 >> np.int64(32))))
            surv = s0[okp] - off
            if len(surv) == 0:
                return z, z, z

    if doc_idx is None:
        doc_idx, freqs = np.unique(surv >> np.int64(32), return_counts=True)
    docs = cand[doc_idx]
    nd = np.concatenate(norm_docs)
    nv = np.concatenate(norm_vals)
    norms = nv[np.searchsorted(nd, docs)]
    return docs, freqs.astype(np.int64), norms


def phrase(postings: dict, phrase_params: TermScorerParams,
           terms: list, k: int, f64: bool = False, after=None,
           banned=None, stats_out: dict | None = None, slop: int = 0,
           ordered: bool = True):
    """Phrase top-k (PhraseQuery.cpp:28-34; slop>0 per query.Phrase)."""
    docs, freqs, norms = phrase_matches(postings, terms, slop=slop,
                                        ordered=ordered)
    keep = _mask_banned(docs, banned)
    if keep is not None:
        docs, freqs, norms = docs[keep], freqs[keep], norms[keep]
    if stats_out is not None:
        # `exact` is the TotalHits relation (the COUNT is exact — every
        # matching doc was enumerated, slop or not); `slop` records the
        # evaluation mode so consumers can tell near-match results from
        # exact-phrase ones (ADVICE r4) without conflating the two.
        stats_out.update(total=int(len(docs)), exact=True, slop=int(slop),
                         ordered=bool(ordered or slop == 0))
        _fill_block_stats(stats_out, postings, terms)
    if len(docs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    scores = phrase_params.score(freqs, norms, f64)
    docs, scores = _after_filter(docs, np.asarray(scores, dtype=np.float64),
                                 after)
    return _topk(docs, scores, k)


# ------------------------------------------------------------ query trees


def _est_df(node: dict, postings: dict, aux_sets: dict) -> float:
    """Selectivity estimate for required-clause ordering (rarest first —
    the reference's cost-based lead iterator, BooleanQuery.cpp:63-87)."""
    op = node["op"]
    if op == "term":
        sp = postings.get(node["key"])
        return sp.df if sp is not None else 0
    if op == "phrase":
        dfs = [postings[k].df for k in node["keys"] if k in postings]
        return min(dfs) if len(dfs) == len(node["keys"]) else 0
    if op == "aux":
        return len(aux_sets.get(node["aux"], ()))
    if op == "none":
        return 0
    return float("inf")  # nested boolean: evaluate after cheap leaves


def eval_tree(node: dict, postings: dict, params: dict, aux_sets: dict,
              f64: bool, restrict: tuple[int, int] | None = None):
    """Evaluate a query-tree node → (docs asc, scores). Scores accumulate
    in clause order (float32 mode reference-identical); `restrict` limits
    leaf decode to a candidate docID span."""
    dtype = np.float64 if f64 else np.float32
    empty = (np.zeros(0, np.int64), np.zeros(0, dtype))
    op = node["op"]

    if op == "none":
        return empty
    if op == "term":
        sp = postings.get(node["key"])
        if sp is None:
            return empty
        if restrict is not None:
            d, tf, nn = sp.docs_in_range(restrict[0], restrict[1])
        else:
            d, tf, nn = sp.decode_all()
        return d, np.asarray(params[node["pid"]].score(tf, nn, f64),
                             dtype=dtype)
    if op == "phrase":
        d, freqs, norms = phrase_matches(postings,
                                         [tuple(k) for k in node["keys"]],
                                         restrict,
                                         slop=node.get("slop", 0),
                                         ordered=node.get("ordered", True))
        if len(d) == 0:
            return empty
        return d, np.asarray(params[node["pid"]].score(freqs, norms, f64),
                             dtype=dtype)
    if op == "aux":
        # range / match-all clause: constant-score over an aux doc set
        d = aux_sets.get(node["aux"])
        if d is None or len(d) == 0:
            return empty
        if restrict is not None:
            d = d[(d >= restrict[0]) & (d <= restrict[1])]
        return d, np.full(len(d), node.get("boost", 1.0), dtype=dtype)
    if op != "bool":
        raise ValueError(f"unknown tree op {op!r}")

    must, should = node["must"], node["should"]
    must_not, filt = node["must_not"], node["filter"]
    msm = node.get("msm", 0)

    child: dict = {}  # (occur, i) -> (docs, scores)
    cand = None
    r = restrict

    def _tighten(c):
        return (int(c[0]), int(c[-1])) if len(c) else None

    # required clauses, cheapest first (scoring order stays clause order)
    req = ([("must", i) for i in range(len(must))]
           + [("filter", i) for i in range(len(filt))])
    req.sort(key=lambda oi: _est_df((must if oi[0] == "must" else filt)[oi[1]],
                                    postings, aux_sets))
    for occ, i in req:
        n = (must if occ == "must" else filt)[i]
        d, s = eval_tree(n, postings, params, aux_sets, f64, r)
        child[(occ, i)] = (d, s)
        cand = d if cand is None else np.intersect1d(cand, d,
                                                     assume_unique=True)
        if len(cand) == 0:
            return empty
        r = _tighten(cand)

    if cand is None:
        # no required clauses: candidates = union of SHOULD matches
        if not should:
            return empty
        for i, n in enumerate(should):
            child[("should", i)] = eval_tree(n, postings, params, aux_sets,
                                             f64, restrict)
        parts = [child[("should", i)][0] for i in range(len(should))]
        parts = [p for p in parts if len(p)]
        if not parts:
            return empty
        cand = np.unique(np.concatenate(parts))
        r = _tighten(cand)
    else:
        for i, n in enumerate(should):
            child[("should", i)] = eval_tree(n, postings, params, aux_sets,
                                             f64, r)

    for n in must_not:
        if len(cand) == 0:
            return empty
        d, _ = eval_tree(n, postings, params, aux_sets, f64, _tighten(cand))
        cand = np.setdiff1d(cand, d, assume_unique=True)
    if len(cand) == 0:
        return empty

    # accumulate scores in clause order: MUST..., then SHOULD...
    acc = np.zeros(len(cand), dtype=dtype)
    n_should = np.zeros(len(cand), dtype=np.int32)
    for occ, seq in (("must", must), ("should", should)):
        for i in range(len(seq)):
            d, s = child[(occ, i)]
            if len(d) == 0:
                continue
            idx = np.searchsorted(cand, d)
            hit = idx < len(cand)
            hit[hit] &= cand[idx[hit]] == d[hit]
            acc[idx[hit]] = (acc[idx[hit]]
                             + s[hit].astype(dtype)).astype(dtype)
            if occ == "should":
                n_should[idx[hit]] += 1
    if msm >= 1 and should:
        keep = n_should >= msm
        cand, acc = cand[keep], acc[keep]
    return cand, acc


def eval_tree_topk(node: dict, postings: dict, params: dict, aux_sets: dict,
                   k: int, f64: bool, after=None, banned=None,
                   stats_out: dict | None = None):
    """Tree evaluation + live-docs mask + searchAfter + local top-k."""
    docs, scores = eval_tree(node, postings, params, aux_sets, f64)
    keep = _mask_banned(docs, banned)
    if keep is not None:
        docs, scores = docs[keep], scores[keep]
    if stats_out is not None:
        stats_out.update(total=int(len(docs)), exact=True)
    docs, scores = _after_filter(docs, np.asarray(scores, dtype=np.float64),
                                 after)
    return _topk(docs, scores, k)


def _topk(docs: np.ndarray, scores: np.ndarray, k: int):
    """Collector order: score desc, docID asc (TopScoreDocCollector.cpp:220-221)."""
    if len(docs) == 0:
        return docs, scores
    order = np.lexsort((docs, -scores))
    order = order[:k]
    return docs[order], scores[order]
