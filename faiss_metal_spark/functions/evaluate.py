"""Retrieval-quality evaluation: recall@k for approximate indexes.

Every ANN structure in this repo (LSH, IVF, PQ/OPQ, binary, SQ8,
NN-Descent) trades recall for cost; production pipelines monitor that
trade continuously against an exact-search sample. This is the
monitoring operator: join an approximate result set against the exact
one and report per-query and aggregate recall — one equi-join on
(qid, label) plus two aggregations, all JVM-side.

Contract: both inputs are result DataFrames in this repo's standard
shape — at least (qid, label) with rank < k rows per query (sentinel
rows with label < 0 are ignored). Recall@k for a query = |approx ∩
exact| / |exact| over each side's top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int | None = None,
    qid_col: str = "qid",
    label_col: str = "label",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall: (qid, n_exact, n_hit, recall). Truncates both
    sides to ``rank < k`` when ``k`` is given (pass None for inputs
    already cut to the k of interest)."""

    def side(df: DataFrame) -> DataFrame:
        out = df.where(F.col(label_col) >= 0)
        if k is not None:
            out = out.where(F.col(rank_col) < k)
        return out.select(
            F.col(qid_col).alias("qid"), F.col(label_col).alias("label")
        ).distinct()

    a, e = side(approx), side(exact)
    hits = a.join(e, ["qid", "label"], "inner").groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    totals = e.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        totals.join(hits, "qid", "left")
        .select(
            "qid",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact")
            ).alias("recall"),
        )
    )


def mean_recall(approx: DataFrame, exact: DataFrame, k: int | None = None) -> float:
    """Aggregate recall over all queries (an action)."""
    per_q = recall_at_k(approx, exact, k)
    row = per_q.agg(F.avg("recall")).collect()[0]
    return float(row[0]) if row[0] is not None else 0.0


def tune_nprobe(
    index,
    queries: DataFrame,
    k: int,
    target_recall: float = 0.95,
    nprobes: list[int] | None = None,
) -> dict:
    """Pick the smallest nprobe meeting ``target_recall`` — the
    ParameterSpace/OperatingPoints workflow FAISS users run before
    deploying an IVF index, over this repo's IVFIndex/IVFPQIndex.

    The baseline is the index's own full probe (``nprobe = nlist``):
    for IVFFlat that is exact search; for IVFPQ it is the ADC ceiling,
    so the sweep isolates exactly the loss nprobe controls (coarse-
    quantizer misses), not the quantization error nprobe cannot fix.

    Sweeps doubling nprobe values (or the given list, ascending),
    stopping at the first that meets the target; the full-probe
    baseline runs once. Returns ``{"nprobe": chosen, "points":
    [{"nprobe": p, "recall": r}, ...]}`` — the measured operating
    curve, so callers can log it. Cost: one search per probed point
    over the (sampled) query set — run it on a query sample, not the
    production feed.
    """
    nlist = index.nlist
    if nprobes is None:
        nprobes, p = [], 1
        while p < nlist:
            nprobes.append(p)
            p *= 2
    nprobes = sorted(set(int(p) for p in nprobes if 1 <= p < nlist))
    exact = index.search(queries, k, nprobe=nlist).persist()
    exact.count()
    points = []
    chosen = nlist
    try:
        for p in nprobes:
            r = mean_recall(index.search(queries, k, nprobe=p), exact)
            points.append({"nprobe": p, "recall": r})
            if r >= target_recall:
                chosen = p
                break
        else:
            points.append({"nprobe": nlist, "recall": 1.0})
    finally:
        exact.unpersist()
    return {"nprobe": chosen, "points": points}


def tune_polysemous_ht(
    index,
    queries: DataFrame,
    k: int,
    target_recall: float = 0.95,
    hts: list[int] | None = None,
) -> dict:
    """Pick the smallest polysemous Hamming threshold meeting
    ``target_recall`` — faiss's ParameterSpace sweep over
    ``polysemous_ht`` (IndexPQ ST_polysemous), over this repo's
    :class:`PQIndex` after :meth:`polysemous_train`.

    Baseline = the index's own plain ADC search (``ht`` unset): the
    filter can only DROP candidates, so recall vs that baseline
    isolates exactly the loss ht controls. Sweeps ascending ht values
    (default: multiples of m·nbits/8 up to half the code width — the
    useful region; faiss defaults to ht = nbits·m/2 too), stopping at
    the first that meets the target; the gate is STRICT (hd < ht, like
    faiss), so the accept-all fallback is ``m·nbits + 1`` — faiss
    IndexPQ's own polysemous_ht default. Returns ``{"ht": chosen,
    "points": [{"ht": h, "recall": r}, ...]}``. Cost: one search per
    probed point over the (sampled) query set."""
    m = int(index.codebooks.shape[0])
    bits = m * index.nbits
    if hts is None:
        step = max(bits // 8, 1)
        hts = list(range(step, bits // 2 + 1, step))
    # bits+1 is a legal user-supplied probe point: the strict gate's
    # accept-all value (hd < bits+1 admits everything)
    hts = sorted(set(int(h) for h in hts if 0 <= h <= bits + 1))
    exact = index.search(queries, k).persist()
    exact.count()
    points = []
    chosen = bits + 1
    try:
        for h in hts:
            r = mean_recall(index.search(queries, k, ht=h), exact)
            points.append({"ht": h, "recall": r})
            if r >= target_recall:
                chosen = h
                break
        else:
            points.append({"ht": bits + 1, "recall": 1.0})
    finally:
        exact.unpersist()
    return {"ht": chosen, "points": points}


def explore_operating_points(
    index,
    queries: DataFrame,
    k: int,
    param_grid: dict[str, list],
    exact: DataFrame | None = None,
    runs: int = 1,
) -> list[dict]:
    """General ``faiss::ParameterSpace::explore`` + ``OperatingPoints``
    analog: sweep every combination of the given search-kwarg grid
    (e.g. ``{"nprobe": [1, 2, 4], "ht": [9, 17]}``), measure recall@k
    against the exact answer and wall seconds per search call, and mark
    the Pareto-optimal points — the set faiss keeps in
    ``OperatingPoints::optimal`` (no other point is both faster AND
    more accurate).

    ``exact`` defaults to the index's own ceiling when it exposes a
    full-probe knob (``nlist``), else it must be supplied (e.g. a flat
    ``knn_search`` result) — passing the ceiling rather than the true
    exact answer isolates exactly the loss the swept knobs control,
    the ``tune_nprobe`` discipline.

    Returns points sorted fastest-first:
    ``[{"params": {...}, "recall": r, "sec": s, "optimal": bool}]``.
    Cost: ``runs`` searches per grid point over the query set — run on
    a query SAMPLE, not the production feed.
    """
    import itertools
    import time

    if exact is None:
        if not hasattr(index, "nlist"):
            raise ValueError(
                "explore_operating_points: pass exact= for indexes "
                "without a full-probe ceiling (no .nlist)"
            )
        exact = index.search(queries, k, nprobe=index.nlist)
    exact = exact.persist()
    exact.count()
    names = sorted(param_grid)
    points = []
    try:
        for combo in itertools.product(*(param_grid[n] for n in names)):
            kw = dict(zip(names, combo))
            best = float("inf")
            for _ in range(max(1, int(runs))):
                # fresh plan per run, NO persist in the timed region:
                # persisting every run both leaked cache entries (only
                # the last was released) and let later runs read the
                # cache instead of searching
                t0 = time.perf_counter()
                index.search(queries, k, **kw).count()
                best = min(best, time.perf_counter() - t0)
            res = index.search(queries, k, **kw).persist()
            try:
                r = mean_recall(res, exact)
            finally:
                res.unpersist()
            points.append({"params": kw, "recall": r, "sec": round(best, 4)})
    finally:
        exact.unpersist()
    points.sort(key=lambda p: (p["sec"], -p["recall"]))
    # Pareto: keep points no other point dominates in (sec, recall) —
    # after the fastest-first sort a point is optimal iff its recall
    # strictly exceeds every faster point's recall (ties lose to the
    # faster member, faiss's OperatingPoints pruning)
    best_r = -1.0
    for p in points:
        p["optimal"] = p["recall"] > best_r
        if p["recall"] > best_r:
            best_r = p["recall"]
    return points
