"""Binary vector index — sign quantization + Hamming-distance search.

FAISS-family superset surface (``faiss::IndexBinaryFlat`` +
``IndexRefineFlat`` semantics re-expressed on Spark): the reference's
flat index stores only FP32/FP16/BF16
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47 — a
``faiss::Index`` subclass, no binary tier), so binary codes extend its
storage-format family downward: 1 bit/dim, 32× smaller than FP32.

Layout: sign bits (x > 0 → 1) packed 32 dims per BIGINT word — dim
``w*32 + j`` lands at bit ``31 - j`` of word ``w`` (the fold is
``acc*2 + bit``, so the first dim in a word is its MSB). 32 bits per
64-bit slot keeps every packed word non-negative, which matters twice:
Spark and DuckDB agree on the value with no signed wrap (DuckDB raises
on BIGINT overflow, so a 64-bit pack could not be oracle-checked), and
``bit_count`` never touches a sign bit. Dims past ``d`` in the last
word read as NULL (``try_element_at`` here, native list indexing in
DuckDB) → ``NULL > 0`` is not true → 0 on both engines, so any ``d``
works.

Everything is a Catalyst expression inside whole-stage codegen: packing
is a ``transform``/``aggregate`` fold, distance is a ``zip_with`` of
``bit_count(xor)`` summed over the word arrays. No Python executes per
row anywhere on this path.

Scale: identical shape to ``knn_search``'s declarative path — broadcast
the query batch, one scan of the packed table (d/8 bytes per row vs 4d
for FP32), per-partition partial top-k under the window aggregation, no
vector shuffle. ``hamming_refine`` is the two-stage 100 TB pattern:
Hamming prefilter at 1 bit/dim over the whole corpus, exact rescore via
broadcast-join fetch of only the ``nq·k·refine_factor`` candidate
full-precision rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 32


def _rank_topk(
    scored: DataFrame,
    k: int,
    corpus: DataFrame | None = None,
    distance_cast: str | None = "long",
) -> DataFrame:
    """Shared finalize for every binary-tier top-k: route (qid, label,
    distance) candidates through :func:`knn._finalize`'s one-shuffle
    merge (``pad=False`` — the binary contract is min(k, candidates)
    rows per qid, no sentinels; ascending distance, ties by ascending
    label). Passing the ``corpus`` frame applies the same salted
    premerge gate ``knn_search`` uses: past parts·k structs per final
    group, a bounded partial merge runs first, so one hot qid never
    lands its whole candidate set in a single task — the two-phase
    shape of /root/reference/shaders/block_select.metal:130-177."""
    from .knn import _PREMERGE_PARTS_K, _PREMERGE_SALT, _finalize

    salt = None
    if corpus is not None:
        try:
            parts = corpus.rdd.getNumPartitions()
        except Exception:  # pragma: no cover — exotic plans; skip the gate
            parts = None
        if parts is not None and parts * k > _PREMERGE_PARTS_K:
            salt = _PREMERGE_SALT
    return _finalize(
        None, scored, k, "l2",
        premerge_salt=salt, pad=False, distance_cast=distance_cast,
    )


def binarize_col(vec: Column | str, d: int) -> Column:
    """Pack the sign bits of a ``d``-dim float array into
    ``ceil(d/32)`` non-negative BIGINT words (see module docstring for
    the bit layout)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    nwords = (d + BITS_PER_WORD - 1) // BITS_PER_WORD
    return F.transform(
        F.sequence(F.lit(0), F.lit(nwords - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(BITS_PER_WORD - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc * F.lit(2)
            + F.when(
                F.try_element_at(v, w * BITS_PER_WORD + j + F.lit(1)) > 0, F.lit(1)
            ).otherwise(F.lit(0)),
        ),
    )


def hamming_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length packed word arrays:
    Σ_w bit_count(a[w] XOR b[w])."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def binarize(
    df: DataFrame, d: int, id_col: str = "id", vec_col: str = "vec"
) -> DataFrame:
    """(id, vec) → (id, words): the stored form of the binary index."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        binarize_col(vec_col, d).alias("words"),
    )


def hamming_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    d: int,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    packed: bool = False,
) -> DataFrame:
    """Exact Hamming top-k over sign-binarized vectors
    (``IndexBinaryFlat::search`` semantics: ascending distance, ties by
    ascending label, rank 0-based). Returns
    (qid, rank, label, distance: long). ``packed=True`` means the
    corpus side already holds :func:`binarize` words in ``vec_col``
    (the stored-index form); otherwise the pack is a projection fused
    into the scan stage. Queries are always float vectors.
    """
    v = vectors.select(
        F.col(id_col).cast("long").alias("label"),
        (F.col(vec_col) if packed else binarize_col(vec_col, d)).alias("_vw"),
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        binarize_col(qvec_col, d).alias("_qw"),
    )
    joined = (
        F.broadcast(q)
        .crossJoin(v)
        .select("qid", "label", hamming_expr(F.col("_qw"), F.col("_vw")).alias("distance"))
    )
    return _rank_topk(joined, k, corpus=vectors)


def hamming_refine(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    d: int,
    refine_factor: int = 4,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """Two-stage retrieval: Hamming prefilter to ``k·refine_factor``
    candidates, exact L2 rescore of only those rows, re-ranked top-k —
    ``IndexBinaryFlat`` feeding ``IndexRefineFlat``. The corpus-sized
    scan touches 1 bit/dim; full-precision vectors are fetched for
    candidates only, through broadcast joins (the big table never
    shuffles)."""
    from ..functions.vector import l2sq

    cand = hamming_knn(
        vectors, queries, k * refine_factor, d, id_col, vec_col, qid_col, qvec_col
    ).select("qid", "label")
    vv = vectors.select(
        F.col(id_col).cast("long").alias("label"), F.col(vec_col).alias("_vvec")
    )
    qq = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("_qvec")
    )
    rescored = (
        F.broadcast(cand)
        .join(vv, "label")
        .join(F.broadcast(qq), "qid")
        .select(
            "qid", "label", l2sq(F.col("_qvec"), F.col("_vvec")).alias("distance")
        )
    )
    # candidates are nq·k·refine_factor-bounded — no salt gate needed;
    # distances are exact L2 doubles, not Hamming longs
    return _rank_topk(rescored, k, corpus=None, distance_cast=None)


# ---------------------------------------------------------------------------
# Binary IVF (faiss IndexBinaryIVF): Hamming coarse quantizer over the
# packed words — assignment, probe ranking and in-cell search are ALL
# Catalyst integer expressions (no Python per row anywhere), so the
# whole tier is engine-exact and SQL-oracle-expressible.
# ---------------------------------------------------------------------------


def _lit_words(row) -> Column:
    return F.array(*[F.lit(int(w)) for w in row])


def _cell_structs(wcol: Column, centroid_words) -> list[Column]:
    """Per-cell (hamming, cell) structs — struct ordering is
    lexicographic, so min/sort break Hamming ties by ascending cell id
    (the faiss coarse-assignment tie rule)."""
    return [
        F.struct(
            hamming_expr(wcol, _lit_words(cw)).alias("h"),
            F.lit(int(c)).alias("cell"),
        )
        for c, cw in enumerate(centroid_words)
    ]


def binary_cell_col(words: Column | str, centroid_words) -> Column:
    """Nearest-centroid cell id by Hamming distance (ties → lower id)."""
    wcol = F.col(words) if isinstance(words, str) else words
    return F.array_min(F.array(*_cell_structs(wcol, centroid_words)))["cell"]


def binary_ivf_assign(
    words_df: DataFrame, centroid_words, words_col: str = "words"
) -> DataFrame:
    """Add ``cell`` = Hamming-nearest binary centroid (one scan, no
    shuffle; the n_cells·nwords centroid table rides as plan literals)."""
    return words_df.withColumn(
        "cell", binary_cell_col(words_col, centroid_words)
    )


def _binary_probed_pairs(
    inv: DataFrame,
    centroid_words,
    queries: DataFrame,
    nprobe: int,
    d: int,
    id_col: str = "id",
    words_col: str = "words",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """(qid, label, distance) Hamming pairs over the ``nprobe`` probed
    cells — the shared probe stage of IndexBinaryIVF search and
    range_search: query side binarizes, ranks ALL cells with one
    ``array_sort`` over (hamming, cell) structs, slices its probe list
    and explodes to (qid, cell); that small side broadcast-joins the
    inverted file on ``cell`` (equi-join → dynamic partition pruning on
    a cell-partitioned store)."""
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        binarize_col(qvec_col, d).alias("_qw"),
    )
    probed = q.select(
        "qid",
        "_qw",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(F.array(*_cell_structs(F.col("_qw"), centroid_words))),
                    1,
                    int(nprobe),
                ),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )
    v = inv.select(
        F.col(id_col).cast("long").alias("label"),
        F.col(words_col).alias("_vw"),
        "cell",
    )
    return (
        F.broadcast(probed)
        .join(v, "cell")
        .select(
            "qid", "label", hamming_expr(F.col("_qw"), F.col("_vw")).alias("distance")
        )
    )


def hamming_range_search(
    vectors: DataFrame,
    queries: DataFrame,
    radius: int,
    d: int,
    id_col: str = "id",
    vec_col: str = "vec",
    qid_col: str = "qid",
    qvec_col: str = "vec",
    packed: bool = False,
) -> DataFrame:
    """All stored words with Hamming distance STRICTLY below ``radius``
    — faiss ``IndexBinaryFlat::range_search`` (its keep rule is
    ``dis < radius``). Returns (qid, label, distance: long), unordered
    — no rank, no sentinel rows, matching the float ``range_search``
    contract.

    One broadcast-nested-loop scan of the word table; the integer
    filter runs inside whole-stage codegen, so output volume (bounded
    by the radius) is the only cost beyond the scan — no shuffle, no
    Python stage."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("label"),
        (F.col(vec_col) if packed else binarize_col(vec_col, d)).alias("_vw"),
    )
    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        binarize_col(qvec_col, d).alias("_qw"),
    )
    return (
        F.broadcast(q)
        .crossJoin(v)
        .select(
            "qid", "label", hamming_expr(F.col("_qw"), F.col("_vw")).alias("distance")
        )
        .where(F.col("distance") < int(radius))
    )


def binary_ivf_range_search(
    inv: DataFrame,
    centroid_words,
    queries: DataFrame,
    radius: int,
    nprobe: int,
    d: int,
    id_col: str = "id",
    words_col: str = "words",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """faiss ``IndexBinaryIVF::range_search``: the Hamming radius
    filter applied over the probed cells — exact within cell coverage
    (full probe ≡ :func:`hamming_range_search`), a subset under partial
    probes, never a false positive. Same unordered (qid, label,
    distance: long) contract as the flat variant."""
    return _binary_probed_pairs(
        inv, centroid_words, queries, nprobe, d, id_col, words_col, qid_col, qvec_col
    ).where(F.col("distance") < int(radius))


def binary_ivf_search(
    inv: DataFrame,
    centroid_words,
    queries: DataFrame,
    k: int,
    nprobe: int,
    d: int,
    id_col: str = "id",
    words_col: str = "words",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """IndexBinaryIVF::search — probe the ``nprobe`` Hamming-nearest
    cells per query, exact Hamming top-k within (ascending distance,
    ties by label, rank 0-based; min(k, probed rows) results).

    Fully declarative single job: the query side binarizes, ranks ALL
    cells with one ``array_sort`` over (hamming, cell) structs, slices
    its probe list and explodes to (qid, cell); that small side
    broadcast-joins the inverted file on ``cell`` — an equi-join, so a
    cell-partitioned store gets dynamic partition pruning — and the
    window top-k finishes per query. No driver collect, no Python
    stage; probe ranking is integer-exact, so results are
    engine-reproducible bit-for-bit.
    """
    joined = _binary_probed_pairs(
        inv, centroid_words, queries, nprobe, d, id_col, words_col, qid_col, qvec_col
    )
    return _rank_topk(joined, k, corpus=inv)


def unpack_words_np(W, d: int) -> "np.ndarray":
    """Inverse of the :func:`binarize_np` bit layout: (n, ceil(d/32))
    packed words → (n, d) float64 0/1 bit matrix (dim w·32+j reads bit
    31−j of word w). Squared L2 between two unpacked rows equals their
    packed Hamming distance exactly — the identity that lets the graph
    family's float machinery (nn_descent build, graph_search serving)
    run over binary storage (faiss IndexBinaryHNSW)."""
    import numpy as np

    W = np.atleast_2d(np.asarray(W, np.int64))
    n, nw = W.shape
    shifts = np.arange(BITS_PER_WORD - 1, -1, -1, dtype=np.int64)
    bits = (W[:, :, None] >> shifts) & 1  # (n, nw, 32)
    return bits.reshape(n, nw * BITS_PER_WORD)[:, :d].astype(np.float64)


def binarize_np(X) -> "np.ndarray":
    """numpy twin of :func:`binarize_col` for host-side arrays
    (centroids): (n, d) float → (n, ceil(d/32)) int64 packed words,
    bit-identical to the Catalyst pack (dim w·32+j → bit 31−j of
    word w, x > 0 → 1)."""
    import numpy as np

    X = np.atleast_2d(np.asarray(X))
    n, d = X.shape
    nwords = (d + BITS_PER_WORD - 1) // BITS_PER_WORD
    bits = (X > 0).astype(np.int64)
    pad = np.zeros((n, nwords * BITS_PER_WORD - d), np.int64)
    grouped = np.concatenate([bits, pad], axis=1).reshape(n, nwords, BITS_PER_WORD)
    weights = (np.int64(1) << np.arange(BITS_PER_WORD - 1, -1, -1, dtype=np.int64))
    return (grouped * weights).sum(axis=2)


# ---------------------------------------------------------------------------
# Binary hash index (faiss IndexBinaryHash / IndexBinaryMultiHash):
# bucket = b sign bits read straight off the vector (slice i covers
# dims [i·b, (i+1)·b)), candidates = stored rows sharing a probed
# bucket, rerank = exact full-width Hamming. Everything after the
# host-side probe-set enumeration (nq·C(b,≤nflip) rows — query-batch
# sized) is Catalyst: bucket extraction is the binarize_col fold over
# a dim slice, candidate fetch a broadcast equi-join on the bucket
# (partition-prunable when the store is written partitionBy bucket),
# rerank the packed bit_count(xor) in whole-stage codegen.
# ---------------------------------------------------------------------------


def sign_prefix_col(vec: Column | str, start: int, b: int) -> Column:
    """MSB-first integer of the ``b`` sign bits at dims
    [start, start+b) — the bucket key of IndexBinaryHash (slice 0) and
    IndexBinaryMultiHash (slice i at start = i·b)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(b - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc * F.lit(2)
        + F.when(
            F.try_element_at(v, F.lit(start + 1) + j) > 0, F.lit(1)
        ).otherwise(F.lit(0)),
    )


def sign_prefix_np(X, start: int, b: int) -> "np.ndarray":
    """numpy twin of :func:`sign_prefix_col` (bit-identical)."""
    import numpy as np

    X = np.atleast_2d(np.asarray(X))
    bits = (X[:, start : start + b] > 0).astype(np.int64)
    weights = np.int64(1) << np.arange(b - 1, -1, -1, dtype=np.int64)
    return (bits * weights).sum(axis=1)


def _flip_set(code: int, b: int, nflip: int) -> list[int]:
    """All b-bit codes within Hamming distance ≤ nflip of ``code`` —
    the probe set of IndexBinaryHash's increasing-radius scan, made
    explicit (C(b, ≤nflip) codes; callers keep nflip small)."""
    from itertools import combinations

    out = [int(code)]
    for r in range(1, nflip + 1):
        for pos in combinations(range(b), r):
            flipped = int(code)
            for p in pos:
                flipped ^= 1 << p
            out.append(flipped)
    return out


def _binary_hash_scored(
    hashed: DataFrame,
    queries: DataFrame,
    d: int,
    b: int,
    nflip: int,
    n_slices: int,
    id_col: str,
    words_col: str,
    qid_col: str,
    qvec_col: str,
) -> DataFrame | None:
    """Shared probe+rescore stage of IndexBinaryHash search and
    range_search: exact full-width Hamming (qid, label, distance: long)
    pairs over the hash-probed candidate set. Returns None for an
    empty query batch.

    Probe sets are enumerated host-side from the query batch (bounded:
    nq·C(b,≤nflip) rows) and broadcast against the per-slice bucket
    columns. The RESULTING candidate set, though, is
    corpus-occupancy-bounded — bucket membership scales with ntotal,
    not with k — so it is NEVER broadcast: the words fetch is a
    shuffle-hash equi-join on ``label`` (candidates build-side; both
    sides shuffle on an 8-byte key, no sort, no driver collect)."""
    import numpy as np
    import pandas as pd

    spark = hashed.sparkSession
    qpdf = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
    ).toPandas()
    if len(qpdf) == 0:
        return None
    Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    qids = qpdf["qid"].to_numpy(np.int64)

    probe_frames = []
    for s in range(n_slices):
        hq = sign_prefix_np(Q, s * b, b)
        rows = [
            (int(qid), int(code))
            for qid, h in zip(qids, hq)
            for code in _flip_set(int(h), b, nflip)
        ]
        pf = spark.createDataFrame(
            pd.DataFrame(rows, columns=["qid", f"h{s}"]), f"qid long, h{s} long"
        )
        v = hashed.select(
            F.col(id_col).cast("long").alias("label"), f"h{s}"
        )
        probe_frames.append(F.broadcast(pf).join(v, f"h{s}").select("qid", "label"))
    cand = probe_frames[0]
    for pf in probe_frames[1:]:
        cand = cand.unionByName(pf)
    cand = cand.distinct()

    q = queries.select(
        F.col(qid_col).cast("long").alias("qid"),
        binarize_col(qvec_col, d).alias("_qw"),
    )
    v = hashed.select(
        F.col(id_col).cast("long").alias("label"), F.col(words_col).alias("_vw")
    )
    return (
        cand.hint("shuffle_hash")
        .join(v, "label")
        .join(F.broadcast(q), "qid")
        .select(
            "qid", "label", hamming_expr(F.col("_qw"), F.col("_vw")).alias("distance")
        )
    )


def binary_hash_search(
    hashed: DataFrame,
    queries: DataFrame,
    k: int,
    d: int,
    b: int,
    nflip: int = 0,
    n_slices: int = 1,
    id_col: str = "id",
    words_col: str = "words",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """Hash-probed Hamming top-k (faiss ``IndexBinaryHash::search``
    semantics at radius nflip; ``n_slices > 1`` is
    ``IndexBinaryMultiHash``: candidates are the UNION over slices of
    same-bucket rows, the LSH-band OR-construction over sign bits).

    ``hashed`` carries packed ``words`` plus bucket columns ``h0..``
    (:func:`binary_hash_table`). Candidates are rescored by exact
    full-width Hamming — distances are EXACT for every returned row;
    partial coverage only bounds which rows are seen (never a false
    positive, the IVF-probe contract). Returns (qid, rank, label,
    distance). The candidate fetch is a shuffle-hash join and the
    rerank runs through :func:`_rank_topk`'s salted premerge gate —
    bucket occupancy scales with the corpus, so neither side of this
    path may assume candidates fit on the driver (see
    :func:`_binary_hash_scored`).
    """
    scored = _binary_hash_scored(
        hashed, queries, d, b, nflip, n_slices, id_col, words_col, qid_col, qvec_col
    )
    if scored is None:
        from .knn import RESULT_SCHEMA

        return hashed.sparkSession.createDataFrame([], RESULT_SCHEMA)
    return _rank_topk(scored, k, corpus=hashed)


def binary_hash_range_search(
    hashed: DataFrame,
    queries: DataFrame,
    radius: int,
    d: int,
    b: int,
    nflip: int = 0,
    n_slices: int = 1,
    id_col: str = "id",
    words_col: str = "words",
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """faiss ``IndexBinaryHash::range_search``: Hamming distance
    STRICTLY below ``radius`` over the hash-probed candidates — exact
    within bucket coverage, never a false positive. Unordered
    (qid, label, distance: long), no rank, no sentinels — the
    :func:`hamming_range_search` contract.

    This is a true range path: the radius filter applies directly to
    the probed candidate pairs inside whole-stage codegen — no Window,
    no top-k ranking, no per-qid fan-in — unlike a k=ntotal search
    followed by a filter, which ranks every candidate first."""
    scored = _binary_hash_scored(
        hashed, queries, d, b, nflip, n_slices, id_col, words_col, qid_col, qvec_col
    )
    if scored is None:
        return hashed.sparkSession.createDataFrame(
            [], "qid long, label long, distance long"
        )
    return scored.where(F.col("distance") < int(radius))


def binary_hash_table(
    vectors: DataFrame,
    d: int,
    b: int,
    n_slices: int = 1,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, words, h0[, h1, ...]) — packed codes plus per-slice bucket
    keys, one scan, no shuffle (the stored form of IndexBinaryHash /
    IndexBinaryMultiHash; write partitionBy("h0") to turn bucket
    probes into directory pruning)."""
    if b <= 0 or n_slices <= 0 or n_slices * b > d:
        raise ValueError(f"need 0 < n_slices·b ≤ d, got {n_slices}·{b} vs d={d}")
    cols = [
        F.col(id_col).cast("long").alias("id"),
        binarize_col(vec_col, d).alias("words"),
    ]
    cols += [
        sign_prefix_col(vec_col, s * b, b).alias(f"h{s}") for s in range(n_slices)
    ]
    return vectors.select(*cols)
