"""Deduplication operators for training-data pipelines.

North-star extensions (not in the reference — SURVEY §2.9): exact
dedup, MinHash+LSH near-dedup, SimHash, n-gram Jaccard similarity join,
and embedding-cosine near-dup. All shapes are shuffle-disciplined for
100 TB corpora:

- exact dedup       — one hash-groupBy on a 32-byte digest (map-side
                      partial aggregation; no raw-text shuffle).
- MinHash signatures — explode shingles → groupBy(doc) with min() aggs:
                      Spark's partial+final aggregation keeps the
                      shuffle at one row per (doc, shingle-hash) after
                      map-side combine; signatures are tiny.
- LSH candidates    — self-equi-join on (band, band-hash) buckets; the
                      join key is a digest so skew only appears when
                      *real* duplicate clusters exist (AQE skew-join
                      handles the pathological all-identical case).
- cosine near-dup   — block on a caller key (e.g. cluster/label) and
                      equi-join within blocks: turns an O(n²) theta
                      join into per-block products.

Hashing is md5-based (not murmur3) so every pipeline here has an exact
cross-engine SQL oracle — determinism is part of the operator contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..functions.vector import cosine_sim


def exact_dedup(
    df: DataFrame, key: Column, id_col: str = "doc_id", keep: str = "min"
) -> DataFrame:
    """Group rows by a content key; emit one keeper id + group size.

    Returns (dup_key, n_dups, keeper) for groups with >1 member.
    """
    agg_keep = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n_dups"), agg_keep.alias("keeper"))
        .where(F.col("n_dups") > 1)
    )


def segment_col(text_col: str = "text", window: int = 20) -> Column:
    """The fixed-``window``-token segment array of a document — the ONE
    statement of segmentation shared by batch :func:`segment_dedup` and
    the streaming variant so the two can never disagree on boundaries.
    The trailing (<window)-token remainder is kept."""
    return F.expr(
        f"transform(sequence(0, int((size(split({text_col}, ' ')) - 1) / {int(window)})),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i * {int(window)} + 1, {int(window)})))"
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    keep: str = "min",
) -> DataFrame:
    """Sub-document (paragraph/segment) exact dedup: split each doc's
    token stream into fixed ``window``-token segments and dedup the
    segments corpus-wide — the granularity that catches repeated
    boilerplate (headers, footers, license blocks) that whole-document
    dedup misses. Returns (dup_key = segment text, n_dups, keeper).

    Scale shape: one explode (O(total tokens / window) rows) into the
    same digest groupBy as :func:`exact_dedup` — map-side combined, no
    second scan; the shuffled row is the segment text + two longs. For
    very long segments, wrap ``dup_key`` in ``xxhash64`` upstream of a
    verify join (the IVFFlatDedup digest discipline) — at the default
    window the raw text is already shuffle-cheap. The trailing segment
    is the (<window)-token remainder, kept: boilerplate tails matter.
    """
    seg = F.explode(segment_col(text_col, window)).alias("segment")
    return exact_dedup(
        df.select(id_col, seg), F.col("segment"), id_col=id_col, keep=keep
    )


def minhash_signature_cols(shingle_col: Column, num_hashes: int) -> list[Column]:
    """num_hashes min-hash columns over an exploded shingle column.

    Each md5 digest is carved into four independent 8-hex-char lanes, so
    H signatures cost ⌈H/4⌉ md5 evaluations per shingle instead of H —
    at corpus scale the hash is the dominant per-row cost of signature
    building. Lexicographic min over fixed-width hex substrings is a
    proper min-hash family and orders identically in any engine.
    """
    cols = []
    for i in range(num_hashes):
        digest, lane = divmod(i, 4)
        h = F.md5(shingle_col) if digest == 0 else F.md5(
            F.concat(shingle_col, F.lit("#" * digest))
        )
        cols.append(F.min(F.substring(h, 8 * lane + 1, 8)).alias(f"mh{i}"))
    return cols


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, mh0..mh{H-1}) — docs with < shingle_size tokens drop out."""
    sh = (
        docs.select(F.col(id_col), F.explode(shingles(text_col, shingle_size)).alias("sh"))
    )
    return sh.groupBy(id_col).agg(*minhash_signature_cols(F.col("sh"), num_hashes))


def lsh_band_buckets(
    signatures: DataFrame, id_col: str = "doc_id", num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """(id, band, bkey) band-bucket projection of a signature table.

    Band key = md5 of the concatenated signature slice, so the join key
    is a fixed-width digest regardless of H. This is also the persisted
    LSH state for incremental dedup: keep it as the corpus's band index
    (bucketed/partitioned on ``bkey``) and daily deltas join against it
    without recomputing a single corpus signature.
    """
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*cols)).alias("bkey"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band."""
    buckets = lsh_band_buckets(signatures, id_col, num_hashes, bands)

    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bkey") == F.col(f"b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _md5_val32(col: Column) -> Column:
    """First 32 bits of md5 as a BIGINT — the cross-engine hash value.

    md5 is used (not xxhash/murmur) so DuckDB reproduces the exact
    integer; conv(hex, 16, 10) decodes the first 8 hex chars.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash: bit b of the signature is the sign of
    Σ_tokens (±1) where +1 iff bit b of hash(token) is set.

    Near-identical documents differ in few tokens, so their per-bit sums
    — and therefore signatures — are close in Hamming distance. One
    explode + one groupBy: Spark's map-side combine keeps the shuffle at
    one partial-sum row per (doc, partition), and the 32 CASE-sums are
    a single whole-stage-codegen aggregation (no Python).
    """
    from ..functions.text import tokens

    val = _md5_val32(F.col("t"))
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(val, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_band_buckets(
    signatures: DataFrame, id_col: str = "doc_id", bits: int = 32, bands: int = 4
) -> DataFrame:
    """(id, simhash, band, bkey) bit-slice buckets of a SimHash table —
    the persisted SimHash state for incremental dedup (the signature
    rides along so delta joins can verify exact Hamming distance
    without refetching the corpus)."""
    bw = bits // bands
    mask = (1 << bw) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * bw).bitwiseAND(F.lit(mask)).alias("bkey"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def simhash_neardup_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation is the standard banding trick: split the
    signature into ``bands`` bit-slices and equi-join on (band, slice) —
    any pair within Hamming ≤ bands−1 shares at least one exact band
    (pigeonhole), so with default 4 bands radius ≤ 3 has full recall and
    the verify step re-filters with the exact bit_count. No cross
    product is ever formed; the join key is a small int, and skew only
    appears for genuinely duplicate-heavy corpora (AQE handles it).
    """
    buckets = simhash_band_buckets(signatures, id_col, bits, bands)

    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pair_candidates: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    threshold: float = 0.0,
    max_df: int | None = 10_000,
    materialize_shingles: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Without explicit candidates, compares all pairs that share ≥1
    shingle (the shared-shingle join IS the candidate generation — no
    full cross product is ever formed, which is what makes this viable
    on large corpora).
    Returns (id_a, id_b, jaccard).

    ``max_df`` caps the document frequency a shingle may have and still
    participate: one boilerplate shingle shared by n docs would
    otherwise contribute n² rows to the self-join — the quadratic
    blowup that kills a 100 TB run. Shingles above the cutoff are
    excluded from the similarity DEFINITION (both the intersection and
    the per-doc set sizes), so the result is exactly the Jaccard of the
    filtered shingle sets and any engine (see the SQL oracle) computes
    the identical value. High-DF shingles carry almost no similarity
    signal, so the filtered Jaccard tracks the unfiltered one closely.
    ``max_df=None`` disables the cutoff.

    Shingle strings are hashed to int64 before the self-join: the
    shuffle moves 8-byte keys instead of n-word strings and the join
    compares longs. A 64-bit collision (≈ p·2⁻⁶⁴ per pair) would
    overcount one intersection — negligible against the corpus sizes
    this runs at, and the oracle comparison would surface it.

    ``materialize_shingles`` (r13): localCheckpoint the (id, sh)
    shingle table so the text→explode→hash stage runs ONCE instead of
    once per plan branch (the self-join's two sides + the size
    aggregate + the df-cutoff ban each re-evaluate it lazily — four
    corpus explodes in one plan). The checkpoint stores 16-byte rows
    (one per distinct doc-shingle), a few × the token count — the
    standard space-for-rescan trade; values identical either way.
    Measured at sf0.1: ~3.0 s → ~2.3 s for the headline key.
    """
    def _shingle_rows(src: DataFrame) -> DataFrame:
        return src.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, shingle_size))).alias("_s"),
        ).select(id_col, F.xxhash64("_s").alias("sh"))

    # With explicit candidates, only docs that appear in some candidate
    # pair enter the shingle explode at all — the doc restriction is a
    # semi-join on id, so applying it BEFORE the explode produces the
    # identical shingle rows while the (corpus − candidates) docs never
    # shingle, never hash, never shuffle. Set sizes are computed over
    # the same restricted rows: a candidate doc's shingle set is intact.
    cand_ids = None
    docs_sh = docs
    if pair_candidates is not None:
        cand_ids = (
            pair_candidates.select(F.col("id_a").alias(id_col))
            .unionByName(pair_candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        docs_sh = docs.join(cand_ids, id_col, "left_semi")
    sh = _shingle_rows(docs_sh)
    if materialize_shingles:
        sh = sh.localCheckpoint()
    if max_df is not None:
        # the document-frequency cutoff is defined over the WHOLE
        # corpus, so the ban list aggregates a full-corpus explode even
        # under candidate restriction — but it reduces straight to a
        # groupBy count (no join, no carried text). The ban list itself
        # (shingles above the cutoff) is tiny by construction —
        # boilerplate is rare among distinct shingles — so broadcast it
        # and anti-join; the complement ("keep") set is nearly the
        # whole shingle vocabulary and would force a full shuffle join
        # of the corpus against itself-sized state.
        # without candidate restriction `sh` already holds the whole
        # corpus's shingle rows — aggregate those instead of
        # re-exploding the corpus text a second time (and when the
        # shingle table is materialized, the ban costs one cheap
        # aggregate over the checkpoint)
        ban_src = sh if pair_candidates is None else _shingle_rows(docs)
        ban = (
            ban_src
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df)
            .select("sh")
        )
        if materialize_shingles:
            # the ban join rides inside `sh`, which three plan branches
            # consume — under candidate restriction the ban's own
            # full-corpus explode would otherwise run once per branch;
            # the list itself is tiny (banned digests only)
            ban = ban.localCheckpoint()
        sh = sh.join(F.broadcast(ban), "sh", "left_anti")

    sh_join = sh
    sizes = sh_join.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a, b = sh_join.alias("a"), sh_join.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if pair_candidates is not None:
        inter = inter.join(pair_candidates, ["id_a", "id_b"], "inner")

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _union_find(pairs) -> dict[int, int]:
    """Min-label union-find over an iterable of (a, b) int pairs.
    Returns a fully path-compressed parent map (root = min id of the
    component). Shared by the per-cell SemDeDup grouping and the
    small-graph connected-components fast path."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # compress everything so lookups after return are O(1)
    for x in list(parent):
        find(x)
    return parent


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    small_graph_rows: int = 1_000_000,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: (id, cluster) where
    cluster = min id reachable in the undirected pair graph.

    Min-label propagation: every node starts as its own label; each
    round takes the min of its own and its neighbors' labels; converges
    in O(graph diameter) rounds — duplicate clusters are shallow, so
    this is a handful of joins, each a plain shuffle on the edge key.
    The loop is driver-side but each iteration is fully distributed and
    the convergence check is one count per round (the standard
    GraphX-style pattern). Deterministic → exactly reproducible by a
    recursive-SQL oracle.

    Strategy gate: a single bounded collect probes the RAW edge list —
    ``limit(small_graph_rows + 1)`` so the driver never materializes
    more than the gate no matter the graph. If everything arrived
    (≤ ``small_graph_rows`` edges) the graph is solved with one
    union-find pass — the small-side discipline of a broadcast join
    applied to graph closure; symmetrization/self-loops are an
    ITERATIVE-path artifact the collected solver never needs, so the
    small path is ONE action on the edge lineage (r14: the previous
    shape built the 2E+V symmetric frame, counted it, then collected
    it — three passes and two shuffles of pure overhead, 2.0 s of a
    256-edge curate_corpus CC at sf0.1; now ~0.5 s). A dedup graph is
    edge-sparse by construction (pairs only exist where
    near-duplicates do), so even 100 TB corpora routinely land under
    the gate; the iterative path exists for the ones that don't.
    Measured at sf0.1: the 793-edge LSH graph costs ~3.2 s in
    driver-scheduled propagation rounds vs ~0.4 s collected.
    """
    raw = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    probe = raw.limit(int(small_graph_rows) + 1).toPandas()
    if len(probe) <= small_graph_rows:
        import pandas as pd

        parent = _union_find(zip(probe["a"], probe["b"]))
        ids = sorted(
            set(int(i) for i in probe["a"]) | set(int(i) for i in probe["b"])
        )
        out = pd.DataFrame(
            {"id": ids, "cluster": [parent.get(i, i) for i in ids]}
        )
        return edges.sparkSession.createDataFrame(
            out, schema="id long, cluster long"
        )
    # persist the symmetric edge list BEFORE the first action: edges
    # usually sit on an expensive lineage (the whole LSH pipeline), and
    # marking the cache after the init action would recompute that
    # lineage once more in round 0 (measured: 2× the LSH cost). Self-loop
    # rows (v,v) fold the "own label" term into the neighbor set, so each
    # round is one join + one aggregation (2 shuffles) instead of
    # join + agg + label-realignment join (3 shuffles) — at 100× the
    # graph, that third shuffle per round is the difference.
    sym = raw.unionByName(
        raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    und = sym.unionByName(
        sym.select("a").distinct().select("a", F.col("a").alias("b"))
    ).persist()
    # first propagation round fused into init: label₀ = min over
    # neighbors∪self of id comes straight off the self-looped edge list
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("lbl"))
        .select(F.col("a").alias("id"), "lbl")
        .persist()
    )
    # labels only ever decrease, so Σlbl strictly decreases on any
    # change — a 1-row aggregate replaces the join-based change count
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]

    for it in range(max_iter):
        # lbl_new(v) = min over neighbors∪self of lbl — the self-loops
        # make the plain neighbor-min already include v's own label, so
        # no realignment join is needed. (No pointer-jump shortcut: dup
        # clusters are shallow, and an extra self-join per round measured
        # slower than the 1-2 rounds it saves.)
        new_labels = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("lbl").alias("lbl"))
            .select(F.col("a").alias("id"), "lbl")
        )
        if (it + 1) % 8 == 0:
            # truncate lineage every few rounds: a deep graph would
            # otherwise accumulate an unbounded plan (each round's plan
            # embeds all previous rounds') and eventually stall the
            # driver at 100× diameter
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        new_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    und.unpersist()
    return labels.select(F.col("id"), F.col("lbl").alias("cluster"))


def embedding_neardup_pairs(
    emb: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_block_rows: int = 4096,
) -> DataFrame:
    """Cosine near-duplicate pairs within blocking-key groups.

    (id_a, id_b, cos) with id_a < id_b and cos ≥ threshold. The block
    key bounds the quadratic term; for unblocked corpora use LSH
    bucketing (similarity.py) to generate blocks first.

    The pairwise math runs as one BLAS GEMM per cell inside
    ``applyInPandas`` (U·Uᵀ of the L2-normalized matrix) instead of a
    per-pair expression over an exploded self-join — vectors cross the
    Arrow boundary once, and the quadratic term is a C-speed matrix
    multiply rather than row-wise aggregates.

    Skew bound: a block larger than ``max_block_rows`` is gridded into
    ``nsb = ceil(b / cap)`` hash sub-blocks and every unordered
    sub-block pair (lo ≤ hi) becomes its own task (the
    ``knn_join_blocked`` cell pattern, similarity.py) — so per-task
    memory is capped at 2·cap·d + (2·cap)² doubles REGARDLESS of key
    skew; one hot blocking key (empty titles, boilerplate labels — the
    100 TB reality) fans out to nsb² bounded tasks instead of OOMing
    one. Each row is replicated nsb times (b²/cap shuffled rows per
    oversized block — proportional to the pair work itself); well-sized
    blocks keep nsb = 1 and a single cell. Every unordered row pair
    lands in exactly one cell: (sb_x, sb_y) sorted.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def _unit_rows(pdf: pd.DataFrame, mask) -> tuple[np.ndarray, np.ndarray]:
        ids = pdf["_id"].to_numpy(np.int64)[mask]
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf["_v"].to_numpy()[mask])[order].astype(np.float64)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        U = np.divide(V, nrm, out=np.zeros_like(V), where=nrm > 0)
        return ids, U

    def cell_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
            {"id_a": np.int64, "id_b": np.int64, "cos": np.float64}
        )
        if len(pdf) < 2:
            return empty
        lo, hi = int(key[1]), int(key[2])
        sb = pdf["_sb"].to_numpy(np.int64)
        if lo == hi:  # triangle within one sub-block
            ids, U = _unit_rows(pdf, sb == lo)
            if len(ids) < 2:
                return empty
            S = U @ U.T
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = S[ia, ib] >= threshold
            return pd.DataFrame(
                {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos": S[ia, ib][keep]}
            )
        ids_a, Ua = _unit_rows(pdf, sb == lo)
        ids_b, Ub = _unit_rows(pdf, sb == hi)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return empty
        S = Ua @ Ub.T
        ia, ib = np.nonzero(S >= threshold)
        xa, xb = ids_a[ia], ids_b[ib]
        return pd.DataFrame(
            {
                "id_a": np.minimum(xa, xb),
                "id_b": np.maximum(xa, xb),
                "cos": S[ia, ib],
            }
        )

    blocks = emb.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    counts = blocks.groupBy("blk").agg(F.count(F.lit(1)).alias("_bn"))
    nsb = F.ceil(F.col("_bn") / F.lit(max_block_rows)).cast("int")
    withsb = (
        blocks.join(counts, "blk")
        .withColumn("_nsb", nsb)
        .withColumn("_sb", F.pmod(F.xxhash64("_id"), F.col("_nsb")).cast("int"))
    )
    # replicate each row into every grid cell its sub-block touches:
    # (sb, t) for t ≥ sb plus (t, sb) for t < sb — nsb copies total
    up = F.transform(
        F.sequence(F.col("_sb"), F.col("_nsb") - 1),
        lambda t: F.struct(F.col("_sb").alias("lo"), t.alias("hi")),
    )
    down = F.when(
        F.col("_sb") > 0,
        F.transform(
            # guard: sequence(a, b) with a > b counts DOWN, so the
            # _sb = 0 case must not evaluate this branch's sequence
            F.sequence(F.lit(0), F.greatest(F.col("_sb") - 1, F.lit(0))),
            lambda t: F.struct(t.alias("lo"), F.col("_sb").alias("hi")),
        ),
    ).otherwise(F.array().cast("array<struct<lo:int,hi:int>>"))
    cells = F.concat(up, down)
    exploded = withsb.withColumn("_cell", F.explode(cells)).select(
        "blk", "_id", "_v", "_sb",
        F.col("_cell.lo").alias("_lo"), F.col("_cell.hi").alias("_hi"),
    )
    return exploded.groupBy("blk", "_lo", "_hi").applyInPandas(
        cell_pairs, out_schema
    )


def semantic_dedup(
    emb: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_block_rows: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, find
    near-duplicate pairs by pairwise cosine WITHIN each cluster only,
    connect them into groups, and keep one representative per group
    (the deterministic min-id variant). Returns ``(id, cell, group,
    keep)`` — keep = 1 iff the row is its group's representative;
    singletons keep themselves.

    Pure composition of existing scale-shaped operators: cell
    assignment is one scan (``ivf_assign``), the quadratic term is
    bounded per cell and skew-gridded (``embedding_neardup_pairs``),
    grouping is min-label propagation (``connected_components``). At
    100 TB the cluster count — not the corpus — bounds every task:
    no all-pairs, no single hot task.
    """
    import pandas as pd

    from .similarity import ivf_assign

    assigned = ivf_assign(
        emb.select(F.col(id_col), F.col(vec_col)),
        centroids,
        id_col=id_col,
        vec_col=vec_col,
    ).persist()
    pairs = embedding_neardup_pairs(
        assigned,
        block_col="cell",
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        max_block_rows=max_block_rows,
    )

    # Near-dup edges cannot cross cells (pairs are generated within a
    # cell), so components decompose per cell — a single-pass per-cell
    # union-find replaces the iterative ``connected_components`` loop
    # (no driver-side rounds, one shuffle of the pair list on cell).
    # Per-task state is that cell's PAIR count — bounded by near-dup
    # density, not cell size; the generic iterative CC remains the tool
    # for graphs whose edges span blocks (dedup_clusters).
    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        # min-label union ⇒ root = min id of the component
        parent = _union_find(zip(pdf["id_a"], pdf["id_b"]))
        ids = sorted({int(v) for c in ("id_a", "id_b") for v in pdf[c]})
        return pd.DataFrame(
            {"id": ids, "cluster": [parent.get(i, i) for i in ids]}
        )

    pairs_c = pairs.join(
        assigned.select(F.col(id_col).alias("id_a"), "cell"), "id_a"
    )
    clusters = pairs_c.groupBy("cell").applyInPandas(
        lambda pdf: _uf(pdf), "id long, cluster long"
    )
    out = (
        assigned.select(F.col(id_col).alias("id"), "cell")
        .join(clusters.select("id", "cluster"), "id", "left")
        .select(
            "id",
            "cell",
            F.coalesce("cluster", F.col("id")).alias("group"),
        )
        .withColumn("keep", (F.col("group") == F.col("id")).cast("int"))
    )
    # materialize now so the intermediate cache can be released — the
    # persisted ``assigned`` otherwise leaks executor storage across
    # repeated calls in a long-lived session (the result is id-scale,
    # small; its lineage over three uses of ``assigned`` is not)
    out = out.localCheckpoint(eager=True)
    assigned.unpersist()
    return out


def incremental_dedup(
    new_docs: DataFrame,
    seen_keys: DataFrame,
    key: Column,
    id_col: str = "doc_id",
    seen_key_col: str = "dup_key",
) -> DataFrame:
    """Delta-batch exact dedup against an existing corpus digest index —
    the incremental form of :func:`exact_dedup`. Dedupes the delta
    internally (min id per key), then anti-joins the surviving keys
    against ``seen_keys`` (one ``dup_key`` column — the digest index of
    everything already ingested). Returns ``(dup_key, n_dups, keeper)``
    for delta rows that are genuinely new; ``n_dups`` counts the
    delta-internal collapse.

    The 100 TB property: the existing corpus is NEVER rescanned — only
    its digest index is touched, and the join runs digest-against-digest
    (16-byte keys, never text). Keep the index bucketed on dup_key and
    the anti-join is shuffle-free on the index side; a small delta
    broadcasts instead (AQE picks at runtime).
    """
    delta = new_docs.select(key.alias("dup_key"), F.col(id_col).alias("_id"))
    survivors = delta.groupBy("dup_key").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("_id").alias("keeper")
    )
    # select the digest column BY NAME: silently taking column 0 of a
    # multi-column index frame yields a wrong (empty-ish) anti-join.
    # A single-column frame is unambiguous and accepted as-is.
    if seen_key_col in seen_keys.columns:
        seen = seen_keys.select(F.col(seen_key_col).alias("dup_key"))
    elif len(seen_keys.columns) == 1:
        seen = seen_keys.select(F.col(seen_keys.columns[0]).alias("dup_key"))
    else:
        raise ValueError(
            f"seen_keys needs a {seen_key_col!r} column (or exactly one "
            f"column); got {seen_keys.columns}"
        )
    return survivors.join(seen, "dup_key", "left_anti")


def incremental_lsh_dedup(
    new_docs: DataFrame,
    band_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 2,
    shingle_size: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Delta-batch NEAR-dedup against a persisted LSH band index — the
    incremental form of :func:`lsh_candidate_pairs`, completing the
    delta story :func:`incremental_dedup` starts for exact dedup.

    ``band_index`` is the corpus's ``(id, band, bkey)`` state from
    :func:`lsh_band_buckets` (same ``num_hashes``/``bands``/
    ``shingle_size`` — the keys are meaningless across configs).
    Returns ``(pairs, delta_bands)``:

    - ``pairs``: distinct candidate pairs (id_a < id_b) involving at
      least one delta doc — delta×corpus collisions via one equi-join
      on (band, bkey) against the index, plus delta-internal collisions
      via the standard self-join. Equals the batch
      ``lsh_candidate_pairs`` over corpus ∪ delta restricted to pairs
      touching the delta (pinned by test).
    - ``delta_bands``: the delta's band rows — append them to the index
      and it IS ``lsh_band_buckets`` of corpus ∪ delta, ready for the
      next delta.

    The 100 TB property: corpus text is never rescanned and corpus
    signatures are never recomputed — the corpus side of the join is
    its (id, band, 32-hex-key) index only. Keep the index bucketed on
    ``bkey`` and the delta side (small) broadcasts; candidate volume is
    driven by real collisions, exactly as in the batch operator.
    """
    sig = minhash_signatures(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
    )
    delta_bands = lsh_band_buckets(sig, id_col, num_hashes, bands)

    d = delta_bands.alias("d")
    c = band_index.alias("c")
    cross = (
        d.join(
            c,
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.bkey") == F.col("c.bkey"))
            & (F.col(f"d.{id_col}") != F.col(f"c.{id_col}")),
        )
        .select(
            F.least(F.col(f"d.{id_col}"), F.col(f"c.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"d.{id_col}"), F.col(f"c.{id_col}")).alias("id_b"),
        )
    )
    within = (
        d.join(
            delta_bands.alias("e"),
            (F.col("d.band") == F.col("e.band"))
            & (F.col("d.bkey") == F.col("e.bkey"))
            & (F.col(f"d.{id_col}") < F.col(f"e.{id_col}")),
        )
        .select(
            F.col(f"d.{id_col}").alias("id_a"), F.col(f"e.{id_col}").alias("id_b")
        )
    )
    return cross.unionByName(within).distinct(), delta_bands


def incremental_simhash_dedup(
    new_docs: DataFrame,
    band_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Delta-batch SimHash near-dedup against a persisted bit-slice
    index — the third leg of the incremental family
    (:func:`incremental_dedup` exact, :func:`incremental_lsh_dedup`
    MinHash-Jaccard, this one Hamming).

    ``band_index`` is the corpus's ``(id, simhash, band, bkey)`` state
    from :func:`simhash_band_buckets` (same ``bits``/``bands``).
    Returns ``(pairs, delta_bands)``: pairs are (id_a < id_b, hamming ≤
    max_hamming) involving at least one delta doc — one (band, bkey)
    equi-join against the index plus the delta self-join, Hamming
    verified from the signatures both sides carry; delta_bands appended
    to the index reproduces ``simhash_band_buckets`` of corpus ∪ delta.

    100 TB property: identical to the MinHash form — corpus text is
    never rescanned and signatures never recomputed; the index rows are
    (id, 2 ints, small int) and the delta side broadcasts.
    """
    sig = simhash_signatures(new_docs, text_col=text_col, id_col=id_col, bits=bits)
    delta_bands = simhash_band_buckets(sig, id_col, bits, bands)

    def _pairs(left: DataFrame, right: DataFrame, strict: bool) -> DataFrame:
        a, b = left.alias("a"), right.alias("b")
        cond = (
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
        )
        cond = cond & (
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
            if strict
            else F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
        )
        sel = a.join(b, cond).select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        return sel.where(F.col("hamming") <= max_hamming)

    cross = _pairs(delta_bands, band_index, strict=False)
    within = _pairs(delta_bands, delta_bands, strict=True)
    return cross.unionByName(within).distinct(), delta_bands
