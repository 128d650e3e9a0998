"""Polysemous codes — faiss ``IndexPQ`` polysemous training re-expressed
for the Spark PQ tier (Douze, Jégou & Perronnin, "Polysemous codes",
ECCV 2016; faiss ``PolysemousTraining`` / ``IndexPQ::search`` with
``polysemous_ht``). The reference engine has no PQ tier at all
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47 stores only
FP32/FP16/BF16) — this extends the superset PQ family with faiss's
last notable PQ feature.

Idea: a PQ code is *polysemous* — it is simultaneously (a) an index
into the codebooks for ADC, and (b) a compact bit string. Training
REORDERS each subquantizer's codewords so that the Hamming distance
between code bits correlates with the distance between the codewords
they name. After training, search prunes with a cheap Hamming test on
the code bits (bit_count of an XOR — no codebook gather) and runs the
exact ADC only on codes STRICTLY within ``polysemous_ht`` bits of the
query's own code (faiss gates at ``hd < polysemous_ht``; its accept-all
default is ``nbits·M + 1``).

The permutation is a pure RELABELING: codebook row ``perm[i]`` takes
codeword ``i``'s vector and every stored code byte ``i`` is rewritten
to ``perm[i]``, so decode/reconstruct/ADC are bit-identical before and
after — only the bit pattern of the code changes. (Same invariant
faiss maintains: ``PolysemousTraining::optimize_pq_for_hamming``
permutes centroids and the already-encoded codes together.)

Objective (faiss ``OT_ReproduceDistances_affine``, simplified to the
pure least-squares form): choose the permutation π minimizing

    Σ_{i<j} ( d(i,j)/σ_d − h(π(i),π(j))/σ_h )²

where d is the squared codeword distance and h the Hamming distance of
the nbits-bit labels — i.e. make Hamming REPRODUCE the distance
ranking. Optimized by seeded simulated annealing over pair swaps
(faiss ``SimulatedAnnealingParameters``), each swap delta evaluated on
the two affected rows only (O(ksub) per proposal). Everything here is
host-side numpy over the (m, ksub, dsub) codebooks — training state is
quantizer-sized, never corpus-sized; the one corpus-sized step (code
remapping) is a single vectorized ``mapInArrow`` LUT gather.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pq import CODE_SCHEMA, _arrow_codes, _arrow_i64, _binary_array

# popcount of a byte — table lookup vectorizes the Hamming matrix
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _hamming_table(nbits: int) -> np.ndarray:
    """(2^nbits, 2^nbits) Hamming distances between sub-code labels."""
    ksub = 1 << nbits
    xor = np.arange(ksub)[:, None] ^ np.arange(ksub)[None, :]
    return _POPCOUNT8[xor & 0xFF] + _POPCOUNT8[(xor >> 8) & 0xFF]


def polysemous_train_books(
    codebooks: np.ndarray,
    n_iter: int = 30_000,
    seed: int = 123,
    init_temperature: float = 0.7,
) -> np.ndarray:
    """Per-subquantizer codeword permutations (m, ksub) — seeded
    simulated annealing on the distance-reproduction objective; the
    returned ``perms[j][i]`` is the NEW label of subquantizer ``j``'s
    old codeword ``i``. Deterministic for fixed inputs."""
    m, ksub, dsub = codebooks.shape
    nbits = int(ksub).bit_length() - 1
    H = _hamming_table(nbits).astype(np.float64)
    H /= max(H.std(), 1e-12)
    rng = np.random.default_rng(seed)
    perms = np.zeros((m, ksub), dtype=np.int64)
    for j in range(m):
        C = codebooks[j].astype(np.float64)
        sq = (C * C).sum(1)
        D = sq[:, None] + sq[None, :] - 2.0 * (C @ C.T)
        np.fill_diagonal(D, 0.0)
        D = np.maximum(D, 0.0)
        D /= max(D.std(), 1e-12)
        perm = np.arange(ksub)
        # cost rows under the current permutation
        R = (D - H[perm][:, perm]) ** 2
        cost = R.sum()
        temp = init_temperature * cost / max(ksub * ksub, 1)
        for it in range(n_iter):
            a, b = rng.integers(0, ksub, 2)
            if a == b:
                continue
            cand = perm.copy()
            cand[a], cand[b] = cand[b], cand[a]
            # only rows/cols a and b change: delta on those slices
            old_rows = R[a].sum() + R[b].sum() - R[a, b]
            Ha = H[cand[a]][cand]
            Hb = H[cand[b]][cand]
            new_a = (D[a] - Ha) ** 2
            new_b = (D[b] - Hb) ** 2
            new_rows = new_a.sum() + new_b.sum() - new_a[b]
            delta = new_rows - old_rows
            t = temp * (1.0 - it / n_iter)
            if delta < 0 or (t > 0 and rng.random() < np.exp(-2.0 * delta / t)):
                perm = cand
                R[a], R[b] = new_a, new_b
                R[:, a], R[:, b] = new_a, new_b  # symmetric
                cost += 2 * delta
        perms[j] = perm
    return perms


def apply_polysemous(
    codebooks: np.ndarray,
    codes: DataFrame,
    perms: np.ndarray,
    extra_cols: tuple = (),
) -> tuple[np.ndarray, DataFrame]:
    """Relabel (codebooks, stored codes) by the trained permutations —
    decode(new_code, new_books) ≡ decode(old_code, old_books) exactly.
    Books permute host-side; codes remap in one vectorized
    ``mapInArrow`` LUT gather (the only corpus-sized step).
    ``extra_cols`` pass through verbatim (the IVFPQ tier keeps its
    ``cell`` column so the inverted-file partitioning survives)."""
    m, ksub, dsub = codebooks.shape
    perms = np.asarray(perms, dtype=np.int64)
    if perms.shape != (m, ksub):
        raise ValueError(f"perms shape {perms.shape} != (m, ksub) {(m, ksub)}")
    for j in range(m):
        if len(np.unique(perms[j])) != ksub:
            raise ValueError(f"perms[{j}] is not a permutation")
    new_books = np.empty_like(codebooks)
    for j in range(m):
        new_books[j, perms[j]] = codebooks[j]
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast(perms.astype(np.uint8))
    extra_cols = tuple(extra_cols)
    out_schema = CODE_SCHEMA
    if extra_cols:
        import pyspark.sql.types as T

        base = codes.schema
        out_schema = T.StructType(
            list(CODE_SCHEMA.fields) + [base[c] for c in extra_cols]
        )

    def remap(batches):
        import pyarrow as pa

        P = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            C = _arrow_codes(batch.column("code"))
            out = np.empty_like(C)
            for j in range(P.shape[0]):
                out[:, j] = P[j][C[:, j]]
            arrays = [pa.array(_arrow_i64(batch.column("id"))), _binary_array(out)]
            names = ["id", "code"]
            for c in extra_cols:
                arrays.append(batch.column(c))
                names.append(c)
            yield pa.record_batch(arrays, names=names)

    return new_books, codes.mapInArrow(remap, out_schema)


def hamming_reproduction_score(codebooks: np.ndarray) -> float:
    """Mean Spearman-style alignment between codeword distances and
    label Hamming distances across subquantizers (higher = Hamming
    ranks codewords better) — the quantity polysemous training
    improves; exposed for tests and tuning."""
    m, ksub, _ = codebooks.shape
    nbits = int(ksub).bit_length() - 1
    H = _hamming_table(nbits).astype(np.float64)
    iu = np.triu_indices(ksub, 1)
    rs = []
    for j in range(m):
        C = codebooks[j].astype(np.float64)
        sq = (C * C).sum(1)
        D = sq[:, None] + sq[None, :] - 2.0 * (C @ C.T)
        d, h = D[iu], H[iu]
        if d.std() < 1e-12 or h.std() < 1e-12:
            continue
        rs.append(float(np.corrcoef(d, h)[0, 1]))
    return float(np.mean(rs)) if rs else 0.0


def polysemous_search(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int,
    ht: int,
    qid_col: str = "qid",
    qvec_col: str = "vec",
) -> DataFrame:
    """ADC top-k restricted to codes STRICTLY within ``ht`` Hamming bits
    of each query's own code — faiss ``IndexPQ::search_core_polysemous``
    admits ``hd < polysemous_ht`` (strict; its accept-all default is
    ``nbits·M + 1``), and this gate matches it exactly: ``ht = 0``
    admits nothing, ``ht = m·nbits + 1`` degenerates to plain
    ``pq_search``. Distances of returned rows are EXACT ADC values; the
    Hamming test only bounds which codes are evaluated. Sentinel padding
    fills queries whose filter passes fewer than k codes.

    Per Arrow batch: one XOR + popcount-LUT pass builds the (nq, batch)
    Hamming matrix on raw bytes (no codebook gather), then the ADC
    gather runs per query over its SURVIVORS only — the compute saving
    that is the point of polysemous codes. No corpus collect, no
    shuffle beyond the shared nq·k-bounded finalize."""
    from .knn import RESULT_SCHEMA, _finalize
    from .pq import _adc_lut, pq_assign_np

    m, ksub, dsub = codebooks.shape
    nbits = int(ksub).bit_length() - 1
    spark = codes.sparkSession
    qpdf = queries.select(
        F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qvec")
    ).toPandas()
    qids = qpdf["qid"].to_numpy(np.int64)
    if len(qids) == 0:
        return spark.createDataFrame([], RESULT_SCHEMA)
    Q = np.stack(qpdf["qvec"].to_numpy()).astype(np.float64)
    if Q.shape[1] != m * dsub:
        raise ValueError(f"query dim {Q.shape[1]} != m·dsub {m * dsub}")
    qcodes = pq_assign_np(Q, codebooks)  # (nq, m) uint8
    lut = _adc_lut(Q, codebooks, "l2")
    bc = spark.sparkContext.broadcast((qids, qcodes, lut, int(ht)))

    def partial_topk(batches):
        import pyarrow as pa

        qids_, qc, lut_, ht_ = bc.value
        nq_ = len(qids_)
        best: list[list[tuple]] = [[] for _ in range(nq_)]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            C = _arrow_codes(batch.column("code"))
            labels = _arrow_i64(batch.column("id"))
            # Hamming on raw code bytes: XOR then popcount LUT, summed
            # over the m byte positions — (nq, batch) ints, no gather
            ham = np.zeros((nq_, len(C)), dtype=np.int64)
            for j in range(C.shape[1]):
                ham += _POPCOUNT8[
                    np.bitwise_xor(qc[:, j][:, None], C[:, j][None, :])
                ]
            for qi in range(nq_):
                surv = np.nonzero(ham[qi] < ht_)[0]
                if len(surv) == 0:
                    continue
                d = np.zeros(len(surv), dtype=np.float64)
                Cs = C[surv]
                for j in range(C.shape[1]):
                    d += lut_[qi, j, :][Cs[:, j]]
                if len(surv) > k:
                    top = np.argpartition(d, k - 1)[:k]
                else:
                    top = np.arange(len(surv))
                best[qi].extend(
                    zip(d[top].tolist(), labels[surv[top]].tolist())
                )
                # keep the running set bounded at k per query
                if len(best[qi]) > k:
                    best[qi] = sorted(best[qi])[:k]
        out_q, out_l, out_d = [], [], []
        for qi in range(nq_):
            for dist, lab in best[qi]:
                out_q.append(qids_[qi])
                out_l.append(lab)
                out_d.append(dist)
        if out_q:
            yield pa.record_batch(
                [
                    pa.array(np.asarray(out_q, np.int64)),
                    pa.array(np.asarray(out_l, np.int64)),
                    pa.array(np.asarray(out_d, np.float64)),
                ],
                names=["qid", "label", "distance"],
            )

    from .pq import _PARTIAL_SCHEMA

    candidates = codes.mapInArrow(partial_topk, _PARTIAL_SCHEMA)
    qdf = queries.select(F.col(qid_col).cast("long").alias("qid"))
    return _finalize(qdf, candidates, k, "l2")

