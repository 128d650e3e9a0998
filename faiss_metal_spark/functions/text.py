"""Text-analysis column expressions for large-scale corpus pipelines.

All pure Catalyst expressions (whole-stage codegen, no Python): token
counting, shingling, quality scoring, language scoring. Built to be
SQL-oracle-checkable — every construct here has an exact ANSI-SQL
equivalent (see __spark_entry__.oracle_sql), which is why hashing uses
md5 (identical across engines) rather than murmur3.

These are north-star extensions (SURVEY §0, BASELINE.json): the
reference engine has no string functions (SURVEY §2.9); they're built
on Spark primitives, not ported.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny multi-language stopword sample; enough for ratio features and
# the n-gram language heuristic on synthetic corpora. Deliberately
# short so the SQL oracle can inline the same list.
STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def avg_token_len(text: Column | str) -> Column:
    """Mean token length in characters (double)."""
    t = tokens(text)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t).cast("double")


def distinct_token_ratio(text: Column | str) -> Column:
    """|distinct tokens| / |tokens| — repetition detector."""
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t).cast("double")


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.size(t).cast("double")


def _plain_name(text) -> bool:
    """True when ``text`` is a plain (unqualified) column name — the
    F.expr fast paths backquote it as ONE identifier, which would
    change the meaning of dotted/backticked names that F.col() parses
    as qualified references; those fall back to the Column path."""
    return isinstance(text, str) and "." not in text and "`" not in text


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1].

    0.4·distinct-token ratio + 0.3·length saturation (tokens/64 capped
    at 1) + 0.3·mean-token-length saturation (len/8 capped at 1).
    Deterministic, closed-form — the SQL oracle computes the same.
    """
    if _plain_name(text):
        # r15: one F.expr string (equality pinned by
        # tests/test_r15_expr_equiv.py); D suffixes keep literals DOUBLE
        sp = f"split(`{text}`, ' ')"
        return F.expr(
            f"0.4D * (CAST(size(array_distinct({sp})) AS DOUBLE) "
            f"/ CAST(size({sp}) AS DOUBLE)) "
            f"+ 0.3D * least(CAST(size({sp}) AS DOUBLE) / 64.0D, 1.0D) "
            f"+ 0.3D * least((CAST(aggregate({sp}, 0, (acc, x) -> "
            f"acc + length(x)) AS DOUBLE) / CAST(size({sp}) AS DOUBLE)) "
            f"/ 8.0D, 1.0D)"
        )
    dr = distinct_token_ratio(text)
    ls = F.least(token_count(text).cast("double") / F.lit(64.0), F.lit(1.0))
    ts = F.least(avg_token_len(text) / F.lit(8.0), F.lit(1.0))
    return F.lit(0.4) * dr + F.lit(0.3) * ls + F.lit(0.3) * ts


# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: the SQL oracle inlines the same lists.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "es": ["el", "los", "las", "una", "es", "y", "por"],
    "fr": ["le", "la", "les", "et", "est", "des", "une"],
}


def lang_score(text: Column | str, markers: list[str]) -> Column:
    """Fraction of tokens that are markers of one language."""
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*markers)))
    return hits.cast("double") / F.size(t).cast("double")


def lang_id(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language marker-token ratio.

    Deterministic tie-break: alphabetically-first language code wins
    (sort on (−score, lang) structs — struct ordering is lexicographic
    by field in both Spark and ANSI engines, so the SQL oracle can
    reproduce the exact argmax).
    """
    mk = markers or LANG_MARKERS
    structs = [
        F.struct((-lang_score(text, words)).alias("s"), F.lit(lang).alias("lang"))
        for lang, words in sorted(mk.items())
    ]
    return F.array_sort(F.array(*structs)).getItem(0).getField("lang")


# Modulus for the rolling document fingerprint (largest int32 prime).
FP_MOD = 2_147_483_647
FP_BASE = 31


def token_hash32(col: Column) -> Column:
    """First 32 bits of md5(token) as BIGINT — cross-engine stable."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _sql_h32(x: str) -> str:
    """SQL text of :func:`token_hash32` over SQL fragment ``x`` —
    identical expression tree once parsed (r15: the expensive builders
    render ONE SQL string per column instead of hundreds of py4j
    round-trips; doc_profile measured 1.09 s of pure driver-side plan
    construction before this)."""
    return f"CAST(conv(substring(md5({x}), 1, 8), 16, 10) AS BIGINT)"


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive rolling (Rabin–Karp) fingerprint of the token
    stream: fold (acc·31 + hash32(token)) mod 2³¹−1 left-to-right.

    Unlike the MinHash/SimHash set signatures this is sensitive to
    token *order*, so it detects exact-sequence duplicates even when
    the bag of words matches. Pure Catalyst (aggregate HOF) — no
    Python, no shuffle; it's a projection.
    """
    if _plain_name(text):
        # r15: one F.expr string (tests/test_r15_expr_equiv.py)
        return F.expr(
            f"aggregate(transform(split(`{text}`, ' '), "
            f"x -> {_sql_h32('x')}), CAST(0 AS BIGINT), "
            f"(acc, v) -> (acc * {FP_BASE} + v) % {FP_MOD})"
        )
    t = tokens(text)
    vals = F.transform(t, token_hash32)
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(FP_BASE) + v) % F.lit(FP_MOD),
    )


def winnow_fingerprints(text: Column | str, k: int = 4, w: int = 5) -> Column:
    """Winnowing fingerprints (the MOSS algorithm): hash every token
    k-gram, slide a window of ``w`` hashes, keep each window's minimum;
    distinct mins form the document's fingerprint set.

    Guarantees: any shared token run of length ≥ k+w−1 between two
    documents produces at least one shared fingerprint, while only
    ~2/(w+1) of the k-gram hashes survive — sub-linear signature size
    with a matching-detection guarantee. Pure Catalyst (arrays + HOFs);
    the md5-derived hash keeps it SQL-oracle-checkable.
    """
    grams = shingles(text, k)
    hashes = F.transform(grams, token_hash32)

    # Bind the hash array ONCE as a lambda variable: referencing the
    # raw `hashes` expression inside the per-window lambda would
    # re-evaluate the whole md5 array per window (O(T²) hashing per
    # document — measured 60× slower at sf0.1). transform over a
    # 1-element wrapper array gives the windows a bound variable
    # instead of a repeated subexpression.
    def windows(hs: Column) -> Column:
        idx = F.when(
            F.size(hs) >= w, F.sequence(F.lit(1), F.size(hs) - (w - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_min(F.slice(hs, i, w)))
        )

    return F.get(F.transform(F.array(hashes), windows), 0)


# A BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex (vs whitespace tokens())."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings; empty array when < n tokens.

    Guarded so Spark's descending-sequence quirk (sequence(1,0) =
    [1,0]) can't produce phantom shingles.
    """
    t = tokens(text)

    # bind the token array once (see winnow_fingerprints: a raw
    # expression inside the lambda re-splits the text per shingle)
    def mk(tt: Column) -> Column:
        idx = F.when(
            F.size(tt) >= n, F.sequence(F.lit(1), F.size(tt) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda j: F.concat_ws(" ", F.slice(tt, j, n)))

    return F.get(F.transform(F.array(t), mk), 0)


def _shingles_sql(col_sql: str, n: int) -> str:
    """SQL text of :func:`shingles` over SQL fragment ``col_sql`` —
    same bind-once 1-element-array trick (tt is a lambda variable)."""
    return (
        f"get(transform(array(split({col_sql}, ' ')), tt -> "
        f"transform(CASE WHEN size(tt) >= {n} THEN "
        f"sequence(1, size(tt) - {n - 1}) "
        f"ELSE CAST(array() AS array<int>) END, "
        f"j -> concat_ws(' ', slice(tt, j, {n})))), 0)"
    )


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Within-document n-gram repetition: 1 − |distinct n-grams| /
    |n-grams| (0 = no repeated n-gram, → 1 for highly repetitive
    boilerplate). The standard repeated-n-gram quality filter for LLM
    training corpora; docs shorter than n grams score 0.0."""
    if _plain_name(text):
        # r15: one F.expr string; the shingle expression repeats
        # inline exactly as the Column API repeated it
        # (tests/test_r15_expr_equiv.py)
        s = _shingles_sql(f"`{text}`", n)
        return F.expr(
            f"CASE WHEN size({s}) > 0 THEN 1.0D "
            f"- CAST(size(array_distinct({s})) AS DOUBLE) "
            f"/ CAST(size({s}) AS DOUBLE) ELSE 0.0D END"
        )
    s = shingles(text, n)
    return F.when(
        F.size(s) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(s)).cast("double") / F.size(s).cast("double"),
    ).otherwise(F.lit(0.0))


def hashed_embedding(
    text: Column | str, d: int = 64, normalize: bool = True
) -> Column:
    """Dense hashing-trick text embedding (the oracle-able twin of
    MLlib's HashingTF, signed like feature hashing): lane =
    hash32(token) mod d, sign = bit 16 of the hash, vec[i] = Σ signs of
    tokens in lane i, optionally L2-normalized.

    Sign/lane independence holds when ``d`` is a power of two ≤ 2^16:
    the lane then uses only hash bits below bit 16 (``pmod`` reduces to
    a mask), disjoint from the sign bit. For other ``d`` the modulus
    mixes upper hash bits into the lane and the sign correlates with
    it — acceptable for counting features, but prefer power-of-two
    dimensions (the default 64 qualifies).

    A pure projection — no explode, no shuffle; O(d·T) codegen
    arithmetic per row after ONE md5 pass per token. Every expensive
    intermediate (the pair array, the raw vector, the norm) is bound
    once as a lambda variable via the 1-element-array trick — the same
    HOF re-evaluation hazard :func:`winnow_fingerprints` documents.
    This is the bridge from the text stack to the vector stack:
    documents become ``array<double>`` embeddings that every kNN / ANN
    / dedup operator in the engine accepts directly.

    r15: for string column names the whole expression renders as ONE
    ``F.expr`` SQL string — semantically identical (pinned by
    tests/test_r15_expr_equiv.py) but one py4j round-trip instead of
    ~60 (guide §5, driver discipline: plan construction is driver-side
    single-threaded work). Column inputs keep the Column-API path.
    """
    if _plain_name(text):
        return F.expr(_hashed_embedding_sql(f"`{text}`", d, normalize))
    t = tokens(text)

    def mk(x: Column) -> Column:
        v = token_hash32(x)
        return F.struct(
            F.pmod(v, F.lit(d)).cast("int").alias("lane"),
            F.when(
                F.shiftright(v, 16).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
            ).otherwise(F.lit(-1.0)).alias("sign"),
        )

    pairs = F.transform(t, mk)

    def fold(p: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.aggregate(
                p,
                F.lit(0.0),
                lambda acc, x: acc
                + F.when(x["lane"] == i.cast("int"), x["sign"]).otherwise(
                    F.lit(0.0)
                ),
            ),
        )

    raw = F.get(F.transform(F.array(pairs), fold), 0)
    if not normalize:
        return raw

    def normed(r: Column) -> Column:
        nrm = F.sqrt(F.aggregate(r, F.lit(0.0), lambda a, v: a + v * v))

        def with_n(nv: Column) -> Column:
            return F.when(nv > 0, F.transform(r, lambda v: v / nv)).otherwise(r)

        return F.get(F.transform(F.array(nrm), with_n), 0)

    return F.get(F.transform(F.array(raw), normed), 0)


def _hashed_embedding_sql(col_sql: str, d: int, normalize: bool) -> str:
    """SQL text of :func:`hashed_embedding` over SQL fragment
    ``col_sql`` — same lane/sign/fold/normalize semantics, same
    bind-once 1-element-array trick (p/r/n are lambda variables, so no
    subexpression re-evaluates per lane). Double literals carry the
    ``D`` suffix: a bare ``1.0`` parses as DECIMAL in Spark SQL."""
    h = _sql_h32("x")
    pairs = (
        f"transform(split({col_sql}, ' '), x -> named_struct("
        f"'lane', CAST(pmod({h}, {d}) AS INT), "
        f"'sign', CASE WHEN (shiftright({h}, 16) & 1) = 1 "
        f"THEN 1.0D ELSE -1.0D END))"
    )
    raw = (
        f"get(transform(array({pairs}), p -> "
        f"transform(sequence(0, {d - 1}), i -> "
        f"aggregate(p, 0.0D, (acc, s) -> acc + "
        f"(CASE WHEN s.lane = i THEN s.sign ELSE 0.0D END)))), 0)"
    )
    if not normalize:
        return raw
    return (
        f"get(transform(array({raw}), r -> "
        f"get(transform(array(sqrt(aggregate(r, 0.0D, (a, v) -> a + v * v))), "
        f"n -> CASE WHEN n > 0.0D THEN transform(r, v -> v / n) ELSE r END), "
        f"0)), 0)"
    )


def chunk_spans(
    text: Column | str, chunk: int = 32, overlap: int = 8
) -> Column:
    """Sliding passage windows over the token stream — the chunking
    step before embedding long documents (RAG / dense-retrieval
    pipelines): chunk i covers tokens [i·stride, i·stride + chunk)
    with stride = chunk − overlap; the last chunk may be short; every
    document yields ≥ 1 chunk.

    Returns ``array<struct<chunk_id int, n_tok int, chunk string>>`` —
    explode it for a passage table. Pure Catalyst projection: no
    shuffle, one tokenization pass (bound once, winnow-style).
    """
    if not (0 <= overlap < chunk):
        raise ValueError(f"need 0 <= overlap < chunk, got {overlap}, {chunk}")
    stride = chunk - overlap
    t = tokens(text)

    def mk(ts: Column) -> Column:
        n_chunks = F.greatest(
            F.lit(1),
            F.ceil((F.size(ts) - F.lit(overlap)).cast("double") / F.lit(stride)).cast(
                "int"
            ),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.least(
                    F.lit(chunk), F.size(ts) - i * F.lit(stride)
                ).cast("int").alias("n_tok"),
                F.array_join(
                    F.slice(ts, i * F.lit(stride) + 1, chunk), " "
                ).alias("chunk"),
            ),
        )

    return F.get(F.transform(F.array(t), mk), 0)


# PII patterns (the C4/RefinedWeb-style scrub list): deliberately
# simple classes so the same regexes run identically in any
# RE2/PCRE-ish engine (no lookbehind, no backrefs). ORDER IS
# PRECEDENCE — most specific first: an SSN or IP would otherwise also
# match the looser phone class.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]"),
]


def pii_counts(text: Column | str) -> Column:
    """Struct of per-class PII match counts — the audit half of the
    scrub (run first at corpus scale to size the problem). Each class
    is counted on the text with HIGHER-precedence classes already
    redacted, so counts partition the matches exactly as
    :func:`redact_pii` replaces them (an SSN is an ssn, never also a
    phone). Pure Catalyst projection."""
    c = F.col(text) if isinstance(text, str) else text
    counts = []
    for name, p in PII_PATTERNS:
        counts.append(F.regexp_count(c, F.lit(p)).alias(name))
        c = F.regexp_replace(c, p, f"<{name}>")
    return F.struct(*counts)


def redact_pii(text: Column | str, token: str = "<{name}>") -> Column:
    """Replace every PII match with a class token (``<email>``,
    ``<phone>``, …) — the redaction half, applied in the precedence
    order of ``PII_PATTERNS``. A chain of ``regexp_replace``
    projections — shuffle-free, whole-stage codegen."""
    c = F.col(text) if isinstance(text, str) else text
    out = c
    for name, p in PII_PATTERNS:
        out = F.regexp_replace(out, p, token.format(name=name))
    return out


def gopher_flags(
    text: Column | str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> Column:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1) as
    a struct of pass/fail flags plus the conjunction: token-count
    bounds, mean-word-length bounds, symbol-to-word ratio (# and …
    analog: non-alphanumeric tokens), and a minimum stopword presence
    (fluency proxy). Thresholds are parameters; defaults follow the
    paper where the simplified schema allows. One projection — compose
    with ``quality_score`` and ``repetition_ratio`` for the full
    filter."""
    c = F.col(text) if isinstance(text, str) else text
    t = tokens(c)
    n = F.size(t)
    avg = avg_token_len(c)
    symbolish = F.size(
        F.filter(t, lambda x: x.rlike("^[^a-zA-Z0-9]+$"))
    )
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN)))
    n_ok = (n >= min_tokens) & (n <= max_tokens)
    len_ok = (avg >= min_avg_len) & (avg <= max_avg_len)
    sym_ok = symbolish.cast("double") / n.cast("double") <= max_symbol_ratio
    stop_ok = stop_hits >= min_stopword_hits
    return F.struct(
        n_ok.alias("n_tokens_ok"),
        len_ok.alias("avg_len_ok"),
        sym_ok.alias("symbol_ok"),
        stop_ok.alias("stopword_ok"),
        (n_ok & len_ok & sym_ok & stop_ok).alias("keep"),
    )


_ACCENT_SRC = "áàâäãåéèêëíìîïóòôöõúùûüýÿçñÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝÇÑ"
_ACCENT_DST = "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN"


def normalize_for_dedup(text: Column | str, fold_accents: bool = True) -> Column:
    """Canonical text form for hashing — the normalization a
    web-scale dedup pipeline applies BEFORE the digest/MinHash stage
    (the CCNet/C4 discipline: near-identical pages must collide):
    casefold to lower, fold common Latin accents, remove
    control/format characters, collapse whitespace runs to single
    spaces, trim. Pure Catalyst projection (lower/translate/regexp
    chain in whole-stage codegen — no Python per row); byte-level
    unicode canonicalization (NFC) belongs at ingestion, before text
    reaches the engine. Pair with ``exact_dedup`` /
    ``minhash_signatures`` by normalizing the text column first:
    ``docs.withColumn("text", normalize_for_dedup("text"))``.
    """
    c = F.col(text) if isinstance(text, str) else text
    out = F.lower(c)
    if fold_accents:
        out = F.translate(out, _ACCENT_SRC.lower(), _ACCENT_DST.lower())
    # whitespace first: tab/newline are BOTH whitespace and Cc — they
    # must become spaces, not vanish and glue words together
    out = F.regexp_replace(out, r"\s+", " ")
    out = F.regexp_replace(out, r"[\p{Cc}\p{Cf}]", "")
    return F.trim(out)


# The C4 reference's actual line-drop phrases (TFDS c4_utils
# _get_clean_page): cookie POLICY phrases, not the bare word — a
# "cookie recipe" line must survive. "javascript" / "lorem ipsum"
# match as whole words (boundary rlike below), never inside longer
# tokens.
C4_BAD_MARKERS = [
    "lorem ipsum",
    "javascript",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
    "privacy policy",
    "terms of use",
]


def c4_clean_lines(
    text: Column | str,
    min_words: int = 3,
    bad_markers: list[str] | None = None,
    require_terminal_punct: bool = True,
) -> Column:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the
    published heuristics behind the Colossal Clean Crawled Corpus) as
    ONE Catalyst projection: split the document on newlines, keep only
    lines that (a) end in terminal punctuation (``. ! ? "``),
    (b) carry at least ``min_words`` words, and (c) contain none of the
    boilerplate markers (case-insensitive WHOLE-WORD/phrase match —
    the C4 cookie-POLICY phrase list, so "cookie recipe" survives and
    "javascript" never matches inside a longer token), then re-join
    the survivors. Returns the cleaned text (empty string when no line
    survives). Caller-supplied ``bad_markers`` get the same
    word-boundary treatment.

    The paper's remaining rules live elsewhere in this engine: the
    citation-span and curly-brace *document* drops are `gopher_flags` /
    `quality_score` composition, and the three-sentence-span corpus
    dedup is `segment_dedup` / `corpus_quality.duplicate_spans`.
    Scale: a pure projection — no shuffle, no UDF, runs in whole-stage
    codegen at scan time."""
    c = F.col(text) if isinstance(text, str) else text
    markers = C4_BAD_MARKERS if bad_markers is None else list(bad_markers)
    line = lambda x: x  # noqa: E731 — readability alias

    import re as _re

    def keep(x):
        trimmed = F.trim(line(x))
        ok = F.size(F.split(trimmed, r"\s+")) >= int(min_words)
        if require_terminal_punct:
            ok = ok & trimmed.rlike('[.!?"]$')
        low = F.lower(trimmed)
        for mk in markers:
            # word-boundary phrase match (still codegen: one rlike).
            # \b only where the marker EDGE is a word char — \b needs
            # a word char on the inside, so wrapping a marker like
            # '© 2024' or 'cookie:' unconditionally could never match
            # and would silently disable that filter.
            m = mk.lower()
            pat = _re.escape(m)
            if m and _re.match(r"\w", m[0]):
                pat = r"\b" + pat
            if m and _re.match(r"\w", m[-1]):
                pat = pat + r"\b"
            ok = ok & ~low.rlike(pat)
        return ok

    return F.array_join(F.filter(F.split(c, r"\n"), keep), "\n")
