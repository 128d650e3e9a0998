"""URL canonicalization + domain extraction — the web-corpus curation
surface (CCNet / RefinedWeb / Dolma-style pipelines dedupe and cap BY
DOMAIN before any content pass; C4 keeps a URL blocklist). The
reference engine has no text surface at all
(/root/reference/include/faiss-metal/MetalIndexFlat.h:47) — this is
part of the LLM-pipeline superset, and it deliberately stays ALL
Catalyst (regexp/split projections in whole-stage codegen — no Python
per row, no UDF, ANSI-replayable) so it runs at scan time on a 100 TB
crawl with zero extra shuffles.

Operators:

- :func:`canonicalize_url` — the dedup key normalization: lowercase
  scheme+authority, strip fragments, strip tracking params
  (utm_*/gclid/fbclid/msclkid/ref), drop default ports and empty
  queries, trim trailing slashes.
- :func:`url_domain` — the authority host (userinfo and port
  stripped, lowercased).
- :func:`registered_domain` — approximate eTLD+1 (last two labels;
  three when the TLD is a 2-letter country code behind a common
  second-level label like ``co``/``com``/``ac``/``gov`` — the
  documented public-suffix APPROXIMATION; a full PSL belongs in a
  lookup table joined at ingestion).
- :func:`domain_blocklist_filter` — drop rows whose registered domain
  is on a literal blocklist (plan literal — broadcast by
  construction).
- :func:`domain_cap` — ≤ n docs per registered domain, the
  deterministic md5-order downsample (delegates to
  :func:`~faiss_metal_spark.pipeline.stratified_cap` — one shared
  statement of the cap semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking params stripped by canonicalize_url (the common
# cross-pipeline set; callers pass their own via `tracking_params`).
TRACKING_PARAMS = ["utm_[^=&#]*", "gclid", "fbclid", "msclkid", "ref"]

# Second-level labels that commonly sit under 2-letter ccTLDs
# (co.uk, com.au, ac.jp, gov.in, ...) — the eTLD+1 approximation.
_SECOND_LEVEL = ("co", "com", "net", "org", "gov", "ac", "edu")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_url(
    url: Column | str, tracking_params: list[str] | None = None
) -> Column:
    """Canonical URL string for exact URL-level dedup — one Catalyst
    regexp chain (see module docstring for the rule list). Rules apply
    in order: fragment → lowercase scheme+authority → default port →
    tracking params → empty/dangling query separators → trailing
    slashes. Deterministic, and each rule is a plain regexp any SQL
    engine replays (the oracle runs the identical chain in DuckDB with
    the 'g' flag)."""
    u = F.trim(_c(url))
    # 1. fragment never survives
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme + authority (never the path/query): split at
    #    the first slash after "//", lowercase the prefix, re-attach
    pre = F.regexp_extract(u, r"^([^/]*//[^/?#]*)", 1)
    u = F.concat(F.lower(pre), F.substring(u, F.length(pre) + F.lit(1), F.lit(1 << 30)))
    # 3. default ports (capture the boundary — no lookarounds, so the
    #    DuckDB oracle's RE2 replays the identical pattern)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80($|[/?#])", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443($|[/?#])", "$1$2")
    # 4. tracking params: split the query into its param list, keep
    #    the non-tracking survivors, re-attach (exact — no separator
    #    repair heuristics; empty query drops its '?')
    pats = TRACKING_PARAMS if tracking_params is None else list(tracking_params)
    drop = "^(" + "|".join(pats) + ")="
    base = F.substring_index(u, "?", 1)
    query = F.when(
        F.length(u) > F.length(base),
        F.substring(u, F.length(base) + F.lit(2), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(drop),
    )
    u = F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)
    # 5. trailing slashes (path-end only — the URL's end by now);
    #    capture the preceding char instead of a lookbehind (RE2)
    u = F.regexp_replace(u, r"([^/])/+$", "$1")
    return u


def url_domain(url: Column | str) -> Column:
    """Authority host of a URL, lowercased, userinfo/port stripped
    (empty string when the value does not parse as a URL)."""
    return F.lower(
        F.regexp_extract(
            _c(url), r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
        )
    )


def _parse_psl(psl) -> tuple[set, set, set, int]:
    """Split PSL rule lines into (exact, wildcard-base, exception)
    sets + the longest rule's label count. Accepts raw
    publicsuffix.org lines: blanks and ``//`` comments are skipped,
    ``*.``-prefixed rules contribute their base, ``!``-prefixed rules
    are exceptions."""
    exact, wild, exc = set(), set(), set()
    max_j = 1
    for raw in psl:
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            body = rule[1:]
            exc.add(body)
            max_j = max(max_j, body.count(".") + 1)
        elif rule.startswith("*."):
            body = rule[2:]
            wild.add(body)
            max_j = max(max_j, body.count(".") + 2)
        else:
            exact.add(rule)
            max_j = max(max_j, rule.count(".") + 1)
    return exact, wild, exc, max_j


def registered_domain(
    url: Column | str, from_host: bool = False, psl=None
) -> Column:
    """eTLD+1 of a URL's host.

    Default (``psl=None``): the documented zero-dependency
    APPROXIMATION — last two labels, three when the TLD is a 2-letter
    country code behind a common second-level label (``a.b.co.uk`` →
    ``b.co.uk``, ``www.x.com`` → ``x.com``).

    ``psl=``: an iterable of public-suffix rules (raw
    publicsuffix.org list lines — comments/blanks skipped, ``*.``
    wildcard and ``!`` exception rules honored per the PSL algorithm:
    prevailing rule = any matching exception, else the longest match,
    else ``*``). Real crawls need this: the heuristic caps and blocks
    ``*.github.io`` / ``*.blogspot.com``-class suffixes incorrectly.
    Compiled into a bounded literal-set expression (Catalyst turns
    large ``isin`` lists into an InSet hash probe — a plan constant,
    broadcast by construction, no Python per row and no extra
    shuffle; the full ~10k-rule PSL is ~100 KB of plan literal).

    Pass ``from_host=True`` when the column already holds a bare
    host."""
    host = F.lower(_c(url)) if from_host else url_domain(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    if psl is None:
        # Guard the n-1 index explicitly: element_at(_, 0) throws
        # under ANSI, and relying on when()-short-circuit codegen
        # order is fragile across plan rewrites (single-label/empty
        # hosts hit it).
        second = F.when(n >= 2, F.element_at(labels, n - 1))  # 2nd-to-last
        tld = F.when(n >= 1, F.element_at(labels, n))
        cc = (F.length(tld) == 2) & second.isin(*_SECOND_LEVEL)
        take = F.when(cc & (n >= 3), F.lit(3)).otherwise(F.lit(2))
        return F.when(n <= take, host).otherwise(
            F.array_join(F.slice(labels, n - take + 1, take), ".")
        )

    exact, wild, exc, max_j = _parse_psl(psl)

    def suffix(j):
        # last j labels joined; start clamps to 1 so slice never sees
        # a 0/negative index when n < j (the n >= j gate decides the
        # VALUE, the clamp keeps evaluation-order independence — the
        # ADVICE-1 ANSI lesson)
        return F.array_join(
            F.slice(labels, F.greatest(n - F.lit(j) + 1, F.lit(1)), F.lit(j)),
            ".",
        )

    # public-suffix label count by PSL precedence: exception rules
    # first (ps = rule minus its first label), else the LONGEST
    # matching exact/wildcard rule (scan j descending), else 1 ("*").
    ps_len = F.lit(1)
    for j in range(2, max_j + 1):  # longest wins: later when() = outer
        cond = (n >= j) & F.lit(False)
        if exact:
            cond = cond | suffix(j).isin(*sorted(exact))
        if wild and j >= 2:
            cond = cond | suffix(j - 1).isin(*sorted(wild))
        ps_len = F.when((n >= j) & cond, F.lit(j)).otherwise(ps_len)
    # j == 1 exact rules (plain TLD entries like "com") keep ps_len at
    # 1 — already the default.
    for j in sorted({r.count(".") + 1 for r in exc}):
        ps_len = F.when(
            (n >= j) & suffix(j).isin(*sorted(e for e in exc if e.count(".") + 1 == j)),
            F.lit(j - 1),
        ).otherwise(ps_len)
    take = ps_len + 1
    return F.when(n <= take, host).otherwise(
        F.array_join(
            F.slice(labels, F.greatest(n - take + 1, F.lit(1)), take), "."
        )
    )


def domain_blocklist_filter(
    docs: DataFrame, blocked: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is on ``blocked`` (literal
    list — a plan constant, broadcast by construction; a million-entry
    blocklist belongs in a broadcast anti-join instead)."""
    dom = registered_domain(url_col)
    return docs.where(~dom.isin(*[b.lower() for b in blocked]))


def domain_cap(
    docs: DataFrame,
    n_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """≤ ``n_per_domain`` docs per registered domain, deterministic
    md5(id) order — the over-crawled-domain downsample. Delegates to
    :func:`~faiss_metal_spark.pipeline.stratified_cap` so the cap
    semantics have one statement engine-wide."""
    from ..pipeline import stratified_cap

    # Collision-checked helper column: never silently overwrite (and
    # then drop) a caller column that happens to be named "_dom".
    dom_col = "_dom"
    while dom_col in docs.columns:
        dom_col = "_" + dom_col
    tagged = docs.withColumn(dom_col, registered_domain(url_col))
    return stratified_cap(tagged, dom_col, n_per_domain, id_col=id_col).drop(
        dom_col
    )
