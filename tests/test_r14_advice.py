"""Round-14 ADVICE closures, each pinned at its anchor:

1. ``registered_domain`` guards the ``element_at(labels, n-1)``
   subexpression explicitly with ``when(n >= 2, ...)`` so a bare
   projection on single-label / empty hosts cannot throw
   INVALID_INDEX_OF_ZERO under ANSI, independent of codegen
   short-circuit order (functions/url.py).
2. ``sources/index_io.py`` ``_is_engine_index`` tuple no longer carries
   the duplicated ``BinaryHNSWIndex`` entry (source-level pin).
3. ``IVFRQIndex.from_table`` / ``IVFRQFastScanIndex.from_table`` take
   ``nsplits`` (and everything after ``m``) keyword-only, so an old
   positional ``from_table(vt, n, m, 16384)`` call raises instead of
   silently rebinding 16384 to ``nsplits`` (compact_index.py).
4. ``domain_cap`` uses a collision-checked helper column: a caller
   DataFrame that already has ``_dom`` keeps it untouched
   (functions/url.py).
"""

import inspect
import os

import pytest

from faiss_metal_spark.compact_index import IVFRQFastScanIndex, IVFRQIndex
from faiss_metal_spark.functions.url import domain_cap, registered_domain


# -- 1. registered_domain ANSI-safe on degenerate hosts ---------------------


def test_registered_domain_single_label_ansi(spark):
    df = spark.createDataFrame(
        [
            ("http://localhost/x",),
            ("http://a/x",),
            ("not a url",),
            ("",),
            ("https://www.example.co.uk/p?q=1",),
            ("https://x.com/",),
        ],
        ["url"],
    )
    # Bare projection (no surrounding when()) must not throw under ANSI.
    rows = (
        df.select(registered_domain("url").alias("rd"))
        .collect()
    )
    vals = [r.rd for r in rows]
    assert vals[0] == "localhost"
    assert vals[1] == "a"
    # non-URLs parse to empty host -> empty registered domain
    assert (vals[2] or "") == ""
    assert (vals[3] or "") == ""
    assert vals[4] == "example.co.uk"
    assert vals[5] == "x.com"


# -- 2. no duplicated isinstance entry --------------------------------------


def test_index_io_no_duplicate_isinstance_entry():
    from faiss_metal_spark.sources import index_io

    src = inspect.getsource(index_io._is_engine_index)
    tuple_src = src[src.index("return isinstance") :]
    names = [
        ln.strip().rstrip(",")
        for ln in tuple_src.splitlines()
        if ln.strip().endswith(",")
    ]
    assert len(names) == len(set(names)), names


# -- 3. nsplits keyword-only ------------------------------------------------


@pytest.mark.parametrize("cls", [IVFRQIndex, IVFRQFastScanIndex])
def test_ivfrq_from_table_nsplits_keyword_only(cls):
    sig = inspect.signature(cls.from_table)
    p = sig.parameters["nsplits"]
    assert p.kind is inspect.Parameter.KEYWORD_ONLY
    assert sig.parameters["sample_size"].kind is inspect.Parameter.KEYWORD_ONLY
    # The old positional call shape must raise, not rebind.
    with pytest.raises(TypeError):
        cls.from_table(None, 8, 4, 16384)


# -- 4. domain_cap does not clobber a caller '_dom' column ------------------


def test_domain_cap_preserves_caller_dom_column(spark):
    df = spark.createDataFrame(
        [
            (i, f"https://site{i % 2}.com/p{i}", f"keep{i}")
            for i in range(8)
        ],
        ["doc_id", "url", "_dom"],
    )
    out = domain_cap(df, 2)
    assert "_dom" in out.columns
    got = {r.doc_id: r._dom for r in out.collect()}
    for did, v in got.items():
        assert v == f"keep{did}"
    # cap semantics still hold: <=2 per registered domain
    assert len(got) == 4
