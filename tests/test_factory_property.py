"""Property fuzz of the index_factory spec grammar.

The factory is the faiss-user entry point and its grammar grew across
rounds (transform prefixes, RFlat suffix, x<b> code widths); pinned
here: every well-formed spec maps to the documented class, malformed
specs raise ValueError (never an arbitrary crash), and whitespace is
insignificant — for ANY generated spec, not just the curated list."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from faiss_metal_spark import (
    GraphIndex,
    IMIIndex,
    IVFFlatDedupIndex,
    IVFIndex,
    IVFPQIndex,
    IVFPQRIndex,
    IVFSQIndex,
    LSHIndex,
    PQIndex,
    PreTransformIndex,
    RefineIndex,
    SQ8Index,
    VectorTable,
    index_factory,
)

_spark = None
_vt = None


def _get_vt():
    global _spark, _vt
    if _spark is None:
        from faiss_metal_spark.session import get_spark

        _spark = get_spark("faiss-metal-spark-tests")
        rng = np.random.default_rng(5)
        V = rng.uniform(-1, 1, size=(300, 16)).astype(np.float32)
        _vt = VectorTable(_spark, 16).add_numpy(V)
    return _vt


# (spec template, expected class) — m/nlist values valid for d=16, n=300
_VALID = [
    ("Flat", VectorTable),
    ("SQ8", SQ8Index),
    ("SQ4", SQ8Index),
    ("PQ4", PQIndex),
    ("PQ4x4", PQIndex),
    ("PQ2x6", PQIndex),
    ("IVF4", IVFIndex),
    ("IVF4,Flat", IVFIndex),
    ("IVF4,FlatDedup", IVFFlatDedupIndex),
    ("IVF4,PQ4x4", IVFPQIndex),
    ("IVF4,SQ8", IVFSQIndex),
    ("IVF4,PQ4+4", IVFPQRIndex),
    ("IMI2x2", IMIIndex),
    ("HNSW4", GraphIndex),
    ("NSG4", GraphIndex),
    ("LSH16", LSHIndex),
    # r10: OPQ as a TRUE transform prefix (faiss "OPQ16,IVF64,PQ16");
    # bare "OPQ<m>"/"OPQ<m>,PQ<m>" keep building the fused OPQIndex
    ("OPQ4,IVF4,PQ4x4", PreTransformIndex),
    ("OPQ4,IVF4,Flat", PreTransformIndex),
    ("OPQ4_8,PQ4", PreTransformIndex),  # dimension-reducing OPQ form
]


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    case=st.sampled_from(_VALID),
    pad=st.sampled_from(["", " ", "  "]),
    rflat=st.booleans(),
)
def test_factory_grammar_well_formed(case, pad, rflat):
    spec, want = case
    vt = _get_vt()
    s = spec.replace(",", f",{pad}")
    if rflat:
        s = f"{s},RFlat"
        want = RefineIndex
    kw = {"sample_size": 300} if any(
        t in spec for t in ("IVF", "PQ", "IMI")
    ) else {}
    if "HNSW" in spec or "NSG" in spec:
        kw = {"iters": 2}
    idx = index_factory(vt, f"{pad}{s}", **kw)
    assert isinstance(idx, want), (s, type(idx).__name__)
    if hasattr(idx, "release"):
        idx.release()
    elif isinstance(idx, RefineIndex) and hasattr(idx.base, "release"):
        idx.base.release()


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    bad=st.sampled_from(
        [
            "Flats", "SQ5", "SQ9", "PQ", "PQ4x", "PQ4x9", "PQ4x0", "IVF",
            "IVF4,", "IVF4,PQ", "IVF4,SQ5", "IVF4,FlatDedupX", "IMI3x4",
            "HNSW", "LSHx", "RFlat", ",RFlat", "PCA,IVF4", "RR0x,Flat",
            "IVF4,PQ4+", "OPQ4,PQ8", "OPQ4_10,PQ4", "OPQ4_32,PQ4",
            "BHash", "nonsense", "",
        ]
    )
)
def test_factory_grammar_malformed_refuses(bad):
    vt = _get_vt()
    with pytest.raises(ValueError):
        index_factory(vt, bad)
