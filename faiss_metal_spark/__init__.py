"""faiss_metal_spark — a PySpark-native vector analytics engine.

A from-scratch engine with the query capabilities of the reference
flat-index vector search system (decisiongraph/faiss-metal, surveyed in
SURVEY.md), re-expressed Spark-first: DataFrame/SQL logical plans,
Catalyst/Tungsten physical execution, Arrow-vectorized Python only where
the built-ins can't express the semantics, plus the LLM-data-pipeline
operator extensions (dedup, similarity join, text analysis) the
north-star targets.
"""

from .compact_index import (
    BinaryIndex,
    BinaryHashIndex,
    BinaryHNSWIndex,
    BinaryIVFIndex,
    GraphIndex,
    Flat1DIndex,
    GraphPQIndex,
    GraphSQIndex,
    IMIIndex,
    LSHIndex,
    NSGIndex,
    IVFFlatDedupIndex,
    IVFIndex,
    IVFPQFastScanIndex,
    IVFPQIndex,
    IVFPQRIndex,
    IVFRQFastScanIndex,
    IVFRQIndex,
    IVFSQIndex,
    OPQIndex,
    PQFastScanIndex,
    PQIndex,
    PRQFastScanIndex,
    PRQIndex,
    RefineIndex,
    RQFastScanIndex,
    RQIndex,
    RowwiseMinMaxIndex,
    SQ8Index,
    index_factory,
)
from .operators.coarse import HNSWCoarseQuantizer
from .operators.kmeans import Kmeans
from .operators.pca import NormTransformIndex, PreTransformIndex
from .quantize import STORAGE_BF16, STORAGE_FP16, STORAGE_FP32
from .session import get_spark
from .sources.index_io import clone_index, read_index, write_index
from .sharded import ShardedIndex
from .vector_table import (
    IDMap2VectorTable,
    IDMapVectorTable,
    IDSelectorAnd,
    IDSelectorNot,
    IDSelectorOr,
    IDSelectorRange,
    IDSelectorXor,
    SearchParams,
    SearchToken,
    VectorTable,
)

__all__ = [
    "VectorTable",
    "IDMap2VectorTable",
    "IDMapVectorTable",
    "SearchToken",
    "IDSelectorAnd",
    "IDSelectorNot",
    "IDSelectorOr",
    "IDSelectorRange",
    "IDSelectorXor",
    "SearchParams",
    "ShardedIndex",
    "SQ8Index",
    "BinaryIndex",
    "BinaryHashIndex",
    "BinaryHNSWIndex",
    "BinaryIVFIndex",
    "GraphIndex",
    "Flat1DIndex",
    "GraphPQIndex",
    "GraphSQIndex",
    "IMIIndex",
    "LSHIndex",
    "NSGIndex",
    "IVFFlatDedupIndex",
    "IVFIndex",
    "IVFPQFastScanIndex",
    "IVFPQIndex",
    "IVFPQRIndex",
    "IVFSQIndex",
    "IVFRQFastScanIndex",
    "IVFRQIndex",
    "OPQIndex",
    "PQFastScanIndex",
    "PQIndex",
    "PRQFastScanIndex",
    "PRQIndex",
    "NormTransformIndex",
    "PreTransformIndex",
    "RefineIndex",
    "RQFastScanIndex",
    "RQIndex",
    "RowwiseMinMaxIndex",
    "index_factory",
    "Kmeans",
    "HNSWCoarseQuantizer",
    "write_index",
    "read_index",
    "clone_index",
    "get_spark",
    "STORAGE_FP32",
    "STORAGE_FP16",
    "STORAGE_BF16",
]

__version__ = "0.1.0"
