from .knn import RESULT_SCHEMA, knn_search

__all__ = ["knn_search", "RESULT_SCHEMA"]
