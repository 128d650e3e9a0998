from .vector import cosine_dist, cosine_sim, dot, l2sq, l2sq_decomp, sqnorm

__all__ = ["sqnorm", "dot", "l2sq", "l2sq_decomp", "cosine_sim", "cosine_dist"]
