from .vector_io import (  # noqa: F401
    read_vectors,
    synthetic_vectors,
    write_vectors,
)
