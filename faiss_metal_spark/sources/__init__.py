from .index_io import (  # noqa: F401
    read_index,
    write_index,
)
from .layout import (  # noqa: F401
    bucketed_table,
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from .vector_io import (  # noqa: F401
    read_vectors,
    synthetic_vectors,
    write_vectors,
)
