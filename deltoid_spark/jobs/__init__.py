from .partitioning import assign_partitions  # noqa: F401
from .pipeline import (  # noqa: F401
    compact,
    decode,
    encode,
    encode_append,
    history,
    metrics_summary,
    vacuum,
    verify,
)
