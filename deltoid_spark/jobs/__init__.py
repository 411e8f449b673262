from .partitioning import assign_partitions  # noqa: F401
from .pipeline import decode, encode, metrics_summary, verify  # noqa: F401
