from .inspect import (  # noqa: F401
    executed_plan,
    exchange_count,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    unpartitioned_windows,
)
