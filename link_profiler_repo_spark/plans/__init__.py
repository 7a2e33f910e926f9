from .inspect import (  # noqa: F401
    assert_no_single_partition_exchange,
    count_exchanges,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)
