"""Physical-plan inspection helpers (pushdown/pruning/broadcast checks)."""

from .inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    read_schemas,
    wholestage_codegen_ids,
)
