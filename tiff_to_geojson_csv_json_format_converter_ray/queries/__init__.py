"""Driver-contract query package (split from __ray_entry__.py,
VERDICT r3 item 5): one module per definition-order chunk plus the
oracle-SQL parts and the thin registry."""

from .registry import (  # noqa: F401
    _REGISTRY_HEAD,
    entry,
    oracle_sql,
    queries,
)
