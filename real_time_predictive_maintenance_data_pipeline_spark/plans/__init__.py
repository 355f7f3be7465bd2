from .registry import Query, all_queries, get_query, register  # noqa: F401


def load_all() -> None:
    """Import every catalog module so registration side-effects run."""
    from . import (  # noqa: F401
        analytics,
        curation,
        governance,
        llm,
        relational,
        telemetry,
    )
