"""Query registry backing ``__ray_entry__.queries()`` / ``oracle_sql()``.

Each entry is a named pipeline/operator from SURVEY.md §2 (or a
training-data-scale extension), as a callable ``fn(sf_dir) -> Dataset |
pandas.DataFrame | pyarrow.Table``. Entries with a DuckDB-runnable ANSI-SQL
equivalent register it for the driver's side-by-side correctness gate;
genuinely non-SQL-expressible ops register ``sql=None`` (rows-only check).
Column names in the Ray result and the SQL MUST match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: Callable) -> Callable:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent), then make
    sure the golden-oracle parquet dumps exist for the non-SQL-expressible
    queries (computed once per machine; see golden.py)."""
    from . import (  # noqa: F401
        ann,
        cleanse,
        dedup_ops,
        docspans,
        lexical,
        multimodal,
        relops,
        sketch,
        textan,
    )
    from .golden import ensure_goldens

    ensure_goldens()
