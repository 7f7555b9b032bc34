"""Query registry — the engine's demonstrable operator inventory.

Every operator from SURVEY.md §2 (reference-parity tier) and the
extension tiers registers here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
ANSI-SQL oracle string for DuckDB differential testing. The driver
contract in ``__spark_entry__.py`` exposes this registry.

Registration is import-driven: importing this package pulls in every
query module.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None ⇒ rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``.

    Duplicate names fail at import: a silent overwrite means one of
    two different queries vanishes from the gate while its tests
    keep exercising whichever import order won."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(
                f"query {name!r} already registered by "
                f"{REGISTRY[name].fn.__module__}; rename "
                f"{fn.__module__}.{fn.__qualname__}"
            )
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module registers its queries
    from hivetomysql_spark.queries import (  # noqa: F401
        analytics_extras,
        analytics_extras2,
        analytics_extras3,
        analytics_extras4,
        analytics_extras5,
        analytics_extras6,
        analytics_extras7,
        analytics_extras8,
        analytics_extras9,
        analytics_extras10,
        analytics_extras11,
        analytics_extras12,
        analytics_extras13,
        analytics_extras14,
        analytics_extras15,
        analytics_extras16,
        analytics_extras17,
        analytics_extras18,
        analytics_extras19,
        analytics_extras20,
        analytics_extras21,
        analytics_extras22,
        analytics_extras23,
        analytics_extras24,
        analytics_extras25,
        analytics_extras26,
        analytics_extras27,
        analytics_extras28,
        analytics_extras29,
        analytics_extras30,
        analytics_extras31,
        analytics_extras32,
        analytics_extras33,
        analytics_extras34,
        analytics_extras35,
        analytics_extras36,
        analytics_extras37,
        analytics_extras38,
        analytics_extras39,
        analytics_extras40,
        analytics_extras41,
        analytics_extras42,
        analytics_extras43,
        analytics_extras44,
        analytics_extras45,
        analytics_extras46,
        analytics_extras47,
        analytics_extras48,
        analytics_extras49,
        analytics_extras50,
        analytics_extras51,
        analytics_extras52,
        analytics_extras53,
        analytics_extras54,
        analytics_extras55,
        analytics_extras56,
        analytics_extras57,
        analytics_extras58,
        analytics_extras59,
        analytics_extras60,
        analytics_extras61,
        analytics_extras62,
        analytics_extras63,
        analytics_extras64,
        analytics_extras65,
        analytics_extras66,
        analytics_extras67,
        analytics_extras68,
        analytics_extras69,
        analytics_extras70,
        analytics_extras71,
        analytics_extras72,
        analytics_extras73,
        analytics_extras74,
        analytics_extras75,
        analytics_extras76,
        analytics_extras77,
        analytics_extras78,
        analytics_extras79,
        analytics_extras80,
        corpus_stats,
        events_analytics,
        feature_eng,
        graph_iterative,
        incremental,
        llm,
        llm2,
        parity,
        relational,
        relational_advanced,
        relational_extras,
        scalar_functions,
        streaming_batch,
        tpch_shapes,
        tpch_shapes2,
        training_prep,
        windows,
    )

    _LOADED = True
