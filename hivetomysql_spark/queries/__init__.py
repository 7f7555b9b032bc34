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
        business_suite,
        dataquality_suite,
        events_suite,
        graph_suite,
        llmops_suite,
        misc_suite,
        ml_suite,
        multimodal_suite,
        privacy_suite,
        relational_suite,
        similarity_suite,
        sketches_suite,
        stats_suite,
        text_suite,
        timeseries_suite,
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
