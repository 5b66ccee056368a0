"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (region_performance — the
5-way star join + KPI mart, reference mart_dept_performance analog) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full operator
registry from instacart_medallion_lakehouse_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instacart_medallion_lakehouse_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.queries()["region_performance"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.3."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return _q.oracle_sql()
