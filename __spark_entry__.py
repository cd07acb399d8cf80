"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship route->aggregate query at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators, each as a
(spark, sf_dir) callable with a DuckDB-executable ANSI-SQL oracle where
the semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from log_server_spark.queries import REGISTRY  # noqa: E402
from log_server_spark.queries_graft import REGISTRY_GRAFT  # noqa: E402
from log_server_spark.queries_ml import REGISTRY_ML  # noqa: E402
from log_server_spark.queries_web import REGISTRY_WEB  # noqa: E402

_ALL = {**REGISTRY_GRAFT, **REGISTRY, **REGISTRY_ML, **REGISTRY_WEB}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = _ALL["flagship_route_aggregate"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
