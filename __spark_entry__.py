"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship transcript→KG pipeline at sf0.001-ish scale.
``queries``/``oracle_sql``: operator-backed queries over the driver's parquet
tables with DuckDB oracles (see sopspark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    try:
        from sopspark.session import _package_zip

        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added, or driver-local execution only


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcript→KG construction at smoke scale — synth
    corpus (input_hint schema) → window turn assembly → vectorized triple
    extraction → broadcast entity linking → owl:sameAs CC merge → graph
    table. Returns the materialized triple set as flat strings."""
    _ship_package(spark)
    from sopspark.queries import q_kg_flagship

    return q_kg_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sopspark.queries import QUERIES, _wrapped

    return _wrapped()


def oracle_sql() -> dict[str, str]:
    from sopspark.queries import ORACLES

    return dict(ORACLES)
