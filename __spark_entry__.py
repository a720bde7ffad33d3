"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship per-partition verdict pipeline at sf0.001;
queries()/oracle_sql() map every implemented operator family from
SURVEY.md §2 (+ training-data ops from the task brief) onto the
/root/testdata tables with DuckDB-exact oracle twins where the operator is
SQL-expressible (approximate sketches — MinHash/SimHash/IVF/HLL/KLL —
are rows-only by design and covered by pytest with planted data).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from faang_pydantics_validation_spark.contract import QUERIES  # noqa: E402
from faang_pydantics_validation_spark.contract_oracles import ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-suite verdict table over events at sf0.001."""
    return QUERIES["verdicts_events_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
