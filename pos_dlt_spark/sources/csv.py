"""Batch CSV sources — reference S1-S3 (`02_Data Generation.py:95-103,
148-158`; `03_Bronze-to-Silver ETL.py:130-140,188-197,217-226`).

All reads use explicit schemas and the reference's timestamp format; a
list of paths reads as one DataFrame (the reference's two-store multi-file
union, U1 at `02:89-92`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pos_dlt_spark.schemas import TIMESTAMP_FORMAT


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.csv(
        list(paths), header=header, schema=schema, timestampFormat=TIMESTAMP_FORMAT
    )
