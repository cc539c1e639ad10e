"""Shared fixtures for the examples -- the engine-side analog of
``/root/reference/examples/common.py`` (NAMES, Greeter, log helpers).

Each example mirrors one reference example 1:1 (docstring cites it) so a
reference user can diff the two side by side.  Data is built inline exactly
like the reference examples do; every example exposes ``main(spark)`` and
is runnable standalone.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parents[1])
sys.path.insert(0, _REPO_ROOT)
# Python workers (pandas UDFs, custom DataSources) import the package by
# module path -- make the repo importable for them too when examples run
# standalone from this directory.
os.environ["PYTHONPATH"] = _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

#: Reference NAMES list (common.py:7) -- repeated keys exercise first-seen.
NAMES = ["John", "Paula", "Fred", "John", "Paula"]

T0 = datetime(2025, 1, 1)


def get_example_spark() -> SparkSession:
    from async_stream_processing_spark import get_spark

    spark = get_spark("examples", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def name_stream(spark: SparkSession, names=None, step_s: float = 1.0) -> DataFrame:
    """The reference's ``zip(timestamps(start, 1s), NAMES)`` past stream
    (examples/past.py) as an event relation."""
    names = names or NAMES
    rows = [
        (T0 + timedelta(seconds=i * step_s), i + 1, n) for i, n in enumerate(names)
    ]
    return spark.createDataFrame(rows, "ts timestamp, seq long, name string")


def series(spark: SparkSession, pairs, stream_id: int = 0) -> DataFrame:
    """(seconds_offset, value) pairs -> event relation."""
    rows = [
        (T0 + timedelta(seconds=s), (stream_id << 40) + i + 1, float(v))
        for i, (s, v) in enumerate(pairs)
    ]
    return spark.createDataFrame(rows, "ts timestamp, seq long, value double")


def show(df: DataFrame, n: int = 10, label: str = "") -> None:
    if label:
        print(f"-- {label}")
    df.show(n, truncate=False)
