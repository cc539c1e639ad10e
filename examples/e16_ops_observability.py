"""Operational analytics over the event log: the monitoring/lakehouse
queries an on-call engineer runs — data-quality gate, dimension history,
presence intervals, anomaly scores, interrupted conversions, smoothed
trends.

Every operator shown here is oracle-checked in `__spark_entry__.py`
(dq_audit, scd2_intervals, interval_coalesce, zscore_outliers,
pattern_no_interrupt, ewma_users, twap_daily); this example shows the
incident-triage flow they compose into.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

from pyspark.sql import functions as F

from common import get_example_spark, show

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_e16", str(Path(__file__).resolve().parents[1] / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    spec.loader.exec_module(mod)
    return mod


def main(spark):
    m = _entry()

    show(m.q_dq_audit(spark, SF_DIR), n=6,
         label="pre-ingest data-quality gate (violations per constraint)")

    show(
        m.q_zscore_outliers(spark, SF_DIR)
        .filter("is_outlier").orderBy(F.desc(F.abs(F.col("z")))),
        n=5,
        label="anomalous events (|z| > 2, integer-decided)",
    )

    show(
        m.q_pattern_no_interrupt(spark, SF_DIR).filter(~F.col("matched")),
        n=5,
        label="conversions BROKEN by an interruption (click->purchase "
              "with an error between)",
    )

    show(
        m.q_scd2_intervals(spark, SF_DIR).filter("is_current"),
        n=5,
        label="current dimension state per user (SCD2 open intervals)",
    )

    show(
        m.q_interval_coalesce(spark, SF_DIR)
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_islands")),
        n=5,
        label="presence islands per user (coalesced activity intervals)",
    )

    ewma = m.q_ewma_users(spark, SF_DIR)
    show(ewma, n=5, label="per-user EWMA of value (keyed ordered fold)")

    twap = m.q_twap_daily(spark, SF_DIR)
    show(twap.orderBy("user_id", "day"), n=5,
         label="daily time-weighted average value")
    return twap


if __name__ == "__main__":
    main(get_example_spark())
