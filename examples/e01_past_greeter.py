"""Past-stream replay + first-seen greeting.

Mirrors ``/root/reference/examples/past.py`` (replay NAMES at 1 s spacing
through ``Greeter.greet``, common.py:25-34): "Hello X" on the first
occurrence of a name, "Hello again X" after.  The callback becomes a
column expression over the first-seen marker -- same output, set-membership
state replaced by ``row_number() = 1``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from common import get_example_spark, name_stream, show


def main(spark):
    from async_stream_processing_spark.operators.dedup import mark_first_seen

    names = name_stream(spark)
    greeted = mark_first_seen(names, "name").withColumn(
        "greeting",
        F.when(F.col("is_first"), F.concat(F.lit("Hello "), F.col("name")))
        .otherwise(F.concat(F.lit("Hello again "), F.col("name"))),
    ).orderBy("ts", "seq")
    show(greeted.select("ts", "name", "greeting"), label="past.py replay")
    return greeted


if __name__ == "__main__":
    main(get_example_spark())
