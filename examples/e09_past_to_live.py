"""Past backfill crossing into live processing.

Mirrors ``/root/reference/examples/crossing.py``: replay a historical
queue, print "** Running live **" at the transition, then keep consuming
live events.  Here the past is a parquet backlog drained by the first
micro-batch; live files landing afterwards are picked up by the same
query; ``on_live_start`` fires on the first post-backlog batch.
"""

from __future__ import annotations

import tempfile
import time
from datetime import timedelta

from common import T0, get_example_spark, name_stream


def main(spark):
    from async_stream_processing_spark.streaming.replay import (
        process_stream,
        replay_stream,
    )

    schema = "ts timestamp, seq long, name string"
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        name_stream(spark).write.mode("overwrite").parquet(src)

        seen = []
        q = process_stream(
            replay_stream(spark, src, schema),
            lambda b, i: seen.extend((i, r["name"]) for r in b.collect()),
            on_start=lambda: print("** Replay starting **"),
            on_live_start=lambda: print("** Running live **"),
            checkpoint=f"{tmp}/ckpt",
            available_now=False,  # stay alive for live files
            past_path=src,  # live-start == this backlog drained
        )
        # wait for the backlog to drain, then land a "live" file
        deadline = time.time() + 60
        while time.time() < deadline and len(seen) < 5:
            time.sleep(0.5)
        spark.createDataFrame(
            [(T0 + timedelta(seconds=100), 999, "Zoe")], schema
        ).write.mode("append").parquet(src)
        while time.time() < deadline and len(seen) < 6:
            time.sleep(0.5)
        q.stop()
        print("events (batch_id, name):", seen)
    return seen


if __name__ == "__main__":
    main(get_example_spark())
