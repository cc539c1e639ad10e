"""Replay-throughput measurement vs BASELINE.md.

The reference's replay loop (single thread, single asyncio loop) is flat
at ~192-235k events/s regardless of stream count (BASELINE.md:18-20).
This measures the engine's equivalent WORST CASE: a fully-ordered replay
-- parquet scan -> global (ts, seq) sort -> sink -- i.e. one total
order, no key parallelism, the shape least favorable to a distributed
engine.  Keyed replays parallelize beyond it.

Usage: python tools/replay_throughput.py [n_events ...]
Prints one JSON line per n with cold/warm wall times and events/s.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import functions as F

    from async_stream_processing_spark import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark("replay-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    for n in ns:
        src = tempfile.mkdtemp(prefix="replay_src_")
        # shuffled event times so the global sort is real work, plus a
        # payload column so rows aren't degenerate
        (
            spark.range(n)
            .select(
                F.col("id").alias("seq"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000)
                    + (F.abs(F.xxhash64("id")) % F.lit(86_400))
                ).alias("ts"),
                (F.abs(F.xxhash64("id", F.lit(1))) % 10_000).alias("user_id"),
                (F.abs(F.xxhash64("id", F.lit(2))) % 100_000 / 100.0).alias(
                    "value"
                ),
            )
            .write.mode("overwrite")
            .parquet(src)
        )

        def replay() -> float:
            t0 = time.time()
            (
                spark.read.parquet(src)
                .orderBy("ts", "seq")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            return time.time() - t0

        cold = replay()
        warm = min(replay() for _ in range(2))
        print(
            json.dumps(
                {
                    "n": n,
                    "cold_s": round(cold, 3),
                    "warm_s": round(warm, 3),
                    "cold_events_per_s": int(n / cold),
                    "warm_events_per_s": int(n / warm),
                }
            )
        )
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
