"""Profile the streaming gates' micro-batch cost breakdown (r13 §1).

Replays stream_sessions / stream_interval_join exactly as the registry
queries build them, but keeps the StreamingQuery handle so the
per-batch ``durationMs`` / ``stateOperators`` metrics can be printed —
the data bench.py's end-to-end timing cannot show. Optional env:
  STREAM_PROFILE_CONF='k=v;k=v'  extra session conf (e.g. RocksDB
                                 state store provider) applied BEFORE
                                 the stream starts.
Usage: python tools/profile_streams.py [sessions|interval|both] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_sessions(spark):
    from pyspark.sql import functions as F

    from sparker_spark.entry_r3e import STREAM_GAP, _SINK_SEQ
    from sparker_spark.entry_r5 import _stage_copy
    from sparker_spark.streaming.incremental import streaming_sessionize

    path = f"{SF_DIR}/events.parquet"
    stage = _stage_copy(path, "stream_sessions_prof_")
    batch_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    out = streaming_sessionize(stream, gap=STREAM_GAP, watermark="3650 days")
    sink = f"prof_sessions_{next(_SINK_SEQ)}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.table(sink).count()
    return q, n


def run_interval(spark):
    from pyspark.sql import functions as F

    from sparker_spark.entry import _load_events
    from sparker_spark.entry_r3e import _SINK_SEQ
    from sparker_spark.entry_r5 import (
        INTERVAL_JOIN_SPAN,
        STREAM_WATERMARK,
        _stage_frame,
    )
    from sparker_spark.streaming.incremental import streaming_interval_join

    ev = _load_events(spark, SF_DIR)
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    ls = _stage_frame(left, "prof_ij_left_", key=SF_DIR)
    rs = _stage_frame(right, "prof_ij_right_", key=SF_DIR)
    lstream = spark.readStream.schema(spark.read.parquet(ls).schema).parquet(ls)
    rstream = spark.readStream.schema(spark.read.parquet(rs).schema).parquet(rs)
    out = streaming_interval_join(
        lstream, rstream, key="user_id", interval=INTERVAL_JOIN_SPAN,
        watermark=STREAM_WATERMARK,
    )
    sink = f"prof_interval_{next(_SINK_SEQ)}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.table(sink).count()
    return q, n


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from sparker_spark.session import get_spark

    extra = {}
    for kv in os.environ.get("STREAM_PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(
        app_name="profile_streams",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in extra.items():
        print(f"# conf {k}={v}")

    runners = {"sessions": run_sessions, "interval": run_interval}
    names = list(runners) if which == "both" else [which]
    for name in names:
        for rep in range(reps):
            spark.catalog.clearCache()
            import gc

            gc.collect()
            t0 = time.time()
            q, n = runners[name](spark)
            wall = time.time() - t0
            prog = [json.loads(p.json) for p in q.recentProgress]
            print(f"\n== {name} rep{rep}: wall={wall:.2f}s rows={n} "
                  f"batches={len(prog)}")
            for p in prog:
                d = p.get("durationMs", {})
                so = p.get("stateOperators", [])
                state = " ".join(
                    f"[rows={s.get('numRowsTotal')} "
                    f"commit={s.get('commitTimeMs')}ms "
                    f"mem={s.get('memoryUsedBytes')}]"
                    for s in so
                )
                print(f"  batch {p.get('batchId')}: in={p.get('numInputRows')} "
                      f"dur={d} {state}")


if __name__ == "__main__":
    main()
