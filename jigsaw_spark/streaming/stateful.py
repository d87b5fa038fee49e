"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (SURVEY §2.8); this is the engine
extension for incremental session/user state over the event stream. The
operator contract:

  - state lives per group key, survives across micro-batches (and across
    restarts via the checkpoint), so a run with Trigger.AvailableNow can be
    re-invoked as new files land and counts keep accumulating — the
    transactional generalization of the reference's skip-existing
    incrementality (F8, jigsaw/io_utils.py:89,150).
  - within a batch the kernel sees Arrow batches per key; cross-batch
    ordering is the file arrival order, which is why the sessionization
    state keeps `last_ts` rather than assuming sorted input.

Scale: state is partitioned by the group key across executors (HDFS/RocksDB
state store on a real cluster); the shuffle is on user_id only, and each
micro-batch moves only new data.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800


def stateful_user_sessions(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Per-user cumulative (n_events, n_sessions) maintained in group state.

    Sessions use the reference-free gap rule shared with the batch
    w1_sessionize query: a new session starts when the gap since the
    previous event exceeds ``gap_seconds``. When the full history arrives
    time-ordered in one batch this emits exactly the batch answer (the
    parity the test asserts); incrementally it continues from stored state.
    Output mode: update — one row per user per batch with running totals.
    """

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        n_events, n_sessions, last_us = (
            state.get if state.exists else (0, 0, None)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts")
        for ts in rows["ts"]:
            us = int(ts.value // 1000)  # pandas ns -> micros
            if last_us is None or (us - last_us) > gap_seconds * 1_000_000:
                n_sessions += 1
            last_us = us
            n_events += 1
        state.update((n_events, n_sessions, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, n_sessions long",
        stateStructType="n_events long, n_sessions long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessions(
    spark,
    src_path: str,
    checkpoint: str,
    out_dir: str | None = None,
    glob: str = "*.parquet",
    gap_seconds: int = SESSION_GAP_SECONDS,
):
    """Drain the event stream through the stateful session operator with
    AvailableNow, appending each micro-batch's updates to a parquet dir via
    foreachBatch (the memory sink cannot recover from a checkpoint; this
    sink can). Returns (out_dir, DataFrame over every update written so
    far). Re-running with the same checkpoint resumes from stored state —
    incremental semantics."""
    import os

    from jigsaw_spark.streaming.ingest import read_event_stream

    out_dir = out_dir or os.path.join(checkpoint, "_updates")
    stream = read_event_stream(spark, src_path, glob=glob)
    out = stateful_user_sessions(stream, gap_seconds)

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir, spark.read.parquet(out_dir)


def tws_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats on the Spark 4 ``transformWithState`` API
    (the typed-state successor to applyInPandasWithState): ValueState for
    (n_events, total_value, max_value) + MapState for per-event-type
    counts. Emits one row per user per micro-batch with cumulative
    values, so an AvailableNow full-history drain equals the batch
    groupBy answer (the parity the oracle asserts).

    Scale: state is keyed by user_id and partitioned across the state
    store (RocksDB at volume — ingest.rocksdb_state_conf); each batch
    shuffles only its own rows, and MapState keeps per-type counts
    without serializing the whole map per update (point lookups), the
    API's actual advantage over a single struct blob."""
    try:  # the TWS state-server protocol needs the protobuf runtime
        import google.protobuf  # noqa: F401
    except ImportError as e:  # container constraint, same class as cv2/PIL
        raise NotImplementedError(
            "transformWithState requires the `protobuf` package (Spark's "
            "Python state-server protocol is protobuf-framed); it is not "
            "installed in this container. applyInPandasWithState "
            "(stateful_user_sessions) is the dependency-free path."
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # money-style totals accumulate in integer cents: exact,
            # order-independent, and oracle-reproducible (SCALE.md §4.1)
            self.totals = handle.getValueState(
                "totals", "n long, cents long, mx double"
            )
            self.by_type = handle.getMapState(
                "by_type", "t string", "c long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents, mx = (
                self.totals.get() if self.totals.exists() else (0, 0, None)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    (pdf["value"] * 100).round().astype("int64").sum()
                )
                bmax = float(pdf["value"].max())
                mx = bmax if mx is None else max(mx, bmax)
                for t, c in pdf["event_type"].value_counts().items():
                    prev = (
                        self.by_type.getValue((t,))[0]
                        if self.by_type.containsKey((t,))
                        else 0
                    )
                    self.by_type.updateValue((t,), (prev + int(c),))
            self.totals.update((n, cents, mx))
            n_types = sum(1 for _ in self.by_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                    "max_value": [mx],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStats(),
            outputStructType=(
                "user_id long, n_events long, total_cents long, "
                "max_value double, n_types long"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )


def run_tws_user_stats(
    spark, src_path: str, checkpoint: str, glob: str = "*.parquet"
):
    """AvailableNow drain of the transformWithState operator through a
    restart-safe foreachBatch parquet sink (same harness contract as
    run_stateful_sessions)."""
    import os

    from jigsaw_spark.streaming.ingest import read_event_stream

    out_dir = os.path.join(checkpoint, "_updates")
    out = tws_user_stats(read_event_stream(spark, src_path, glob=glob))

    def sink(batch_df, _batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_dir, spark.read.parquet(out_dir)
