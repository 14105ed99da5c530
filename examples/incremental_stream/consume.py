"""Incremental consumption via the stream-cursor API: consume_dataframe
returns only the records past the persisted cursor and advances it; the
cursor becomes durable ONLY after this node's outputs commit
(exactly-once). The running totals merge in with an UPSERT."""
from basis_devkit_spark import *


@node
def consume(events=InputStream, out=OutputTable):
    from pyspark.sql import functions as F

    batch = events.consume_dataframe()  # rows past the cursor; advances it
    if batch.isEmpty():
        return
    inc = batch.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
    )
    if out.exists:
        prev = out.read_dataframe().select(
            F.col("event_type").alias("__t"),
            F.col("n").alias("__n"),
            F.col("total").alias("__tot"),
        )
        inc = (
            inc.join(prev, F.col("event_type") == F.col("__t"), "left")
            .select(
                "event_type",
                (F.col("n") + F.coalesce(F.col("__n"), F.lit(0))).alias("n"),
                (F.col("total") + F.coalesce(F.col("__tot"), F.lit(0.0))).alias("total"),
            )
        )
    out.upsert(inc)
