"""Empirical check of Spark session_window merge semantics at the
exactly-one-gap boundary (round-8, VERDICT item 1).

Two events 00:00 and 00:10 with a 10-minute gap: does Spark merge them
(inclusive boundary) or split (exclusive)? Same probe for dynamic-gap
(Column gap) windows where the second event starts exactly at the first
event's window end.
"""
import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

rows = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0), "view"),
    (1, datetime.datetime(2024, 1, 1, 0, 10, 0), "view"),
]
df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")

static = (
    df.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
    .agg(F.count("*").alias("n"))
    .select("w.start", "w.end", "n")
    .collect()
)
print("STATIC gap=10min, events at 00:00 and 00:10:")
for r in static:
    print("  ", r)
print("  -> MERGED" if len(static) == 1 else "  -> SPLIT")

# dynamic: first event is a purchase (20-min gap), second 00:20 exactly
rows2 = [
    (1, datetime.datetime(2024, 1, 1, 0, 0, 0), "purchase"),
    (1, datetime.datetime(2024, 1, 1, 0, 20, 0), "view"),
]
df2 = spark.createDataFrame(rows2, "user_id int, ts timestamp, event_type string")
gap = F.when(F.col("event_type") == "purchase", F.lit("20 minutes")).otherwise(
    F.lit("10 minutes")
)
dyn = (
    df2.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
    .agg(F.count("*").alias("n"))
    .select("w.start", "w.end", "n")
    .collect()
)
print("DYNAMIC gap (purchase=20m), events at 00:00(purchase) and 00:20:")
for r in dyn:
    print("  ", r)
print("  -> MERGED" if len(dyn) == 1 else "  -> SPLIT")

spark.stop()
