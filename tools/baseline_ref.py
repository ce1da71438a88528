#!/usr/bin/env python3
"""Reference baseline: a faithful PySpark port of the reference's
batch backfill (spark_batch_backfill.py:29-87) mapped onto the events
table — silver transform (epoch->ts, bool normalize, key dedup,
guarded ratio) -> silver parquet, then gold 15-minute window agg ->
gold parquet (stand-in for the JDBC sink; no Postgres in the sandbox).

Run once to populate BASELINE.md:
  python3 tools/baseline_ref.py /root/testdata/sf0.1

Configs are the reference's own: default shuffle partitions, default
AQE — the point is to measure the reference pipeline as written.
"""
import sys, time, shutil

from pyspark.sql import SparkSession
from pyspark.sql.functions import col, when, expr, window, get_json_object, date_trunc

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = "/tmp/baseline_ref_out"
shutil.rmtree(out, ignore_errors=True)

spark = (SparkSession.builder.appName("RefBatchBackfill")
         .master("local[32]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("WARN")

t0 = time.time()

bronze = spark.read.format("parquet").load(f"{sf_dir}/events.parquet")

# The testdata has shipped ts as BOTH parquet ns (read as long under
# the legacy flag) and plain us TIMESTAMP_NTZ depending on the
# generation — fold both to a timestamp, exactly like the library's
# Tables.normalizeEventTs, so the baseline runs on either vintage.
from pyspark.sql.types import LongType
if isinstance(bronze.schema["ts"].dataType, LongType):
    ts_expr = "timestamp_micros(ts div 1000)"
else:
    ts_expr = "CAST(ts AS TIMESTAMP)"

# silver: mirrors the reference line for line (event_ts normalize,
# 0/1->bool coercion, key dedup, guarded ratio)
silver = (
    bronze
    .withColumn("event_minute", date_trunc("minute", expr(ts_expr)))
    .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
    .withColumn("is_error_int", (col("event_type") == "error").cast("int"))
    .withColumn("is_error", when(col("is_error_int") == 1, True)
                .otherwise(col("is_error_int").cast("boolean")))
    .drop("is_error_int")
    .dropDuplicates(["event_id"])
    .withColumn(
        "pct_value",
        when((col("value") + col("k")) > 0,
             col("value") / (col("value") + col("k")).cast("double"))
        .otherwise(None))
)
silver.write.mode("overwrite").format("parquet").save(f"{out}/silver")

gold = (
    spark.read.parquet(f"{out}/silver")
    .groupBy(window(col("event_minute"), "15 minutes"), col("event_type"))
    .agg(expr("avg(pct_value) as avg_pct_value"),
         expr("avg(value) as avg_value"),
         expr("count(*) as n_events"))
    .withColumn("window_start", col("window.start"))
    .withColumn("window_end", col("window.end"))
    .drop("window")
)
gold.write.mode("overwrite").format("parquet").save(f"{out}/gold")

wall = time.time() - t0
n_silver = spark.read.parquet(f"{out}/silver").count()
n_gold = spark.read.parquet(f"{out}/gold").count()
print(f'{{"baseline":"ref_backfill","sf":"{sf_dir}","wall_sec":{wall:.2f},'
      f'"silver_rows":{n_silver},"gold_rows":{n_gold}}}')
spark.stop()
