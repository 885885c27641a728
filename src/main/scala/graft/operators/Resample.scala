package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Time-series resampling with gap-fill: project an irregular event
  * stream onto a regular per-key time grid and carry the last
  * observation forward (LOCF) across the gaps — the standard
  * preprocessing step before feature extraction over sensor/activity
  * streams, and the time-dimension analog of the as-of join
  * ([[AsofJoin]] matches one probe list; resampling materializes the
  * whole grid).
  *
  * 100 TB shape: one aggregate keyed on (key, bucket), one per-key
  * grid explode (bounded by each key's own span, not the global one),
  * one equi join, and a per-key ordered window for the fill — all
  * hash-partitioned on the key, no global sort, state bounded by one
  * row per (key, bucket).
  */
object Resample {

  /** Resample `df` onto a per-key `unit` grid ("day"/"hour"): one row
    * per key per bucket between that key's first and last event, with
    * `n_events` (0 in gaps) and `value_locf` = value of the latest
    * event at-or-before the bucket's end, carried forward across empty
    * buckets. Bucket ties on the timestamp resolve to the larger
    * value (deterministic; supply unique timestamps per key — true of
    * the events fixture — if tie order matters). */
  def gapFill(df: DataFrame, key: Column, ts: Column, value: Column,
      unit: String = "day"): DataFrame = {
    val step = unit match {
      case "day" => expr("interval 1 day")
      case "hour" => expr("interval 1 hour")
      case other => throw new IllegalArgumentException(
        s"unsupported grid unit '$other' (day|hour)")
    }
    val events = df.select(key.as("key"), date_trunc(unit, ts).as("bucket"),
      ts.as("ts"), value.as("v"))
    val perBucket = events.groupBy("key", "bucket")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("v"))).getField("v").as("v"))
    val grid = events.groupBy("key")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"), explode(sequence(col("b0"), col("b1"), step))
        .as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("value_locf"))
  }

  val defs: Seq[(String, Q)] = Seq(

    // daily per-user resample of the events stream; the oracle fills
    // gaps with the portable gaps-and-islands formulation (a running
    // COUNT of non-null observations numbers each carry-group; the
    // group's MAX is its one non-null value), which is exactly
    // last(..., ignoreNulls) — spelled so any ANSI engine can run it
    "q45_gap_fill" -> Q(
      "WITH pb AS (SELECT user_id, date_trunc('day', ts) AS bucket, " +
      "COUNT(*) AS n_events, arg_max(value, ts) AS v FROM events " +
      "GROUP BY 1, 2), " +
      "grid AS (SELECT user_id, unnest(generate_series(b0, b1, " +
      "INTERVAL 1 DAY)) AS bucket FROM (SELECT user_id, " +
      "MIN(date_trunc('day', ts)) AS b0, MAX(date_trunc('day', ts)) AS b1 " +
      "FROM events GROUP BY 1)), " +
      "j AS (SELECT g.user_id, g.bucket, COALESCE(pb.n_events, 0) AS n_events, " +
      "pb.v FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id " +
      "AND g.bucket = pb.bucket), " +
      "k AS (SELECT user_id, bucket, n_events, v, COUNT(v) OVER " +
      "(PARTITION BY user_id ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS grp " +
      "FROM j) " +
      "SELECT user_id, bucket, n_events, MAX(v) OVER " +
      "(PARTITION BY user_id, grp) AS value_locf FROM k " +
      "ORDER BY user_id, bucket") {
      (s, dir) =>
        gapFill(Engine.table(s, dir, "events"),
            col("user_id"), col("ts"), col("value"), "day")
          .withColumnRenamed("key", "user_id")
          .orderBy("user_id", "bucket")
    }
  )
}
