package graft.queries

import org.apache.spark.sql.functions._

import graft.{Engine, Q}

/** Ordered funnel analysis over the event stream: how many users
  * progressed view → click → purchase, where each stage only counts if
  * it happened strictly AFTER the user's entry into the previous stage
  * (first-touch ordering — a click before the first view is not a
  * funnel click). The canonical product-analytics query, exercising
  * conditional event sequencing that plain per-type counts get wrong.
  *
  * 100 TB shape: three aggregates and two joins, ALL keyed on user_id
  * — after the first shuffle every stage reuses the same hash
  * partitioning (no re-shuffle), and each stage's input shrinks
  * monotonically (funnel sets only narrow). No windows over the raw
  * stream, no per-user event buffering.
  */
object Funnel {

  val defs: Seq[(String, Q)] = Seq(

    "q47_funnel" -> Q(
      "WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events " +
      "WHERE event_type = 'view' GROUP BY 1), " +
      "c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e " +
      "JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view " +
      "WHERE e.event_type = 'click' GROUP BY 1), " +
      "p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e " +
      "JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click " +
      "WHERE e.event_type = 'purchase' GROUP BY 1) " +
      "SELECT stage, users FROM (" +
      "SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v " +
      "UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c " +
      "UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p) " +
      "ORDER BY stage") {
      (s, dir) =>
        val e = Engine.table(s, dir, "events")
          .select("user_id", "event_type", "ts")
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") > col("t_view"))
          .groupBy("user_id").agg(min("ts").as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts") > col("t_click"))
          .groupBy("user_id").agg(min("ts").as("t_purchase"))
        def stageCount(df: org.apache.spark.sql.DataFrame, name: String) =
          df.agg(count(lit(1)).as("users"))
            .select(lit(name).as("stage"), col("users"))
        stageCount(v, "1_view")
          .unionByName(stageCount(c, "2_click"))
          .unionByName(stageCount(p, "3_purchase"))
          .orderBy("stage")
    }
  )
}
