package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Engine, Q}

/** As-of (temporal) join: for each left row, the most recent right row
  * with right.ts <= left.ts and equal keys — an operator Spark lacks
  * natively (guide §"Custom operator"; DuckDB has ASOF JOIN built in,
  * which serves as the oracle).
  *
  * Implementation is the scalable union-and-window formulation rather
  * than a range join: tag both sides, union, then one window pass per
  * key ordered by time carrying the last-seen right row forward
  * (`last(ignoreNulls)` over an unbounded-preceding frame). Cost is a
  * single hash shuffle on the key + a per-partition sort — O(n log n),
  * no candidate-pair explosion, skew handled by AQE like any window.
  * Right rows sort before left rows at equal timestamps so ties match
  * (ASOF's >= semantics). */
object AsofJoin {

  /** left gains `asofCol` = the right `valueCol` as of each left row's
    * time (null when no prior right row exists for the key).
    *
    * The carried value is a single-field STRUCT, not the bare value:
    * `last(ignoreNulls)` then selects by row PRESENCE, so a right row
    * whose payload is NULL still wins the match (DuckDB ASOF semantics —
    * nearest row regardless of payload nullness).
    *
    * REQUIRES an ORDERABLE `valueCol` (numeric/string/date/struct —
    * not map): the struct participates in the window ORDER BY, which
    * both makes the result deterministic and defines THIS operator's
    * tie-break for duplicate right rows at the same (key, ts): the
    * GREATEST payload wins. ASOF semantics leave that tie undefined
    * (DuckDB picks an arbitrary one); ours is pinned by test
    * (AsofJoinSpec) so results never depend on partitioning. Callers
    * with an unorderable payload should join on a surrogate orderable
    * column (e.g. a row id) and fetch the payload afterwards. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, asofCol: String): DataFrame = {
    val leftCols = left.columns
    val vType = right.schema(valueCol).dataType
    val nullMatch = lit(null).cast(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", vType))))
    val l = left.withColumn("_side", lit(1)).withColumn("_m", nullMatch)
    val r = right.select(col(key), col(ts),
        struct(col(valueCol).as("v")).as("_m"))
      .withColumn("_side", lit(0))
    val lNorm = l.select((Seq(col(key), col(ts), col("_side"), col("_m")) ++
      leftCols.filter(c => c != key && c != ts).map(col)): _*)
    val rNorm = r.select((Seq(col(key), col(ts), col("_side"), col("_m")) ++
      leftCols.filter(c => c != key && c != ts)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(key)
      // right rows first on tied ts (ASOF >= matches same-instant rows);
      // _m last breaks right-vs-right ties deterministically
      .orderBy(col(ts).asc, col("_side").asc, col("_m").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn(asofCol, last(col("_m"), ignoreNulls = true).over(w)("v"))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col(asofCol)): _*)
  }

  val defs: Seq[(String, Q)] = Seq(

    // for each purchase, the most recent prior-or-simultaneous error by
    // the same user (classic event-attribution shape)
    "q33_asof_join" -> Q(
      "SELECT p.event_id, e.event_id AS prior_error " +
      "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
      "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e " +
      "ON p.user_id = e.user_id AND p.ts >= e.ts " +
      "ORDER BY p.event_id") {
      (s, dir) =>
        val ev = Engine.table(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val errors = ev.filter(col("event_type") === "error")
          .select("event_id", "user_id", "ts")
        asof(purchases, errors, "user_id", "ts", "event_id", "prior_error")
          .select("event_id", "prior_error")
          .orderBy("event_id")
    }
  )
}
