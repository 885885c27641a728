package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Pinned semantics for the as-of join beyond the oracle-checked
  * q33 query: exact-timestamp matches, missing-match nulls, and the
  * documented duplicate-(key,ts) tie-break (greatest payload wins). */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("gap-fill: grid covers the key's span, LOCF carries across holes") {
    import org.apache.spark.sql.functions._
    val day = 86400L
    val e = Seq(
      (1L, ts(0), 10.0),            // day 0
      (1L, ts(day * 3 + 5), 30.0),  // day 3 — days 1,2 are holes
      (1L, ts(day * 3 + 9), 31.0),  // same day, later ts wins LOCF
      (2L, ts(day), 99.0))          // single-day key
      .toDF("user_id", "t", "v")
    val got = graft.operators.Resample
      .gapFill(e, col("user_id"), col("t"), col("v"), "day")
      .orderBy("key", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 10.0), // day 0: one event
      (1L, 0L, 10.0), // day 1: hole, carried
      (1L, 0L, 10.0), // day 2: hole, carried
      (1L, 2L, 31.0), // day 3: two events, latest wins
      (2L, 1L, 99.0)))
    // hourly grid on the same data spans 73 hours for key 1
    val hourly = graft.operators.Resample
      .gapFill(e, col("user_id"), col("t"), col("v"), "hour")
    assert(hourly.filter(col("key") === 1L).count() == day * 3 / 3600 + 1)
  }

  test("asof picks the latest right row at or before each left ts") {
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (2L, ts(5), "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(8), 100L), (1L, ts(15), 200L), (1L, ts(25), 300L))
      .toDF("k", "t", "v")
    val got = AsofJoin.asof(left, right, "k", "t", "v", "asof_v")
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(got == Map(
      "a" -> Some(100L), // ts(8) <= 10
      "b" -> Some(200L), // ts(15) <= 20, not 25
      "c" -> None))      // key 2 has no right rows
  }

  test("equal timestamps match (>= semantics) and null payloads still win") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(5), java.lang.Long.valueOf(7L)),
        (1L, ts(10), null.asInstanceOf[java.lang.Long]))
      .toDF("k", "t", "v")
    val row = AsofJoin.asof(left, right, "k", "t", "v", "asof_v").head()
    // the ts(10) row is the nearest match even though its payload is
    // null — row presence, not payload nullness, decides the match
    assert(row.isNullAt(3))
  }

  test("duplicate right (key, ts) rows: greatest payload wins, partition-invariant") {
    // ADVICE pin: ASOF leaves this tie undefined; our operator defines
    // it as max(payload) via the struct in the window ORDER BY, so the
    // answer cannot depend on partitioning or input order
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "tag")
    for (parts <- Seq(1, 3, 7); order <- Seq(true, false)) {
      val rows = Seq((1L, ts(10), 5L), (1L, ts(10), 9L), (1L, ts(10), 2L))
      val right = (if (order) rows else rows.reverse)
        .toDF("k", "t", "v").repartition(parts)
      val got = AsofJoin.asof(left, right, "k", "t", "v", "asof_v")
        .head().getLong(3)
      assert(got == 9L, s"parts=$parts order=$order got=$got")
    }
  }
}
