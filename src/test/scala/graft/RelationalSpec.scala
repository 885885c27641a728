package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + exact-value tests for the relational inventory on sf0.001.
  * The cross-engine hash check runs via Verify + the DuckDB oracle; here we
  * assert plan health (non-empty, schema) and a few independently-known
  * values. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  val dir = "/root/testdata/sf0.001"

  // every query with an oracle must produce rows on the smoke SF, so the
  // driver's rows>0 check and the hash check both exercise real data
  for ((name, q) <- SparkEntry.registry) {
    test(s"$name runs and returns rows") {
      val df = q.impl(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("q01_scan returns the 5 regions in order") {
    val rows = SparkEntry.queries("q01_scan")(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("q03_agg groups are complete and counts sum to table size") {
    val df = SparkEntry.queries("q03_agg")(spark, dir)
    val total = df.collect().map(_.getAs[Long]("cnt")).sum
    val n = Engine.table(spark, dir, "lineitem").count()
    assert(total == n)
  }

  test("q09_window_rank emits exactly one row per customer") {
    val df = SparkEntry.queries("q09_window_rank")(spark, dir)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("q03 decimal aggregates are partition-count invariant") {
    // the determinism contract behind every oracle hash-match: results
    // must not depend on how data is partitioned/summed
    val base = SparkEntry.queries("q03_agg")(spark, dir).collect().map(_.toSeq)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      Seq("1", "7", "29").foreach { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        val got = SparkEntry.queries("q03_agg")(spark, dir).collect().map(_.toSeq)
        assert(got.toSeq == base.toSeq, s"diverged at $n partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q14_rollup grand total equals lineitem count") {
    val rows = SparkEntry.queries("q14_rollup")(spark, dir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("c") ==
      Engine.table(spark, dir, "lineitem").count())
  }

  test("GeoMean matches exp(mean(ln)) and is partition invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = Seq(1.0, 2.5, 10.0, 40.0, 0.125)
    val expected = math.exp(xs.map(math.log).sum / xs.size)
    val gm = udaf(queries.Relational.GeoMean)
    for (parts <- Seq(1, 3, 5)) {
      val got = xs.toDF("x").repartition(parts)
        .agg(gm(col("x"))).head.getDouble(0)
      assert(math.abs(got - expected) < 1e-9, s"parts=$parts got=$got")
    }
  }

  test("GeoMean returns NaN (not a crash) on non-positive or non-finite input") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gm = udaf(queries.Relational.GeoMean)
    for (bad <- Seq(0.0, -3.0, Double.NaN, Double.PositiveInfinity)) {
      val got = Seq(1.0, 2.0, bad).toDF("x").agg(gm(col("x"))).head.getDouble(0)
      assert(got.isNaN, s"bad=$bad got=$got")
    }
    // empty group is NaN too (no defined geometric mean)
    assert(Seq.empty[Double].toDF("x").agg(gm(col("x"))).head.getDouble(0).isNaN)
  }
}
