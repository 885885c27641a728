package graft.acid

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** NDV (approximate-distinct) materialized-view columns: an HLL
  * sketch per group, unioned forward on inserts, recomputed for a
  * group whenever a value nets out of it. At spec-sized cardinalities
  * the sketch is in its exact (coupon) regime, so every check compares
  * against exact COUNT(DISTINCT) — the approximation only begins
  * beyond thousands of distincts per group. */
class NdvMvSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")

  private def mkSrc(rows: Seq[(Long, String, java.lang.Long)]): Instance = {
    val root = Files.createTempDirectory("graft_ndv_src_").toUri.toString
    val df = spark.createDataFrame(rows).toDF("obj_id", "g", "v")
    val i = VersionedTable.create(spark, root, df.schema)
    val t = i.begin(); t.insert(df); i.commit(t); i
  }

  private def exact(src: Instance) = src.read()
    .groupBy("g").agg(countDistinct(col("v")).as("x"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def approx(mv: MaterializedAggView) = mv.read()
    .select(col("g"), col("approx_ndv_v"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private val NL = null.asInstanceOf[java.lang.Long]

  test("ndv view tracks exact distinct counts through churn") {
    val src = mkSrc(Seq(
      (1L, "a", L(10)), (2L, "a", L(10)), (3L, "a", L(20)),
      (4L, "b", L(5)), (5L, "b", NL)))
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    val mv = MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("v"))
    mv.refresh()
    assert(approx(mv) == Map("a" -> 2L, "b" -> 1L))

    // duplicate insert: ndv unchanged; new value: +1
    val t1 = src.begin()
    t1.insert(spark.createDataFrame(Seq((6L, "a", L(10)), (7L, "b", L(7))))
      .toDF("obj_id", "g", "v"))
    src.commit(t1)
    mv.refresh()
    assert(approx(mv) == Map("a" -> 2L, "b" -> 2L))
    assert(approx(mv) == exact(src))

    // delete ONE copy of a duplicated value: recompute keeps it exact
    // (the value survives in other rows)
    val t2 = src.begin(); t2.delete(Seq(1L)); src.commit(t2)
    mv.refresh()
    assert(approx(mv) == Map("a" -> 2L, "b" -> 2L))

    // delete the LAST copy of a value: ndv drops
    val t3 = src.begin(); t3.delete(Seq(3L)); src.commit(t3)
    mv.refresh()
    assert(approx(mv) == Map("a" -> 1L, "b" -> 2L))
    assert(approx(mv) == exact(src))

    // update moves a value: old nets out (recompute), new unions in
    val t4 = src.begin()
    t4.update(Seq(7L), df => df.withColumn("v", lit(99L)))
    src.commit(t4)
    mv.refresh()
    assert(approx(mv) == exact(src))

    // a group dying entirely deletes its row
    val t5 = src.begin(); t5.delete(Seq(2L, 6L)); src.commit(t5)
    mv.refresh()
    assert(mv.read().filter(col("g") === "a").count() == 0)
  }

  test("all-null groups estimate 0; nulls never count") {
    val src = mkSrc(Seq((1L, "a", NL), (2L, "a", NL), (3L, "b", L(1))))
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    val mv = MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("v"))
    mv.refresh()
    assert(approx(mv) == Map("a" -> 0L, "b" -> 1L))
    // deleting a null row is not ndv activity
    val t = src.begin(); t.delete(Seq(1L)); src.commit(t)
    mv.refresh()
    assert(approx(mv) == Map("a" -> 0L, "b" -> 1L))
  }

  test("a cancelling interval leaves the sketch untouched") {
    val src = mkSrc(Seq((1L, "a", L(1))))
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    val mv = MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("v"))
    mv.refresh()
    val before = mv.view.latestVersion
    // insert a NEW value and delete it again in a later commit of the
    // SAME refresh interval: net 0 — neither union nor recompute
    val t1 = src.begin()
    t1.insert(spark.createDataFrame(Seq((9L, "a", L(42))))
      .toDF("obj_id", "g", "v"))
    src.commit(t1)
    val t2 = src.begin(); t2.delete(Seq(9L)); src.commit(t2)
    mv.refresh()
    assert(approx(mv) == Map("a" -> 1L))
    // the merge saw an empty delta: the view advanced by at most the
    // watermark commit, and group a's stored row was not rewritten
    val rewrites = mv.view.changes(before, mv.view.latestVersion)
      .filter(col("g") === "a").count()
    assert(rewrites == 0L, s"cancelling interval rewrote $rewrites rows")
  }

  test("ndv composes with WHERE, sums and min/max; def round-trips") {
    val root = Files.createTempDirectory("graft_ndv_src_").toUri.toString
    val df = spark.createDataFrame(Seq(
      (1L, "a", L(10), 100L), (2L, "a", L(20), 4L), (3L, "b", L(10), 50L)))
      .toDF("obj_id", "g", "v", "w")
    val src = VersionedTable.create(spark, root, df.schema)
    val t = src.begin(); t.insert(df); src.commit(t)
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Seq("w"),
      where = Some("w >= 10"), minCols = Seq("w"),
      ndvCols = Seq("v")).refresh()
    // reopen from the persisted definition: ndv maintenance survives
    val mv = MaterializedAggView.openFromDef(spark, viewRoot)
    assert(mv.ndvCols == Seq("v"))
    val t2 = src.begin()
    t2.insert(spark.createDataFrame(Seq((4L, "a", L(30), 9L),
      (5L, "b", L(60), 70L))).toDF("obj_id", "g", "v", "w"))
    src.commit(t2)
    mv.refresh()
    // row 4 (w=9) is outside the WHERE: its v=30 must NOT count
    val got = mv.read()
      .select(col("g"), col("cnt"), col("sum_w"), col("min_w"),
        col("approx_ndv_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("a", 1L, 100L, 100L, 1L), ("b", 2L, 120L, 50L, 2L)))
  }

  test("ndv survives the rebuild path after vacuum") {
    val src = mkSrc(Seq((1L, "a", L(1)), (2L, "a", L(2)), (3L, "b", L(3))))
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    val mv = MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("v"))
    mv.refresh()
    // churn + aggressive vacuum: the stale view's interval pre-images
    // are reclaimed, forcing the snapshot rebuild, which must carry
    // the sketches
    (1 to 3).foreach { i =>
      val t = src.begin()
      t.update(Seq(1L), df => df.withColumn("v", lit(i * 100L)))
      src.commit(t)
    }
    src.vacuum(retainVersions = 1)
    mv.refresh()
    assert(mv.lastRefreshMode == "rebuild" || mv.lastRefreshMode == "incremental")
    assert(approx(mv) == exact(src))
  }

  test("string ndv columns work; doubles are rejected at create") {
    val root = Files.createTempDirectory("graft_ndv_src_").toUri.toString
    val df = spark.createDataFrame(Seq((1L, "a", "x", 1.5),
      (2L, "a", "y", 2.5))).toDF("obj_id", "g", "s", "d")
    val src = VersionedTable.create(spark, root, df.schema)
    val t = src.begin(); t.insert(df); src.commit(t)
    val viewRoot = Files.createTempDirectory("graft_ndv_view_").toUri.toString
    val mv = MaterializedAggView.create(spark, viewRoot, src,
      groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("s"))
    mv.refresh()
    assert(mv.read().select("approx_ndv_s").collect().head.getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      MaterializedAggView.create(spark,
        Files.createTempDirectory("graft_ndv_bad_").toUri.toString, src,
        groupCols = Seq("g"), sumCols = Nil, ndvCols = Seq("d"))
    }
  }
}
