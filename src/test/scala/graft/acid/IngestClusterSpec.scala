package graft.acid

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** Ingest-side clustering (`CALL system.set_clustering` / the
  * `cluster_by` table property): catalog INSERTs range-partition +
  * locally sort their staged files on the cluster columns, so the
  * universal footer-stat index prunes point/range predicates tightly
  * from the moment rows land — the continuous half of `compact`'s
  * whole-table Z-order pass. */
class IngestClusterSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")

  private def freshCat(): (String, String) = {
    val tag = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    val cat = s"gclu$tag"
    val wh = Files.createTempDirectory("graft_clu_wh_").toUri.toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("clustered INSERT lands range-disjoint sorted files; point probe prunes to one") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (obj_id BIGINT, v BIGINT)")
    spark.sql(s"CALL $cat.system.set_clustering('ns.t', 'v')")
    // pin the range-partition fan-out for the assertion (AQE would
    // coalesce this tiny batch to one file — correct at scale, but
    // then disjointness is vacuous)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      // v scattered relative to id: clustering must SHUFFLE, not rely
      // on input order ((id*37)%1000 is a permutation-ish spread)
      spark.sql(s"INSERT INTO $cat.ns.t " +
        "SELECT id AS obj_id, (id * 37) % 1000 AS v FROM range(400)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
    }
    val inst = VersionedTable.open(spark, s"$wh/ns/t")
    val st = inst.tableStateAt(inst.latestVersion)
    val ranges = st.fileStats.values.toSeq
      .flatMap(_.get("v").flatMap(_.longRange))
    assert(ranges.size >= 2, s"expected several files, got $ranges")
    // disjoint per-file ranges on the cluster column
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1,
        s"file ranges overlap: $a vs $b (not clustered)")
      case _ => ()
    }
    // a point predicate's candidate set is exactly one file
    val probe = 37L
    assert(ranges.count(r => r._1 <= probe && probe <= r._2) == 1)
    // rows and values intact through the shuffle
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head.getLong(0)
      == 400L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.t WHERE v = 37").head.getLong(0) == 1L)
    // guards: cluster column can be neither renamed nor dropped while
    // the spec names it
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN v TO w") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.t DROP COLUMN v") }
    // clearing the spec lifts them
    spark.sql(s"CALL $cat.system.set_clustering('ns.t', '')")
    spark.sql(s"ALTER TABLE $cat.ns.t RENAME COLUMN v TO w")
  }

  test("cluster_by table property clusters from the first insert; tiny inserts keep the fast path") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ns.t (obj_id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('cluster_by' = 'v')")
    // a tiny literal insert skips the clustering shuffle (fast path)
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 10), (2, 20)")
    val inst = VersionedTable.open(spark, s"$wh/ns/t")
    assert(inst.read().count() == 2)
    assert(inst.tableStateAt(inst.latestVersion).numFiles == 1L)
    val tinyFiles =
      inst.tableStateAt(inst.latestVersion).fileStats.keySet
    // set_partitioning preserves the cluster spec (merged _catalog.json)
    spark.sql(s"CALL $cat.system.set_partitioning('ns.t', '')")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try spark.sql(s"INSERT INTO $cat.ns.t " +
      "SELECT id + 100 AS obj_id, (id * 7) % 100 AS v FROM range(100)")
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
    }
    val st = inst.tableStateAt(inst.latestVersion)
    // the clustered insert's files (new since the tiny one) are
    // range-disjoint on v
    val fromBig = st.fileStats.toSeq
      .filter { case (f, _) => !tinyFiles.contains(f) }
      .flatMap(_._2.get("v").flatMap(_.longRange))
      .sortBy(_._1)
    assert(fromBig.size >= 2)
    fromBig.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._1, s"overlap: $a vs $b")
      case _ => ()
    }
  }
}
