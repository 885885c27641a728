package graft.acid

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** SQL row-level operations (group-based copy-on-write): UPDATE,
  * MERGE INTO, and arbitrary-predicate DELETE against catalog tables,
  * driven end-to-end through spark.sql. */
class RowLevelSpec extends AnyFunSuite {
  lazy val spark = {
    val s = Engine.session("4")
    val wh = Files.createTempDirectory("graft_wh_rl_").toUri.toString
    s.conf.set("spark.sql.catalog.rcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.rcat.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)

  private def freshTable(name: String): Instance = {
    sql("CREATE NAMESPACE IF NOT EXISTS rcat.rl")
    sql(s"CREATE TABLE rcat.rl.$name (obj_id BIGINT, value BIGINT)")
    // two commits with disjoint id ranges -> two files with stats
    sql(s"INSERT INTO rcat.rl.$name VALUES (1, 10), (2, 20)")
    sql(s"INSERT INTO rcat.rl.$name VALUES (100, 1000), (200, 2000)")
    VersionedTable.open(spark,
      spark.conf.get("spark.sql.catalog.rcat.warehouse") + s"/rl/$name")
  }

  private def rows(name: String): Seq[(Long, Long)] =
    sql(s"SELECT * FROM rcat.rl.$name ORDER BY obj_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("SQL UPDATE: one commit, file-pruned rewrite, history intact") {
    val inst = freshTable("u")
    sql("UPDATE rcat.rl.u SET value = value + 1 WHERE obj_id = 100")
    assert(rows("u") == Seq((1L, 10L), (2L, 20L), (100L, 1001L), (200L, 2000L)))
    assert(inst.latestVersion == 3L, "UPDATE must be exactly one commit")
    // only the file containing id 100 was rewritten: the v2 delta
    // removes/adds one file, not two
    val m = inst.readManifest(3L)
    assert(m.removed.size == 1, s"expected 1 retired file, got ${m.removed}")
    // the replacement file re-enters the data-skipping index: the CoW
    // commit records universal footer stats (and the primary id range)
    // for its staged file, exactly like a plain insert — without this
    // every SQL rewrite would exempt its output from pruning until the
    // next compaction
    assert(m.added.size == 1)
    assert(m.stats.contains(m.added.head),
      "CoW replacement file missing its obj_id range")
    val us = m.fileStats.getOrElse(m.added.head, Map.empty)
    assert(us.contains("value"),
      s"CoW replacement file missing universal stats, got ${us.keySet}")
    // pre-update state is still time-travelable
    assert(sql("SELECT value FROM rcat.rl.u VERSION AS OF 2 " +
      "WHERE obj_id = 100").head().getLong(0) == 1000L)
  }

  test("SQL UPDATE with an arbitrary predicate rewrites only matching groups") {
    freshTable("u2")
    sql("UPDATE rcat.rl.u2 SET value = 0 WHERE value >= 1000")
    assert(rows("u2") == Seq((1L, 10L), (2L, 20L), (100L, 0L), (200L, 0L)))
  }

  test("SQL DELETE with arbitrary predicate takes the CoW path") {
    val inst = freshTable("d")
    sql("DELETE FROM rcat.rl.d WHERE value > 15 AND value < 1500")
    assert(rows("d") == Seq((1L, 10L), (200L, 2000L)))
    assert(inst.latestVersion == 3L)
  }

  test("SQL MERGE INTO: update, delete, and insert clauses in one commit") {
    val inst = freshTable("m")
    sql("CREATE OR REPLACE TEMPORARY VIEW m_src AS SELECT * FROM VALUES " +
      "(2, 5), (100, -1), (999, 9990) AS s(obj_id, value)")
    sql("""MERGE INTO rcat.rl.m t USING m_src s ON t.obj_id = s.obj_id
          WHEN MATCHED AND s.value < 0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET value = t.value + s.value
          WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("m") ==
      Seq((1L, 10L), (2L, 25L), (200L, 2000L), (999L, 9990L)))
    assert(inst.latestVersion == 3L, "MERGE must be exactly one commit")
    // CDC classifies the rewrite; pre-merge version intact
    assert(sql("SELECT count(*) FROM rcat.rl.m VERSION AS OF 2")
      .head().getLong(0) == 4L)
  }

  test("runtime group filtering: a MERGE keyed into one file rewrites one file") {
    val inst = freshTable("rgf")
    // a join-shaped MERGE has NO static pushdown on the target — only
    // the runtime group filter (dynamic subquery over the source keys)
    // can narrow the scan, and the commit's retire list must follow it
    sql("CREATE OR REPLACE TEMPORARY VIEW rgf_src AS SELECT * FROM VALUES " +
      "(100, 7) AS s(obj_id, value)")
    sql("""MERGE INTO rcat.rl.rgf t USING rgf_src s ON t.obj_id = s.obj_id
          WHEN MATCHED THEN UPDATE SET value = t.value + s.value""")
    assert(rows("rgf") ==
      Seq((1L, 10L), (2L, 20L), (100L, 1007L), (200L, 2000L)))
    val m = inst.readManifest(inst.latestVersion)
    assert(m.removed.size == 1,
      s"runtime group filter must narrow the rewrite to the one file " +
        s"whose id range holds 100, got retired=${m.removed}")
    // the other file's rows are untouched on disk (no needless rewrite)
    assert(m.added.size == 1)
  }

  test("row-level ops conflict metadata blocks concurrent writers of those ids") {
    val inst = freshTable("c")
    val t = inst.begin()
    import spark.implicits._
    t.insert(Seq((100L, 7L)).toDF("obj_id", "value")) // id in rewritten range
    sql("UPDATE rcat.rl.c SET value = 0 WHERE obj_id = 100")
    intercept[ConflictException](inst.commit(t))
  }

  test("UPDATE matching nothing commits nothing") {
    val inst = freshTable("n")
    sql("UPDATE rcat.rl.n SET value = 0 WHERE obj_id = 555555")
    assert(inst.latestVersion == 2L, "no-match UPDATE must not commit")
    assert(rows("n").size == 4)
  }
}
