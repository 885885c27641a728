package graft.acid

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** Cross-table atomic transactions (VERDICT r6 #3; reference: a
  * db-core txn spans every object in the datastore, instance.rs:88-111):
  * all-or-nothing visibility across tables, crash between phases
  * leaves every participant invisible, snapshot isolation across the
  * set, per-table conflicts stay exact. */
class MultiCommitSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private def freshDir(tag: String) =
    Files.createTempDirectory(s"graft_multi_$tag").toUri.toString

  private def mk(tag: String, rows: Seq[(Long, Long)],
      conf: EngineConf = EngineConf()): Instance = {
    val inst = VersionedTable.create(spark, freshDir(tag),
      AcidQueries.schema, conf)
    if (rows.nonEmpty) {
      val t = inst.begin()
      t.insert(rows.toDF("obj_id", "value").coalesce(1))
      inst.commit(t)
    }
    inst
  }

  private def contents(inst: Instance): Seq[(Long, Long)] =
    inst.read().orderBy("obj_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("two tables commit atomically; both visible with exact contents") {
    val a = mk("a", Seq((1L, 10L)))
    val b = mk("b", Seq((100L, 1000L)))
    val ta = a.begin(); ta.insert(Seq((2L, 20L)).toDF("obj_id", "value"))
    val tb = b.begin(); tb.insert(Seq((200L, 2000L)).toDF("obj_id", "value"))
    val versions = MultiCommit.commitAll(freshDir("log"),
      Seq((a, ta), (b, tb)))
    assert(versions(a.root) == 2L && versions(b.root) == 2L)
    assert(contents(a) == Seq((1L, 10L), (2L, 20L)))
    assert(contents(b) == Seq((100L, 1000L), (200L, 2000L)))
    // the pointers reference ONE shared decision record
    val (ra, rb) = (a.readManifest(2L), b.readManifest(2L))
    assert(ra.multiRef.isDefined && ra.multiRef == rb.multiRef)
  }

  test("a mixed update+delete+insert multi-commit applies everywhere or nowhere") {
    val a = mk("a2", Seq((1L, 10L), (2L, 20L)))
    val b = mk("b2", Seq((100L, 1000L)))
    val ta = a.begin(); ta.delete(Seq(1L))
    val tb = b.begin()
    tb.update(Seq(100L), df => df.withColumn("value",
      org.apache.spark.sql.functions.col("value") + 1))
    MultiCommit.commitAll(freshDir("log2"), Seq((a, ta), (b, tb)))
    assert(contents(a) == Seq((2L, 20L)))
    assert(contents(b) == Seq((100L, 1001L)))
  }

  test("coordinator crash between phases: every participant invisible, " +
      "reader arbitration aborts, the woken writer's claim fails") {
    val conf = EngineConf(multiGraceMs = 50L)
    val a = mk("ca", Seq((1L, 10L)), conf)
    val b = mk("cb", Seq((100L, 1000L)), conf)
    val logDir = freshDir("clog")
    val decision = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(logDir), "m-crashed.json")
    val uri = a.fs.makeQualified(decision).toString
    // simulate the crash: pointer published for table A only, decision
    // never claimed (the coordinator died before reaching table B)
    val ta = a.begin(); ta.insert(Seq((2L, 20L)).toDF("obj_id", "value"))
    a.commit(ta, Some(uri))
    assert(a.latestVersion == 2L)
    // a cold reader must NOT see the half-committed transaction: the
    // grace elapses, the reader arbitrates the decision aborted
    val coldA = VersionedTable.open(spark, a.root, conf)
    assert(contents(coldA) == Seq((1L, 10L)))
    // ...and the arbitration decided the slot: the woken coordinator's
    // committed-claim now fails, so it can never half-apply
    assert(!VersionedTable.claimDecision(a.fs, decision, conf.claimer,
      committed = true))
    // table B was never touched
    assert(contents(b) == Seq((100L, 1000L)))
    // the SAME instance that published the pointer also resolves it
    // aborted (cache is per-decision, not per-outcome-hope)
    assert(contents(a) == Seq((1L, 10L)))
    // and a later normal commit on A proceeds past the dead pointer
    val t2 = a.begin(); t2.insert(Seq((3L, 30L)).toDF("obj_id", "value"))
    a.commit(t2)
    assert(contents(a) == Seq((1L, 10L), (3L, 30L)))
  }

  test("mid-sequence conflict aborts the whole set: nothing visible anywhere") {
    val a = mk("fa", Seq((1L, 10L)))
    val b = mk("fb", Seq((100L, 1000L)))
    // roots sort lexicographically; find which commits FIRST so the
    // conflict can be injected on the SECOND — proving the first's
    // already-published pointer gets voided
    val ordered = Seq(a, b).sortBy(_.root)
    val (first, second) = (ordered.head, ordered.last)
    val tf = first.begin()
    tf.insert(Seq((7L, 70L)).toDF("obj_id", "value"))
    val ts = second.begin()
    ts.delete(Seq(if (second eq a) 1L else 100L))
    // interleaved single-table commit touching the same object makes
    // the second pointer publish conflict
    val steal = second.begin()
    steal.delete(Seq(if (second eq a) 1L else 100L))
    second.commit(steal)
    val beforeFirst = contents(first)
    intercept[ConflictException] {
      MultiCommit.commitAll(freshDir("flog"),
        Seq((first, tf), (second, ts)))
    }
    // the first table's pointer published but must resolve ABORTED
    val coldFirst = VersionedTable.open(spark, first.root)
    assert(coldFirst.read().orderBy("obj_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == beforeFirst)
  }

  test("snapshot isolation: a version pinned before the multi never sees it; " +
      "checkpoints after it fold the committed state") {
    val conf = EngineConf(checkpointInterval = 3)
    val a = mk("sa", Seq((1L, 10L)), conf)
    val b = mk("sb", Seq((100L, 1000L)), conf)
    val preA = a.latestVersion
    val ta = a.begin(); ta.insert(Seq((2L, 20L)).toDF("obj_id", "value"))
    val tb = b.begin(); tb.insert(Seq((200L, 2000L)).toDF("obj_id", "value"))
    MultiCommit.commitAll(freshDir("slog"), Seq((a, ta), (b, tb)))
    assert(a.snapshot(preA).count() == 1L)
    // drive A past a checkpoint boundary; the fold must carry the
    // multi-committed file through the checkpoint
    (0 until 3).foreach { i =>
      val t = a.begin()
      t.insert(Seq((10L + i, 1L)).toDF("obj_id", "value"))
      a.commit(t)
    }
    assert(contents(a).map(_._1).contains(2L))
    val cold = VersionedTable.open(spark, a.root, conf)
    assert(contents(cold).map(_._1).contains(2L))
  }
}
