package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.{AcidQueries, ConflictException, VersionedTable}

/** ACID-layer scenario tests mirroring the reference's E2E coverage
  * (instance.rs:599-762): visibility, snapshot isolation, rollback,
  * durability across reopen, vacuum, and the 4-thread concurrent
  * counter (instance.rs:724-758) under optimistic retry. */
class AcidSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("graft_acid_").toUri.toString

  test("scenario: insert/update/delete/rollback/reopen") {
    val rows = AcidQueries.scenario(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, 200L)))
  }

  test("snapshot isolation: pinned txn does not see later commits") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t1 = inst.begin()
    t1.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    inst.commit(t1)

    val reader = inst.begin() // pins version 1
    val writer = inst.begin()
    writer.insert(Seq((2L, 2L)).toDF("obj_id", "value"))
    inst.commit(writer)

    assert(reader.read().count() == 1) // stable snapshot
    assert(inst.read().count() == 2)   // head sees the commit
    inst.refresh(reader)               // update_read_csn analog
    assert(reader.read().count() == 2)
  }

  test("write-write conflict on the same object aborts the loser") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t0 = inst.begin()
    t0.insert(Seq((7L, 0L)).toDF("obj_id", "value"))
    inst.commit(t0)

    val a = inst.begin()
    val b = inst.begin()
    a.update(Seq(7L), df => df.withColumn("value", col("value") + 1))
    b.update(Seq(7L), df => df.withColumn("value", col("value") + 1))
    inst.commit(a)
    intercept[ConflictException] { inst.commit(b) }
    val v = inst.read().filter(col("obj_id") === 7).head().getLong(1)
    assert(v == 1L) // exactly one increment landed
  }

  test("conflict on the same FILE aborts the loser even for disjoint objects") {
    // copy-on-write rewrites whole files: two txns touching different
    // objects that share a file would republish stale copies of each
    // other's rows if only object ids were compared
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t0 = inst.begin()
    t0.insert(Seq((1L, 10L), (2L, 20L)).toDF("obj_id", "value").coalesce(1))
    inst.commit(t0)

    val a = inst.begin()
    val b = inst.begin()
    a.update(Seq(1L), df => df.withColumn("value", col("value") + 1))
    b.update(Seq(2L), df => df.withColumn("value", col("value") + 1))
    inst.commit(a)
    intercept[ConflictException] { inst.commit(b) }
    val state = inst.read().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == Map(1L -> 11L, 2L -> 20L)) // no resurrection, no dupes
  }

  test("concurrent counter: 4 threads x 10 increments with retry") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t0 = inst.begin()
    t0.insert(Seq((1L, 0L)).toDF("obj_id", "value"))
    inst.commit(t0)

    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        var done = 0
        while (done < 10) {
          val t = inst.begin()
          try {
            t.update(Seq(1L), df => df.withColumn("value", col("value") + 1))
            inst.commit(t)
            done += 1
          } catch { case _: ConflictException => () } // retry
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(inst.read().head().getLong(1) == 40L)
  }

  test("read-your-own-writes: two deletes in one txn on a shared file") {
    // regression: delete/update used to read the PINNED snapshot, so a
    // second mutation in the same txn rewrote the original file again —
    // manifest removed=[F,F] added=[F1,F2] resurrected deleted rows and
    // duplicated survivors
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t0 = inst.begin()
    t0.insert(Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("obj_id", "value").coalesce(1)) // one file, three objects
    inst.commit(t0)

    val t = inst.begin()
    t.delete(Seq(1L))
    t.delete(Seq(2L))
    assert(t.read().collect().map(_.getLong(0)).toSet == Set(3L)) // RYOW
    inst.commit(t)
    val rows = inst.read().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq.sorted == Seq((3L, 30L))) // no resurrection, no dupes
  }

  test("read-your-own-writes: update then delete same object in one txn") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t0 = inst.begin()
    t0.insert(Seq((1L, 10L), (2L, 20L)).toDF("obj_id", "value").coalesce(1))
    inst.commit(t0)

    val t = inst.begin()
    t.update(Seq(1L), df => df.withColumn("value", col("value") + 5))
    t.delete(Seq(1L))
    inst.commit(t)
    val state = inst.read().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == Map(2L -> 20L))
  }

  test("read-your-own-writes: insert visible to same-txn delete") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t = inst.begin()
    t.insert(Seq((1L, 1L), (2L, 2L)).toDF("obj_id", "value").coalesce(1))
    assert(t.read().count() == 2)
    t.delete(Seq(1L))
    inst.commit(t)
    assert(inst.read().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("object id allocation is bounded and non-overlapping") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    val t = inst.begin()
    val id = t.newObjectId()
    assert(id > 0 && (id & 0xFFFFF) == 1) // seq occupies the low 20 bits
  }

  test("vacuum reclaims unreferenced files, retained versions still read") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    (1 to 5).foreach { i =>
      val t = inst.begin()
      if (i == 1) t.insert(Seq((1L, 0L)).toDF("obj_id", "value"))
      else t.update(Seq(1L), df => df.withColumn("value", col("value") + 1))
      inst.commit(t)
    }
    val head = inst.latestVersion
    val removed = inst.vacuum(retainVersions = 2)
    assert(removed > 0)
    assert(inst.snapshot(head).head().getLong(1) == 4L)
    assert(inst.snapshot(head - 1).head().getLong(1) == 3L)
  }

  test("checkpoint compaction: reads replay from the latest checkpoint") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    (1 to 12).foreach { i =>
      val t = inst.begin()
      t.insert(Seq((i.toLong, i.toLong)).toDF("obj_id", "value"))
      inst.commit(t)
    }
    // checkpointInterval = 10 → v10 is a checkpoint manifest with the
    // full file list; reopening replays only v10..v12
    assert(inst.latestVersion == 12L)
    val reopened = VersionedTable.open(spark, dir)
    assert(reopened.read().count() == 12)
    assert(reopened.snapshot(10).count() == 10) // the checkpoint itself
    assert(reopened.snapshot(3).count() == 3)   // pre-checkpoint history
  }

  test("time travel: every retained version is readable") {
    val inst = VersionedTable.create(spark, freshDir(), AcidQueries.schema)
    (1 to 3).foreach { i =>
      val t = inst.begin()
      t.insert(Seq((i.toLong, i.toLong)).toDF("obj_id", "value"))
      inst.commit(t)
    }
    assert((0 to 3).map(inst.snapshot(_).count()).toSeq == Seq(0L, 1L, 2L, 3L))
  }
}
