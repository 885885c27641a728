package graft.acid

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** Atomic manifest publish protocol: the version must only ever be
  * claimed with its COMPLETE content in place (a crashed writer that
  * claimed a version with a torn body would poison every later
  * read/commit — there is no recovery path for a persistently-invalid
  * claimed version, by design: it cannot happen). */
class PublishSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("graft_pub_").toUri.toString

  private def manifestFiles(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(new java.net.URI(dir).getPath, "_manifests")
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSeq
    } finally s.close()
  }

  test("abort spares adopted files but reclaims the txn's own staging") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    val t1 = inst.begin()
    t1.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    inst.commit(t1)
    val committedFile = inst.stateAt(inst.latestVersion)._1.head

    // a restore-shaped transaction: re-references the committed file
    // (adopted) AND stages a file of its own — an abort must reclaim
    // only the latter
    val t2 = inst.begin()
    t2.insert(Seq((2L, 2L)).toDF("obj_id", "value"))
    val ownStaged = t2.added.filterNot(_ == committedFile).head
    t2.added += committedFile
    t2.adopted += committedFile
    inst.rollback(t2)

    val dataRoot = java.nio.file.Paths.get(new java.net.URI(dir).getPath, "data")
    assert(java.nio.file.Files.exists(dataRoot.resolve(committedFile)),
      "abort reclaimed a committed file the txn had merely adopted")
    assert(!java.nio.file.Files.exists(dataRoot.resolve(ownStaged)),
      "abort failed to reclaim the txn's own staging")
    // table still reads
    assert(inst.read().count() == 1)
  }

  test("publish leaves no temp files and the claimed content is complete") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    val t = inst.begin()
    t.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    inst.commit(t)
    val files = manifestFiles(dir)
    assert(!files.exists(_.startsWith(".tmp-")), s"leaked temps in $files")
    // every published manifest parses (complete content, valid crc)
    files.filter(f => f.startsWith("v") && f.endsWith(".json")).foreach { f =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(
        new java.net.URI(dir).getPath, "_manifests", f))
      VersionedTable.fromJson(text)
    }
  }

  test("losing a publish race returns false and leaves the winner intact") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    val t = inst.begin()
    t.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    inst.commit(t) // v1 published
    val rival = VersionedTable.open(spark, dir)
    val loser = VersionedTable.Manifest(1L, 999L, "obj_id BIGINT", Nil, Nil,
      Nil, checkpoint = false, Nil)
    assert(!rival.publish(loser), "claiming an existing version must fail")
    // the winner's content was not replaced (tsn is not the rival's)
    val head = java.nio.file.Files.readString(java.nio.file.Paths.get(
      new java.net.URI(dir).getPath, "_manifests", f"v${1L}%020d.json"))
    assert(VersionedTable.fromJson(head).tsn != 999L)
    assert(!manifestFiles(dir).exists(_.startsWith(".tmp-")))
  }

  test("a writer crash before the atomic claim leaves the version unclaimed") {
    val dir = freshDir()
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema)
    // simulate the crash window: a fully-written temp exists, but the
    // link/rename never ran — no v1 manifest, so v1 is NOT claimed
    val tmp = java.nio.file.Paths.get(new java.net.URI(dir).getPath,
      "_manifests", ".tmp-v1-deadbeef")
    java.nio.file.Files.writeString(tmp, "{\"version\":1, torn")
    assert(inst.latestVersion == 0L)
    // the next commit claims v1 normally — the crash cost nothing
    val t = inst.begin()
    t.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    assert(inst.commit(t) == 1L)
    assert(inst.read().count() == 1)
  }

  test("vacuum sweeps crashed-publish manifest temps past the grace") {
    val dir = freshDir()
    val conf = EngineConf(orphanGraceMs = 0L)
    val inst = VersionedTable.create(spark, dir, AcidQueries.schema, conf)
    val t = inst.begin()
    t.insert(Seq((1L, 1L)).toDF("obj_id", "value"))
    inst.commit(t)
    val tmp = java.nio.file.Paths.get(new java.net.URI(dir).getPath,
      "_manifests", ".tmp-v2-cafef00d")
    java.nio.file.Files.writeString(tmp, "{\"version\":2, torn")
    Thread.sleep(20)
    inst.vacuum(retainVersions = 10, sweepOrphans = true)
    assert(!java.nio.file.Files.exists(tmp), "stale publish temp not swept")
    assert(inst.read().count() == 1)
  }
}
