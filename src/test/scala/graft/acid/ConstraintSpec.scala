package graft.acid

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.Engine

/** CHECK constraints: declared once, validated against existing rows
  * at add time, then enforced INSIDE every write job (insert, CoW
  * update/merge survivors, fast-path tiny commits) — a violating row
  * fails the write loudly with the constraint name; NULL passes like
  * SQL CHECK. Constraint changes conflict table-wide, ride the
  * manifest full-map like renames, and revert with restore. */
class ConstraintSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("obj_id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def fresh(conf: EngineConf = EngineConf()): Instance =
    VersionedTable.create(spark,
      Files.createTempDirectory("graft_cons_").toUri.toString, schema, conf)

  private def messages(e: Throwable): String = {
    var t: Throwable = e
    val sb = new StringBuilder
    var depth = 0
    while (t != null && depth < 20) {
      sb.append(Option(t.getMessage).getOrElse("")).append('\n')
      t = t.getCause; depth += 1
    }
    sb.toString
  }

  test("insert validates in the write job; violating row names the constraint") {
    val t = fresh()
    t.withRetry() { x => x.insert(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("obj_id", "grp", "v")) }
    t.addConstraint("v_pos", "v > 0")
    assert(t.constraints == Map("v_pos" -> "v > 0"))
    // a LARGE insert takes the job path: force it past fastPathRows
    val big = spark.range(100, 200)
      .select(col("id").as("obj_id"), lit("c").as("grp"),
        (col("id") - lit(150)).as("v")) // half the rows violate
    val e = intercept[Exception] { t.withRetry() { x => x.insert(big) } }
    assert(messages(e).contains("CHECK constraint v_pos"))
    // nothing landed
    assert(t.read().count() == 2)
    // valid big insert lands
    t.withRetry() { x => x.insert(spark.range(100, 200)
      .select(col("id").as("obj_id"), lit("c").as("grp"),
        col("id").as("v"))) }
    assert(t.read().count() == 102)
  }

  test("fast-path tiny insert validates too; NULL passes like SQL CHECK") {
    val t = fresh()
    t.addConstraint("v_pos", "v > 0")
    val e = intercept[Exception] { t.withRetry() { x =>
      x.insert(Seq((1L, "a", -5L)).toDF("obj_id", "grp", "v")) } }
    assert(messages(e).contains("CHECK constraint v_pos"))
    assert(t.read().count() == 0)
    // NULL v: the expression is NULL -> passes (SQL CHECK semantics)
    t.withRetry() { x => x.insert(Seq((2L, "a")).toDF("obj_id", "grp")
      .withColumn("v", lit(null).cast("long"))) }
    assert(t.read().count() == 1)
  }

  test("addConstraint validates existing rows and rejects bad definitions") {
    val t = fresh()
    t.withRetry() { x => x.insert(Seq((1L, "a", -3L))
      .toDF("obj_id", "grp", "v")) }
    val e = intercept[ConstraintViolationException] {
      t.addConstraint("v_pos", "v > 0") }
    assert(e.getMessage.contains("v_pos"))
    assert(t.constraints.isEmpty)
    // non-boolean expression
    intercept[IllegalArgumentException] { t.addConstraint("bad", "v + 1") }
    // unknown column
    intercept[IllegalArgumentException] { t.addConstraint("bad", "nope > 0") }
    // column-free constant
    intercept[IllegalArgumentException] { t.addConstraint("bad", "1 = 1") }
    // non-deterministic
    intercept[IllegalArgumentException] {
      t.addConstraint("bad", "v > rand()") }
    // bad name
    intercept[IllegalArgumentException] { t.addConstraint("no-dash", "v > 0") }
  }

  test("update and merge outputs validate; drop lifts the invariant") {
    val t = fresh()
    t.withRetry() { x => x.insert(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("obj_id", "grp", "v")) }
    t.addConstraint("v_pos", "v > 0")
    val e = intercept[Exception] { t.withRetry() { x =>
      x.update(Seq(1L), df => df.withColumn("v", lit(-1L))) } }
    assert(messages(e).contains("CHECK constraint v_pos"))
    assert(t.read().filter(col("obj_id") === 1L).select("v")
      .head().getLong(0) == 10L)
    val e2 = intercept[Exception] { t.withRetry() { x =>
      x.merge(Seq((3L, "c", -9L)).toDF("obj_id", "grp", "v"),
        insertUnmatched = true) } }
    assert(messages(e2).contains("CHECK constraint v_pos"))
    assert(t.dropConstraint("v_pos"))
    assert(!t.dropConstraint("v_pos"))
    t.withRetry() { x => x.insert(Seq((4L, "d", -7L))
      .toDF("obj_id", "grp", "v")) }
    assert(t.read().count() == 3)
  }

  test("rename/drop of a referenced column is rejected; constraints survive checkpoints and reopen") {
    val t = fresh(EngineConf(checkpointInterval = 2))
    t.addConstraint("v_pos", "v > 0")
    intercept[Exception] { t.withRetry() { x => x.renameColumn("v", "w") } }
    intercept[Exception] { t.withRetry() { x =>
      x.alterSchema(StructType(schema.filterNot(_.name == "v"))) } }
    // unrelated rename is fine
    t.withRetry() { x => x.renameColumn("grp", "g") }
    // churn past several checkpoints, then reopen cold
    (0 until 5).foreach { i =>
      t.withRetry() { x => x.insert(Seq((i.toLong, "a", i + 1L))
        .toDF("obj_id", "g", "v")) }
    }
    val re = VersionedTable.open(spark, t.root)
    assert(re.constraints == Map("v_pos" -> "v > 0"))
    val e = intercept[Exception] { re.withRetry() { x =>
      x.insert(Seq((99L, "z", 0L)).toDF("obj_id", "g", "v")) } }
    assert(messages(e).contains("CHECK constraint v_pos"))
  }

  test("a writer pinned before an interleaved constraint change conflicts") {
    val t = fresh()
    val txn = t.begin()
    txn.insert(Seq((1L, "a", -5L)).toDF("obj_id", "grp", "v"))
    // constraint lands AFTER the writer's snapshot: its staged rows
    // were never validated against it, so the commit must conflict
    t.addConstraint("v_pos", "v > 0")
    val e = intercept[ConflictException] { t.commit(txn) }
    assert(e.getMessage.contains("constraints changed"))
    assert(t.read().count() == 0)
  }

  test("restore reverts the constraint plane with the data") {
    val t = fresh()
    t.withRetry() { x => x.insert(Seq((1L, "a", 5L))
      .toDF("obj_id", "grp", "v")) }
    val before = t.latestVersion
    t.addConstraint("v_pos", "v > 0")
    t.restore(before)
    assert(t.constraints.isEmpty)
    t.withRetry() { x => x.insert(Seq((2L, "b", -1L))
      .toDF("obj_id", "grp", "v")) }
    assert(t.read().count() == 2)
  }

  test("streaming sink: a violating micro-batch fails its epoch, lands nothing") {
    val dir = Files.createTempDirectory("graft_cons_stream_").toUri.toString
    val t = VersionedTable.create(spark, dir, schema)
    t.addConstraint("v_pos", "v > 0")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val ckpt = Files.createTempDirectory("graft_cons_sck_").toString
    def drain(): Unit = {
      val q = mem.toDF().toDF("obj_id", "grp", "v")
        .writeStream.format("graft").option("path", dir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData((1L, "a", 10L))
    drain()
    assert(t.read().count() == 1)
    mem.addData((2L, "b", -5L))
    val e = intercept[Exception] { drain() }
    assert(messages(e).contains("CHECK constraint v_pos"))
    assert(t.read().count() == 1)
  }

  test("uniqueIds: plain inserts cannot land a duplicate id (batch, cross-txn, streaming)") {
    val t = VersionedTable.create(spark,
      Files.createTempDirectory("graft_uniq_").toUri.toString, schema,
      EngineConf(uniqueIds = true))
    t.withRetry() { x => x.insert(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("obj_id", "grp", "v")) }
    // within-batch duplicate
    val e1 = intercept[Exception] { t.withRetry() { x =>
      x.insert(Seq((3L, "c", 1L), (3L, "c", 2L))
        .toDF("obj_id", "grp", "v")) } }
    assert(messages(e1).contains("duplicate obj_id 3"))
    // vs existing
    val e2 = intercept[Exception] { t.withRetry() { x =>
      x.insert(Seq((1L, "z", 99L)).toDF("obj_id", "grp", "v")) } }
    assert(messages(e2).contains("obj_id 1 already exists"))
    assert(t.read().count() == 2)
    // read-your-own-writes: two batches in ONE txn collide too
    val e3 = intercept[Exception] { t.withRetry() { x =>
      x.insert(Seq((5L, "e", 1L)).toDF("obj_id", "grp", "v"))
      x.insert(Seq((5L, "e", 2L)).toDF("obj_id", "grp", "v")) } }
    assert(messages(e3).contains("obj_id 5 already exists"))
    // a deleted id may be re-inserted
    t.withRetry() { x => x.delete(Seq(2L)) }
    t.withRetry() { x => x.insert(Seq((2L, "b2", 21L))
      .toDF("obj_id", "grp", "v")) }
    assert(t.read().count() == 2)
    // merge/upsert replace rows (unique by construction, unaffected)
    t.withRetry() { x => x.upsert(Seq((1L, "a", 11L))
      .toDF("obj_id", "grp", "v")) }
    assert(t.read().filter(col("obj_id") === 1L).head().getLong(2) == 11L)
    // streaming APPEND epochs probe too
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val ckpt = Files.createTempDirectory("graft_uniq_ck_").toString
    def drain(): Unit = {
      val q = mem.toDF().toDF("obj_id", "grp", "v")
        .writeStream.format("graft").option("path", t.root)
        .option("checkpointLocation", ckpt)
        .option("uniqueIds", "true")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData((10L, "s", 1L))
    drain()
    mem.addData((10L, "s", 2L))
    val e4 = intercept[Exception] { drain() }
    assert(messages(e4).contains("obj_id 10 already exists"))
    assert(t.read().filter(col("obj_id") === 10L).count() == 1)

    // idempotent-replay interplay: a REPLAYED txnAppId write must
    // no-op gracefully, not trip the duplicate probe on its own first
    // attempt's rows; a genuinely NEW version with duplicate ids still
    // fails
    val t2 = VersionedTable.create(spark,
      Files.createTempDirectory("graft_uniq_rep_").toUri.toString, schema)
    def idemWrite(ver: Long, id: Long): Unit =
      Seq((id, "r", ver)).toDF("obj_id", "grp", "v")
        .write.format("graft").option("path", t2.root)
        .option("uniqueIds", "true")
        .option("txnAppId", "job-A").option("txnVersion", ver)
        .mode("append").save()
    idemWrite(1L, 7L)
    idemWrite(1L, 7L) // replay: lands nothing, no error
    assert(t2.read().count() == 1)
    val e6 = intercept[Exception] { idemWrite(2L, 7L) } // new version, dup id
    assert(messages(e6).contains("obj_id 7 already exists"))

    // SQL face: unique_ids table property + set_unique_ids toggle
    val cat = "guniq" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    val wh = Files.createTempDirectory("graft_uniq_wh_").toUri.toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.u (obj_id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('unique_ids' = 'true')")
    spark.sql(s"INSERT INTO $cat.ns.u VALUES (1, 1)")
    val e5 = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.u VALUES (1, 2)") }
    assert(messages(e5).contains("obj_id 1 already exists"))
    spark.sql(s"CALL $cat.system.set_unique_ids('ns.u', false)")
    spark.sql(s"INSERT INTO $cat.ns.u VALUES (1, 2)") // now allowed
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.u").head.getLong(0)
      == 2L)
  }

  test("uniqueIds: catalog protection holds for path-based writes too") {
    // CALL set_unique_ids records the spec in _catalog.json; a writer
    // coming through .option("path", ...) (no catalog) must inherit
    // it — otherwise the protection has a side door. An explicit
    // option still overrides by name.
    val cat = "guniqp" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    val wh = Files.createTempDirectory("graft_uniqp_wh_").toUri.toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.p (obj_id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns.p VALUES (1, 1)")
    spark.sql(s"CALL $cat.system.set_unique_ids('ns.p', true)")
    val root = s"$wh/ns/p"
    val dup = Seq((1L, 99L)).toDF("obj_id", "v")
    val e = intercept[Exception] {
      dup.write.format("graft").option("path", root)
        .mode("append").save() // NO uniqueIds option: spec must apply
    }
    assert(messages(e).contains("obj_id 1 already exists"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.p").head.getLong(0)
      == 1L)
    // explicit opt-out by name wins over the recorded spec
    dup.write.format("graft").option("path", root)
      .option("uniqueIds", "false").mode("append").save()
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.p").head.getLong(0)
      == 2L)
  }

  test("property: random op sequences never leave a violating row behind") {
    // invariant after EVERY commit: no live row violates any in-force
    // constraint (adds validate existing rows; writes validate staged
    // rows; drops only relax) — and a rejected op changes NOTHING
    val rnd = new scala.util.Random(0xC0457L)
    val t = fresh()
    var nextId = 0L
    var pool = Vector.empty[Long] // live ids
    def snapshotState(): (Long, Long) =
      (t.latestVersion, t.read().count())
    (0 until 40).foreach { step =>
      val cons = t.constraints
      val before = snapshotState()
      val v = rnd.nextInt(200) - 50 // [-50, 150): sometimes negative
      val violates = (n: Long) =>
        cons.contains("v_pos") && n <= 0
      rnd.nextInt(6) match {
        case 0 | 1 => // insert one row (maybe violating)
          val id = { nextId += 1; nextId }
          val ok = !violates(v)
          try {
            t.withRetry() { x => x.insert(Seq((id, s"g${id % 3}", v.toLong))
              .toDF("obj_id", "grp", "v")) }
            assert(ok, s"step $step: violating insert ($v) landed")
            pool :+= id
          } catch { case e: Throwable =>
            assert(!ok, s"step $step: valid insert ($v) failed: $e")
            assert(snapshotState() == before)
          }
        case 2 if pool.nonEmpty => // update one row (maybe violating)
          val id = pool(rnd.nextInt(pool.size))
          val ok = !violates(v)
          try {
            t.withRetry() { x => x.update(Seq(id),
              df => df.withColumn("v", lit(v.toLong))) }
            assert(ok, s"step $step: violating update ($v) landed")
          } catch { case e: Throwable =>
            assert(!ok, s"step $step: valid update ($v) failed: $e")
            assert(snapshotState() == before)
          }
        case 3 if pool.nonEmpty => // delete
          val id = pool(rnd.nextInt(pool.size))
          t.withRetry() { x => x.delete(Seq(id)) }
          pool = pool.filterNot(_ == id)
        case 4 if !cons.contains("v_pos") => // try to add the invariant
          val hasBad = t.read().filter(col("v") <= 0).limit(1).count() > 0
          try {
            t.addConstraint("v_pos", "v > 0")
            assert(!hasBad, s"step $step: add landed over violating rows")
          } catch { case _: ConstraintViolationException =>
            assert(hasBad, s"step $step: clean add rejected")
          }
        case 5 if cons.contains("v_pos") =>
          assert(t.dropConstraint("v_pos"))
        case _ => ()
      }
      // the standing invariant
      t.constraints.foreach { case (n, check) =>
        val bad = t.read()
          .filter(coalesce(expr(check), lit(true)) === false).count()
        assert(bad == 0L, s"step $step: $bad rows violate $n")
      }
    }
  }

  test("SQL surface: add_constraint / show_constraints / drop_constraint") {
    val wh = Files.createTempDirectory("graft_cons_sql_").toUri.toString
    val cat = "gcons" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(8)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.ns.t (obj_id BIGINT, grp STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 'a', 10)")
    spark.sql(s"CALL $cat.system.add_constraint('ns.t', 'v_pos', 'v > 0')")
    val shown =
      spark.sql(s"CALL $cat.system.show_constraints('ns.t')").collect()
    assert(shown.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("v_pos", "v > 0")))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, 'b', -5)") }
    assert(messages(e).contains("CHECK constraint v_pos"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0)
      == 1L)
    // metadata table twin of show_constraints
    assert(spark.sql(s"SELECT name, `check` FROM $cat.ns.`t$$constraints`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("v_pos", "v > 0")))
    spark.sql(s"CALL $cat.system.drop_constraint('ns.t', 'v_pos')")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (2, 'b', -5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").head().getLong(0)
      == 2L)
  }
}
