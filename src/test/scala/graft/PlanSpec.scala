package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the properties that make these
  * queries viable at 100 TB (scan pruning, predicate pushdown, broadcast
  * selection, top-k without global sort, whole-stage codegen) are
  * asserted on the actual executed plans so a refactor can't silently
  * regress them. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: predicates are pushed to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)") ||
      p.contains("GreaterThan(l_quantity,45"), p)
  }

  test("q02: scan reads only the referenced columns") {
    val p = plan("q02_filter")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_shipdate"),
      s"scan reads unneeded columns: $read")
  }

  test("q04: dimension join is a broadcast hash join") {
    assert(plan("q04_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q11: top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q11_topk").contains("TakeOrderedAndProject"))
  }

  test("q03: partial (map-side) aggregation + codegen in the final plan") {
    val df = SparkEntry.queries("q03_agg")(spark, dir)
    df.collect() // finalize the AQE plan
    val exec = df.queryExecution.executedPlan
    assert(exec.toString.contains("partial_sum"), exec) // map-side combine
    val finalPlan = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // codegen stages print as "*(n) Operator" in the final AQE plan
    assert("""\*\(\d+\)""".r.findFirstIn(finalPlan.toString).isDefined,
      finalPlan.toString)
  }

  test("q26: per-pair cosine uses the custom codegen expression") {
    assert(plan("q26_ann_top1").toLowerCase.contains("cosinesimilarity"))
  }

  test("q20: scalar subquery threshold is broadcast, not collected") {
    assert(plan("q20_subquery").contains("BroadcastNestedLoopJoin") ||
      plan("q20_subquery").contains("BroadcastHashJoin"))
  }

  test("partitioned layout: partition filter prunes before any file opens") {
    // the q32_partitioned_roundtrip pattern: filter on the hive
    // partition column must become a PartitionFilters entry (directory
    // pruning), NOT a data filter evaluated per row
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune_").toString
    Engine.table(spark, dir, "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id")
    val p = df.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("lang"), s"no partition filter on lang:\n$p")
  }

  test("sampling filter stays in the scan stage and prunes columns") {
    val df = graft.operators.Sampling.sampleByKey(
      Engine.table(spark, dir, "documents"), "doc_id", 10).select("doc_id")
    val p = df.queryExecution.executedPlan.toString
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"sample decision must read only the id column: $read")
  }

  test("q40: gram keys are hashed longs and the heldout side broadcasts") {
    val df = SparkEntry.queries("q40_decontaminate")(spark, dir)
    df.collect() // finalize AQE join selection
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    // join on the codegen'd 64-bit gram hash, not 8-word strings
    assert(exec.contains("shinglehashes(text"), exec)
    // a gram side measured small — AQE must broadcast it, not
    // sort-merge two exploded gram streams
    assert(exec.contains("BroadcastHashJoin"), exec)
  }

  test("q44: packing shuffles once on the shard, never a global sort") {
    val df = SparkEntry.queries("q44_pack")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the window must partition by shard (per-shard local sort)...
    assert(p.contains("windowspecdefinition(shard"), p)
    // ...and the only whole-dataset Sort allowed is the final ORDER BY
    // (which follows the aggregate, over per-bin rows, not chunks);
    // a Sort directly over the chunk stream without a partitioning key
    // would mean a degenerate empty-frame window
    assert(!p.contains("Window [") ||
      !p.linesIterator.exists(l => l.contains("Sort") && l.contains("global=true")
        && l.contains("chunk_idx")), p)
  }

  test("q25 embed near-dup: cosine threshold lives IN the join condition") {
    // the 10x regression shape: cosine in a filter ABOVE the join
    // materializes every candidate pair (two arrays each) before
    // discarding it; keeping it in the BNLJ condition evaluates inside
    // the codegen'd probe loop with zero row construction for misses
    val p = plan("q25_embed_neardup")
    val bnlj = p.linesIterator
      .find(_.contains("BroadcastNestedLoopJoin")).getOrElse("")
    assert(bnlj.nonEmpty, s"expected a broadcast nested-loop join:\n$p")
    assert(bnlj.toLowerCase.contains("cosinesimilarity") ||
      bnlj.contains("graft_cosine_sim"),
      s"cosine threshold not in the join condition:\n$bnlj")
  }
}
