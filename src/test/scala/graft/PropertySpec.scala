package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property-based tests (SURVEY.md §5.2): invariants over generated
  * inputs rather than fixtures. Uses ScalaCheck generators directly with
  * fixed seeds (a Spark job per case is expensive, so a handful of
  * deterministic cases per property). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._

  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val docGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(5, 20)
    base <- Gen.listOfN(30, Gen.oneOf(vocab))
    docs <- Gen.listOfN(n, for {
      mutate <- Gen.choose(0, 8)
      idxs <- Gen.listOfN(mutate, Gen.choose(0, 29))
      repl <- Gen.listOfN(mutate, Gen.oneOf(vocab))
    } yield {
      val arr = base.toArray
      idxs.zip(repl).foreach { case (i, w) => arr(i) = w }
      arr.mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("exact dedup is idempotent and never increases rows") {
    cases(docGen, 5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val once = Dedup.exact(df, Seq("text"))
      val twice = Dedup.exact(once, Seq("text"))
      assert(once.count() == twice.count())
      assert(once.count() <= df.count())
    }
  }

  test("minhash-LSH: subset of exact pairs; full recall above the margin") {
    // LSH recall at J just above tau is probabilistic (≈87% at J=0.5 for
    // 32 bands x 4 rows) — the guarantee is: no false positives ever
    // (exact verification), and pairs comfortably above the threshold
    // (J≥0.75 → recall ≈ 1-5e-6) are always found.
    cases(docGen, 5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val exact = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
        .collect().map(_.toSeq).toSet
      val high = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.75)
        .collect().map(_.toSeq).toSet
      val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 0.5)
        .collect().map(_.toSeq).toSet
      assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
      assert(high.subsetOf(lsh), s"missed high-sim pairs: ${high -- lsh}")
    }
  }

  test("jaccard pairs are well-formed: ordered ids, jac in [tau, 1]") {
    cases(docGen, 5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.3).collect().foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        val j = r.getDouble(2)
        assert(j >= 0.3 - 1e-9 && j <= 1.0 + 1e-9)
      }
    }
  }

  test("jaccard prefix is exact at non-binary tau (0.9): threshold pairs survive") {
    // |A| = 10 shingles, |B| = 9, overlap 9 -> jac = 9/10 = exactly tau.
    // The naive ceil(n*tau) evaluates 0.9*10 to 9.000000000000002 ->
    // ceil 10 -> prefix one element short -> this pair silently dropped
    // (round-4 ADVICE); the rational ceiling keeps it.
    val words = (1 to 12).map(i => s"w$i")
    val a = words.mkString(" ")          // 10 distinct shingles
    val b = words.take(11).mkString(" ") // 9 shingles, all shared with a
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    for (byDf <- Seq(false, true)) {
      val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.9, byDf).collect()
      assert(got.length == 1, s"orderByDf=$byDf missed the exact-threshold pair")
      assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
      assert(math.abs(got(0).getDouble(2) - 0.9) < 1e-9)
    }
  }

  test("jaccard pairs at tau=0.9 equal the brute-force oracle under either order") {
    cases(docGen, 3).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val sets = docs.map { case (id, t) =>
        val w = t.split(" ")
        id -> (if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
               else Set.empty[String])
      }.filter(_._2.nonEmpty)
      val expect = (for {
        (ia, sa) <- sets
        (ib, sb) <- sets
        if ia < ib
        inter = (sa & sb).size
        if inter.toDouble / (sa.size + sb.size - inter) >= 0.9
      } yield (ia, ib)).toSet
      for (byDf <- Seq(false, true)) {
        val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.9, byDf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expect,
          s"orderByDf=$byDf: extra=${got -- expect} missing=${expect -- got}")
      }
    }
  }

  test("acid: random committed/rolled-back inserts equal the sequential model") {
    val opsGen = Gen.listOfN(8, for {
      v <- Gen.choose(0L, 100L)
      commit <- Gen.oneOf(true, true, false) // ~1/3 rollback
    } yield (v, commit))
    cases(opsGen, 3).foreach { ops =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_").toUri.toString
      val inst = graft.acid.VersionedTable.create(spark, dir,
        graft.acid.AcidQueries.schema)
      var model = Map.empty[Long, Long]
      var nextId = 1000L
      ops.foreach { case (v, commit) =>
        val txn = inst.begin()
        val id = nextId; nextId += 1
        txn.insert(Seq((id, v)).toDF("obj_id", "value"))
        if (commit) { inst.commit(txn); model += id -> v }
        else inst.rollback(txn)
      }
      val got = inst.read().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model)
    }
  }

  test("corpus ops are partition-count invariant (upsample/chunk/pack/decontaminate)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalytics
    import graft.operators.Sampling
    cases(docGen, 3).foreach { docs =>
      val langs = Vector("en", "de", "fr")
      val base = docs.map { case (id, t) => (id, t, langs((id % 3).toInt)) }
        .toDF("doc_id", "text", "lang")
      def allOf(parts: Int): Seq[Seq[Any]] = {
        val df = if (parts == 0) base else base.repartition(parts)
        val up = Sampling.upsample(df, col("doc_id"),
            when(col("lang") === "en", lit(1.0)).otherwise(lit(2.5)))
          .select("doc_id", "copy")
        val ch = TextAnalytics.chunk(df, col("doc_id"), col("text"), 8, 6)
        val pk = TextAnalytics.packChunks(ch, ctxTokens = 16, shards = 4)
          .select("doc_id", "chunk_idx", "shard", "bin", "offset")
        val held = df.filter(col("doc_id") % 5 === 0)
        val tr = df.filter(col("doc_id") % 5 =!= 0)
        val cont = Dedup.contaminated(tr, held, "doc_id", "text", 3)
        (up.collect() ++ ch.collect() ++ pk.collect() ++ cont.collect())
          .map(_.toSeq).toSeq
      }
      val one = allOf(0).sortBy(_.toString)
      Seq(2, 7).foreach { p =>
        assert(allOf(p).sortBy(_.toString) == one,
          s"corpus op output drifted at $p partitions")
      }
    }
  }

  test("packing conservation: every chunk lands in exactly one window, tokens add up") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalytics
    cases(docGen, 3).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val ch = TextAnalytics.chunk(df, col("doc_id"), col("text"), 8, 6)
      val packed = TextAnalytics.packChunks(ch, ctxTokens = 16, shards = 2)
      assert(packed.count() == ch.count(), "packing dropped or duplicated chunks")
      // per shard the layout is gapless: the furthest stream position
      // (start + tokens over all chunks) is exactly the shard's total
      // token count
      packed.groupBy("shard").agg(
          sum("chunk_tokens").as("toks"),
          max(expr("bin * 16 + offset + chunk_tokens")).as("streamEnd"))
        .collect().foreach { r =>
          assert(r.getLong(1) == r.getLong(2),
            s"shard ${r.get(0)}: token stream inconsistent with window layout")
        }
      // offsets are within the window
      assert(packed.filter(col("offset") >= 16 || col("offset") < 0).count() == 0)
    }
  }

  test("split mixer: uniform buckets, frozen membership, scan-order free") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(0, 20000).select(col("id").as("doc_id"))
    val buckets = ids
      .select(graft.operators.Sampling.splitBucket(col("doc_id")).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(buckets.length == 100, "every bucket of 100 is hit")
    // uniformity: each bucket expects 200; allow a generous +-35% band
    // (the mixer is an LCG, not crypto — but splits must not skew)
    buckets.foreach { case (b, c) =>
      assert(c > 130 && c < 270, s"bucket $b count $c outside [130,270]")
    }
    // frozen membership: pinned values can never drift across versions
    // (a changed mixer silently reshuffles every downstream eval set)
    val pinned = Seq(0L, 1L, 42L, 9999L, 123456789L).map { id =>
      ids.sparkSession.range(id, id + 1)
        .select(graft.operators.Sampling.splitBucket(col("id")).as("b"))
        .head().getLong(0)
    }
    assert(pinned == Seq(0L, 94L, 7L, 56L, 15L), s"mixer drifted: $pinned")
    // partitioning independence: same buckets at any parallelism
    val repart = ids.repartition(7)
      .select(graft.operators.Sampling.splitBucket(col("doc_id")).as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(repart.sorted.toSeq == buckets.sorted.toSeq)
  }

  /** Sequential model of C4 span dedup: first (doc, idx) occurrence of
    * each full-width span survives, tails always survive, docs whose
    * every tile was removed drop out. */
  private def spanModel(docs: Seq[(Long, String)], width: Int)
      : Map[Long, String] = {
    val tiles = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      val n = ws.length
      val nt = math.ceil(n.toDouble / width).toInt
      (0 until nt).map { i =>
        val span = ws.slice(i * width, math.min((i + 1) * width, n))
          .mkString(" ")
        (id, i, span, (i + 1) * width <= n)
      }
    }
    val winners = tiles.filter(_._4).groupBy(_._3)
      .map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
    val kept = tiles.filter(t => !t._4 || winners(t))
    kept.groupBy(_._1).map { case (id, ts) =>
      id -> ts.sortBy(_._2).map(_._3).mkString(" ")
    }
  }

  test("span dedup matches the sequential first-occurrence model") {
    for (width <- Seq(1, 3, 4); docs <- cases(docGen, 3)) {
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), width)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == spanModel(docs, width), s"width=$width")
    }
  }

  test("span dedup edge cases: exact duplicate doc, width > doc, empty-ish") {
    // doc 2 duplicates doc 1 exactly (6 words = 2 full 3-tiles): every
    // tile loses to doc 1, so doc 2 drops out entirely. doc 3 shares
    // only its first tile with doc 1 and keeps its tail. doc 4 is
    // shorter than the width: single tail tile, always kept verbatim.
    val docs = Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f",
      3L -> "a b c x y",
      4L -> "solo pair")
    val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b c d e f", 3L -> "x y", 4L -> "solo pair"))
    assert(got == spanModel(docs, 3))
  }
}
