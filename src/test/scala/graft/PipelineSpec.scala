package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.functions.TextAnalytics

/** Behavior tests for the LLM-pipeline operators (dedup, similarity,
  * text analytics, multimodal) beyond the cross-engine oracle checks. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = Engine.session("4")
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("shingles: short docs yield empty set, no failure") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) == Seq("a b c", "b c d"))
  }

  test("shingle hashing matches split semantics on trailing spaces") {
    // string_split("x y z w ") has an empty trailing token, giving the
    // extra shingle "z w " — the hashed tokenizer must agree with the
    // SQL oracle here or Jaccard values diverge
    val df = Seq((1L, "x y z w"), (2L, "x y z w ")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getDouble(2) == 0.6667) // |{xyz,yzw}| / |{xyz,yzw,"z w "}|
  }

  test("exact dedup removes duplicate keys") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "t")
    assert(Dedup.exact(df, Seq("t")).count() == 2)
  }

  test("minhash-LSH pairs equal exact Jaccard pairs (full recall)") {
    val docs = Engine.table(spark, dir, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).collect()
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.5).collect()
    assert(exact.nonEmpty)
    assert(lsh.map(_.toSeq).toSet == exact.map(_.toSeq).toSet)
  }

  test("jaccard prefix filter is exact under either global order") {
    // the prefix-filter theorem holds for ANY global total order on
    // shingles; hash-asc (slice, default) and df-asc (windowed) must
    // produce identical pairs — and tie out with the tau=0.5 oracle set
    val docs = Engine.table(spark, dir, "documents")
    val byHash = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(_.toSeq)
    val byDf = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5,
      orderByDf = true).collect().map(_.toSeq)
    assert(byHash.nonEmpty)
    assert(byHash.toSeq == byDf.toSeq)
  }

  test("simhash pairs equal exact Jaccard pairs at tau=0.9") {
    val docs = Engine.table(spark, dir, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9).collect()
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", 3, 0.9).collect()
    assert(sim.map(_.toSeq).toSet == exact.map(_.toSeq).toSet)
  }

  test("connected components: transitive chains merge, islands stay apart") {
    // A~B, B~C (no direct A~C) must land in ONE component — the case
    // greedy drop-doc_hi dedup under-merges
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain exercises multi-round propagation
    val chain = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(1)).distinct
    assert(labels.toSeq == Seq(1L))
  }

  test("cosine: identical vectors score 1.0, orthogonal 0.0") {
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 2.0)))
      .toDF("vec_id", "v")
    val out = Similarity.cosineNearDup(df, -2.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) == 0.0)
  }

  test("ANN top-1 picks the true nearest neighbor") {
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(-1.0, 0.2)))
      .toDF("vec_id", "v")
    val out = Similarity.annTop1(df, df.filter(col("vec_id") === 0))
      .collect().head
    assert(out.getLong(1) == 1L)
  }

  test("langId classifies handwritten multilingual snippets") {
    val df = Seq(
      "the quick brown fox is one of the foxes",
      "el perro y la casa que en madrid",
      "der hund und die katze ist nicht hier",
      "le chat et les chiens est dans la maison")
      .toDF("text")
    val got = df.select(TextAnalytics.langId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "de", "fr"))
  }

  test("fingerprint is content-sensitive and stable") {
    val df = Seq((1L, "hello world"), (2L, "hello worle"), (3L, "hello world"))
      .toDF("id", "text")
    val fp = df.select(TextAnalytics.fingerprint(spark, col("text"))).collect().map(_.getLong(0))
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
  }

  test("multimodal: payload round-trips bytes and features normalize") {
    val docs = Engine.table(spark, dir, "documents").limit(20)
    val packed = Multimodal.packAsMedia(docs, "text")
    val back = packed.select(col("text"),
      decode(col("payload"), "UTF-8").as("rt")).collect()
    assert(back.forall(r => r.getString(0) == r.getString(1)))
    val feats = Multimodal.extractFeatures(packed, "doc_id", "payload").collect()
    assert(feats.length == 20)
    feats.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 8 && math.abs(f.sum - 1.0) < 1e-9)
    }
  }
}
