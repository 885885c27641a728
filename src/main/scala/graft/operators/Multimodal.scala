package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** Multimodal column plumbing (SURVEY.md §2.2 Q28): media payloads as
  * opaque BINARY columns with a typed metadata struct, plus a
  * feature-extraction operator over mapPartitions.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (byte-histogram "features"); the
  * Spark-side plumbing — schema, batch iteration, partition-local
  * decode, output schema — is real and tested. On a cluster the stub
  * body is replaced by a real codec call per element; the dataflow
  * (narrow mapPartitions, no shuffle, no driver collection) is the
  * 100 TB shape.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("nbytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Pack a text column as a binary payload + metadata struct — the
    * fixture generator for media-shaped data. */
  def packAsMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("blob").as("kind"),
        octet_length(col("payload")).cast("long").as("nbytes"),
        lit(0).as("width"), lit(0).as("height")))

  /** STUB decoder: deterministic 8-bin byte histogram, normalized.
    * Replace the body with a real codec (image resize / audio frames /
    * video sampling) in production — the signature and dataflow stay. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xFF) >> 5) += 1.0
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    bins.map(_ / n)
  }

  /** Partition-local feature extraction over binary payloads: the
    * mapPartitions shape lets a real decoder amortize codec init per
    * partition (the expensive part at scale). */
  def extractFeatures(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        // per-partition: init codec once (stubbed), stream elements
        rows.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Deterministic frame sampler for video-shaped payloads: the payload
    * is treated as a sequence of `frameBytes`-sized frames and every
    * `stride`-th frame becomes its own row (doc, frame index, frame
    * bytes). Byte-slicing stands in for a real demuxer (none in this
    * container); the one-row→many-frames explode dataflow is the
    * production shape — narrow, no shuffle, frame rows feed the same
    * [[extractFeatures]] path as whole payloads. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val nFrames = ceil(octet_length(col("p")) / lit(frameBytes.toDouble))
      .cast("int")
    df.select(col(idCol), col(payloadCol).as("p"))
      .withColumn("fidx", explode(
        sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .select(col(idCol), col("fidx"),
        col("p").substr(col("fidx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  val defs: Seq[(String, Q)] = Seq(

    // binary round-trip: pack → meta/digest projections match DuckDB
    // computing the same over the source text bytes
    "q28_multimodal" -> Q(
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes, " +
      "md5(text) AS digest FROM documents ORDER BY doc_id") {
      (s, dir) =>
        val packed = packAsMedia(Engine.table(s, dir, "documents"), "text")
        packed.select(col("doc_id"), col("meta.nbytes").as("nbytes"),
          md5(col("payload")).as("digest"))
          .orderBy("doc_id")
    },

    // feature extraction through the mapPartitions stub — deterministic,
    // not SQL-expressible → rows-only check; exactness covered in tests
    // the stub decoder is a deterministic byte histogram, so its output
    // IS SQL-recomputable: bin 3 counts bytes in [0x60, 0x7F] (lowercase
    // letters) — hash-gating the whole pack → BINARY →
    // mapPartitions-decode dataflow, not just its row count. The
    // denominator is octet_length(encode(..)) — BYTES, matching the
    // stub's payload.length even if a fixture ever grows non-ASCII
    // text (multi-byte sequences contribute no 0x60-0x7F bytes, so the
    // numerator is byte-safe as-is)
    "q28_features" -> Q(
      "SELECT doc_id AS id, ROUND(CAST(length(text) - " +
      "length(regexp_replace(text, '[\\x60-\\x7f]', '', 'g')) AS DOUBLE) " +
      "/ GREATEST(octet_length(encode(text)), 1), 4) AS f3 " +
      "FROM documents ORDER BY id") {
      (s, dir) =>
        val packed = packAsMedia(Engine.table(s, dir, "documents"), "text")
        extractFeatures(packed, "doc_id", "payload")
          .select(col("id"), round(element_at(col("features"), 4), 4).as("f3"))
          .orderBy("id")
    },

    // frame sampling over video-shaped payloads; byte-sliced frames are
    // digest-compared against DuckDB slicing the same content. DuckDB
    // 1.0 has no BLOB substring, so the oracle slices the VARCHAR —
    // equivalent byte-for-byte because the documents fixture is pure
    // ASCII (verified octet_length == length at every SF); Spark still
    // slices the BINARY payload
    "q28_frame_sample" -> Q(
      "WITH m AS (SELECT doc_id, text AS p, " +
      "CAST(CEIL(octet_length(encode(text))/256.0) AS INT) AS nf FROM documents), " +
      "f AS (SELECT doc_id, p, unnest(generate_series(0, " +
      "GREATEST(nf-1, 0), 4)) AS fidx FROM m) " +
      "SELECT doc_id, fidx, md5(substring(p, fidx*256+1, 256)) AS digest " +
      "FROM f ORDER BY doc_id, fidx") {
      (s, dir) =>
        val packed = packAsMedia(Engine.table(s, dir, "documents"), "text")
        sampleFrames(packed, "doc_id", "payload")
          .select(col("doc_id"), col("fidx"), md5(col("frame")).as("digest"))
          .orderBy("doc_id", "fidx")
    }
  )
}
