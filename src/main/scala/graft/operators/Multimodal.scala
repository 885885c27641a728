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
    "q28_features" -> Q.noOracle {
      (s, dir) =>
        val packed = packAsMedia(Engine.table(s, dir, "documents"), "text")
        extractFeatures(packed, "doc_id", "payload")
          .select(col("id"), round(element_at(col("features"), 1), 4).as("f0"))
          .orderBy("id")
    }
  )
}
