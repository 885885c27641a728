package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** Multimodal column plumbing (SURVEY.md §2.2 Q28): media payloads as
  * opaque BINARY columns with a typed metadata struct, plus REAL
  * pure-JVM decoders for two uncompressed containers — raw PGM (P5)
  * images and RIFF/WAVE PCM audio — driven through the same
  * mapPartitions feature-extraction operator a production codec would
  * use. The fixture packers build genuine containers around the
  * documents fixture's bytes (header + raster/samples), so the
  * decoders parse real magic numbers, dimensions, chunk tables, and
  * payload bytes; every feature is recomputed independently by the
  * DuckDB oracle, hash-gating the full pack → BINARY → decode → feature
  * dataflow. Compressed codecs (JPEG/FLAC/H.264) slot into the same
  * decoder signature; only the per-element byte parsing changes.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("nbytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Pack a text column as an opaque binary payload + metadata struct —
    * the untyped-blob fixture (q28_multimodal's round-trip). */
  def packAsMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("blob").as("kind"),
        octet_length(col("payload")).cast("long").as("nbytes"),
        lit(0).as("width"), lit(0).as("height")))

  /** Pack a text column as a REAL raw-PGM (P5) image: `P5\n{w} {h}\n
    * 255\n` header followed by w·h one-byte samples — the text bytes,
    * space-padded up to the raster size. 16 columns wide, height =
    * ceil(bytes/16). Pure column arithmetic, no UDF. */
  def packAsImage(df: DataFrame, textCol: String): DataFrame = {
    val nb = octet_length(encode(col(textCol), "UTF-8"))
    val h = greatest(lit(1), ceil(nb / lit(16.0)).cast("int"))
    val padded = call_function("rpad", col(textCol), h * 16, lit(" "))
    df.withColumn("payload", encode(
        concat(lit("P5\n16 "), h.cast("string"), lit("\n255\n"), padded),
        "UTF-8"))
      .withColumn("meta", struct(
        lit("image/pgm").as("kind"),
        octet_length(col("payload")).cast("long").as("nbytes"),
        lit(16).as("width"), h.as("height")))
  }

  /** Little-endian byte serializers for RIFF headers, as columns: each
    * byte rendered as a hex pair, `unhex` packs them to BINARY. */
  private def le(x: Column, bytes: Int): Column =
    unhex(concat((0 until bytes).map(i =>
      lpad(hex(shiftright(x.cast("long"), 8 * i).bitwiseAND(lit(255L))),
        2, "0")): _*))

  /** Pack a text column as a REAL RIFF/WAVE file: canonical 44-byte
    * header (PCM, mono, 8 kHz, 8-bit) with correct little-endian chunk
    * sizes, then the text bytes as samples. The header is assembled
    * from column arithmetic (`hex`/`unhex` for the LE fields) — the
    * decoder on the other side walks the chunk table for real. */
  def packAsWav(df: DataFrame, textCol: String): DataFrame = {
    val data = encode(col(textCol), "UTF-8")
    val n = octet_length(data)
    val header = concat(
      encode(lit("RIFF"), "UTF-8"), le(n + 36, 4),
      encode(lit("WAVE"), "UTF-8"),
      encode(lit("fmt "), "UTF-8"), le(lit(16), 4),
      le(lit(1), 2), le(lit(1), 2),          // PCM, mono
      le(lit(8000), 4), le(lit(8000), 4),    // sample rate, byte rate
      le(lit(1), 2), le(lit(8), 2),          // block align, bits/sample
      encode(lit("data"), "UTF-8"), le(n, 4))
    df.withColumn("payload", concat(header, data))
      .withColumn("meta", struct(
        lit("audio/wav").as("kind"),
        octet_length(concat(header, data)).cast("long").as("nbytes"),
        lit(0).as("width"), lit(0).as("height")))
  }

  /** REAL raw-PGM (P5) decoder: netpbm header parse (whitespace-token
    * scanner with `#`-comment support, magic check, dims + maxval),
    * then the w·h raster bytes. Features over the DECODED samples:
    * [width, height, mean/maxval, fraction of samples in 0x60–0x7f].
    * Throws on malformed input — a corrupt image must fail loudly, not
    * feature-extract garbage. */
  def decodePgm(payload: Array[Byte]): Array[Double] = {
    var i = 0
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (i < payload.length && (payload(i) == ' ' || payload(i) == '\n'
          || payload(i) == '\r' || payload(i) == '\t')) i += 1
        if (i < payload.length && payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else more = false
      }
    }
    def token(): String = {
      skipWs()
      val start = i
      while (i < payload.length && payload(i) > ' ') i += 1
      require(i > start, s"truncated PGM header at byte $start")
      new String(payload, start, i - start, "US-ASCII")
    }
    require(token() == "P5", "not a raw (P5) PGM payload")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0 && maxval > 0 && maxval < 65536,
      s"invalid PGM geometry ${w}x$h maxval=$maxval")
    i += 1 // exactly one whitespace byte separates maxval from raster
    val n = w * h
    require(payload.length >= i + n,
      s"PGM raster truncated: need $n bytes, have ${payload.length - i}")
    var sum = 0L; var inBand = 0L
    var k = 0
    while (k < n) {
      val b = payload(i + k) & 0xFF
      sum += b
      if (b >= 0x60 && b <= 0x7F) inBand += 1
      k += 1
    }
    Array(w.toDouble, h.toDouble,
      sum.toDouble / (n.toDouble * maxval), inBand.toDouble / n)
  }

  /** REAL RIFF/WAVE decoder: verifies the RIFF/WAVE preamble, walks
    * the chunk table by little-endian sizes (skipping unknown chunks,
    * honoring odd-size padding), reads the fmt block, and locates the
    * data chunk. Features over the DECODED samples: [sample count,
    * duration seconds, mean amplitude / 255]. 8-bit mono PCM; other
    * layouts fail loudly. */
  def decodeWav(payload: Array[Byte]): Array[Double] = {
    def le(off: Int, bytes: Int): Long = {
      var v = 0L; var i = 0
      while (i < bytes) { v |= (payload(off + i) & 0xFFL) << (8 * i); i += 1 }
      v
    }
    def tag(off: Int): String = new String(payload, off, 4, "US-ASCII")
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var rate = 0L; var bits = 0L; var channels = 0L
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= payload.length) {
      val id = tag(off); val size = le(off + 4, 4)
      // a corrupt 32-bit size (> 2 GiB) would wrap toInt negative and
      // stall or reverse the walk — reject it before advancing
      require(size >= 0 && size <= payload.length.toLong,
        s"corrupt $id chunk size $size")
      if (id == "fmt ") {
        require(le(off + 8, 2) == 1, "only PCM WAV is supported")
        channels = le(off + 10, 2)
        rate = le(off + 12, 4)
        bits = le(off + 22, 2)
      } else if (id == "data") {
        dataOff = off + 8; dataLen = size
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 8 && channels == 1, s"unsupported layout ${bits}bit x$channels")
    require(dataOff + dataLen <= payload.length, "data chunk truncated")
    val n = dataLen.toInt
    var sum = 0L; var k = 0
    while (k < n) { sum += payload(dataOff + k) & 0xFF; k += 1 }
    Array(n.toDouble, n.toDouble / rate,
      if (n == 0) 0.0 else sum.toDouble / (n.toDouble * 255.0))
  }

  /** Partition-local feature extraction over binary payloads: the
    * mapPartitions shape lets a real decoder amortize codec init per
    * partition (the expensive part at scale) — narrow, no shuffle, no
    * driver collection. `decode` is any bytes→features codec
    * ([[decodePgm]], [[decodeWav]], or a compressed-format decoder on
    * a cluster with native libs). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      decode: Array[Byte] => Array[Double] = decodePgm): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        // per-partition: decoder init once, stream elements
        rows.map { r =>
          Row(r.getLong(0), decode(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Deterministic frame sampler for video-shaped payloads: the payload
    * is treated as a sequence of `frameBytes`-sized frames and every
    * `stride`-th frame becomes its own row (doc, frame index, frame
    * bytes). Byte-slicing stands in for a real demuxer; the
    * one-row→many-frames explode dataflow is the production shape —
    * narrow, no shuffle, frame rows feed the same [[extractFeatures]]
    * path as whole payloads. */
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

    // image features through the REAL PGM decoder: the oracle rebuilds
    // every feature from first principles — width/height from the
    // packing geometry, mean from a per-byte ascii sum (pad bytes are
    // 0x20), band fraction from a byte-class regexp — so a parse that
    // misread the header, the raster offset, or any sample byte
    // hash-mismatches. Byte-safe: fixtures are pure ASCII (verified
    // octet_length == length at every SF), so chars == bytes.
    "q28_features" -> Q(
      "WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb " +
      "FROM documents), " +
      "s AS (SELECT doc_id, SUM(ascii(substring(text, i, 1))) AS bytesum " +
      "FROM d, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) " +
      "GROUP BY doc_id), " +
      "j AS (SELECT d.doc_id, d.text, d.nb, " +
      "GREATEST(1, CAST(CEIL(d.nb/16.0) AS INT)) AS h, " +
      "COALESCE(s.bytesum, 0) AS bytesum FROM d LEFT JOIN s USING (doc_id)) " +
      "SELECT doc_id AS id, CAST(16 AS DOUBLE) AS w, CAST(h AS DOUBLE) AS h, " +
      "ROUND((bytesum + 32*(16*h - nb)) / (16.0*h*255.0), 4) AS f_mean, " +
      "ROUND((length(text) - length(regexp_replace(text, '[\\x60-\\x7f]', '', 'g'))) " +
      "/ (16.0*h), 4) AS f_band FROM j ORDER BY id") {
      (s, dir) =>
        val packed = packAsImage(Engine.table(s, dir, "documents"), "text")
        extractFeatures(packed, "doc_id", "payload", decodePgm)
          .select(col("id"),
            element_at(col("features"), 1).as("w"),
            element_at(col("features"), 2).as("h"),
            round(element_at(col("features"), 3), 4).as("f_mean"),
            round(element_at(col("features"), 4), 4).as("f_band"))
          .orderBy("id")
    },

    // audio features through the REAL WAV decoder: the oracle knows the
    // packing layout (8-bit mono 8kHz → n samples = n text bytes,
    // duration n/8000) and recomputes mean amplitude per byte — a
    // chunk walk that misplaced the data offset or misread an LE size
    // hash-mismatches
    "q28_audio" -> Q(
      "WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb " +
      "FROM documents), " +
      "s AS (SELECT doc_id, SUM(ascii(substring(text, i, 1))) AS bytesum " +
      "FROM d, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) " +
      "GROUP BY doc_id) " +
      // secs/amp stay UNROUNDED: both engines compute the identical
      // IEEE division (n/8000, sum/(n*255)), so the doubles are
      // bit-equal — while ROUND(x, 4) straddles HALF_UP-vs-binary ties
      // (346/8000 = .04325 rounds differently in the JVM and DuckDB)
      "SELECT d.doc_id AS id, CAST(d.nb AS DOUBLE) AS n_samples, " +
      "d.nb/8000.0 AS secs, " +
      "COALESCE(s.bytesum, 0) / (GREATEST(d.nb, 1)*255.0) AS amp " +
      "FROM d LEFT JOIN s USING (doc_id) ORDER BY id") {
      (s, dir) =>
        val packed = packAsWav(Engine.table(s, dir, "documents"), "text")
        extractFeatures(packed, "doc_id", "payload", decodeWav)
          .select(col("id"),
            element_at(col("features"), 1).as("n_samples"),
            element_at(col("features"), 2).as("secs"),
            element_at(col("features"), 3).as("amp"))
          .orderBy("id")
    },

    // frame sampling over the PGM payload (header + raster): byte-sliced
    // frames are digest-compared against DuckDB reconstructing the same
    // container and slicing identically. DuckDB 1.0 has no BLOB
    // substring, so the oracle slices the VARCHAR — equivalent
    // byte-for-byte because the documents fixture is pure ASCII
    // (verified octet_length == length at every SF); Spark still
    // slices the BINARY payload
    "q28_frame_sample" -> Q(
      "WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb " +
      "FROM documents), " +
      "p AS (SELECT doc_id, 'P5' || chr(10) || '16 ' || " +
      "CAST(GREATEST(1, CAST(CEIL(nb/16.0) AS INT)) AS VARCHAR) || chr(10) || " +
      "'255' || chr(10) || " +
      "rpad(text, CAST(16*GREATEST(1, CAST(CEIL(nb/16.0) AS INT)) AS INT), ' ') " +
      "AS payload FROM d), " +
      "m AS (SELECT doc_id, payload, " +
      "CAST(CEIL(octet_length(encode(payload))/256.0) AS INT) AS nf FROM p), " +
      "f AS (SELECT doc_id, payload, unnest(generate_series(0, " +
      "GREATEST(nf-1, 0), 4)) AS fidx FROM m) " +
      "SELECT doc_id, fidx, md5(substring(payload, fidx*256+1, 256)) AS digest " +
      "FROM f ORDER BY doc_id, fidx") {
      (s, dir) =>
        val packed = packAsImage(Engine.table(s, dir, "documents"), "text")
        sampleFrames(packed, "doc_id", "payload")
          .select(col("doc_id"), col("fidx"), md5(col("frame")).as("digest"))
          .orderBy("doc_id", "fidx")
    }
  )
}
