package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract/frame-sample stages.
  *
  * IMAGE DECODE IS REAL: the JDK ships PNG/JPEG codecs
  * (`javax.imageio.ImageIO`), so [[ImageCodec]] decodes actual image bytes
  * to pixels, [[decodeImageStats]] and [[ImageLumaExtractor]] compute
  * features over REAL decoded pixels, and [[syntheticPngMedia]] encodes a
  * deterministic pixel formula to genuine PNG payloads (lossless, so every
  * downstream stat is oracle-checkable by re-deriving from the formula).
  * Only stages whose codec the JDK lacks remain declared stubs: video
  * frame extraction ([[FixedSizeFrameSampler]]) and audio. The
  * [[ByteHistogramExtractor]] survives as the no-codec FALLBACK for
  * payloads `ImageIO` cannot parse.
  *
  * Everything Spark-side is real and tested: the schema, the binary column
  * handling, the per-partition batch iteration (the Scala analogue of
  * `mapInPandas`: one decoder instance per partition, streaming iterator
  * in/out, no per-row setup), and the downstream columnar metadata path.
  *
  * Scale notes: payload bytes travel only through the narrow decode stage —
  * metadata extraction ([[metadata]]) is pure codegen'd projection, feature
  * vectors are small (`dim` floats), and nothing shuffles except what the
  * caller aggregates afterwards. Partition sizing is the real lever at
  * 100 TB: keep `spark.sql.files.maxPartitionBytes` such that a partition
  * of blobs fits the decoder's memory, exactly as with Parquet row groups.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. Width/height for images,
    * sampleRate/durationMs for audio — absent fields stay null.
    */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width_px", IntegerType),
    StructField("height_px", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Build a media frame from the documents fixture: UTF-8 bytes as the
    * opaque payload (the container ships no real image/audio fixtures; the
    * plumbing does not care what the bytes mean). NULL text follows the
    * engine-wide "NULL ≡ empty document" contract: the payload coalesces to
    * zero bytes so the imperative decode stages never see a null array.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").alias("media_id"),
      lit("text-blob").alias("kind"),
      coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte])).alias("payload"),
      struct(
        lit("utf8").alias("format"),
        lit(null).cast(IntegerType).alias("width_px"),
        lit(null).cast(IntegerType).alias("height_px"),
        lit(null).cast(IntegerType).alias("sample_rate"),
        lit(null).cast(LongType).alias("duration_ms")).alias("meta"))

  /** Payload metadata without decoding: size, content digest, and a
    * magic-byte format sniff — pure projection over the binary column.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("payload")).alias("n_bytes"),
      sha2(col("payload"), 256).alias("payload_sha256"),
      when(col("payload").startsWith(lit(Array(0x89.toByte, 'P'.toByte))), "png")
        .when(col("payload").startsWith(lit(Array(0xff.toByte, 0xd8.toByte))), "jpeg")
        .when(col("payload").startsWith(lit("RIFF".getBytes)), "riff-wav")
        .otherwise("unknown").alias("sniffed_format"))

  /** Decoder contract: bytes → fixed-dim feature vector. One instance is
    * reused for a whole partition (open models/codecs once).
    */
  trait FeatureExtractor extends Serializable {
    def dim: Int
    def extract(payload: Array[Byte]): Array[Float]
  }

  /** Real image codec over the JDK's built-in readers (PNG, JPEG, GIF,
    * BMP). One `decode` call parses the container, inflates, and unpacks
    * to packed-ARGB ints — everything downstream is plain arithmetic.
    * Disk caching is off: `ImageIO` otherwise spills every read through a
    * temp file, a per-row syscall tax with zero benefit for in-memory
    * byte-array payloads.
    */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** Bytes → (width, height, packed ARGB row-major pixels), or None if
      * the payload is not an image the JDK can parse (`ImageIO.read`
      * returns null rather than throwing on unknown containers).
      */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
      if (payload == null || payload.isEmpty) None
      else Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        (w, h, img.getRGB(0, 0, w, h, null, 0, w))
      }

    /** Deterministic synthetic image: every channel of pixel (x,y) is a
      * pure modular formula of (mediaId, x, y), and the dimensions vary
      * with the id (8..16 px a side) so decoders cannot hardcode a shape.
      * Encoded as REAL PNG bytes via the JDK encoder; PNG is lossless, so
      * `decode(encode(id))` returns exactly these values — which is what
      * makes every decoded-pixel statistic DuckDB-checkable from the
      * formula alone, without the oracle ever seeing the bytes.
      */
    def syntheticPng(mediaId: Long): Array[Byte] = {
      val w = (8 + mediaId % 9).toInt
      val h = (8 + (mediaId / 9) % 9).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((mediaId * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((mediaId * 17 + x * 11 + y * 5) % 256).toInt
          val b = ((mediaId * 23 + x * 3 + y * 19) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** NO-CODEC FALLBACK (formerly the stand-in decoder) — used when
    * `ImageIO` cannot parse a payload. Produces an L1-normalized 16-bin
    * byte histogram; stable across runs and engines, so tests can assert
    * exact values.
    */
  object ByteHistogramExtractor extends FeatureExtractor {
    val dim = 16
    def extract(payload: Array[Byte]): Array[Float] = {
      val counts = new Array[Float](dim)
      payload.foreach { b => counts((b & 0xff) >> 4) += 1f }
      val total = math.max(payload.length, 1).toFloat
      counts.map(_ / total)
    }
  }

  /** REAL image feature extractor: decodes the payload with the JDK codec
    * and histograms the integer luminance `(r+g+b)/3` of every decoded
    * pixel into 16 bins (L1-normalized, float32 division — the float
    * arithmetic DuckDB's REAL reproduces bit-for-bit). Non-image payloads
    * fall back to [[ByteHistogramExtractor]], so one extractor serves a
    * mixed-modality column without a pre-filter pass.
    */
  object ImageLumaExtractor extends FeatureExtractor {
    val dim = 16
    def extract(payload: Array[Byte]): Array[Float] =
      ImageCodec.decode(payload) match {
        case Some((_, _, px)) =>
          val counts = new Array[Float](dim)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            val luma = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            counts(luma >> 4) += 1f
            i += 1
          }
          val total = math.max(px.length, 1).toFloat
          counts.map(_ / total)
        case None => ByteHistogramExtractor.extract(payload)
      }
  }

  /** The real decode stage: per-partition `ImageIO` decode (same deliberate
    * `mapPartitions` altitude as [[extractFeatures]] — a codec is not an
    * expression) emitting EXACT integer statistics of the decoded pixels:
    * dimensions, pixel count, and per-channel sums as longs. Integer sums
    * make the stage bit-checkable: no float accumulation order to worry
    * about, and the oracle re-derives the same longs from the synthetic
    * pixel formula. Undecodable payloads yield `decoded = false` zero rows
    * rather than errors — at 100 TB some blobs WILL be corrupt, and a
    * decode stage that throws on the first one is useless.
    *
    * Scale shape: payload bytes enter and die inside the stage; only the
    * 8-column stat row leaves, so nothing wide ever shuffles.
    */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          ImageCodec.decode(payload) match {
            case Some((w, h, px)) =>
              var r = 0L; var g = 0L; var b = 0L
              var i = 0
              while (i < px.length) {
                val p = px(i)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                i += 1
              }
              (id, true, w, h, w.toLong * h, r, g, b)
            case None => (id, false, 0, 0, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF("media_id", "decoded", "width_px", "height_px", "n_px",
        "r_sum", "g_sum", "b_sum")
  }

  /** PNG header dimensions WITHOUT decoding — a pure codegen'd projection
    * over the binary column (IHDR width/height are big-endian u32 at byte
    * offsets 16/20). This is the metadata-sniff altitude for the common
    * "partition by resolution before decoding anything" pass: at 100 TB
    * you want dims for every blob but pixels for none of them.
    */
  def pngHeaderDims(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      conv(hex(substring(col("payload"), 17, 4)), 16, 10)
        .cast(IntegerType).alias("width_px"),
      conv(hex(substring(col("payload"), 21, 4)), 16, 10)
        .cast(IntegerType).alias("height_px"))

  /** Synthetic PNG media frame: one REAL PNG payload per document id,
    * encoded per partition (encoder state reused, bytes never shuffled).
    * The pixel content is the [[ImageCodec.syntheticPng]] formula, so
    * every downstream decoded-pixel statistic has a closed-form oracle.
    */
  def syntheticPngMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val payload = ImageCodec.syntheticPng(id)
          val w = (8 + id % 9).toInt
          val h = (8 + (id / 9) % 9).toInt
          (id, "image", payload, ("png", w, h))
        }
      }
      .toDF("media_id", "kind", "payload", "m")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(
          col("m._1").alias("format"),
          col("m._2").alias("width_px"),
          col("m._3").alias("height_px"),
          lit(null).cast(IntegerType).alias("sample_rate"),
          lit(null).cast(LongType).alias("duration_ms")).alias("meta"))
  }

  /** Frame sampler contract: bytes → iterator of frame payloads. */
  trait FrameSampler extends Serializable {
    def frames(payload: Array[Byte]): Iterator[Array[Byte]]
  }

  /** STUB SAMPLER — fake "video" decode: fixed-size byte windows with an
    * every-Nth stride. The JDK ships no video codec (unlike images, where
    * [[ImageCodec]] is real), so this remains the one declared stand-in;
    * real frame decoding drops in behind the same trait.
    */
  final class FixedSizeFrameSampler(frameBytes: Int, everyN: Int)
      extends FrameSampler {
    def frames(payload: Array[Byte]): Iterator[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyN == 0 => f }
  }

  /** The batch-decode stage: per-partition imperative iteration (the
    * deliberate `mapPartitions` in this engine — a codec is not an
    * expression). The extractor is instantiated once per partition;
    * rows stream through without materializing the partition.
    */
  def extractFeatures(
      media: DataFrame,
      extractor: FeatureExtractor = ByteHistogramExtractor): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
    typed.mapPartitions { rows =>
      rows.map { case (id, payload) => (id, extractor.extract(payload)) }
    }.toDF("media_id", "features")
  }

  /** The frame-sampling stage: one input row fans out to its sampled
    * frames, each re-wrapped as an opaque payload row.
    */
  def sampleFrames(
      media: DataFrame,
      sampler: FrameSampler): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          sampler.frames(payload).zipWithIndex.map { case (f, i) =>
            (id, i, f, f.length)
          }
        }
      }.toDF("media_id", "frame_idx", "frame_payload", "frame_bytes")
  }

  /** Stand-in pipeline for the oracle harness: documents → payloads →
    * metadata. (Feature/frame stages have no SQL twin — their decode is
    * imperative — so they are covered by unit tests and a rows-only query.)
    */
  def documentMedia(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Real-PNG media for the oracle harness: one deterministic PNG per
    * document id (see [[syntheticPngMedia]]).
    */
  def pngMedia(spark: SparkSession, sfDir: String): DataFrame =
    syntheticPngMedia(spark.read.parquet(s"$sfDir/documents.parquet"))
}
