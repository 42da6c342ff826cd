package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract/frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[ByteHistogramExtractor]],
  * [[FixedSizeFrameSampler]]) — but everything Spark-side is real and
  * tested: the schema, the binary column handling, the per-partition batch
  * iteration (the Scala analogue of `mapInPandas`: one decoder instance per
  * partition, streaming iterator in/out, no per-row setup), and the
  * downstream columnar metadata path.
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

  /** STUB DECODER — deterministic fake standing in for a real image/audio
    * model (none available in this container). Produces an L1-normalized
    * 16-bin byte histogram; stable across runs and engines, so tests can
    * assert exact values. Swap for a real ONNX/JNI decoder in production —
    * the plumbing ([[extractFeatures]]) is unchanged.
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

  /** Frame sampler contract: bytes → iterator of frame payloads. */
  trait FrameSampler extends Serializable {
    def frames(payload: Array[Byte]): Iterator[Array[Byte]]
  }

  /** STUB SAMPLER — fake "video" decode: fixed-size byte windows with an
    * every-Nth stride. Real frame decoding drops in behind the same trait.
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
}
