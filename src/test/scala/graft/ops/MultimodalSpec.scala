package graft.ops

import graft.SparkSpec

/** Unit spec for the multimodal plumbing: real schema/batch behavior around
  * the stubbed decoders.
  */
class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    Multimodal.fromDocuments(
      rows.toSeq.map { case (id, b) => (id, new String(b, "ISO-8859-1")) }
        .toDF("doc_id", "text"))
      // round-trip text→bytes loses non-UTF8 magic bytes; rebuild payload
      .drop("payload")
      .join(rows.toSeq.toDF("media_id", "payload"), "media_id")
  }

  test("fromDocuments produces the canonical media schema") {
    import spark.implicits._
    val df = Multimodal.fromDocuments(Seq((1L, "hello")).toDF("doc_id", "text"))
    assert(df.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "meta"))
    // compare field names/types; literal-built structs tighten nullability
    val metaFields = df.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fields
    assert(metaFields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = df.collect().head
    assert(row.getAs[Array[Byte]]("payload") === "hello".getBytes("UTF-8"))
  }

  test("metadata: size, digest, and magic-byte sniffing") {
    val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    val jpeg = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)
    val wav = "RIFF1234WAVE".getBytes("UTF-8")
    val out = Multimodal.metadata(media(
      (1L, png), (2L, jpeg), (3L, wav), (4L, "plain text".getBytes)))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_bytes"), r.getAs[String]("sniffed_format")))).toMap
    assert(out(1L) === ((4, "png")))
    assert(out(2L) === ((3, "jpeg")))
    assert(out(3L) === ((12, "riff-wav")))
    assert(out(4L) === ((10, "unknown")))
  }

  test("byte-histogram stub is deterministic, normalized, and exact") {
    val f = Multimodal.ByteHistogramExtractor.extract(
      Array(0x00, 0x01, 0x10, 0xf0.toByte))
    assert(f.length === 16)
    assert(f(0) === 0.5f)  // 0x00, 0x01 both in bin 0
    assert(f(1) === 0.25f) // 0x10
    assert(f(15) === 0.25f) // 0xf0
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("extractFeatures streams per-partition and keeps ids aligned") {
    val out = Multimodal.extractFeatures(media(
      (7L, Array[Byte](0, 0, 0, 0)), (8L, Array[Byte](-1, -1))))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(out(7L).head === 1.0f)            // all bytes in bin 0
    assert(out(8L)(15) === 1.0f)             // 0xff in bin 15
    assert(out.values.forall(_.size === 16))
  }

  test("frame sampler: fixed windows with stride, sizes preserved") {
    val payload = (0 until 10).map(_.toByte).toArray // 10 bytes
    val out = Multimodal.sampleFrames(
      media((5L, payload)), new Multimodal.FixedSizeFrameSampler(3, 2))
      .collect().sortBy(_.getAs[Int]("frame_idx"))
    // windows: [0..2][3..5][6..8][9] → every 2nd → idx 0 (3B) and idx 1 (6..8, 3B)
    assert(out.length === 2)
    assert(out(0).getAs[Int]("frame_bytes") === 3)
    assert(out(0).getAs[Array[Byte]]("frame_payload") === Array[Byte](0, 1, 2))
    assert(out(1).getAs[Array[Byte]]("frame_payload") === Array[Byte](6, 7, 8))
  }
}
