package graft.operators

import graft.SparkSpec

/** MediaCodec stub semantics + the mapPartitions feature pipeline. */
class MultimodalSpec extends SparkSpec {

  test("codec features on known bytes") {
    val f = Multimodal.MediaCodec.extractFeatures(
      Array[Byte](0, 10, 10, 100))
    assert(f(0) == 4.0)   // n_bytes
    assert(f(1) == 30.0)  // mean
    assert(f(2) == 100.0) // max
    assert(f(3) == 3.0)   // distinct
    assert(Multimodal.MediaCodec.extractFeatures(Array.empty).toSeq
      == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("resize maps to fixed length, nearest-neighbor") {
    val in = (0 until 100).map(_.toByte).toArray
    val out = Multimodal.MediaCodec.resize(in, 10)
    assert(out.length == 10)
    assert(out.toSeq == Seq(0, 10, 20, 30, 40, 50, 60, 70, 80, 90)
      .map(_.toByte))
    assert(Multimodal.MediaCodec.resize(Array.empty, 4).toSeq
      == Seq(0, 0, 0, 0).map(_.toByte))
    // upscaling also lands on a fixed grid
    assert(Multimodal.MediaCodec.resize(Array[Byte](1, 2), 4).toSeq
      == Seq[Byte](1, 1, 2, 2))
  }

  test("frame sampling takes every k-th byte") {
    val frames = Multimodal.MediaCodec.sampleFrames(
      (0 until 100).map(_.toByte).toArray, stride = 16)
    assert(frames.toSeq == Seq(0, 16, 32, 48, 64, 80, 96).map(_.toByte))
  }

  test("multimodal_features pipeline: one row per doc, sane features") {
    val rows = Multimodal.queries("multimodal_features")(
      spark, SparkSpec.sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val nBytes = r.getInt(1)
      assert(nBytes > 0)
      val byteSum = r.getLong(2)
      // integer fixed-point mean: exact floor division, no rounding
      assert(r.getLong(3) == byteSum * 10000L / nBytes)
      assert(r.getLong(3) > 0 && r.getLong(3) < 256L * 10000)
      assert(r.getInt(6) == (nBytes + 15) / 16)          // frame count
    }
  }

  test("MediaCodec.resize: identity at same length, zeros on empty") {
    val bytes = Array[Byte](10, 20, 30, 40, 50)
    assert(Multimodal.MediaCodec.resize(bytes, 5).toSeq == bytes.toSeq,
      "same-length resize must be the identity")
    assert(Multimodal.MediaCodec.resize(Array.empty[Byte], 8).toSeq ==
      Seq.fill(8)(0.toByte))
    // downsample picks index i*len/outLen: 0,2 for len 5 -> 2
    assert(Multimodal.MediaCodec.resize(bytes, 2).toSeq ==
      Seq[Byte](10, 30))
    // upsample repeats: 10,10,20,20,30,30,40,40,50,50
    assert(Multimodal.MediaCodec.resize(bytes, 10).toSeq ==
      Seq[Byte](10, 10, 20, 20, 30, 30, 40, 40, 50, 50))
  }

  test("media table carries binary payload + typed metadata") {
    val mt = Multimodal.mediaTable(spark, SparkSpec.sf0001)
    val schema = mt.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = mt.orderBy("doc_id").limit(1).collect()(0)
    val payload = r.getAs[Array[Byte]]("payload")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Int]("n_bytes") == payload.length)
  }
}
