package graft.operators

import graft.{SparkTestBase, Tables}

class MultimodalSpec extends SparkTestBase {

  test("mapPartitions decode and SQL twin produce identical features") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf0001).limit(50))
    val viaDs = Multimodal.decode(spark, media).toDF()
    val viaSql = Multimodal.decodeSql(media)
      .select("doc_id", "byte_len", "header", "width", "height")
    assertSameRows(viaDs.select("doc_id", "byte_len", "header", "width", "height"), viaSql)
  }

  test("resize stub caps payload bytes, keeps rows 1:1") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf0001).limit(20))
    val resized = Multimodal.resize(spark, media, maxBytes = 64).collect()
    assert(resized.length == 20)
    assert(resized.forall(r => r.payload.length <= 64 && r.byte_len == r.payload.length))
  }

  test("frame-sample stub explodes payloads into every-k-th typed frame") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf0001).limit(5))
    val frames = Multimodal.frameSample(spark, media, frameBytes = 32, everyK = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.forall(f => f.byte_len <= 32 && f.payload.length == f.byte_len))
    // row multiplication: more frames than source docs
    assert(frames.length > 5)
  }

  test("media table carries binary payload + typed metadata struct") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf0001).limit(1))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }
}
