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

  test("decode parity holds for multibyte-leading and empty payloads") {
    import spark.implicits._
    // '中'-leading (3-byte UTF-8 head), 'é'-leading (2-byte), ascii, empty —
    // the typed decode and the SQL twin must agree on ALL of them, which
    // pins both to the same first-CODEPOINT basis (a byte-based stub would
    // produce a different width for the first two).
    val docs = Seq(
      (1L, "中文 document text", "synthetic", "zh", 16L),
      (2L, "état des lieux", "synthetic", "fr", 14L),
      (3L, "plain ascii text", "synthetic", "en", 16L),
      (4L, "", "synthetic", "und", 0L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val media = Multimodal.asMediaTable(docs)
    val viaDs = Multimodal.decode(spark, media).toDF()
      .select("doc_id", "byte_len", "header", "width", "height")
    val viaSql = Multimodal.decodeSql(media)
      .select("doc_id", "byte_len", "header", "width", "height")
    assertSameRows(viaDs, viaSql)
    // and the zh row really exercises the multibyte path: codepoint of 中
    // is 20013 → width 1 + 20013 % 64 = 46 (first-byte 0xE4 would give 37)
    val zh = Multimodal.decode(spark, media).filter(_.doc_id == 1L).head()
    assert(zh.width == 1 + 20013 % 64)
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
