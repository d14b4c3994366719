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

  test("media table carries binary payload + typed metadata struct") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, sf0001).limit(1))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
  }
}
