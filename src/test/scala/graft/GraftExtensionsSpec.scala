package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkTestBase {

  test("extensions register cosine_similarity/dot_product as SQL functions") {
    spark // force the shared session first so its context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate() // new session over the existing SparkContext
      val r = s2.sql(
        """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                          array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d
          |""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 6.0) < 1e-12)
      // the LSH + shingle kernels are SQL-reachable too, int args folded
      val r2 = s2.sql(
        """SELECT hyperplane_signature(array(CAST(1.0 AS FLOAT)), 6, 1, 0) AS sig,
          |       size(shingle_hashes('a b c d', 3)) AS n_shingles,
          |       rolling_hash('ab') AS rh,
          |       l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS u,
          |       quantize_int8(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))) AS q
          |""".stripMargin).collect()(0)
      assert(r2.getInt(0) >= 0 && r2.getInt(0) < 64)
      assert(r2.getInt(1) == 2)
      assert(r2.getLong(2) == ('a' * 31 + 'b') % 1000000007L)
      assert(r2.getSeq[Double](3) == Seq(0.6, 0.8))
      assert(r2.getSeq[Int](4) == Seq(127, -63)) // floor(-63.5 + 0.5)
      // CMS merge + estimate are SQL-reachable: two per-group sketches
      // merged, the item count read back (5 ones + 3 twos, exact at this ε)
      val r3 = s2.sql(
        """SELECT cms_estimate(cms_merge_agg(sk), 1L) AS n1,
          |       cms_estimate(cms_merge_agg(sk), 2L) AS n2
          |FROM (SELECT g, count_min_sketch(v, CAST(0.001 AS DOUBLE),
          |                                 CAST(0.99 AS DOUBLE), 7) AS sk
          |      FROM VALUES (0, 1L), (0, 1L), (0, 2L), (1, 1L), (1, 1L),
          |                  (1, 1L), (1, 2L), (1, 2L) AS t(g, v)
          |      GROUP BY g)
          |""".stripMargin).collect()(0)
      assert(r3.getLong(0) == 5L && r3.getLong(1) == 3L)
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
