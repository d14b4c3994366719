package graft.operators

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val parts = Seq(
    // block X: "widget" cluster with one-char typos, plus a far name
    (1L, "X", "red widget"),
    (2L, "X", "red widget"),   // exact dup: dist 0
    (3L, "X", "red widgit"),   // dist 1
    (4L, "X", "blue gizmo"),   // far from all
    // block Y: a near-dup of block X's name must NOT match across blocks
    (5L, "Y", "red widget"),
    (6L, "Y", "red midget"))   // dist 1 within Y
    .toDF("key", "block", "name")

  test("blockedFuzzyMatch: pairs once, within blocks, within the threshold") {
    val got = Linkage.blockedFuzzyMatch(parts, "block", "key", "name", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    // X: (1,2) d0, (1,3) d1, (2,3) d1; Y: (5,6) d1 — and NOT (1,5) etc.
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L), (5L, 6L, 1L)))
  }

  test("blockedFuzzyMatchStar: identical-name hot block emits linear output, same components") {
    // the sfx10 sweep's 15x shape: one block where 200 records share a
    // name verbatim, plus a 1-char variant group of 3, plus an unrelated name
    val hot = ((1L to 200L).map(k => (k, "B", "john smith")) ++
      Seq((301L, "B", "john smyth"), (302L, "B", "john smyth"), (303L, "B", "john smyth"),
          (400L, "B", "zzz unrelated")))
      .toDF("key", "block", "name")
    val star = Linkage.blockedFuzzyMatchStar(hot, "block", "key", "name", 2).collect()
    // LINEAR in block population: 199 star rows for the hot group, 2 for
    // the variant group, 1 representative link — vs the clique form's
    // C(200,2) + C(3,2) + 200*3 = 20503
    assert(star.length == 199 + 2 + 1, s"got ${star.length}")
    val pairs = star.map(r => (r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    // hot-group star: rep 1 to every other member, distance 0
    assert((2L to 200L).forall(k => pairs.contains((1L, k, 0L))))
    // variant-group star + the single representative fuzzy link at dist 1
    assert(pairs.contains((301L, 302L, 0L)) && pairs.contains((301L, 303L, 0L)))
    assert(pairs.contains((1L, 301L, 1L)))
    // the unrelated name joins nothing
    assert(!pairs.exists(p => p._1 == 400L || p._2 == 400L))
    // connected components match the clique form's partition exactly:
    // {1..200, 301..303} in one component, 400 isolated
    val clique = Linkage.blockedFuzzyMatch(hot, "block", "key", "name", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      parent.keys.map(k => k -> find(k)).toMap
    }
    def partition(m: Map[Long, Long]): Set[Set[Long]] =
      m.keySet.groupBy(m).values.map(_.toSet).toSet
    assert(partition(components(pairs.map(p => (p._1, p._2)))) ==
      partition(components(clique)),
      "star and clique forms must induce the same partition")
  }

  test("blockedFuzzyMatch: the length prefilter cannot drop a true match") {
    // names whose length gap equals the threshold still compare
    val df = Seq((1L, "Z", "abcd"), (2L, "Z", "abcdef")).toDF("key", "block", "name")
    val got = Linkage.blockedFuzzyMatch(df, "block", "key", "name", 2).collect()
    assert(got.length == 1 && got(0).getLong(5) == 2L)
    // one past the threshold: pruned (by the prefilter AND the kernel)
    val far = Seq((1L, "Z", "abcd"), (2L, "Z", "abcdefg")).toDF("key", "block", "name")
    assert(Linkage.blockedFuzzyMatch(far, "block", "key", "name", 2).isEmpty)
  }
}
