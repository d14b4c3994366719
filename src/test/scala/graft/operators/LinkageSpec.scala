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
