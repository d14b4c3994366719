package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("user_id", "event_type")

  test("privateGroupCounts: distinct-user base, bounded deterministic noise") {
    // user 1 appears 3× in 'view' but contributes 1 to its count
    val events = ev((1L, "view"), (1L, "view"), (1L, "view"), (2L, "view"),
      (1L, "buy"), (3L, "buy"))
    val got = Privacy.privateGroupCounts(events, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact distinct counts are 2 ('view') and 2 ('buy'); Laplace(1) noise
    // from the 1e-4-grid uniform is bounded by ln(10000) ≈ 9.21
    assert(math.abs(got("view") - 2.0) <= 9.22)
    assert(math.abs(got("buy") - 2.0) <= 9.22)
    // reproducible: same seed -> identical release
    val again = Privacy.privateGroupCounts(events, eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == again)
    // a rotated seed re-draws the noise (different release epoch)
    val rotated = Privacy.privateGroupCounts(events, eps = 1.0, seed = "dp-release-1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rotated != got)
  }

  test("privateGroupCounts: tighter epsilon means proportionally smaller noise") {
    val events = ev((1L, "view"), (2L, "view"))
    def noise(eps: Double): Double =
      Privacy.privateGroupCounts(events, eps = eps)
        .collect()(0).getDouble(1) - 2.0
    // same uniform draw, scale 1/eps: noise(0.5) = 2 × noise(1) (± the 4dp
    // rounding of each release)
    assert(math.abs(noise(0.5) - 2 * noise(1.0)) < 2e-4,
      s"${noise(0.5)} vs ${noise(1.0)}")
  }
}
