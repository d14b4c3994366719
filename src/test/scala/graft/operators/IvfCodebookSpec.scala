package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The k-means IVF codebook's VALUE, demonstrated on a fixture that has
  * cluster structure to find (VERDICT r14 item 2). The driver fixture's
  * embeddings are random-uniform, where `Similarity.ivfTopK` honestly
  * defaults `kmeansIters = 0` — k-means cannot improve
  * recall-at-scan-fraction when there are no clusters. The scaladoc's
  * "on a real embedding corpus pass kmeansIters ≥ 3" claim needed
  * in-repo evidence: this spec plants a mixture-of-Gaussians corpus
  * (the planted-twin discipline of d6_production applied to geometry)
  * and measures the trained codebook beating the seed quantizer at the
  * SAME nprobe, at two corpus sizes. Measured numbers are recorded in
  * SCALE.md §R15.
  *
  * Fixture: 16 planted Gaussian clusters in 64-dim. Centers are
  * hash-derived ±1 hypercube corners (near-orthogonal in expectation,
  * like real topic clusters); points are center + N(0, σ)-ish noise
  * from a splitmix64 stream, σ small enough that within-cluster cosine
  * ≫ cross-cluster cosine. Queries are fresh perturbations of planted
  * centers, so each query's true neighbors live in one cluster —
  * exactly the regime IVF exists for. Everything is hash-deterministic:
  * no RNG state, bit-stable across runs and partitionings. */
class IvfCodebookSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private val kClusters = 16

  /** splitmix64 → uniform in [-1, 1). */
  private def u(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Cluster center c: a ±1 corner of the hypercube (hash-chosen signs). */
  private def center(c: Int): Array[Double] =
    Array.tabulate(dim)(j => if (u(c.toLong * 1000003L + j) >= 0) 1.0 else -1.0)

  /** Point i of cluster c: center + noise, noise ~ U(-sigma, sigma) per dim. */
  private def point(c: Int, i: Long, sigma: Double, salt: Long): Array[Float] = {
    val ctr = center(c)
    Array.tabulate(dim)(j =>
      (ctr(j) + sigma * u(salt + i * 131L + j * 2654435761L + c)).toFloat)
  }

  /** Hash-based cluster membership: ids do NOT enumerate clusters, so
    * the seed quantizer (first 16 vectors by id) misses some planted
    * clusters — the realistic regime where an arbitrary-seed codebook
    * costs recall and training recovers it. */
  private def clusterOf(i: Long): Int =
    math.min(kClusters - 1, ((u(i * 7919L + 13L) + 1.0) * kClusters / 2).toInt)

  private def corpusOf(n: Int, sigma: Double): DataFrame =
    (0 until n).map { i =>
      (i.toLong, point(clusterOf(i), i.toLong, sigma, salt = 7L).toSeq)
    }.toDF("vec_id", "embedding")

  private def queriesOf(nq: Int, sigma: Double): DataFrame =
    (0 until nq).map { q =>
      // fresh ids far above the corpus range; a different salt stream
      (1000000L + q, point(q % kClusters, q.toLong, sigma, salt = 99991L).toSeq)
    }.toDF("vec_id", "embedding")

  /** Mean recall@k of `got` against brute-force truth. */
  private def recallAgainst(truth: Map[Long, Set[Long]], got: DataFrame): Double = {
    val byQ = got.select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val per = truth.map { case (q, t) =>
      byQ.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    per.sum / per.size
  }

  /** Fraction of the corpus scored per query (candidate rows / (nq × n)). */
  private def scanFraction(corpus: DataFrame, queries: DataFrame,
                           cents: Seq[(Int, Seq[Float])], nprobe: Int): Double = {
    val listSizes = Similarity.ivfAssign(corpus, cents, keep = 1)
      .groupBy(col("cid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probed = Similarity.ivfAssign(queries, cents, keep = nprobe)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => listSizes.getOrElse(r.getInt(1), 0L)).sum
    probed.toDouble / (queries.count() * corpus.count())
  }

  private def runAt(n: Int): (Double, Double, Double, Double) = {
    val sigma = 0.65
    val corpus = corpusOf(n, sigma).localCheckpoint()
    val queries = queriesOf(32, sigma).localCheckpoint()
    val k = 10
    val nprobe = 2
    val truth = Similarity.bruteForceTopK(corpus, queries, k)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val seed = Similarity.centroidsOf(corpus, kClusters)
    val trained = Similarity.kmeansCentroids(corpus, kClusters, iters = 3)
    val rSeed = recallAgainst(truth,
      Similarity.ivfTopK(corpus, queries, k, kClusters, nprobe, kmeansIters = 0))
    val rTrained = recallAgainst(truth,
      Similarity.ivfTopK(corpus, queries, k, kClusters, nprobe, kmeansIters = 3))
    val fSeed = scanFraction(corpus, queries, seed, nprobe)
    val fTrained = scanFraction(corpus, queries, trained, nprobe)
    (rSeed, rTrained, fSeed, fTrained)
  }

  test("trained codebook beats the seed quantizer on a clustered corpus (2 sizes)") {
    for (n <- Seq(2000, 8000)) {
      val (rSeed, rTrained, fSeed, fTrained) = runAt(n)
      info(f"n=$n%d nprobe=2/16: recall@10 seed=$rSeed%.3f trained=$rTrained%.3f " +
        f"scanned seed=${fSeed * 100}%.1f%% trained=${fTrained * 100}%.1f%%")
      // the trained codebook must recover the planted structure…
      assert(rTrained >= 0.95,
        f"trained recall $rTrained%.3f below 0.95 at n=$n")
      // …and clearly beat the arbitrary-seed quantizer at the same nprobe
      assert(rTrained >= rSeed + 0.1,
        f"k-means did not help on the clustered fixture: seed=$rSeed%.3f trained=$rTrained%.3f at n=$n")
      // at equal nprobe the trained quantizer must not buy recall by
      // secretly scanning much more of the corpus
      assert(fTrained <= fSeed + 0.10,
        f"trained codebook scans more: $fTrained%.3f vs $fSeed%.3f at n=$n")
    }
  }

  test("on the clustered corpus the trained quantizer recovers the planted partition") {
    val corpus = corpusOf(2000, 0.65).localCheckpoint()
    val trained = Similarity.kmeansCentroids(corpus, kClusters, iters = 3)
    // purity: each trained list should be dominated by one planted cluster
    val assign = Similarity.ivfAssign(corpus, trained, keep = 1)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (clusterOf(r.getLong(0)), r.getInt(1)))
    val purity = assign.groupBy(_._2).map { case (_, rows) =>
      rows.groupBy(_._1).values.map(_.size).max.toDouble / rows.size
    }
    val meanPurity = purity.sum / purity.size
    info(f"mean list purity = $meanPurity%.3f over ${purity.size} lists")
    // measured 0.852 at σ=0.65 (3 Lloyd iters from a cluster-missing
    // seed leave a couple of lists merged/split — the recall table is
    // the operative evidence; this pin guards the alignment direction)
    assert(meanPurity >= 0.8, f"trained lists not aligned with planted clusters: $meanPurity%.3f")
  }
}
