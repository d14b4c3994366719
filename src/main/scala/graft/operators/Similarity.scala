package graft.operators

import graft.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, dim 64).
  *
  *   - [[bruteForceTopK]] — the exactness baseline: broadcast the (small)
  *     query set against the full corpus, score with the codegen'd
  *     [[graft.functions.CosineSimilarity]] expression, per-query top-k via a
  *     window. The corpus side streams — linear scan, no shuffle of the
  *     corpus, so it scales to any corpus size (cost is queries × corpus).
  *   - [[annTopK]] — the scale path: random-hyperplane LSH signatures bucket
  *     the corpus; queries probe their own bucket plus all hamming-1
  *     neighbors, and only those candidates are scored. Corpus-side work
  *     becomes queries × bucket-size instead of queries × corpus.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes: weight(p, d) derived from
    * xxhash64 — reproducible across runs/cluster sizes with no RNG state. */
  private def planeDot(emb: org.apache.spark.sql.Column, p: Int, dim: Int) =
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0d),
      (acc, d) => acc + element_at(emb, d + 1) *
        (pmod(xxhash64(lit(p), d), lit(10000)).cast("double") / 10000.0 - 0.5))

  /** Sign-random-projection signature: `planes`-bit int per vector. */
  def withLshSignature(embeddings: DataFrame, planes: Int = 6, dim: Int = 64): DataFrame = {
    val bits = (0 until planes).map { p =>
      when(planeDot(col("embedding"), p, dim) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    embeddings.withColumn("lsh_sig", bits)
  }

  /** Exact top-k neighbors for each query vector (query set must be small —
    * it is broadcast). Output: q_id, n_id, cosine, rank. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val c = embeddings.select(col("vec_id").as("n_id"), col("embedding").as("ne"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        portableRound(cosine_similarity(col("qe"), col("ne")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Candidate pairs from LSH buckets with hamming-≤1 multiprobe: each
    * vector emits its signature plus all 1-bit flips; pairs meeting in any
    * probe bucket become candidates. Used as the pair source for near-dup
    * and ANN at scale. */
  def annCandidates(embeddings: DataFrame, planes: Int = 6, dim: Int = 64): DataFrame = {
    val sigs = withLshSignature(embeddings, planes, dim)
      .select(col("vec_id"), col("embedding"), col("lsh_sig"))
    val probes = sigs.select(col("vec_id"), col("embedding"),
      explode(array((lit(-1) +: (0 until planes).map(lit(_))): _*)).as("flip"),
      col("lsh_sig"))
      .select(col("vec_id"), col("embedding"),
        when(col("flip") === -1, col("lsh_sig"))
          .otherwise(col("lsh_sig").bitwiseXOR(pow(lit(2.0), col("flip")).cast("int")))
          .as("probe_sig"))
    val a = probes.alias("a")
    val b = probes.alias("b")
    a.join(b, col("a.probe_sig") === col("b.probe_sig") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("a.embedding").as("ea"),
        col("b.vec_id").as("b_id"), col("b.embedding").as("eb"))
      .distinct()
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` centroids
    * partitions the corpus; each query probes its `nprobe` nearest
    * centroids and scores only those lists. The centroid set is tiny
    * metadata (collected once, shipped as a literal — the same role a
    * k-means codebook plays in a production IVF index; the fixture
    * quantizer takes the first `nlist` vectors as centroids).
    *
    * Scale shape: corpus assignment is one linear scan + shuffle on
    * cluster id; a query then touches nprobe/nlist of the corpus. */
  def ivfAssign(embeddings: DataFrame, centroids: Seq[(Int, Seq[Float])],
                keep: Int): DataFrame = {
    val cents = typedlit(centroids)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    embeddings.select(col("vec_id"), col("embedding"), explode(cents).as("c"))
      .select(col("vec_id"), col("embedding"), col("c._1").as("cid"),
        portableRound(cosine_similarity(col("embedding"), col("c._2")), 6).as("csim"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** Deterministic fixture quantizer: the nlist lowest-id vectors. */
  def centroidsOf(embeddings: DataFrame, nlist: Int): Seq[(Int, Seq[Float])] =
    embeddings.orderBy(col("vec_id")).limit(nlist)
      .select(col("embedding")).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0) }.toIndexedSeq

  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = centroidsOf(embeddings, nlist)
    val corpus = ivfAssign(embeddings, centroids, keep = 1)
      .select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("cid"))
    val probes = ivfAssign(queries, centroids, keep = nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("cid"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    corpus.join(broadcast(probes),
        corpus("cid") === probes("cid") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        portableRound(cosine_similarity(col("qe"), col("ne")), 4).as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN top-k: score only LSH candidates, then per-query top-k. */
  def annTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 6, dim: Int = 64): DataFrame = {
    val sigs = withLshSignature(embeddings, planes, dim)
    val qsigs = withLshSignature(queries, planes, dim)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("lsh_sig").as("q_sig"))
    // query probes its own bucket + hamming-1 buckets
    val probes = qsigs.select(col("q_id"), col("qe"),
      explode(array((lit(-1) +: (0 until planes).map(lit(_))): _*)).as("flip"), col("q_sig"))
      .select(col("q_id"), col("qe"),
        when(col("flip") === -1, col("q_sig"))
          .otherwise(col("q_sig").bitwiseXOR(pow(lit(2.0), col("flip")).cast("int")))
          .as("probe_sig"))
    val cands = sigs.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
        col("lsh_sig"))
      .join(broadcast(probes), col("lsh_sig") === col("probe_sig") &&
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("qe"), col("ne"))
      .distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    cands.select(col("q_id"), col("n_id"),
        portableRound(cosine_similarity(col("qe"), col("ne")), 4).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
