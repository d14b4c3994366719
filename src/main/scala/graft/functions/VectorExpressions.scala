package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Cosine similarity over two `array<float>` embedding columns.
  *
  * A native Catalyst expression (with `doGenCode`) rather than a Scala UDF so
  * it stays inside whole-stage codegen — on a 100 TB similarity sweep the
  * per-row lambda-dispatch cost of a UDF dominates; this compiles to a tight
  * Java loop over the unsafe array data with zero boxing.
  *
  * Accumulation is double, element-order sequential, so results are
  * deterministic across partitionings (needed for the DuckDB oracle compare).
  * Zero-norm vectors yield 0.0 (not NaN) so downstream top-k stays total.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $nx += xi * xi; $ny += yi * yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection LSH signature of an `array<float>` vector:
  * `planes` pseudo-random hyperplanes, one bit each (dot > 0), packed into
  * an int. `table` selects an independent hyperplane family so multi-table
  * LSH unions candidates from several signatures.
  *
  * The hyperplane weights are a pure function of (table, plane, dim) through
  * xxhash64 — identical on every executor, every run, every cluster size —
  * and are PRECOMPUTED once per expression instance into a flat double[].
  * Per row the kernel is planes×dim multiply-adds inside whole-stage
  * codegen; the previous formulation (`aggregate` over a `sequence`, a
  * higher-order function) was CodegenFallback — interpreted per row AND
  * re-deriving every weight through two hash calls per element. Table 0
  * reproduces that formulation's weights exactly
  * (`pmod(xxhash64(p, d), 10000)/10000 - 0.5`), so signatures are unchanged.
  */
case class HyperplaneSignature(child: Expression, planes: Int, dim: Int, table: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_signature"

  /** weights(p*dim + d) — lazily built on first use per JVM, shipped to
    * executors by reference-object serialization. */
  @transient private lazy val weights: Array[Double] =
    HyperplaneSignature.weights(planes, dim, table)

  private def signatureOf(arr: ArrayData): Int = {
    val w = weights
    val n = math.min(dim, arr.numElements())
    var sig = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val base = p * dim
      while (d < n) { dot += arr.getFloat(d).toDouble * w(base + d); d += 1 }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  override def nullSafeEval(v: Any): Any = signatureOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hyperplaneWeights", weights, "double[]")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |int $sig = 0;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  int $base = $p * $dim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double) $a.getFloat($d) * $w[$base + $d];
         |  }
         |  if ($dot > 0) $sig |= (1 << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `tables` hyperplane signatures of a vector in ONE kernel —
  * `array<int>`, element t = [[HyperplaneSignature]](planes, dim, table=t)
  * bit for bit (same weight chain, one concatenated reference array).
  *
  * Why this exists instead of `array(sig_0 … sig_{T-1})`: multi-table LSH
  * at corpus-adaptive sizing wants tens of tables, and an array of T
  * independent expressions inlines T copies of the dot-product loop into
  * one generated method — past JIT method-size limits the projection falls
  * to the interpreter tier, measured 10×+ slower at T=55 on the sfx10
  * fixture while T=16 still JITs. One loop over a (tables × planes × dim)
  * matrix keeps the method small at ANY table count; flops are identical. */
case class HyperplaneSignatures(child: Expression, planes: Int, dim: Int, tables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_signatures"

  @transient private lazy val weights: Array[Double] =
    HyperplaneSignature.weightsAllTables(planes, dim, tables)

  private def signaturesOf(arr: ArrayData): ArrayData = {
    val w = weights
    val n = math.min(dim, arr.numElements())
    val sigs = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        val base = (t * planes + p) * dim
        while (d < n) { dot += arr.getFloat(d).toDouble * w(base + d); d += 1 }
        if (dot > 0) sig |= (1 << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override def nullSafeEval(v: Any): Any = signaturesOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("hyperplaneWeightsAll", weights, "double[]")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val sigs = ctx.freshName("sigs")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |int[] $sigs = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $dot = 0.0;
         |    int $base = ($t * $planes + $p) * $dim;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double) $a.getFloat($d) * $w[$base + $d];
         |    }
         |    if ($dot > 0) $sig |= (1 << $p);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Deterministic weight matrix: plane index is offset by table×planes so
    * each table is an independent family; the (hash of plane, then hash of
    * dim) chain mirrors Spark's `xxhash64(lit(p), d)` two-child evaluation
    * (seed 42), keeping table 0 bit-compatible with the round-1 HOF path. */
  def weights(planes: Int, dim: Int, table: Int): Array[Double] = {
    val w = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      val hp = XXH64.hashInt(table * planes + p, 42L)
      var d = 0
      while (d < dim) {
        val h = XXH64.hashInt(d, hp)
        w(p * dim + d) = ((h % 10000L + 10000L) % 10000L).toDouble / 10000.0 - 0.5
        d += 1
      }
      p += 1
    }
    w
  }

  /** Concatenation of [[weights]](planes, dim, t) for t < tables — the one
    * reference array behind [[HyperplaneSignatures]]; layout
    * `((t*planes + p)*dim + d)`, so each table slice is bit-compatible
    * with the single-table expression. */
  def weightsAllTables(planes: Int, dim: Int, tables: Int): Array[Double] = {
    val all = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      System.arraycopy(weights(planes, dim, t), 0, all, t * planes * dim, planes * dim)
      t += 1
    }
    all
  }
}

/** xxhash64 values of all contiguous `n`-token shingles of a
  * space-tokenized text, in one pass over the string.
  *
  * Bit-identical to the pipeline it replaces —
  * `split → posexplode → window-lead concat → xxhash64(shingle)` — which
  * needed a full shuffle+sort per document (the window) and materialized
  * every shingle string through a per-token exchange. Here the tokenize /
  * slide / hash happens inside one compiled kernel per document row; the
  * only thing that ever leaves the expression is the hash array, which
  * `explode` turns into the (doc, hash) stream the min-hash aggregation
  * consumes. Documents with fewer than `n` tokens yield an empty array
  * (explode then drops them), matching the window formulation's guard.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  def computeJava(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](count)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("shingler", this, "graft.functions.ShingleHashes")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2-normalize an `array<float>` vector, each element portably rounded to
  * `scale` decimals (`floor(x·10ˢ + 0.5)/10ˢ` — the engine-portable
  * rounding the oracle replays). Zero vectors normalize to zeros, not NaN.
  * Compiled single pass; accumulation order is sequential, so the norm is
  * bit-stable across engines and partitionings. */
case class L2NormalizeRounded(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  def computeJava(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var nx = 0.0
    var i = 0
    while (i < n) { val x = arr.getFloat(i).toDouble; nx += x * x; i += 1 }
    val norm = math.sqrt(nx)
    val p = math.pow(10.0, scale)
    val out = new Array[Double](n)
    if (norm != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(arr.getFloat(i).toDouble / norm * p + 0.5) / p
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("l2norm", this, "graft.functions.L2NormalizeRounded")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization of an `array<float>` vector: scale =
  * max|x|/127, q = floor(x/scale + 0.5) — the elementary feature-store
  * compression (4× smaller than float32). Zero vectors quantize to zeros.
  * Output is array<int> so the oracle compares without tinyint dtype
  * mismatches. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  def computeJava(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble); if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Int](n)
    if (maxAbs != 0.0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        out(i) = math.floor(arr.getFloat(i).toDouble / scale + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("quantizer", this, "graft.functions.QuantizeInt8")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Number of elements of a string-array column that belong to a fixed
  * vocabulary (multiset count — duplicates count every time). Replaces the
  * `filter(toks, t => array_contains(vocab, t))` higher-order function,
  * which is CodegenFallback AND rescans the vocabulary array per token;
  * here the vocabulary is a prebuilt hash set probed once per token from
  * compiled code. */
case class TokensInSet(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "tokens_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  def computeJava(arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("tokensInSet", this, "graft.functions.TokensInSet")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two long arrays agree — the MinHash signature
  * agreement kernel (est. Jaccard = agree/numHashes). Replaces
  * `aggregate(zip_with(...))`, two nested interpreted HOFs. */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_agree_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) agree += 1; i += 1 }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash over a string's codepoints
  * (`acc = (acc*31 + cp) mod 1e9+7`) — order-sensitive fingerprint.
  * Replaces `aggregate(split(text, ''), ...)`, which exploded the text
  * into per-character array elements and evaluated the lambda interpreted
  * (higher-order functions are CodegenFallback); here the whole hash is
  * one compiled loop over the string's codepoints. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  def computeJava(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("roller", this, "graft.functions.RollingHash")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `b` Poisson(1) bootstrap multiplicities of one row, as one compiled
  * kernel: md5("bs<g>:<key>") per digest-group (b/4 digests, four 8-hex
  * uniform windows each, the EXACT bits `md5()`/`conv`/`pmod` would read),
  * inverse-CDF against the caller's snapped cumulative ladder.
  *
  * Exists because the declarative form could not survive codegen: 32
  * `when`-ladder columns over 8 inlined md5 calls blew the 64 KB Janino
  * method limit, and the whole-stage fallback then evaluated every
  * collapsed expression interpreted — including 4× duplicated digests.
  * Here the per-row cost is b/4 digests + b table walks inside one JIT'd
  * method, and the downstream aggregate sees a plain `array<long>`. */
case class PoissonBootstrapWeights(child: Expression, b: Int, cum: Seq[Double])
    extends UnaryExpression {

  // the g < b/4 digest loop covers replicates in whole groups of 4; a
  // non-multiple b would silently leave the trailing b % 4 replicates at
  // weight 0 (biased means) for any caller that bypasses
  // Sampling.bootstrapMeans' own validation — fail loudly here instead
  require(b >= 4 && b % 4 == 0, s"b must be a positive multiple of 4, got $b")
  require(cum.nonEmpty, "cumulative ladder must not be empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_bootstrap_weights"

  private val cumArr = cum.toArray

  def computeJava(key: UTF8String): ArrayData = {
    val ks = key.toString
    val out = new Array[Long](b)
    val md = java.security.MessageDigest.getInstance("MD5")
    var g = 0
    while (g < b / 4) {
      val digest = md.digest(("bs" + g + ":" + ks).getBytes("UTF-8"))
      var j = 0
      while (j < 4) {
        // hex window [j*8+1, 8] of the digest string = bytes [4j, 4j+4)
        // big-endian — the same unsigned 32-bit value conv(...,16,10) reads
        var v = 0L
        var bi = j * 4
        while (bi < j * 4 + 4) { v = (v << 8) | (digest(bi) & 0xffL); bi += 1 }
        val u = (v % 1000000L).toDouble / 1000000.0
        var k = 0
        while (k < cumArr.length && !(u < cumArr(k))) k += 1
        out(g * 4 + j) = k.toLong
        j += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bootstrapper", this,
        "graft.functions.PoissonBootstrapWeights")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All chrF per-row statistics in ONE compiled pass: for n = 1..`maxN`,
  * the clipped character-n-gram overlap between candidate and reference
  * strings plus both gram totals, returned as `array<long>` of length
  * 3·maxN laid out [clipped_1, cand_total_1, ref_total_1, clipped_2, …].
  * Character grams are direct substrings (single chars need no separator,
  * unlike the token kernel's \u0001 joins — the identities coincide).
  * Replaces 2·maxN char-array materializations + maxN token-kernel calls
  * per row with one string traversal per n; consumed via `element_at`
  * sums (the PoissonBootstrapWeights pattern). */
case class CharNgramStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_stats"

  def computeJava(c: UTF8String, r: UTF8String): ArrayData = {
    val cs = c.toString
    val rs = r.toString
    val out = new Array[Long](3 * maxN)
    var n = 1
    while (n <= maxN) {
      val refTotal = math.max(rs.length - n + 1, 0)
      val candTotal = math.max(cs.length - n + 1, 0)
      val refCounts = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < refTotal) {
        val g = rs.substring(i, i + n)
        val prev = refCounts.get(g)
        refCounts.put(g, if (prev == null) 1 else prev + 1)
        i += 1
      }
      var clipped = 0L
      i = 0
      while (i < candTotal) {
        val g = cs.substring(i, i + n)
        val left = refCounts.get(g)
        if (left != null && left > 0) {
          clipped += 1
          refCounts.put(g, left - 1)
        }
        i += 1
      }
      val base = 3 * (n - 1)
      out(base) = clipped
      out(base + 1) = candTotal.toLong
      out(base + 2) = refTotal.toLong
      n += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeJava(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("chrfStats", this,
        "graft.functions.CharNgramStats")
      s"${ev.value} = $self.computeJava($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Clipped n-gram overlap between two token arrays — the per-row core of
  * BLEU-style evaluation: Σ over distinct candidate n-grams of
  * min(count_in_candidate, count_in_reference). One compiled hash-count
  * pass per row (a declarative form needs nested higher-order lambdas,
  * which are CodegenFallback and O(L·distinct) interpreted). Tokens are
  * joined with \u0001 so multi-token grams can't collide with a literal
  * token containing a space (tokens are whitespace-split, so \u0001 never
  * occurs inside one). */
case class NgramClippedOverlap(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_clipped_overlap"

  private def grams(a: ArrayData): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val len = a.numElements()
    var i = 0
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('\u0001')
        sb.append(a.getUTF8String(i + j).toString)
        j += 1
      }
      val g = sb.toString
      val prev = m.get(g)
      m.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    m
  }

  def computeJava(c: ArrayData, r: ArrayData): Long = {
    val refCounts = grams(r)
    var clipped = 0L
    val len = c.numElements()
    var i = 0
    while (i + n <= len) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('\u0001')
        sb.append(c.getUTF8String(i + j).toString)
        j += 1
      }
      val g = sb.toString
      val left = refCounts.get(g)
      if (left != null && left > 0) {
        clipped += 1
        refCounts.put(g, left - 1)
      }
      i += 1
    }
    clipped
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("overlapper", this,
        "graft.functions.NgramClippedOverlap")
      s"${ev.value} = $self.computeJava($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns — same codegen rationale. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Viterbi segmentation of one word under a unigram piece model — the
  * per-row core of SentencePiece-style tokenization: the piece sequence
  * minimizing total cost, where each piece's cost is its micro-unit
  * negative log-probability (an exact BIGINT, so the DP is pure integer
  * arithmetic and replays digit-exact in the set-based SQL oracle). Ties
  * on cost prefer the LONGER piece — a total, engine-portable order.
  * The model (piece → cost) rides as a broadcast reference object: the
  * production-tokenizer shape, vocab-keyed native segmentation over the
  * distinct-word table, never per-corpus-token work. Unsegmentable input
  * (a character outside the vocabulary) throws rather than degrading —
  * the trainer guarantees character coverage, so this is a contract
  * violation, not data. */
case class UnigramViterbiPieces(child: Expression,
                                pieces: Seq[(String, Long)],
                                maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(pieces.nonEmpty, "piece model must not be empty")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi_pieces"

  @transient private lazy val costOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, c) => m.put(p, c) }
    m
  }

  def computeJava(word: UTF8String): ArrayData = {
    val w = word.toString
    val n = w.length
    val INF = Long.MaxValue / 4
    val cost = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    var i = 1
    while (i <= n) { cost(i) = INF; i += 1 }
    i = 1
    while (i <= n) {
      var j = 1
      val jMax = math.min(maxPieceLen, i)
      while (j <= jMax) {
        if (cost(i - j) < INF) {
          val c = costOf.get(w.substring(i - j, i))
          if (c != null) {
            val cand = cost(i - j) + c.longValue()
            // tie on cost → prefer the longer piece (j ascends, so >=)
            if (cand < cost(i) || (cand == cost(i) && j > bl(i))) {
              cost(i) = cand
              bl(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    if (n > 0 && cost(n) >= INF)
      throw new IllegalStateException(s"unsegmentable word under model: $w")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var cur = n
    while (cur > 0) {
      val j = bl(cur)
      out.prepend(UTF8String.fromString(w.substring(cur - j, cur)))
      cur -= j
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("viterbi", this,
        "graft.functions.UnigramViterbiPieces")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed bag-of-words counts of a whitespace-split text in ONE compiled
  * pass: element j = how many tokens land in md5 bucket j (the EXACT
  * bucket `Sampling.hashBucket` computes — unsigned first-4-bytes of the
  * digest mod dims — so oracles replaying the per-token md5 keep
  * matching). Replaces explode → per-token hash → (doc, dim) aggregation
  * for consumers that want the DENSE per-document vector: the corpus
  * never explodes, the plan keeps zero exchanges, and the per-row cost
  * is one digest per token inside one JIT'd method. Empty tokens (from
  * repeated separators, or an empty text) count like `split` emits them,
  * matching the declarative form exactly. */
case class HashedBagCounts(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 2 && dims <= 100000, s"dims out of range: $dims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_bag_counts"

  def computeJava(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Long](dims)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val digest = md.digest(s.substring(start, i).getBytes("UTF-8"))
        var v = 0L
        var bi = 0
        while (bi < 4) { v = (v << 8) | (digest(bi) & 0xffL); bi += 1 }
        out((v % dims).toInt) += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bagCounter", this,
        "graft.functions.HashedBagCounts")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row product-quantization assignment: for each of `m` contiguous
  * subspaces of an `array<double>` embedding, the argmin codeword of that
  * subspace's `k`-entry codebook plus the grid-exact squared distance —
  * ONE compiled pass replacing posexplode → broadcast-join → N·m·k-row
  * distance aggregate (the ml5 `HashedBagCounts` / chrf1 `CharNgramStats`
  * kernelization precedent; this was the board's slowest row at 7.95 s).
  *
  * Replays [[graft.operators.Similarity.productQuantize]]'s declarative
  * arithmetic DIGIT-EXACT so the unrolled DuckDB oracle keeps hashing
  * identically: each per-dimension term is `floor((x−c)²·1e9 + 0.5)` in
  * double (the `portableRound(…,9)` grid), terms fold as exact integers
  * (decimal(28,9) summation ≡ integer micro-sum; sums stay < 2^53 for
  * any bounded-magnitude embedding, far below overflow), the distance
  * surfaces through the same decimal→double conversion the old plan's
  * `cast("double")` performed, and argmin ties break on the smaller code
  * id exactly like `min(struct(dist, cid))`.
  *
  * The codebook rides as a broadcast-able reference object of
  * m·k·(dim/m) doubles (= dim·k values — driver metadata, same size as
  * one k-means codebook); per-row cost is m·k·sub multiplies inside one
  * JIT'd method, zero exchanges. */
case class PqAssignCodes(child: Expression, codebook: Array[Double],
                         m: Int, k: Int, sub: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && sub >= 1, s"need m, k, sub >= 1: $m, $k, $sub")
  require(codebook.length == m * k * sub,
    s"codebook length ${codebook.length} != m*k*sub ${m * k * sub}")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sm", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("code", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_assign_codes"

  def computeJava(emb: ArrayData): ArrayData = {
    val n = emb.numElements()
    require(n == m * sub, s"embedding dim $n != m*sub ${m * sub}")
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var bestMicro = Long.MaxValue
      var bestCid = -1
      var bestDist = 0.0
      var cid = 0
      while (cid < k) {
        val base = (s * k + cid) * sub
        var micro = 0L
        var j = 0
        while (j < sub) {
          val d = emb.getDouble(s * sub + j) - codebook(base + j)
          micro += math.floor(d * d * 1e9 + 0.5).toLong
          j += 1
        }
        if (micro < bestMicro) {
          // the declarative plan compared DOUBLE dists (micro < 2^53 on
          // bounded embeddings, so the long order IS the double order);
          // ties on equal dist took the smaller cid — cid ascends here,
          // so strict < reproduces min(struct(dist, cid)) exactly
          bestMicro = micro; bestCid = cid
          bestDist = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(micro), 9).doubleValue()
        }
        cid += 1
      }
      out(s) = org.apache.spark.sql.catalyst.InternalRow(
        s.toLong, bestCid.toLong, bestDist)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqAssign", this,
        "graft.functions.PqAssignCodes")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup-table construction (Jégou et al. 2011 §IV),
  * IN-PLAN: from one unit-normalized query embedding and the broadcast
  * flat codebook ([[PqAssignCodes]] layout, slot (s·k + c)·sub + j),
  * emit the m·k per-subspace inner products
  * lut[s·k + c] = ⟨q_s, codeword(s, c)⟩ as one `array<double>` column.
  * One m·k·sub pass per QUERY ROW — the table build rounds ≤12 did on
  * the driver over a `collect()`ed query set (O(|queries|·m·k) driver
  * heap shipped as expression literals, the one driver-side scale
  * bottleneck the r12 verdict flagged). Here the build distributes with
  * the query frame: a corpus-proportional query batch costs executor
  * time, never driver memory. Same multiply-accumulate order as the old
  * driver loop (j ascending, plain double adds) → bit-identical tables. */
case class PqQueryLut(child: Expression, codebook: Array[Double],
                      m: Int, k: Int, sub: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && sub >= 1, s"need m, k, sub >= 1: $m, $k, $sub")
  require(codebook.length == m * k * sub,
    s"codebook length ${codebook.length} != m*k*sub ${m * k * sub}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_query_lut"

  def computeJava(emb: ArrayData): ArrayData = {
    val n = emb.numElements()
    require(n == m * sub, s"query dim $n != m*sub ${m * sub}")
    val lut = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var acc = 0.0
        var j = 0
        while (j < sub) {
          acc += emb.getDouble(s * sub + j) * codebook(base + j); j += 1
        }
        lut(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqQueryLut", this,
        "graft.functions.PqQueryLut")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score of one PQ-coded corpus vector against
  * one query's lookup table (Jégou et al. 2011 §IV): the approximate
  * inner product is Σ_s lut[s·k + code_s], one array read per subspace —
  * the scan kernel a production IVF-PQ index serves queries with. The
  * table arrives as a COLUMN ([[PqQueryLut]] builds it in-plan and a
  * broadcast join keys it to the candidate stream by query id), so
  * candidate rows carry only ids, m byte-sized codes and the joined-in
  * table through the exchange — never embeddings, and never a
  * driver-side map. */
case class AdcLookupScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, s"codebook size must be >= 1: $k")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup_score"

  def computeJava(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut.getDouble(s * k + codes.getLong(s).toInt); s += 1 }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    computeJava(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("adcScore", this,
        "graft.functions.AdcLookupScore")
      s"${ev.value} = $self.computeJava($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sakoe–Chiba-banded Levenshtein distance over two strings, `band`
  * being a PER-ROW column: the DP visits only cells with |i−j| ≤ band
  * (every cell outside satisfies d(i,j) ≥ |i−j| > band), so the cost is
  * O(len·band) instead of O(len²) — the dtw1 band discipline applied to
  * the wer1 edit DP, whose full quadratic was the board's worst 10×
  * guard ratio. EXACT whenever the true distance is ≤ band; if the
  * banded result exceeds the band the bound cannot be certified and the
  * expression fails LOUDLY (the uni1 bounded-contract: a caller that
  * can derive a certified bound — corpusWer's candidate is its
  * reference minus known deletions/substitutions, so distance ≤
  * #del + #sub by construction — never trips it; a caller that cannot
  * must widen the band, not accept a silent lower bound). */
case class BandedLevenshtein(first: Expression, second: Expression,
                             third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "banded_levenshtein"

  def computeJava(aStr: UTF8String, bStr: UTF8String, bandL: Long): Long = {
    val a = aStr.toString
    val b = bStr.toString
    val n1 = a.length; val n2 = b.length
    val w = math.min(bandL, Int.MaxValue / 4).toInt
    def fail(): Nothing = throw new IllegalStateException(
      s"banded_levenshtein: distance exceeds band $bandL — result would " +
        "be a silent lower bound; widen the band")
    if (math.abs(n1 - n2) > w) fail()
    if (n1 == 0) return n2.toLong
    if (n2 == 0) return n1.toLong
    val INF = Int.MaxValue / 4
    // rows over a, columns over b; only |i-j| <= w cells materialize
    var prev = new Array[Int](n2 + 1)
    var cur = new Array[Int](n2 + 1)
    var j = 0
    while (j <= math.min(n2, w)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n1) {
      val lo = math.max(1, i - w); val hi = math.min(n2, i + w)
      if (lo > 1) cur(lo - 1) = INF
      if (i <= w) cur(0) = i else cur(0) = INF
      j = lo
      while (j <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        val del = if (j <= i + w - 1) prev(j) + 1 else INF
        val ins = cur(j - 1) + 1
        val sub = prev(j - 1) + cost
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      if (hi < n2) cur(hi + 1) = INF
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(n2)
    if (d > w) fail()
    d.toLong
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    computeJava(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val self = ctx.addReferenceObj("bandedLev", this,
        "graft.functions.BandedLevenshtein")
      s"${ev.value} = $self.computeJava($a, $b, $c);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Unicode NFC normalization (canonical composition) as a compiled
  * expression — `java.text.Normalizer` behind `doGenCode` rather than a
  * Scala UDF, so the normalize pass stays inside whole-stage codegen.
  * NFC is the standard first text-pipeline pass: combining sequences
  * (e + U+0301) compose to their precomposed forms (é), so the SAME
  * visible string has ONE byte encoding before any digest/dedup/shingle
  * step — without it, exact dedup misses visually-identical docs that
  * differ only in composition form. Fast path: `isNormalized` avoids
  * allocation for already-NFC text (the overwhelming majority).
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm, so
  * results are oracle-comparable byte for byte. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  def computeJava(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = computeJava(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("nfc", this, "graft.functions.NfcNormalize")
      s"${ev.value} = $self.computeJava($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
