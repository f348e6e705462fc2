package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row hot loops where composed
  * higher-order functions are interpreted and re-evaluated per lambda
  * (SURVEY.md custom-operator preference (b): custom `Expression` beats UDF
  * beats interpreted composition). Each does one tight JVM pass per row, and
  * each implements `doGenCode` as a static-helper call so the expression
  * participates in WHOLE-STAGE CODEGEN — no `CodegenFallback` boundary
  * splitting the generated pipeline (the top-level object compiles to static
  * forwarders, so generated Java calls `graft.functions.CatalystExprs.xxx`
  * directly; primitive returns stay unboxed).
  */
object CatalystExprs {

  @inline private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes — deterministic, allocation-free. */
  private def hashBytes(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }

  // ---- static eval helpers (shared by interpreted eval AND generated code) --

  def shinglesJava(input: UTF8String, k: Int): ArrayData = {
    val words = input.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out =
      if (words.length < k) Array(words.mkString(" "))
      else {
        val grams = new Array[String](words.length - k + 1)
        var i = 0
        while (i + k <= words.length) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j)); j += 1
          }
          grams(i) = sb.toString; i += 1
        }
        grams
      }
    new GenericArrayData(out.map(UTF8String.fromString(_): Any))
  }

  /** STRICT word k-grams (fewer than k words → EMPTY, the decontamination
    * contract — unlike [[shinglesJava]]'s whole-text fallback). Semantics
    * mirror `array_join(slice(split(lower(trim(text)), "\s+"), i, k), " ")`
    * exactly: ASCII-space-only trim (Spark/DuckDB `trim` strips spaces, not
    * tabs — Java's `String.trim` would diverge) and `-1`-limit split (Spark
    * KEEPS trailing empty tokens; Java's default split drops them).
    */
  def strictGramsJava(input: UTF8String, k: Int): ArrayData = {
    val raw = input.toString
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    val words = raw.substring(lo, hi)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    if (words.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val grams = new Array[Any](words.length - k + 1)
      var i = 0
      while (i + k <= words.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j)); j += 1
        }
        grams(i) = UTF8String.fromString(sb.toString); i += 1
      }
      new GenericArrayData(grams)
    }
  }

  def minHashJava(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      val base = hashBytes(arr.getUTF8String(s))
      var i = 0
      while (i < numHashes) {
        val h = splitmix64(base ^ (i.toLong * 0x9e3779b97f4a7c15L))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_): Any))
  }

  def simHashJava(input: UTF8String): Long = {
    val words = input.toString.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val h = splitmix64(hashBytes(UTF8String.fromString(words(w))))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def hyperplaneJava(vecData: ArrayData, planes: Array[Array[Double]]): Long = {
    val vec = vecData.toFloatArray()
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var d = 0.0
      var i = 0
      val n = math.min(vec.length, p.length)
      while (i < n) { d += vec(i) * p(i); i += 1 }
      if (d > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def nearestCentroidJava(vecData: ArrayData, centroids: Array[Array[Double]]): Int = {
    val vec = vecData.toFloatArray()
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var d = 0.0
      var j = 0
      val n = math.min(vec.length, c.length)
      while (j < n) { val x = vec(j).toDouble - c(j); d += x * x; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** One-pass per-document repetition statistics (Gopher-style filter
    * signals, Rae et al. 2021 §A1.1): token count, distinct tokens, the
    * occurrence count of the most frequent word 2-gram, distinct 2-grams and
    * distinct 5-grams — everything the duplicate-word / top-bigram-coverage /
    * duplicate-5-gram fractions need, in a single tokenize-and-count pass.
    * Tokenization matches [[strictGramsJava]] (ASCII-space trim, lowercase,
    * `\s+` split) so the DuckDB oracle can replay it with
    * `string_split_regex(lower(trim(text)), '\s+')`.
    */
  def repStatsJava(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val raw = input.toString
    var lo = 0
    var hi = raw.length
    while (lo < hi && raw.charAt(lo) == ' ') lo += 1
    while (hi > lo && raw.charAt(hi - 1) == ' ') hi -= 1
    if (hi == lo)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0, 0, 0, 0))
    val words = raw.substring(lo, hi)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val n = words.length
    val uniq1 = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { uniq1.add(words(i)); i += 1 }
    val counts2 = new java.util.HashMap[String, Integer](n * 2)
    var top2 = 0
    i = 0
    while (i + 1 < n) {
      val g = words(i) + " " + words(i + 1)
      val c = counts2.merge(g, 1, (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top2) top2 = c.intValue
      i += 1
    }
    val uniq5 = new java.util.HashSet[String](n * 2)
    i = 0
    while (i + 4 < n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < 5) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
      uniq5.add(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, uniq1.size, top2, counts2.size, uniq5.size))
  }

  /** Product-quantization encode: per sub-block argmin centroid, codes packed
    * 8 bits per block into one long (m ≤ 8 blocks, ks ≤ 256 centroids). One
    * pass; ties to the lower code, matching [[nearestCentroidJava]].
    */
  def pqEncodeJava(vecData: ArrayData, codebooks: Array[Array[Array[Double]]]): Long = {
    val vec = vecData.toFloatArray()
    var codes = 0L
    var b = 0
    while (b < codebooks.length) {
      val cb = codebooks(b)
      val dsub = cb(0).length
      val off = b * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var j = 0
        val n = math.min(dsub, math.max(vec.length - off, 0))
        while (j < n) { val x = vec(off + j).toDouble - cent(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes |= (best.toLong & 0xffL) << (8 * b)
      b += 1
    }
    codes
  }

  /** Asymmetric-distance computation: sum the per-block LUT entries selected
    * by the packed codes — m array lookups per candidate, no vector math.
    * `lut` is the query's flattened m×ks table of ||q_sub − centroid||².
    */
  def pqAdcJava(codes: Long, lutData: ArrayData, m: Int, ks: Int): Double = {
    val lut = lutData.toDoubleArray()
    var d = 0.0
    var b = 0
    while (b < m) {
      val code = ((codes >>> (8 * b)) & 0xffL).toInt
      d += lut(b * ks + code)
      b += 1
    }
    d
  }

  def dotJava(l: ArrayData, r: ArrayData): Double = {
    val a = l.toFloatArray()
    val b = r.toFloatArray()
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  private val Pkg = "graft.functions.CatalystExprs"

  /** Lowercased whitespace-split word k-grams in one pass; text shorter than k
    * words yields the whole text as a single shingle (same contract as
    * `TextFunctions.shingles`).
    */
  case class WordShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      shinglesJava(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.shinglesJava($c, $k);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass strict word k-grams (see [[strictGramsJava]]) — replaces the
    * interpreted `transform(sequence(...), i -> array_join(slice(...)))`
    * composition whose per-gram lambda re-touches the word array; the hot
    * side of GPT-3-style decontamination scans the WHOLE corpus through this.
    */
  case class StrictWordGramsExpr(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      strictGramsJava(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.strictGramsJava($c, $k);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `numHashes` MinHash values in ONE pass over the shingle array: each
    * shingle is byte-hashed once, then mixed per hash index — O(S + S·H cheap
    * mixes) instead of H interpreted array traversals with string re-hashing.
    */
  case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minHashJava(input.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.minHashJava($c, $numHashes);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash in ONE pass: tokenize, hash each token once, accumulate
    * the per-bit majority votes in a local array — replaces 64 interpreted
    * `aggregate` lambdas (one full array traversal per bit) with a single
    * O(tokens·64-bitop) JVM loop.
    */
  case class SimHashExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(simHashJava(input.asInstanceOf[UTF8String]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.simHashJava($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane signature bits in one pass (planes precomputed on the
    * driver and closed over; serialized with the expression to executors, and
    * surfaced to generated code as a codegen reference object).
    */
  case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(hyperplaneJava(input.asInstanceOf[ArrayData], planes))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.hyperplaneJava($c, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Schema of [[RepetitionStatsExpr]]: the integer counters from which the
    * repetition fractions derive (fractions are computed as Column arithmetic
    * so the same divisions run verbatim in the DuckDB oracle).
    */
  val RepStatsType: StructType = StructType(Seq(
    StructField("tokens", IntegerType, nullable = false),
    StructField("uniq_words", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("uniq_bigrams", IntegerType, nullable = false),
    StructField("uniq_5grams", IntegerType, nullable = false)))

  /** One-pass repetition counters (see [[repStatsJava]]) — replaces an
    * explode-grams → groupBy-doc mode computation (a per-document shuffle)
    * with a map-only native expression; the whole Gopher-style repetition
    * filter becomes a narrow projection over the corpus.
    */
  case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = RepStatsType
    override def nullSafeEval(input: Any): Any =
      repStatsJava(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.repStatsJava($c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Argmin-centroid bucket assignment in one pass: squared-L2 against every
    * centroid in a tight JVM loop (ties break to the lower index, matching a
    * `when(a.d <= b.d, a)` left-fold). Replaces numCentroids interpreted
    * `aggregate(zip_with(...))` evaluations per row in the IVF assignment —
    * the pass that runs over the FULL corpus at build time.
    */
  case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(nearestCentroidJava(input.asInstanceOf[ArrayData], centroids))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.nearestCentroidJava($c, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass PQ encode (see [[pqEncodeJava]]); codebooks are a codegen
    * reference object like [[NearestCentroidExpr]]'s centroids.
    */
  case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(pqEncodeJava(input.asInstanceOf[ArrayData], codebooks))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $Pkg.pqEncodeJava($c, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC distance from packed codes + a per-query LUT column (see
    * [[pqAdcJava]]) — the PQ scan's hot loop, m table lookups per row.
    */
  case class PqAdcExpr(left: Expression, right: Expression, m: Int, ks: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(codes: Any, lut: Any): Any =
      java.lang.Double.valueOf(
        pqAdcJava(codes.asInstanceOf[Long], lut.asInstanceOf[ArrayData], m, ks))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, l) => s"${ev.value} = $Pkg.pqAdcJava($c, $l, $m, $ks);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sequential-order float dot product in double — bit-identical to
    * `aggregate(zip_with(a,b,*),0d,+)` (same accumulation order) but one JVM
    * loop instead of 2·dim interpreted lambda calls.
    */
  case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Double.valueOf(dotJava(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $Pkg.dotJava($a, $b);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ---- Column helpers -------------------------------------------------------

  def wordShingles(text: Column, k: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(text), k))

  def strictWordGrams(text: Column, k: Int): Column =
    ColumnBridge.column(StrictWordGramsExpr(ColumnBridge.expression(text), k))

  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))

  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text)))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(vec), centroids))

  def hyperplaneSig(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    ColumnBridge.column(HyperplaneSigExpr(ColumnBridge.expression(vec), planes))
  }

  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), codebooks))

  def pqAdc(codes: Column, lut: Column, m: Int, ks: Int): Column =
    ColumnBridge.column(PqAdcExpr(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut), m, ks))

  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))

  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
