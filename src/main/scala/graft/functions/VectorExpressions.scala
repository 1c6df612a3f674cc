package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native codegen'd vector kernels for the similarity operators.
  *
  * The declarative forms (`aggregate(zip_with(...))` for the dot
  * product, nested folds for the hyperplane signature) are
  * HigherOrderFunctions — Catalyst evaluates their lambdas
  * INTERPRETED, one invocation per element, which made the cosine
  * verification the hot path of the embedding dedup (~77M lambda
  * calls at sf0.1). These expressions generate a plain Java loop
  * inside whole-stage codegen instead — same sequential left-fold
  * double arithmetic, so results are bit-identical to the HOF forms
  * and to the DuckDB oracle's list_reduce, ~100× less interpreter
  * overhead.
  *
  * Preference order per the build plan: compose built-ins where the
  * plan shape allows; drop to a custom Expression exactly here, where
  * the built-in form can't reach codegen.
  */

/** Σ a(i)·b(i) over two array<double> columns — sequential fold in
  * index order (left fold ≡ `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,v) -> acc+v)` on equal-length arrays). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
          case ArrayType(DoubleType, _) => true; case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** The random-hyperplane LSH signature: bit j (0 ≤ j < nBits) is set
  * when Σ_d vec(d)·r(j,d) > 0, with r(j,d) the deterministic LCG
  * component ((1103515245·(j·dim+d) + 12345) mod 2^31)/2^31 − 0.5 —
  * exactly [[graft.llm.Similarity.signatureExpr]]'s arithmetic
  * (and the oracle's), evaluated as one generated loop nest. */
case class HyperplaneSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType match {
          case ArrayType(DoubleType, _) => true; case _ => false
        }) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig requires (array<double>, int), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"
  override def foldable: Boolean = false

  private def lcg(idx: Long): Double =
    ((1103515245L * idx + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  override protected def nullSafeEval(v: Any, nb: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val nBits = nb.asInstanceOf[Int]
    val dim = vec.numElements()
    var bits = 0L
    var j = 0
    while (j < nBits) {
      var s = 0.0
      var d = 0
      while (d < dim) { s += vec.getDouble(d) * lcg(j.toLong * dim + d); d += 1 }
      if (s > 0) bits += (1L << j)
      j += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, nBits) => {
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val dim = ctx.freshName("dim")
      val bits = ctx.freshName("bits")
      val idx = ctx.freshName("idx")
      s"""
         |int $dim = $vec.numElements();
         |long $bits = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    long $idx = (long) $j * $dim + $d;
         |    $s += $vec.getDouble($d) *
         |      (((double) ((1103515245L * $idx + 12345L) % 2147483648L)) / 2147483648.0 - 0.5);
         |  }
         |  if ($s > 0) $bits += (1L << $j);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSig =
    copy(left = newLeft, right = newRight)
}

/** The full 128-permutation MinHash signature of one document's word
  * array, in one per-row pass: 3-gram shingles are hashed (portable
  * md5-60 → mod P) and folded into per-permutation minima without
  * ever leaving the row — sig[j] = min over shingles of
  * ((j·2654435761+1) mod P · h + (j·40503+7) mod P) mod P, exactly
  * the arithmetic of the previous explode → 128-min-aggregate plan
  * and of the DuckDB oracle. Replacing that plan removes the shingle
  * explode (50×+ row amplification) AND the 128-column aggregate's
  * exchange from the signature build — at 100 TB the signature pass
  * becomes a narrow map over the corpus scan with NO shuffle at all.
  * Duplicate shingles need no dedup here: minima are idempotent. */
object ShingleMinHashKernel {
  import graft.llm.Portable.P
  val NumPerms = 128
  private val A = Array.tabulate(NumPerms)(j => (j.toLong * 2654435761L + 1) % P)
  private val B = Array.tabulate(NumPerms)(j => (j.toLong * 40503L + 7) % P)
  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  val NumBands = 16
  val RowsPerBand = NumPerms / NumBands

  /** sig[0..127] ++ bands[0..15] — the band keys are computed here
    * too (band b = Σ_{i<8} sig[b·8+i]·(b·8+i+1) mod P, identical to
    * the previous HOF transform and the oracle), so downstream
    * projections slice a cheap column instead of referencing the
    * non-cheap kernel call many times (CollapseProject would inline
    * it per reference — measured as a 10× blow-up when the bands
    * lambda referenced sig[] 128 times). */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val out = new Array[Long](NumPerms + NumBands)
    java.util.Arrays.fill(out, 0, NumPerms, Long.MaxValue)
    val digest = Md.get()
    var i = 0
    while (i <= n - 3) {
      val s = org.apache.spark.unsafe.types.UTF8String.concatWs(Space,
        words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2))
      digest.reset()
      val d = digest.digest(s.getBytes)
      // first 15 hex digits of the md5 = 7 bytes + the high nibble of
      // byte 7 — identical to conv(substring(md5(s),1,15),16,10)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = ((h << 4) | ((d(7) & 0xf0L) >> 4)) % P
      var j = 0
      while (j < NumPerms) {
        val v = (A(j) * h + B(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    var b = 0
    while (b < NumBands) {
      var acc = 0L
      var i2 = 0
      while (i2 < RowsPerBand) {
        val idx = b * RowsPerBand + i2
        acc += out(idx) * (idx + 1)
        i2 += 1
      }
      out(NumPerms + b) = acc % P
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 60-bit SimHash over a token array in one per-row pass: each token
  * is portable-hashed (md5-60 mod P, identical to
  * [[ShingleMinHashKernel]]'s extraction) and bit i of the result is
  * set when Σ_tokens (2·bit_i(h) − 1) > 0 — the same arithmetic as
  * the previous explode → 60-bit-sum aggregate, with duplicate
  * tokens contributing once per occurrence. No explode, no
  * aggregate, no shuffle. */
object SimHashKernel {
  import graft.llm.Portable.P
  val SimBits = 60
  private val Md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](SimBits)
    val digest = Md.get()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(words.getUTF8String(i).getBytes)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = ((h << 4) | ((d(7) & 0xf0L) >> 4)) % P
      var b = 0
      while (b < SimBits) {
        counts(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < SimBits) {
      if (counts(b) > 0) sim += (1L << b)
      b += 1
    }
    sim
  }
}

/** words array<string> → 60-bit SimHash (see [[SimHashKernel]]). */
case class SimHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(w: Any): Any =
    SimHashKernel.compute(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.SimHashKernel.compute($w);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** words array<string> → 128-long MinHash signature (see
  * [[ShingleMinHashKernel]]); rows must be pre-filtered to ≥3 words
  * (no shingles → an all-MaxValue signature, which the operators
  * never produce because they filter first). */
case class ShingleMinHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_minhash requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_minhash"

  override protected def nullSafeEval(w: Any): Any =
    ShingleMinHashKernel.compute(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.ShingleMinHashKernel.compute($w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Session-scoped SQL registration so operators can use the kernels
  * from `expr(...)` strings; idempotent per session. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction("graft_dot",
        (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_hyperplane_sig")))
      reg.createOrReplaceTempFunction("graft_hyperplane_sig",
        (args: Seq[Expression]) => HyperplaneSig(args(0), args(1)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_shingle_minhash")))
      reg.createOrReplaceTempFunction("graft_shingle_minhash",
        (args: Seq[Expression]) => ShingleMinHash(args(0)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_simhash")))
      reg.createOrReplaceTempFunction("graft_simhash",
        (args: Seq[Expression]) => SimHash(args(0)), "built-in")
  }
}
