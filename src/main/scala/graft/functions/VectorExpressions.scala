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
  }
}
