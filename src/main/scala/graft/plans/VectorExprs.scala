package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector math for the similarity operators (SURVEY.md §2.11).
  *
  * Same rationale as MinHashLsh: the higher-order-function equivalents
  * (`aggregate(zip_with(a,b,*),0,+)`) evaluate interpreted — one boxed
  * lambda call per element per row. Inside a crossJoin these are the
  * innermost loop of brute-force similarity: at 10⁶ pairs × 64 dims
  * that is 10⁸ interpreted lambda dispatches where a fused JIT loop
  * does 10⁸ fused multiply-adds.
  *
  * All three expressions implement doGenCode, so they fuse INTO
  * whole-stage codegen (no per-row virtual call, no codegen fence
  * around the join's innermost loop). The interpreted nullSafeEval
  * mirrors the generated loop exactly — summation order is sequential
  * (index 0..n-1), matching the HOF fold, so oracle-rounded similarity
  * values are identical on both paths.
  */
object VectorExprs {

  /** Σ a(i)·b(i); null if either side or any element is null; arrays
    * must be the same length (mismatch → null, mirroring zip_with's
    * null-padding propagation). */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(
      DotExpr(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** √(Σ x²) — L2 norm. */
  def norm(a: Column): Column =
    ColumnShim.column(NormExpr(ColumnShim.expression(a)))

  /** Sign-random-projection signature: bit b of the result is the sign
    * of Σ_d s(b,d)·vec(d), with s(b,d) ∈ {−1, +1} derived from
    * xxhash64(b·γ + d) — a deterministic projection matrix that never
    * materializes. */
  def srpSign(vec: Column, bits: Int): Column =
    ColumnShim.column(SrpSignExpr(ColumnShim.expression(vec), bits))

  private[plans] def requireDoubleArray(
      name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$name needs array<double>, got $other")
  }
}

case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null on length mismatch / null element, independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray("dot", left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess =>
        VectorExprs.requireDoubleArray("dot", right.dataType)
      case fail => fail
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc: java.lang.Double
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotExpr = copy(left = l, right = r)
}

case class NormExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray("vec_norm", child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc): java.lang.Double
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_norm"
  override protected def withNewChildInternal(c: Expression): NormExpr =
    copy(child = c)
}

case class SrpSignExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray("srp_sign", child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      val base = b.toLong * MinHashLsh.GoldenGamma
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (x.isNullAt(d)) return null
        val sign =
          if ((XXH64.hashLong(base + d, MinHashLsh.Seed) & 1L) == 1L) 1.0
          else -1.0
        acc += sign * x.getDouble(d)
        d += 1
      }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig: java.lang.Long
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val base = ctx.freshName("base")
      val sgn = ctx.freshName("sgn")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits && !${ev.isNull}; $b++) {
         |  final long $base = (long) $b * ${MinHashLsh.GoldenGamma}L;
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    final double $sgn =
         |      (($xxh.hashLong($base + $d, ${MinHashLsh.Seed}L) & 1L) == 1L)
         |        ? 1.0 : -1.0;
         |    $acc += $sgn * $a.getDouble($d);
         |  }
         |  if (!${ev.isNull} && $acc >= 0) $sig |= (1L << $b);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override def prettyName: String = "srp_sign"
  override protected def withNewChildInternal(c: Expression): SrpSignExpr =
    copy(child = c)
}
