package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the MinHash signature
  * (SURVEY.md §4.1 "custom Expression only if profiling demands" — the
  * bench demanded: the equivalent nested higher-order-function Column
  * expression evaluates ~numHashes × numShingles interpreted lambdas
  * per row, ~10s for 5 000 docs; this expression runs the same math as
  * one tight compiled loop, ~100× less per-row overhead).
  *
  * Semantics: each shingle is xxhash64'd once; the i-th hash function
  * re-hashes that 64-bit value XOR a per-function salt; signature
  * element i is the minimum over shingles. Deterministic everywhere —
  * no stored state, no RNG.
  *
  * Per-row evaluation cost is one virtual call (CodegenFallback); the
  * loop body itself is JIT-compiled Scala, which is what dominates.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      base(i) =
        if (s == null) 0L
        else XXH64.hashUTF8String(s, MinHashSigExpr.Seed)
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val salt = j * MinHashSigExpr.GoldenGamma
      var m = Long.MaxValue
      var k = 0
      while (k < n) {
        val h = XXH64.hashLong(base(k) ^ salt, MinHashSigExpr.Seed)
        if (h < m) m = h
        k += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  val Seed = 42L
  val GoldenGamma = 0x9E3779B97F4A7C15L

  /** Column-API entry: minhash signature of an array<string> column. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnShim.column(
      MinHashSigExpr(ColumnShim.expression(shingles), numHashes))
}
