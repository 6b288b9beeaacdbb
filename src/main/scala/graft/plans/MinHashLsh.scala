package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass expressions for the MinHash/LSH dedup pipeline.
  *
  * Why native (SURVEY.md §4.1 "custom Expression only if profiling
  * demands"): the equivalent higher-order-function Column pipeline
  * (split → transform shingles → minhash → band buckets) is interpreted
  * (HOFs don't participate in whole-stage codegen), and CollapseProject
  * inlines each upstream expression into EVERY downstream element
  * access — measured ~17 full shingle+signature re-evaluations per row
  * once banding was applied (~25 ms/row; 126 CPU-seconds for 5 000
  * docs). Each expression here is one virtual call per row wrapping a
  * tight JIT-compiled loop (~µs/row), and composing them costs one
  * evaluation per expression per row, not a multiplicative blowup.
  *
  * Determinism: pure functions of the input text + integer params; no
  * RNG, no stored state — identical on every executor, safe for
  * re-computed plan branches at any scale.
  */
object MinHashLsh {
  val Seed = 42L
  val GoldenGamma = 0x9E3779B97F4A7C15L

  /** Distinct xxhash64 values of the 3-word shingles of `text`
    * (whitespace-split, empty tokens preserved — mirrors
    * `split(text, " ")`). Fewer than 3 words → empty array, so
    * `posexplode` downstream drops such docs for free. */
  def shingleHashes(text: Column): Column =
    ColumnShim.column(ShingleHashesExpr(ColumnShim.expression(text)))

  /** One LSH bucket id per band (array length = `bands`): the MinHash
    * signature of the input shingle-hash array is computed internally
    * (`numHashes` functions), split into `bands` equal bands, each
    * band's rows folded into a single 64-bit bucket id. */
  def lshBuckets(hashes: Column, numHashes: Int, bands: Int): Column =
    ColumnShim.column(
      LshBucketsExpr(ColumnShim.expression(hashes), numHashes, bands))

  /** `bits`-bit SimHash of whitespace tokens: bit b is the sign of
    * Σ_tokens (+1 / −1 by bit b of xxhash64(token)) — each token is
    * hashed once, not once per bit. */
  def simhash(text: Column, bits: Int): Column =
    ColumnShim.column(SimHashExpr(ColumnShim.expression(text), bits))

  /** 16-bit variant (demo-scale keyspace — 65k groups max). */
  def simhash16(text: Column): Column = simhash(text, 16)

  /** Full-width fingerprint for corpus-scale near-dup detection. */
  def simhash64(text: Column): Column = simhash(text, 64)
}

case class ShingleHashesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import MinHashLsh._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length - 2
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = UTF8String.fromString(
        words(i) + " " + words(i + 1) + " " + words(i + 2))
      hs(i) = XXH64.hashUTF8String(s, Seed)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place unique (array is sorted)
    var w = 1
    var r = 1
    while (r < n) {
      if (hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  override def prettyName: String = "shingle_hashes"
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

case class LshBucketsExpr(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  import MinHashLsh._
  require(numHashes % bands == 0, "numHashes must divide evenly into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lsh_buckets needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // No shingles → no buckets: a doc too short to shingle must not
    // enter LSH at all (otherwise every such doc shares one constant
    // bucket — a degenerate all-pairs clique of empty documents).
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val salt = j * GoldenGamma
      var m = Long.MaxValue
      var k = 0
      while (k < n) {
        val h = XXH64.hashLong(arr.getLong(k) ^ salt, Seed)
        if (h < m) m = h
        k += 1
      }
      sig(j) = m
      j += 1
    }
    val rows = numHashes / bands
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b.toLong, Seed)
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(sig(b * rows + r) ^ acc, Seed)
        r += 1
      }
      buckets(b) = acc
      b += 1
    }
    new GenericArrayData(buckets)
  }

  override def prettyName: String = "lsh_buckets"
  override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
    copy(child = c)
}

case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  import MinHashLsh._
  require(bits >= 1 && bits <= 64, s"simhash bits must be 1..64, got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new Array[Int](bits)
    var i = 0
    while (i < words.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(words(i)), Seed)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out: java.lang.Long
  }

  override def prettyName: String = "simhash"
  override protected def withNewChildInternal(c: Expression): SimHashExpr =
    copy(child = c)
}
