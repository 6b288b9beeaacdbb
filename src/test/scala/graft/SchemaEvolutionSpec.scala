package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** scan_evolved (VERDICT r13 #5): the schema-evolution read has to get
  * three behaviors exactly right — mergeSchema null-fills an added
  * column for old batches (never drops or reorders rows), a widened
  * primitive type genuinely CANNOT ride mergeSchema (so the explicit
  * cast path isn't decorative), and the cast normalization widens
  * float → double bit-exactly.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private lazy val evolved: String = {
    val out = Scratch.dir(s"spec-evolved-${java.util.UUID.randomUUID()}")
    Scratch.reapLater(out)
    val orders = graft.sources.Catalog.table(spark, sf0001, "orders")
    orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("float").as("o_totalprice"))
      .write.parquet(s"$out/batch=1")
    orders.filter(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("float").as("o_totalprice"),
        col("o_orderstatus"))
      .write.parquet(s"$out/batch=2")
    orders.filter(col("o_orderkey") % 3 === 2)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus"))
      .write.parquet(s"$out/batch=3")
    out
  }

  test("mergeSchema null-fills the added column exactly for old batches") {
    val df = spark.read.option("mergeSchema", "true")
      .option("basePath", evolved)
      .parquet(s"$evolved/batch=1", s"$evolved/batch=2")
    assert(df.columns.contains("o_orderstatus"),
      s"added column missing from merged schema: ${df.columns.mkString(",")}")
    val counts = df.groupBy("batch")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nulls"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts(1)._1 == counts(1)._2,
      s"batch 1 (pre-evolution) must be all-null in the added column: $counts")
    assert(counts(2)._2 == 0L,
      s"batch 2 carries the column — no nulls expected: $counts")
  }

  test("widened primitive types refuse mergeSchema — the cast path is real") {
    val e = intercept[Throwable] {
      spark.read.option("mergeSchema", "true")
        .option("basePath", evolved).parquet(evolved)
        .schema // schema merge happens at read-plan time
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).toLowerCase
    assert(msg.contains("merg") || msg.contains("incompatible") ||
      msg.contains("conflict"), s"unexpected failure shape: ${e.getMessage}")
  }

  test("cast normalization widens float to double bit-exactly") {
    val v12 = spark.read.option("mergeSchema", "true")
      .option("basePath", evolved)
      .parquet(s"$evolved/batch=1", s"$evolved/batch=2")
    assert(v12.schema("o_totalprice").dataType == FloatType)
    val widened = v12.withColumn("o_totalprice",
      col("o_totalprice").cast("double"))
    val v3 = spark.read.option("basePath", evolved)
      .parquet(s"$evolved/batch=3")
    assert(v3.schema("o_totalprice").dataType == DoubleType)
    val u = widened.unionByName(v3)
    assert(u.schema("o_totalprice").dataType == DoubleType)
    // widening direction: double(float(x)) is exactly the float value —
    // compare against the float cast recomputed from the source
    val src = graft.sources.Catalog.table(spark, sf0001, "orders")
      .filter(col("o_orderkey") % 3 < 2)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("float").cast("double").as("want"))
    val bad = widened.join(src, "o_orderkey")
      .filter(col("o_totalprice") =!= col("want")).count()
    assert(bad == 0L, s"$bad rows drifted through the float→double widening")
  }
}
