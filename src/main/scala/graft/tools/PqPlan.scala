package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print the physical-plan shape of Similarity.pqTopK —
  * specifically whether the shortlist rank filter is pushed map-side
  * as WindowGroupLimit (the property that keeps the ADC scan's
  * exchange at |Q|×shortlist rows instead of N×|Q|). */
object PqPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Catalog.table(spark, "/root/testdata/sf0.01", "embeddings")
    val df = graft.operators.Similarity.pqTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("HAS WindowGroupLimit: " + p.contains("WindowGroupLimit"))
    println(p.split("\n").filter(l => l.contains("Window") ||
      l.contains("Exchange") || l.contains("NestedLoop") ||
      l.contains("Cartesian")).mkString("\n"))
    spark.stop()
  }
}
