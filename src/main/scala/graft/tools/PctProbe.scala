package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is a sort_array(collect_list(v)) exact percentile
  * bit-identical to percentile() and how much faster on near-unique
  * doubles? (Percentile's counts-map degenerates when values are
  * unique: one boxed map entry per row.) */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    // built-in: percentile(col, array(0.25, 0.90))
    def builtin() = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.90))").as("p"))

    // replicate Percentile.getPercentile over a sorted array:
    //   position = p * (N - 1); lower = floor, higher = ceil (0-based)
    //   if equal -> v[lower] else (higher - position) * v[lower]
    //                            + (position - lower) * v[higher]
    def viaSort() = {
      def pct(p: Double) = {
        val pos = lit(p) * (size(col("s")) - 1).cast("double")
        val lo = floor(pos).cast("int")
        val hi = ceil(pos).cast("int")
        val vlo = element_at(col("s"), lo + 1)
        val vhi = element_at(col("s"), hi + 1)
        when(hi === lo, vlo)
          .otherwise((hi.cast("double") - pos) * vlo +
            (pos - lo.cast("double")) * vhi)
      }
      li.groupBy("l_returnflag")
        .agg(sort_array(collect_list(col("l_extendedprice"))).as("s"))
        .select(col("l_returnflag"), array(pct(0.25), pct(0.90)).as("p"))
    }

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f.collect()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    // bit-identity check
    val a = builtin().orderBy("l_returnflag").collect()
    val b = viaSort().orderBy("l_returnflag").collect()
    val same = a.zip(b).forall { case (x, y) =>
      x.getString(0) == y.getString(0) && {
        val xa = x.getSeq[Double](1); val ya = y.getSeq[Double](1)
        xa.zip(ya).forall { case (u, v) =>
          java.lang.Double.doubleToLongBits(u) ==
            java.lang.Double.doubleToLongBits(v) }
      }
    }
    println(s"BIT-IDENTICAL: $same")
    a.foreach(r => println(s"  builtin $r")); b.foreach(r => println(s"  sorted  $r"))
    time("builtin")(builtin())
    time("viaSort")(viaSort())
    spark.stop()
  }
}
