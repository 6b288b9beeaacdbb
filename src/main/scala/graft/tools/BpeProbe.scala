package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing of the incremental BPE trainer on the ×N scale
  * corpus — every eager step (localCheckpoint) timed separately so the
  * wall-clock of graft.operators.TextOps.bpeTrain is attributable
  * instead of guessed. Run:
  *   SCALE_MULT=100 sbt "runMain graft.tools.BpeProbe"
  * (expects ScaleBench to have built /tmp/graft-scale-x<N> already).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SCALE_MULT", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"/tmp/graft-scale-x$mult/documents.parquet")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bpe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val wordFreq = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // Mirror the SHIPPED TextOps.bpeTrain state exactly: a checkpointed
    // flat base plus a per-round checkpointed overrides set, with
    // current = base ∖ overrides ∪ overrides via one broadcast
    // anti-join. (An earlier probe revision kept the replaced
    // chained-filter form and so timed an algorithm that no longer
    // ships — its 11→143 s/round growth was the probe's own replay,
    // not the trainer's.)
    val base = t("s0 checkpoint (wordfreq + char split)") {
      wordFreq.select(col("word"), col("freq"),
        filter(split(col("word"), ""), s => s =!= "").as("syms"))
        .localCheckpoint()
    }
    println(s"[bpe] vocab types: ${base.count()}")
    import org.apache.spark.sql.types._
    var overrides = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("word", StringType),
        StructField("freq", LongType),
        StructField("syms", ArrayType(StringType)))))
    def current: DataFrame = base
      .join(broadcast(overrides.select("word")), Seq("word"), "left_anti")
      .unionAll(overrides)

    def bpePairs(df: DataFrame): DataFrame = {
      val nPairs = greatest(size(col("syms")) - 1, lit(0))
      df.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), nPairs),
          slice(col("syms"), lit(2), nPairs),
          (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
        .select(col("pr.a"), col("pr.b"), col("freq"))
    }

    var counts = t("initial pair counts") {
      bpePairs(base).groupBy("a", "b").agg(sum("freq").as("cnt"))
        .localCheckpoint()
    }
    println(s"[bpe] distinct pairs: ${counts.count()}")

    (1 to 6).foreach { i =>
      val top = t(s"r$i top") {
        counts.orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
          .select(col("a"), col("b"), concat(col("a"), col("b")).as("m"),
            col("cnt"))
          .localCheckpoint()
      }
      val nP = greatest(size(col("syms")) - 1, lit(0))
      val hasPair = exists(
        zip_with(slice(col("syms"), lit(1), nP),
          slice(col("syms"), lit(2), nP),
          (x, y) => x === col("ma") && y === col("mb")),
        p => p)
      val fold = aggregate(col("syms"),
        array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 &&
            element_at(acc, -1) === col("ma") && x === col("mb"),
          concat(slice(acc, lit(1), size(acc) - 1), array(col("mm"))))
          .otherwise(concat(acc, array(x))))
      val changed = t(s"r$i changed (filter+fold+checkpoint)") {
        current.crossJoin(broadcast(top.select(col("a").as("ma"),
          col("b").as("mb"), col("m").as("mm"))))
          .filter(hasPair)
          .select(col("word"), col("freq"), col("syms").as("old_syms"),
            fold.as("syms"))
          .localCheckpoint()
      }
      println(s"[bpe] r$i changed words: ${changed.count()}")
      overrides = t(s"r$i overrides checkpoint") {
        overrides
          .join(broadcast(changed.select("word")), Seq("word"), "left_anti")
          .unionAll(changed.select(col("word"), col("freq"), col("syms")))
          .localCheckpoint()
      }
      val delta = bpePairs(changed.select(col("freq"),
        col("old_syms").as("syms")))
        .groupBy("a", "b").agg((-sum("freq")).as("cnt"))
        .unionAll(bpePairs(changed)
          .groupBy("a", "b").agg(sum("freq").as("cnt")))
      counts = t(s"r$i counts delta") {
        counts.unionAll(delta)
          .groupBy("a", "b").agg(sum("cnt").as("cnt"))
          .filter(col("cnt") > 0)
          .localCheckpoint()
      }
    }
    t("final vocab force")(current.count())
    spark.stop()
  }
}
