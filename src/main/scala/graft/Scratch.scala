package graft

/** Scratch-space root for everything the harness writes outside the
  * result dir: format-round-trip staging, streaming checkpoints, the
  * bucketed-table warehouse, and Spark's own local dirs.
  *
  * On a real cluster these are HDFS/S3/NVMe paths chosen by the
  * deployment; in this single-box harness they all used to land on
  * /tmp, and BENCH_r03 showed driver-side disk contention multiplying
  * exactly the queries that touch it (streaming checkpoints 5-20x,
  * format round-trips 3-5x) while the plans themselves were fine.
  * Prefer tmpfs (/dev/shm) so the benchmark measures the engine, not
  * the box's disk queue; fall back to /tmp when tmpfs is absent.
  */
object Scratch {
  /** SPARK_GRAFT_SCRATCH overrides the root: tmpfs pages count against
    * RAM, so a big-corpus run (×1000 ScaleBench shuffles tens of GB)
    * must route scratch to disk or the kernel OOM-kills the JVM —
    * exactly the trade a real deployment makes choosing NVMe over
    * ramdisk for shuffle. Benches at fixture scale keep tmpfs. */
  lazy val root: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        "/dev/shm/graft-scratch"
      else "/tmp/graft-scratch")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    base
  }

  def dir(parts: String*): String = (root +: parts).mkString("/")
}
