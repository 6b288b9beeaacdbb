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
  lazy val root: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        "/dev/shm/graft-scratch"
      else "/tmp/graft-scratch"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    base
  }

  def dir(parts: String*): String = (root +: parts).mkString("/")
}
