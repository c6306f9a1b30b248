package graft.engine

import org.apache.spark.sql.SparkSession

/** spark-submit entry point: `graft.engine.ExtractMain <tableDir> <outDir>
  * [--gen nConvs giantScale buckets snapshots] [--salted] [--salt N]`.
  *
  * With `--gen`, first materializes the deterministic synthetic transcripts
  * table (appending `snapshots` snapshot batches), then runs the resumable
  * extract job over all uncommitted snapshots.
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractMain <tableDir> <outDir> [--gen nConvs giantScale buckets snapshots] [--salted] [--salt N]")
    val tableDir = args(0)
    val outDir = args(1)
    val rest = args.drop(2)
    def intAfter(flag: String, default: Int): Int = {
      val i = rest.indexOf(flag)
      if (i >= 0 && i + 1 < rest.length) rest(i + 1).toInt else default
    }
    val salted = rest.contains("--salted")
    val salt = intAfter("--salt", 16)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gi = rest.indexOf("--gen")
    if (gi >= 0) {
      val nConvs = rest(gi + 1).toInt
      val giant = rest(gi + 2).toInt
      val buckets = rest(gi + 3).toInt
      val nSnaps = rest(gi + 4).toInt
      val per = math.max(1, nConvs / nSnaps)
      var off = 0
      for (s <- 1 to nSnaps) {
        val n = if (s == nSnaps) math.max(0, nConvs - off)
                else math.min(per, math.max(0, nConvs - off))
        if (n > 0) {
          TranscriptsTable.appendSnapshot(spark, tableDir, s, off, n, giant, buckets)
          off += n
        }
      }
      println(s"[gen] wrote $nSnaps snapshot(s), $nConvs conversations under $tableDir")
    }

    val t0 = System.nanoTime()
    val processed = ExtractJob.run(spark,
      ExtractJob.Config(tableDir, outDir, salted = salted, saltBuckets = salt))
    val secs = (System.nanoTime() - t0) / 1e9
    val turns = processed.map(_._2).sum
    println(f"[extract] snapshots=${processed.size} turns=$turns elapsed=$secs%.2fs throughput=${turns / math.max(secs, 1e-9)}%.0f turns/s")
    spark.stop()
  }
}
