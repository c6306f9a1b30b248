package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiling runner (dev tooling, not part of the driver
  * contract): `runMain graft.One <queryName> [sfDir] [reps]` times one
  * catalog entry in isolation (after one discarded warmup of a cheap
  * query), printing per-rep seconds and the formatted physical plan.
  * Lets a slow catalog entry be iterated on without a full Bench pass.
  */
object One {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.One <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val s = SparkSession.builder()
      .master("local[32]")
      .appName(s"graft-one-$name")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      SparkEntry.queries("p7_md5_meta")(s, sfDir).foreach(_ => ()) // warmup
      var df = fn(s, sfDir)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        df.foreach(_ => ())
        println(f"[one] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        if (r < reps) df = fn(s, sfDir) // rebuild: include any eager model step
      }
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    } finally s.stop()
  }
}
