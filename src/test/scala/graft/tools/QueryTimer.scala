package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: time individual catalog queries against an sf dir (Bench's
  * session config, warmup pass included).
  * Usage: sbt "Test/runMain graft.tools.QueryTimer <sfDir> <q1> [q2 ...]"
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("query-timer")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("p7_md5_meta")(s, sfDir).foreach(_ => ()) // warmup
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(s, sfDir).foreach(_ => ())
      println(f"[timer] $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    s.stop()
  }
}
