package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: generate a bench transcripts table for manual worker
  * experiments. Usage:
  * sbt "Test/runMain graft.tools.TableGen <dir> <convs> <giant>"
  */
object TableGen {
  def main(args: Array[String]): Unit = {
    val Array(dir, convs, giant) = args.take(3)
    val buckets = if (args.length > 3) args(3).toInt else 32
    val rowGroup = if (args.length > 4) Some(args(4).toLong) else None
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.engine.TranscriptsTable.appendSnapshot(
      s, dir, 1, 0, convs.toInt, giant.toInt, buckets = buckets,
      rowGroupBytes = rowGroup)
    s.stop()
  }
}
