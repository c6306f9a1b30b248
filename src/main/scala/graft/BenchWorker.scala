package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{ExtractJob, TranscriptsTable}

/** One pinned benchmark trial in its own JVM (launched by [[Bench]] under
  * `taskset`): read the transcripts table, run the salted extract job
  * end-to-end (results + lineage), print `BENCH_SECONDS=<s>`.
  *
  * A separate pinned process is the honest stand-in for an N-core
  * executor: with everything in one JVM, a `local[8]` stage would still
  * borrow the other 24 cores for GC/IO threads and overstate small-N
  * throughput (understating scaling efficiency).
  */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, outDir, cores) = args.take(3)
    val salted = args.length < 4 || args(3) == "salted"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-worker-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT warm-up on a slice of the table, untimed
    val warm = TranscriptsTable.readManifest(tableDir).take(1)
    warm.foreach { s =>
      ExtractJob.extract(spark,
        TranscriptsTable.readSnapshot(spark, s).limit(50000), salted, 16,
        presorted = !salted)
        .write.mode("overwrite").parquet(s"$outDir-warm")
    }
    val turns = TranscriptsTable.readAll(spark, tableDir)
    val t0 = System.nanoTime()
    val results = ExtractJob.extract(spark, turns, salted, 16,
      presorted = !salted)
    results.write.mode("overwrite").parquet(outDir)
    val written = spark.read.parquet(outDir)
    ExtractJob.lineage(spark, written, "bench", 1)
      .write.mode("overwrite").parquet(s"$outDir-lineage")
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"BENCH_SECONDS=$secs%.3f")
    spark.stop()
  }
}
