package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.engine.{ExtractJob, TranscriptsTable}

/** Diagnostic: per-stage task counts and times for the extraction job.
  * Usage: sbt "Test/runMain graft.tools.StageProbe [cores]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.buffer.pageSize", sys.env.getOrElse("PROBE_PAGE", "4m"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("PROBE_CODEC", "snappy"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.taskMetrics
        println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0}%7.2fs " +
          f"cpuSum=${ms.executorCpuTime / 1e9}%8.2fs runSum=${ms.executorRunTime / 1000.0}%8.2fs " +
          f"ser=${ms.resultSerializationTime / 1000.0}%5.2fs gc=${ms.jvmGCTime / 1000.0}%5.2fs " +
          si.name.take(60))
      }
    })
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    val t0 = System.nanoTime()
    TranscriptsTable.appendSnapshot(spark, s"$dir/t", 1, 0, 50000, 25000, cores)
    println(f"GEN ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val turns = TranscriptsTable.readAll(spark, s"$dir/t")
    val mode = sys.env.getOrElse("PROBE_MODE", "salted")
    val t1 = System.nanoTime()
    mode match {
      case "salted" =>
        ExtractJob.extract(spark, turns, salted = true, 16)
          .write.mode("overwrite").parquet(s"$dir/out")
      case "unsalted" =>
        ExtractJob.extract(spark, turns, salted = false, 16)
          .write.mode("overwrite").parquet(s"$dir/out")
      case "rawmap" => // no shuffle, no sort: narrow scan->extract->write
        import spark.implicits._
        import org.apache.spark.sql.functions._
        turns.select(col("conv_id"), col("turn_idx"), col("text"),
            lit("").as("input_file"))
          .as[graft.engine.TurnSlim]
          .mapPartitions(_.map { t =>
            graft.extract.Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
          })
          .write.mode("overwrite").parquet(s"$dir/out")
      case "mapcount" => // no parquet write either
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val n = turns.select(col("conv_id"), col("turn_idx"), col("text"),
            lit("").as("input_file"))
          .as[graft.engine.TurnSlim]
          .mapPartitions(_.map { t =>
            graft.extract.Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
          })
          .rdd.count()
        println(s"mapcount n=$n")
    }
    println(f"EXTRACT($mode) ${(System.nanoTime() - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
