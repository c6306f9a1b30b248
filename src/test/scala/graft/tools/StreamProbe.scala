package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingExtract

/** Diagnostic: drive the streaming pipeline over a real parquet file
  * source (readStream), not a MemoryStream.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.schemaInference", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("sp").toString
    graft.engine.TranscriptsTable.appendSnapshot(spark, s"$dir/t", 1, 0, 20, 32, 2)
    val src = spark.readStream
      .schema(graft.engine.TranscriptsTable.readAll(spark, s"$dir/t").schema)
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/t/snapshot=1")
    val extracted = StreamingExtract.extractStream(spark, src)
    val q = StreamingExtract.windowedQuality(extracted)
      .writeStream.format("memory").queryName("probe_out")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    spark.table("probe_out").orderBy("doc_type").show(20, truncate = false)
    println("PROBE_ROWS=" + spark.table("probe_out").count())
    // drive the watermark-bounded exact dedup over a file source that
    // REALLY contains duplicates: snapshot 2 regenerates the identical
    // conversations (same convOffset), so every key appears twice
    graft.engine.TranscriptsTable.appendSnapshot(spark, s"$dir/t", 2, 0, 20, 32, 2)
    // flatten both snapshots (identical content -> every key twice) into a
    // plain dir: the streaming file source insists on partition inference
    // over snapshot=/bucket= layouts
    val flat = s"$dir/flat"
    graft.engine.TranscriptsTable.readAll(spark, s"$dir/t")
      .write.mode("overwrite").parquet(flat)
    val dupSrc = spark.readStream
      .schema(graft.engine.TranscriptsTable.readAll(spark, s"$dir/t").schema)
      .parquet(flat)
    val q2 = StreamingExtract.dedupStream(dupSrc)
      .writeStream.format("memory").queryName("dedup_probe")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sp-ck").toString)
      .start()
    q2.processAllAvailable(); q2.stop()
    val unique = graft.engine.TranscriptsTable
      .readAll(spark, s"$dir/t").select("conv_id", "turn_idx").distinct().count()
    println("DEDUP_ROWS=" + spark.table("dedup_probe").count() +
      " UNIQUE_KEYS=" + unique)
    // SFT context assembly over the same file source: every assistant
    // turn must emit exactly one example
    val ctxSrc = spark.readStream
      .schema(graft.engine.TranscriptsTable.readAll(spark, s"$dir/t").schema)
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/t/snapshot=1")
    val q3 = StreamingExtract.contextWindows(spark, ctxSrc)
      .writeStream.format("memory").queryName("ctx_probe")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sp-ck2").toString)
      .start()
    q3.processAllAvailable(); q3.stop()
    val assistants = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/t/snapshot=1").filter("role = 'assistant'").count()
    println("CTX_ROWS=" + spark.table("ctx_probe").count() +
      " ASSISTANT_TURNS=" + assistants)
    spark.stop()
  }
}
