package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full extraction pipeline (salted repartition → secondary
    * sort → fused mapPartitions extract) over a small deterministic
    * synthetic transcripts batch. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val turns = spark.range(0, 40, 1, 4).as[Long]
      .mapPartitions(_.flatMap { c =>
        val ci = c.toInt
        (0 until graft.gen.TranscriptGen.convSize(ci, 64)).iterator
          .map(t => graft.gen.TranscriptGen.turn(ci, t))
      }).toDF()
    graft.engine.ExtractJob
      .extract(spark, turns, salted = true, saltBuckets = 8)
      .toDF()
      .select("conv_id", "turn_idx", "doc_type", "extracted_text", "fields",
        "signature_present", "confidence", "status")
  }
  /** The full catalog: operator-keyed queries + colocated DuckDB oracles. */
  private def catalog: Seq[(String, graft.queries.Q.Entry)] =
    graft.queries.CoreQueries.entries ++ graft.queries.DocQueries.entries ++
      graft.queries.PipelineQueries.entries ++ graft.queries.XQueries.entries ++
      graft.queries.OpQueries.entries ++ graft.queries.TranscriptQueries.entries ++
      graft.queries.SketchQueries.entries ++ graft.queries.SourceQueries.entries ++
      graft.queries.OlapQueries.entries ++ graft.queries.GraphQueries.entries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (n, e) => n -> e.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (n, e) if e.oracle.isDefined => n -> e.oracle.get }.toMap
}
