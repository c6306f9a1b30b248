package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extract

/** Internal row types carrying lineage columns alongside the semantic
  * payload. `input_file` is captured at scan time (it does not survive a
  * shuffle as a metadata function) and `partition_id` at extract time.
  *
  * TurnSlim is the pruned hot-path row: the extractor is a function of
  * (conv_id, turn_idx, text) only, so role/tool/ts are projected away
  * BEFORE the shuffle — less shuffle I/O and no per-row Timestamp
  * materialization in the deserializer.
  */
final case class TurnSlim(
    conv_id: String, turn_idx: Int, text: String, input_file: String)

/** Flat sink-boundary row: `sections`/`fields`/`field_src` are canonical
  * JSON strings (reference-faithful — the reference's sinks store JSON
  * text — and ~20x cheaper to write than nested parquet groups; recover
  * typed columns via `from_json` with
  * [[ExtractJob.SectionsSchema]]/[[ExtractJob.FieldsSchema]]).
  * `field_src` carries per-field provenance (anchor | pattern), keyed
  * identically to `fields`.
  */
final case class ResultRow(
    conv_id: String, turn_idx: Int, doc_type: String, extracted_text: String,
    sections: String, fields: String, field_src: String,
    signature_present: Boolean, confidence: Double, status: String,
    partition_id: Int, input_file: String)

/** The extraction pipeline (SURVEY.md §7): scan → [optional salted
  * repartition] → sortWithinPartitions(conv_id, turn_idx) → fused
  * mapPartitions extract → results + per-partition lineage, committed per
  * snapshot for checkpoint-resume.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - The extract stage is NARROW: when the input is already bucketed by
  *    conv_id (our table layout), `salted = false` runs scan→extract→write
  *    with ZERO shuffles. `salted = true` adds exactly one shuffle keyed on
  *    (conv_id, pmod(hash(turn_idx), salt)) — the salt splits a skewed
  *    conversation (one conv with 10^6 turns) across `salt` tasks instead
  *    of serializing one straggler.
  *  - Classifier/regex state is compiled once per JVM (object init), not
  *    per row — the mapPartitions batching the north rule asks for.
  *  - Lineage is a per-partition rollup of the already-written results
  *    (column-pruned scan of status only) — a KB-scale shuffle.
  */
object ExtractJob {

  /** Schemas for recovering typed columns from the JSON sink form:
    * `from_json(col("sections"), SectionsSchema)` /
    * `from_json(col("fields"), FieldsSchema)` — codegen'd Catalyst parse.
    */
  val SectionsSchema: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL(
      "array<struct<header:string, start:int, len:int>>")
  val FieldsSchema: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")

  final case class Config(
      tableDir: String,
      outDir: String,
      runId: String = "run-0",
      salted: Boolean = false,
      saltBuckets: Int = 16,
      /** optional JDBC mirror of the results (K1) — see [[Sinks]] */
      jdbc: Option[Sinks.JdbcConfig] = None)

  /** Core transform: Dataset-native, pure, partition-count independent.
    *
    * @param presorted the input is our bucketed table read directly (rows
    *        of each conversation are contiguous and sorted within every
    *        file) — skip the secondary sort; each row-copy avoided matters
    *        at 100 TB. Only valid with `salted = false`.
    */
  def extract(spark: SparkSession, turns: DataFrame, salted: Boolean,
      saltBuckets: Int, presorted: Boolean = false): Dataset[ResultRow] = {
    import spark.implicits._
    val withFile = turns
      .select(col("conv_id"), col("turn_idx"), col("text"),
        coalesce(input_file_name(), lit("")).as("input_file"))
    val parted =
      if (salted)
        withFile.repartition($"conv_id", pmod(hash($"turn_idx"), lit(saltBuckets)))
      else withFile
    val ordered =
      if (presorted && !salted) parted
      else parted.sortWithinPartitions($"conv_id", $"turn_idx")
    ordered
      .as[TurnSlim]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map { t =>
          val e = Extract.extractTurn(t.conv_id, t.turn_idx, t.text)
          ResultRow(e.conv_id, e.turn_idx, e.doc_type, e.extracted_text,
            Extract.sectionsToJson(e.sections), Extract.fieldsToJson(e.fields),
            Extract.fieldsToJson(e.field_src),
            e.signature_present, e.confidence, e.status, pid, t.input_file)
        }
      }
  }

  /** Per-partition lineage rows (north rule): partition id, input files,
    * turn/ok/fail counts. Computed from the written results so the counts
    * describe exactly what was durably committed.
    */
  def lineage(spark: SparkSession, results: DataFrame, runId: String,
      snapshotId: Long): DataFrame =
    results
      .groupBy(col("partition_id"))
      .agg(
        sort_array(collect_set(col("input_file"))).as("input_files"),
        count(lit(1)).as("turn_count"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("ok_count"),
        sum(when(col("status") =!= "ok", 1L).otherwise(0L)).as("fail_count"))
      .withColumn("run_id", lit(runId))
      .withColumn("snapshot_id", lit(snapshotId))
      .select("run_id", "snapshot_id", "partition_id", "input_files",
        "turn_count", "ok_count", "fail_count")

  def commitMarker(outDir: String, snapshotId: Long): java.nio.file.Path =
    Paths.get(s"$outDir/_commits/snapshot-$snapshotId.done")

  def committedSnapshots(outDir: String): Set[Long] = {
    val dir = Paths.get(s"$outDir/_commits")
    if (!Files.exists(dir)) Set.empty
    else {
      val re = """snapshot-(\d+)\.done""".r
      import scala.jdk.CollectionConverters._
      val stream = Files.list(dir)
      try
        stream.iterator().asScala.flatMap { p =>
          re.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong)
        }.toSet
      finally stream.close()
    }
  }

  /** Process one snapshot: extract → write results → write lineage →
    * atomic commit marker. Output paths are snapshot-scoped and written
    * with overwrite, so a retry after a crash before the marker is
    * idempotent (exactly-once per snapshot without ACID tables).
    */
  def runSnapshot(spark: SparkSession, cfg: Config,
      snap: TranscriptsTable.SnapshotRef): Long = {
    val turns = TranscriptsTable.readSnapshot(spark, snap)
    // the snapshot read IS the bucketed sorted layout -> presorted path
    // (zero shuffle, no secondary-sort row copy) unless salting is on
    val results = extract(spark, turns, cfg.salted, cfg.saltBuckets,
      presorted = !cfg.salted)
    val resPath = s"${cfg.outDir}/results/snapshot=${snap.id}"
    Sinks.writeParquet(results.toDF(), resPath)
    val written = spark.read.parquet(resPath)
    // Default mirror is AT-LEAST-ONCE: a crash between this append and
    // the commit marker re-runs the snapshot and re-appends. Rows carry
    // snapshot_id so a consumer (or a MERGE-capable load job) can dedupe
    // on (snapshot_id, conv_id, turn_idx); plain JDBC append cannot be
    // exactly-once without sink-side transactions. The parquet system of
    // record stays exactly-once via overwrite + marker. `staged` mirrors
    // into a per-snapshot staging table with overwrite-on-replay instead,
    // making consumer-side dedup optional (Sinks.mirrorToJdbcStaged).
    cfg.jdbc.foreach { j =>
      val withSnap = written.withColumn("snapshot_id",
        org.apache.spark.sql.functions.lit(snap.id))
      if (j.staged) Sinks.mirrorToJdbcStaged(withSnap, j, snap.id)
      else Sinks.mirrorToJdbc(withSnap, j)
    }
    val lin = lineage(spark, written, cfg.runId, snap.id)
    lin.write.mode("overwrite").parquet(s"${cfg.outDir}/lineage/snapshot=${snap.id}")
    // turn count from the (tiny) lineage table, not a second results scan;
    // coalesce: sum over an empty snapshot's lineage is null, not 0
    val n = spark.read.parquet(s"${cfg.outDir}/lineage/snapshot=${snap.id}")
      .agg(coalesce(sum("turn_count"), lit(0L))).head().getLong(0)
    // temp+rename commit record — the resume checkpoint
    val marker = commitMarker(cfg.outDir, snap.id)
    Files.createDirectories(marker.getParent)
    val tmp = Paths.get(marker.toString + ".tmp")
    Files.writeString(tmp, s"""{"snapshot":${snap.id},"turns":$n}""")
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    n
  }

  /** Plan = registered snapshots minus committed ones; process the delta.
    * Re-running after success is a no-op; re-running after a mid-job crash
    * re-does only uncommitted snapshots.
    */
  def run(spark: SparkSession, cfg: Config): Seq[(Long, Long)] = {
    val all = TranscriptsTable.readManifest(cfg.tableDir)
    val done = committedSnapshots(cfg.outDir)
    val pending = all.filterNot(s => done.contains(s.id)).sortBy(_.id)
    pending.map(s => s.id -> runSnapshot(spark, cfg, s))
  }
}
