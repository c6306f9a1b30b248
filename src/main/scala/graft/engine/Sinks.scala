package graft.engine

import org.apache.spark.sql.DataFrame

/** Sink boundary (K1). The system of record is the snapshot-scoped
  * parquet results table (resume correctness depends on its overwrite
  * idempotence); a JDBC mirror is config-gated on top — the one sink a
  * reference user actually had (per-document INSERT into Postgres,
  * finalcodes/Facesheet.py:195-196). Unlike the reference's
  * autocommit-per-row, rows go out in executor-side batched inserts
  * (`batchsize`), partition-parallel — the 100 TB-safe shape for a
  * relational sink.
  */
object Sinks {

  /** JDBC mirror config. DELIVERY CONTRACT: the mirror is append-only
    * AT-LEAST-ONCE — a crash-resume re-appends the whole snapshot, and a
    * partially failed executor write can leave partial duplicates within
    * one attempt. Every consumer MUST dedupe on
    * (snapshot_id, conv_id, turn_idx) — e.g. load via a staging table +
    * `MERGE`/`INSERT ... ON CONFLICT DO NOTHING` on that key, or read
    * through a view with `row_number() over (partition by snapshot_id,
    * conv_id, turn_idx) = 1`. Exactly-once lives in the parquet system of
    * record (snapshot overwrite + commit marker), not here.
    */
  final case class JdbcConfig(url: String, table: String,
      options: Map[String, String] = Map.empty)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K6 debug text dump — the reference writes each document's full text
    * to `full_pdf_text.txt` for manual review
    * (MiscTestingScripts/Lauren_RX__JPG_Reader.py:433-435, one file,
    * overwritten per document). The Spark-native shape: one partitioned
    * text dump per run, `<id>\t<escaped-text>` lines, so the dump stays
    * greppable AND distributed (no driver collect, no single-file
    * bottleneck at 100 TB). Escaping is lossless: backslash first, then
    * \n, \r, \t — so a literal "\n" in the source text dumps as "\\n"
    * and is distinguishable from an escaped newline, and tabs cannot
    * break the two-field split. Debug-only: never on the production
    * path.
    */
  def debugTextDump(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    import org.apache.spark.sql.functions._
    val escaped = Seq("\n" -> "n", "\r" -> "r", "\t" -> "t")
      .foldLeft(regexp_replace(col(textCol), "\\\\", "\\\\\\\\")) {
        case (c, (ch, name)) => regexp_replace(c, ch, "\\\\" + name)
      }
    df.select(concat_ws("\t", col(idCol).cast("string"), escaped).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Inverse of [[debugTextDump]]'s escaping, for tooling that wants the
    * original text back from a dump line's second field.
    */
  def unescapeDumpText(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case _    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  def mirrorToJdbc(df: DataFrame, cfg: JdbcConfig): Unit =
    df.write.mode("append")
      .format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("batchsize", 1000)
      .option("isolationLevel", "READ_COMMITTED")
      .options(cfg.options)
      .save()
}
