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

  final case class JdbcConfig(url: String, table: String,
      options: Map[String, String] = Map.empty)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

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
