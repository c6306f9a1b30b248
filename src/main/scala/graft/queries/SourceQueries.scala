package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink FORMAT coverage beyond parquet: JSONL and CSV, the two
  * interchange formats a corpus actually arrives in (crawler dumps are
  * JSONL; tabular exports are CSV). Each entry round-trips the documents
  * table through a DISTRIBUTED write + schema-explicit read of the
  * format, then reproduces a content-bearing projection; the oracle
  * reads the original parquet directly — so a hash match proves the
  * round-trip was lossless (serializer, escaping, schema application,
  * reader partitioning all correct), not merely that the files parse.
  *
  * Scale notes: both writes/reads are executor-side and partition-
  * parallel (one file per task, no driver collect); the JSONL arm
  * carries the full `text` payload through JSON escaping (newlines,
  * quotes, unicode), the CSV arm carries scalars (CSV is the wrong
  * carrier for multi-line text — that limit is the point of keeping
  * both arms).
  */
object SourceQueries {
  import Q._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  val entries: Seq[(String, Entry)] = Seq(

    // JSONL round-trip: full text payload through JSON escaping.
    "src_jsonl_roundtrip" -> Entry(
      (s, d) => {
        import s.implicits._
        val out = tmp("graft-srcrt-jsonl")
        rd(s, d, "documents")
          .select($"doc_id", $"source", $"n_chars", $"text")
          .write.mode("overwrite").json(out)
        s.read
          .schema("doc_id BIGINT, source STRING, n_chars BIGINT, text STRING")
          .json(out)
          .select($"doc_id", $"source", $"n_chars", md5($"text").as("h"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, source, n_chars, md5(text) AS h
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // CSV round-trip: scalar projection (id, source, length, content
    // hash) through the CSV writer/reader with explicit schema.
    "src_csv_roundtrip" -> Entry(
      (s, d) => {
        import s.implicits._
        val out = tmp("graft-srcrt-csv")
        rd(s, d, "documents")
          .select($"doc_id", $"source", $"n_chars", md5($"text").as("h"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read
          .schema("doc_id BIGINT, source STRING, n_chars BIGINT, h STRING")
          .option("header", "true")
          .csv(out)
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, source, n_chars, md5(text) AS h
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
