package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.TextFunctions.{nfcNormalize, stripAccents}

/** NFC normalization and accent folding: parity with java.text.Normalizer
  * ground truth on decomposed/precomposed/singleton/ASCII inputs, null
  * propagation, and whole-stage codegen residency.
  */
class UnicodeExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("unicode-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("nfc: decomposed composes, precomposed unchanged, singleton folds, ascii untouched") {
    import spark.implicits._
    val rows = Seq(
      "cafe\u0301",          // e + U+0301 -> U+00E9
      "caf\u00e9",           // already NFC
      "\u212Bngstr\u00f6m",  // U+212B singleton -> U+00C5
      "plain ascii")
    val out = rows.toDF("t").select(nfcNormalize($"t")).as[String].collect()
    assert(out(0) == "caf\u00e9")
    assert(out(1) == "caf\u00e9")
    assert(out(2) == "\u00c5ngstr\u00f6m")
    assert(out(3) == "plain ascii")
    // length-preserving vs length-shrinking changes both flagged
    assert(out(0).length == rows(0).length - 1)
    assert(out(2).length == rows(2).length)
  }

  test("strip_accents folds the latin-1 accent block; idempotent; ascii by-reference") {
    import spark.implicits._
    val rows = Seq("café", "naïve", "Señor Zürich",
      "résumé crème", "café", "plain")
    val out = rows.toDF("t").select(stripAccents($"t")).as[String].collect()
    assert(out.toSeq == Seq("cafe", "naive", "Senor Zurich",
      "resume creme", "cafe", "plain"))
    // idempotent: folding a folded string is the identity
    val twice = rows.toDF("t")
      .select(stripAccents(stripAccents($"t"))).as[String].collect()
    assert(twice.toSeq == out.toSeq)
  }

  test("null in -> null out") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("caf\u00e9")).toDF("t")
    val got = df.select(nfcNormalize($"t"), stripAccents($"t")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(!got(1).isNullAt(0) && !got(1).isNullAt(1))
  }

  test("both projections stay inside whole-stage codegen") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(nfcNormalize($"text").as("n"), stripAccents($"text").as("f"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("),
      "unicode exprs fell out of whole-stage codegen:\n" + p.take(800))
  }
}
