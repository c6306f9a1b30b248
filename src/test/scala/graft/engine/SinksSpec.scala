package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("sinks-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("jdbc mirror is wired through Spark's JDBC source (no driver in this container)") {
    import spark.implicits._
    val df = Seq(("conv-0", 0, "ok")).toDF("conv_id", "turn_idx", "status")
    // zero-egress container ships no JDBC driver: reaching the
    // DriverManager resolution error proves the sink path goes through
    // the real JDBC write (options applied, save() invoked) rather than
    // being dead config
    val e = intercept[Exception] {
      Sinks.mirrorToJdbc(df,
        Sinks.JdbcConfig("jdbc:postgresql://localhost:5432/graft", "results"))
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).toVector
    val msgs = chain.map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    // accept either failure shape: no driver on the classpath (this
    // container) OR a connection failure if a driver ever ships — both
    // prove the config-gated path reaches the real JDBC source
    assert(msgs.toLowerCase.contains("driver") ||
      msgs.toLowerCase.contains("connection") ||
      chain.exists(_.isInstanceOf[java.sql.SQLException]),
      s"unexpected failure: $msgs")
  }

  test("staged mirror: crash-replay overwrites the snapshot's staging table, no duplicates") {
    import spark.implicits._
    // in-memory table store honoring append/overwrite — the writer
    // indirection exists exactly because no JDBC driver ships here; the
    // orchestration under test (staging-table naming, overwrite-on-
    // replay) is the real code path
    val tables = scala.collection.mutable.Map.empty[String, Vector[String]]
    val writer: Sinks.TableWriter = (df, table, overwrite) => {
      val rows = df.collect().map(_.toString).toVector
      tables(table) =
        if (overwrite) rows else tables.getOrElse(table, Vector.empty) ++ rows
    }
    val cfg = Sinks.JdbcConfig("jdbc:postgresql://h/db", "results", staged = true)
    val snap3 = Seq(("c0", 0, "ok"), ("c0", 1, "ok"))
      .toDF("conv_id", "turn_idx", "status")
    val snap4 = Seq(("c1", 0, "ok")).toDF("conv_id", "turn_idx", "status")
    Sinks.mirrorToJdbcStaged(snap3, cfg, 3, Some(writer))
    Sinks.mirrorToJdbcStaged(snap4, cfg, 4, Some(writer))
    // crash before the commit marker -> the whole snapshot replays: the
    // staging write must OVERWRITE, leaving each row exactly once
    Sinks.mirrorToJdbcStaged(snap3, cfg, 3, Some(writer))
    assert(tables.keySet == Set("results_snap_3", "results_snap_4"))
    assert(tables("results_snap_3").size == 2)
    assert(tables("results_snap_4").size == 1)
    // contrast: an append-mode replay WOULD duplicate — the documented
    // reason the default (unstaged) contract demands consumer-side dedup
    val appendWriter: Sinks.TableWriter = (df, table, _) => {
      val rows = df.collect().map(_.toString).toVector
      tables(table) = tables.getOrElse(table, Vector.empty) ++ rows
    }
    Sinks.mirrorToJdbcStaged(snap3, cfg, 5, Some(appendWriter))
    Sinks.mirrorToJdbcStaged(snap3, cfg, 5, Some(appendWriter))
    assert(tables("results_snap_5").size == 4)
  }

  test("K6 debug text dump: distributed, losslessly escaped, round-trippable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("k6-dump").toString
    // adversarial payloads: newline, literal backslash-n (must stay
    // distinguishable from an escaped newline), tab (would break the
    // two-field split), carriage return (would corrupt lines)
    val texts = Map(
      7L -> "line one\nline two",
      8L -> "plain",
      9L -> "literal \\n backslash",
      10L -> "tab\there\rcr")
    val df = texts.toSeq.toDF("id", "text")
    Sinks.debugTextDump(df, "id", "text", s"$dir/out")
    val lines = spark.read.text(s"$dir/out").as[String].collect().sorted
    assert(lines.toSeq == Seq(
      "10\ttab\\there\\rcr",
      "7\tline one\\nline two",
      "8\tplain",
      "9\tliteral \\\\n backslash"))
    // every line splits into exactly two fields and unescapes to the
    // original text — the round-trip the dump exists for
    for (line <- lines) {
      val Array(id, esc) = line.split("\t", -1)
      assert(Sinks.unescapeDumpText(esc) == texts(id.toLong))
    }
    // overwrite semantics: a rerun replaces, never appends
    Sinks.debugTextDump(df.filter($"id" === 7), "id", "text", s"$dir/out")
    assert(spark.read.text(s"$dir/out").count() == 1)
  }
}
