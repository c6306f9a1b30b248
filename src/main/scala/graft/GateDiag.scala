package graft

import org.apache.spark.sql.SparkSession
import graft.engine.TranscriptsTable

/** Dev diagnostic for the scaling-gate share assignment (not part of the
  * bench contract): builds the exact bench table (`Bench.Defaults` shape)
  * into `args(0)` and prints per-bucket byte sizes, the byte sums of the
  * current `bucket % 4 == q` share groups, and the sums of a
  * longest-processing-time (LPT) byte-balanced grouping — quantifying how
  * much of the gate's straggler share is static-assignment imbalance
  * rather than engine behavior. Run:
  * `sbt "runMain graft.GateDiag /tmp/gatediag"`.
  */
object GateDiag {
  def main(args: Array[String]): Unit = {
    val tableDir = args.headOption.getOrElse("/tmp/gatediag/table")
    val convs = Bench.Defaults.BenchConvs
    val giant = Bench.Defaults.Giant
    val cpus = Bench.Defaults.Cpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-gate-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tableDir))) {
      TranscriptsTable.appendSnapshot(spark, tableDir, 1, 0, convs, giant,
        buckets = cpus, rowGroupBytes = Some(Bench.Defaults.RowGroupBytes))
      System.err.println(s"[gatediag] table built at $tableDir")
    } else System.err.println(s"[gatediag] reusing table at $tableDir")
    spark.stop()

    val snap = TranscriptsTable.readManifest(tableDir).last
    def dirBytes(d: java.io.File): Long =
      d.listFiles().filter(_.isFile).map(_.length).sum
    val buckets = new java.io.File(snap.path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(f => (f.getName.stripPrefix("bucket=").toInt, dirBytes(f)))
      .sortBy(_._1)
    val total = buckets.map(_._2).sum.toDouble
    buckets.foreach { case (b, sz) =>
      System.err.println(f"[gatediag] bucket=$b%2d ${sz / 1e6}%8.1f MB (${100 * sz / total}%5.2f%%)")
    }
    val nShares = 4
    val mod = (0 until nShares).map(q =>
      buckets.filter(_._1 % nShares == q).map(_._2).sum)
    System.err.println(
      "[gatediag] mod-4 share MB: " + mod.map(b => f"${b / 1e6}%.1f").mkString(" / ") +
        f" -> max/ideal = ${mod.max / (total / nShares)}%.4f")
    // LPT: sort buckets descending, assign each to the lightest share
    val lpt = Array.fill(nShares)(0L)
    val lptGroups = Array.fill(nShares)(List.empty[Int])
    buckets.sortBy(-_._2).foreach { case (b, sz) =>
      val q = lpt.zipWithIndex.minBy(_._1)._2
      lpt(q) += sz; lptGroups(q) ::= b
    }
    System.err.println(
      "[gatediag] LPT share MB:  " + lpt.map(b => f"${b / 1e6}%.1f").mkString(" / ") +
        f" -> max/ideal = ${lpt.max / (total / nShares)}%.4f")
    lptGroups.zipWithIndex.foreach { case (g, q) =>
      System.err.println(s"[gatediag] LPT share $q buckets: ${g.sorted.mkString(",")}")
    }
  }
}
