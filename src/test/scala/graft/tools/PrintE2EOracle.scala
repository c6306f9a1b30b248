package graft.tools

import graft.extract.Extract
import graft.gen.TranscriptGen

/** Recomputes the x_e2e_extract aggregate single-threaded from the pure
  * generator + extractor (no Spark) and prints it as the DuckDB VALUES
  * oracle — the numbers inlined in XQueries' oracle and pinned by
  * E2EOracleSpec. Run: sbt "Test/runMain graft.tools.PrintE2EOracle".
  */
object PrintE2EOracle {
  def rows(): Seq[(String, String, Long, Double)] = {
    val agg = scala.collection.mutable.Map.empty[(String, String), (Long, Double)]
    for (c <- 0 until 60; t <- 0 until TranscriptGen.convSize(c, 128)) {
      val tu = TranscriptGen.turn(c, t)
      val e = Extract.extractTurn(tu.conv_id, tu.turn_idx, tu.text)
      val k = (e.doc_type, e.status)
      val (n, s) = agg.getOrElse(k, (0L, 0.0))
      agg(k) = (n + 1, s + e.confidence)
    }
    agg.toSeq.sortBy { case ((d, st), _) => (d, st) }
      .map { case ((d, st), (n, s)) => (d, st, n, s) }
  }

  def main(args: Array[String]): Unit = {
    rows().foreach { case (d, st, n, s) =>
      // distance of the raw sum from the nearest 1e-4 rounding boundary —
      // if this is tiny, a distributed sum's reassociation error could
      // flip round(.,4) and the VALUES oracle would be unstable
      val scaled = s * 10000
      val boundaryDist = math.abs(scaled - math.rint(scaled) match {
        case _ => (scaled + 0.5) - math.floor(scaled + 0.5)
      })
      println(f"('$d', '$st', $n%d, ${math.rint(s * 10000) / 10000}%s)  -- raw=$s%.12f boundary_frac=${(scaled + 0.5) - math.floor(scaled + 0.5)}%.6f")
    }
  }
}
