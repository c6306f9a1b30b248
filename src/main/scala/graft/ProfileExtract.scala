package graft

/** Dev microprofiler for the per-turn extract hot path: times each
  * component of [[graft.extract.Extract.extractTurn]] separately on the
  * deterministic generator corpus, single-threaded, so optimization work
  * targets the measured cost centers instead of guesses. Not part of the
  * bench contract; run with `sbt "runMain graft.ProfileExtract"`.
  */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toInt).getOrElse(3000)
    val corpus: Array[String] = (0 until convs).flatMap { c =>
      (0 until graft.gen.TranscriptGen.convSize(c, 64)).map { t =>
        graft.gen.TranscriptGen.turn(c, t).text
      }
    }.toArray
    System.err.println(s"corpus: ${corpus.length} turns, " +
      s"${corpus.map(_.length.toLong).sum / corpus.length} avg chars")

    import graft.extract.Extract._
    var sink = 0L
    def time(name: String)(f: String => Int): Unit = {
      // 2 warmup + 3 measured passes, report best
      val best = (1 to 5).map { pass =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < corpus.length) { sink += f(corpus(i)); i += 1 }
        (System.nanoTime() - t0) / 1e9
      }.drop(2).min
      System.err.println(f"$name%-22s ${best * 1e9 / corpus.length}%8.0f ns/turn  (${corpus.length / best / 1000}%6.0fk turns/s)")
    }

    time("extractTurn(full)")(t => extractTurn("c", 0, t).fields.size)
    time("extractText")(t => extractText(t).length)
    time("segment")(t => segment(t).size)
    time("classify")(t => classify(t).length)
    time("kvAnchors")(t => kvAnchors(t).size)
    time("facesheetBank")(t => facesheetBank(t).size)
    time("prescriptionBank")(t => prescriptionBank(t).size)
    time("agreementBank")(t => agreementBank(t).size)
    time("insuranceBank")(t => insuranceBank(t).size)
    time("detectSignature")(t => if (detectSignature(t)) 1 else 0)
    time("toLowerCase")(t => t.toLowerCase.length)
    time("split-lines")(t => t.split("\n", -1).length)
    if (sink == 42) println("")
  }
}
