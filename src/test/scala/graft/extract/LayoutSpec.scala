package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Extract.{PosSpan, tableCells}

/** Table-cell alignment from positioned layout spans (lt_table_cells's
  * core function) — grid recovery under jitter, ragged tables, and the
  * clustering boundary semantics.
  */
class LayoutSpec extends AnyFunSuite {

  private def grid(nr: Int, nc: Int, jitter: (Int, Int) => (Double, Double),
      drop: (Int, Int) => Boolean = (_, _) => false): Seq[PosSpan] =
    for {
      r <- 0 until nr
      c <- 0 until nc
      if !drop(r, c)
    } yield {
      val (jx, jy) = jitter(r, c)
      PosSpan(0.1 + c * 0.25 + jx, 0.1 + r * 0.08 + jy, s"c$r$c")
    }

  test("clean grid reconstructs exactly") {
    val cells = tableCells(grid(3, 3, (_, _) => (0.0, 0.0)))
    assert(cells.size === 9)
    assert(cells === (for (r <- 0 until 3; c <- 0 until 3)
      yield (r, c, s"c$r$c")))
  }

  test("sub-gap jitter still clusters to the true grid") {
    val cells = tableCells(grid(4, 3,
      (r, c) => (((r * 3 + c) % 5) * 0.003, ((r + c * 2) % 5) * 0.003)))
    assert(cells.map(t => (t._1, t._2)).toSet ===
      (for (r <- 0 until 4; c <- 0 until 3) yield (r, c)).toSet)
    cells.foreach { case (r, c, t) => assert(t === s"c$r$c") }
  }

  test("missing cells do not shift their row-mates' columns") {
    // drop the middle column's cell in row 1: row 1 keeps columns 0 and 2
    val cells = tableCells(grid(2, 3, (_, _) => (0.0, 0.0),
      drop = (r, c) => r == 1 && c == 1))
    val row1 = cells.filter(_._1 == 1)
    assert(row1.map(_._2) === Seq(0, 2))
    assert(row1.map(_._3) === Seq("c10", "c12"))
  }

  test("a fully dropped row disappears and later row ids shift") {
    val cells = tableCells(grid(3, 2, (_, _) => (0.0, 0.0),
      drop = (r, _) => r == 1))
    // original rows 0 and 2 become rows 0 and 1
    assert(cells === Seq((0, 0, "c00"), (0, 1, "c01"),
      (1, 0, "c20"), (1, 1, "c21")))
  }

  test("gap exactly at the threshold stays in the same cluster (strict >)") {
    // 0.12 - 0.10 and 0.15 - 0.10 evaluate fractionally BELOW the
    // rowGap/colGap doubles in IEEE arithmetic — at the threshold, not
    // past it (constructing via 0.10 + gap lands fractionally ABOVE)
    val spans = Seq(PosSpan(0.10, 0.10, "a"), PosSpan(0.15, 0.12, "b"))
    val cells = tableCells(spans)
    assert(cells.map(_._1).distinct === Seq(0))
    assert(cells.map(_._2).distinct === Seq(0))
  }

  test("empty input yields empty output") {
    assert(tableCells(Seq.empty) === Seq.empty)
  }

  test("single-column list degenerates to one row per span") {
    val spans = (0 until 5).map(i => PosSpan(0.1, 0.1 + i * 0.1, s"line$i"))
    val cells = tableCells(spans)
    assert(cells.map(_._1) === (0 until 5))
    assert(cells.map(_._2).distinct === Seq(0))
  }

  test("reading order: two columns read column-major, not y-interleaved") {
    // two columns whose lines ALTERNATE in y — naive y-order interleaves
    // L0 R0 L1 R1…; reading order must finish the left column first
    val spans = (0 until 3).flatMap(l => Seq(
      PosSpan(0.1 + l * 0.002, 0.1 + l * 0.1, s"L$l"),
      PosSpan(0.6 + l * 0.002, 0.15 + l * 0.1, s"R$l")))
    val ord = graft.extract.Extract.readingOrder(spans)
    assert(ord.map(_._2) === Seq("L0", "L1", "L2", "R0", "R1", "R2"))
    assert(ord.map(_._1) === (0 until 6))
  }

  test("reading order: intra-column jitter below the gutter stays one column") {
    val spans = (0 until 4).map(l => PosSpan(0.1 + (l % 2) * 0.05, l * 0.1, s"l$l"))
    assert(graft.extract.Extract.readingOrder(spans).map(_._2) ===
      Seq("l0", "l1", "l2", "l3"))
    assert(graft.extract.Extract.readingOrder(Seq.empty) === Seq.empty)
  }

  import graft.extract.Extract.mergeSpans

  test("mergeSpans: overlap chain and contained span collapse to one interval") {
    assert(mergeSpans(Seq((10, 20), (12, 14), (15, 35))) === Seq((10, 35, 3)))
  }

  test("mergeSpans: touching spans merge (end == next start)") {
    assert(mergeSpans(Seq((5, 10), (10, 15))) === Seq((5, 15, 2)))
  }

  test("mergeSpans: a one-unit gap keeps spans disjoint") {
    assert(mergeSpans(Seq((5, 10), (11, 15))) ===
      Seq((5, 10, 1), (11, 15, 1)))
  }

  test("mergeSpans: unsorted input is sorted before sweeping") {
    assert(mergeSpans(Seq((50, 60), (10, 20), (58, 70), (12, 14))) ===
      Seq((10, 20, 2), (50, 70, 2)))
  }

  test("mergeSpans: duplicate spans count as distinct sources") {
    assert(mergeSpans(Seq((3, 7), (3, 7))) === Seq((3, 7, 2)))
  }

  test("mergeSpans: a span containing everything absorbs all followers") {
    assert(mergeSpans(Seq((1, 100), (2, 3), (4, 5), (98, 99))) ===
      Seq((1, 100, 4)))
  }

  test("mergeSpans: empty and singleton inputs") {
    assert(mergeSpans(Nil) === Seq.empty)
    assert(mergeSpans(Seq((7, 8))) === Seq((7, 8, 1)))
  }
}
