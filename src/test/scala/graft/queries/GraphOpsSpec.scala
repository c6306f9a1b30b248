package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** GraphOps.connectedComponents on constructed graphs whose closures are
  * known by hand; the distributed fixpoint must reproduce them exactly.
  * The catalog entry dd_cluster_cc additionally gates the full chain
  * (LSH candidate edges -> components) against a DuckDB recursive CTE.
  */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graphops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def comps(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val v = vertices.toDF("id")
    val e = edges.toDF("id_a", "id_b")
    GraphOps.connectedComponents(v, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("paths, triangles, isolated vertices and direction-reversal") {
    // path 1-2-3 (label must flow 2 hops), isolated 4, triangle 5-6-7,
    // and an edge given high-to-low (8 <- 9) to check symmetry
    val got = comps(
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
      Seq((2L, 3L), (1L, 2L), (5L, 6L), (6L, 7L), (5L, 7L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("long chain converges to one component (multi-round propagation)") {
    val n = 12L
    val got = comps((1L to n).toSeq, (1L until n).map(i => (i + 1, i)))
    assert(got == (1L to n).map(_ -> 1L).toMap)
  }

  test("no edges: every vertex is its own component") {
    val got = comps(Seq(10L, 20L), Seq.empty)
    assert(got == Map(10L -> 10L, 20L -> 20L))
  }

  test("vertices absent from the edge list keep their own label") {
    // edges mention only 1-2; vertex 3 must still appear in the output
    val got = comps(Seq(1L, 2L, 3L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
