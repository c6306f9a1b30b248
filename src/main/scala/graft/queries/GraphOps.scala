package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline.
  *
  * The banded-LSH candidate join (PipelineQueries.bandedPairs) emits
  * verified near-dup PAIRS; production dedup needs the transitive
  * closure — "keep one document per near-dup CLUSTER" — because near-dup
  * is not transitive pairwise (A~B, B~C with A!~C still form one cluster
  * to deduplicate). The reference has no analog (its dedup is per-answer
  * set membership); this is the scale-out operation a 100 TB
  * training-data pipeline runs after candidate verification.
  */
object GraphOps {

  /** Connected components by min-label propagation.
    *
    * `vertices` must have column (id); `edges` columns (id_a, id_b).
    * Returns (id, comp) where comp = the minimum vertex id reachable from
    * id (a canonical, deterministic component representative).
    *
    * Each round is ONE shuffle join + ONE aggregation: every vertex takes
    * the min of its own label and its neighbors' labels; a round where no
    * label changes ends the loop. Rounds needed = the graph diameter.
    * That is the right trade for near-dup graphs: components are
    * template cliques of small diameter (1-2 band hops), so 2-4 rounds
    * close them, and each round is skew-safe (the per-key fan-in of the
    * propagate join is a vertex's degree, already bounded upstream by the
    * band-bucket cap). For long-path graphs (diameter ~ n) prefer the
    * alternating large-star/small-star algorithm (O(log n) rounds,
    * Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * not needed here and more shuffles per round.
    *
    * `localCheckpoint` truncates the iterative lineage each round:
    * without it the plan doubles per iteration and the driver, not the
    * data, becomes the scale limit.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val spark = vertices.sparkSession
    // symmetric, deduplicated edge list — propagation must flow both ways
    // pre-partitioned by dst BEFORE the checkpoint: localCheckpoint
    // preserves the physical partitioning, so every round's propagate
    // join exchanges ONLY the labels side — the r5 shape re-shuffled the
    // (static) edge list once per round (guide §2.4: two operations
    // keyed the same way share one exchange). The distinct() already
    // requires a shuffle; keying it by dst makes it the reusable one.
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("dst"))
      .distinct()
      .localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaEdges = sym
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .select(col("src").as("id"), col("comp"),
          lit(null).cast(vertices.schema("id").dataType).as("prev"))
      // the vertex's previous label rides through the SAME aggregation as
      // its new label (min ignores the neighbor rows' null prev), so the
      // convergence test is a scan of the checkpointed round output — no
      // extra shuffle join per round
      val next = labels.select(col("id"), col("comp"), col("comp").as("prev"))
        .unionByName(viaEdges)
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"), min(col("prev")).as("prev"))
        .localCheckpoint(true)
      // converged when no vertex improved its label this round; the
      // count is a driver-side scalar per round, not a data collect
      val improved = next.filter(col("comp") < col("prev")).limit(1).count()
      converged = improved == 0L
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    labels
  }
}
