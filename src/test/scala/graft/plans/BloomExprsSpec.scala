package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.plans.BloomExprs._

/** Distributed Bloom prefilter (BloomFilterAggregate + scalar-subquery
  * might_contain — dd_incremental_history's machinery): the no-false-
  * negative contract, real pruning, and prefilter+verify == exact
  * anti-join.
  */
class BloomExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bloom-exprs-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("no false negatives: every history member probes true") {
    import spark.implicits._
    val hist = (0 until 2000).map(i => s"doc-$i").toDF("h")
    val bloom = hist.agg(bloomAgg($"h", 10000L).as("bf"))
    val misses = hist
      .withColumn("maybe", bloomMightContainSubquery(bloom, $"h"))
      .filter(!$"maybe").count()
    assert(misses === 0L, "a Bloom filter must never reject a member")
  }

  test("prefilter prunes most non-members and verify removes every FP") {
    import spark.implicits._
    val hist = (0 until 2000).map(i => s"doc-$i").toDF("h")
    val fresh = (0 until 1000).map(i => s"new-$i").toDF("h")
    val bloom = hist.agg(bloomAgg($"h", 10000L).as("bf"))
    val probed = fresh
      .withColumn("maybe", bloomMightContainSubquery(bloom, $"h"))
    val definite = probed.filter(!$"maybe").select($"h")
    val verified = probed.filter($"maybe").select($"h")
      .join(hist, Seq("h"), "left_anti")
    // none of the fresh keys are in history: prefilter + verify must
    // return all 1000, and the prefilter alone should pass the bulk
    // (fpp at this sizing is well under 10%)
    val exact = fresh.join(hist, Seq("h"), "left_anti")
    assert((definite.count() + verified.count()) === exact.count())
    assert(definite.count() > 900L,
      s"prefilter pruned too little: ${definite.count()}/1000 definite")
  }

  test("prefilter + verify equals the exact anti-join on overlapping sets") {
    import spark.implicits._
    // history = evens; new batch = 0..499 (half dup, half fresh)
    val hist = (0 until 2000 by 2).map(i => s"k$i").toDF("h")
    val fresh = (0 until 500).map(i => s"k$i").toDF("h")
    val bloom = hist.agg(bloomAgg($"h", 10000L).as("bf"))
    val probed = fresh
      .withColumn("maybe", bloomMightContainSubquery(bloom, $"h"))
    val out = probed.filter(!$"maybe").select($"h")
      .union(probed.filter($"maybe").select($"h")
        .join(hist, Seq("h"), "left_anti"))
    val exact = fresh.join(hist, Seq("h"), "left_anti")
    assert(out.collect().map(_.getString(0)).sorted.toSeq ===
      exact.collect().map(_.getString(0)).sorted.toSeq)
  }
}
