package graft

import org.apache.spark.sql.SparkSession

/** Catalog-only measurement harness for the optimization rounds (guide
  * §1: measure first, isolate the computation). NOT part of the driver
  * contract — Bench.scala stays the frozen harness of record; this main
  * exists so a single query (or a name-filtered subset) can be timed and
  * its plan captured without paying for the gate arms.
  *
  * Usage (sbt -batch "runMain graft.BenchExtra [cmd] [nameRegex] [reps]"):
  *   time  — per-query wall seconds, same rep methodology as Bench
  *           (df.foreach(_ => ()) materializes every column), best-of-N
  *           (default 2) after the same 3-query warmup.
  *   plan  — write .explain("formatted") for each matching query to
  *           plans/r06/<name>_<tag>.txt (tag = 4th arg, default "plan").
  *   noop  — time with the noop sink (guide §1.4) instead of foreach.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("time")
    val nameRe = args.lift(1).getOrElse(".*").r
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val tag = args.lift(3).getOrElse("plan")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val s = session(cpus)
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameRe.pattern.matcher(n).matches }

    cmd match {
      case "plan" =>
        val dir = java.nio.file.Paths.get("plans/r06")
        java.nio.file.Files.createDirectories(dir)
        for ((name, fn) <- catalog) {
          val df = fn(s, sfDir)
          val out = dir.resolve(s"${name}_$tag.txt")
          java.nio.file.Files.write(out,
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              .getBytes("UTF-8"))
          println(s"[plan] wrote $out")
        }
      case _ =>
        // identical warmup to Bench so first-timed-query JIT/parquet-footer
        // warmup does not pollute the table
        for (w <- Seq("p7_md5_meta", "q1_lineitem_agg", "x_pipeline_insurance"))
          SparkEntry.queries.get(w).foreach { fn =>
            try fn(s, sfDir).foreach(_ => ())
            catch { case e: Throwable => System.err.println(s"[warmup] $w: $e") }
          }
        val res = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        def rep(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
          s.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          try {
            if (cmd == "noop")
              fn(s, sfDir).write.format("noop").mode("overwrite").save()
            else fn(s, sfDir).foreach(_ => ())
          } catch { case e: Throwable => System.err.println(s"[bench-extra] $name failed: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        for ((name, fn) <- catalog)
          res(name) = (1 to reps).map(_ => rep(name, fn)).min
        val total = res.values.sum
        println(res.toSeq.sortBy(-_._2)
          .map { case (n, t) => f"$t%8.3f  $n" }.mkString("\n"))
        println(f"[bench-extra] total=$total%.3f s over ${res.size} queries (best-of-$reps, ${cmd} rep)")
    }
    s.stop()
  }
}
