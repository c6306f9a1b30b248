package graft.engine

import org.apache.spark.sql.SparkSession

/** Table-maintenance CLI: `runMain graft.engine.MaintMain <baseDir>`
  * exercises the copy-on-write lifecycle on a results table under
  * <baseDir> — init (v1) → MERGE upsert (v2) → compact (v3) → vacuum —
  * printing version, row count and file count after each step. This is
  * the operational entry point for the Maintenance ops (a demo table is
  * created if the dir is empty; point it at a real results table to
  * compact it for real).
  */
object MaintMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.engine.MaintMain <baseDir>")
    val base = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-maint")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def report(step: String): Unit = {
      val v = Maintenance.currentVersion(base).get
      val n = Maintenance.readCurrent(spark, base).count()
      println(s"[maint] $step: version=$v rows=$n")
    }

    if (Maintenance.currentVersion(base).isEmpty) {
      val demo = (0 until 10000).map(i => (i.toLong, s"val$i"))
        .toDF("id", "v").repartition(32)
      Maintenance.initTable(spark, base, demo)
      report("init")
      val updates = Seq((1L, "UPDATED"), (20000L, "NEW")).toDF("id", "v")
      val v2 = Maintenance.mergeUpsert(spark, base, updates, Seq("id"))
      report(s"mergeUpsert -> v$v2")
    }
    val (v3, before, after) = Maintenance.compact(spark, base, 64L << 20)
    println(s"[maint] compact -> v$v3: $before files -> $after files")
    report("compact")
    val removed = Maintenance.vacuum(base)
    println(s"[maint] vacuum removed versions: ${removed.mkString(", ")}")
    report("vacuum")
    spark.stop()
  }
}
