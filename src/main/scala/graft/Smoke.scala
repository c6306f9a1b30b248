package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner: executes the flagship `SparkEntry.entry` and prints its
  * row count plus a small sample — mirrors the round driver's smoke check.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, 60)
    spark.stop()
  }
}
