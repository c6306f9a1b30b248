package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: drive extract_turn via SQL over sf0.1 documents. */
object ExprProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.ExtractTurnExpr.register(spark)
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .createOrReplaceTempView("docs")
    spark.sql(
      """SELECT extract_turn(text).doc_type AS dt,
        |       extract_turn(text).status AS st, count(*) AS n
        |FROM docs GROUP BY 1, 2 ORDER BY n DESC""".stripMargin).show()
    // adversarial: huge synthetic string through SQL
    spark.sql(
      "SELECT extract_turn(repeat('QTY 9 x Code Y\\n', 20000)).status AS s").show()
    spark.stop()
  }
}
