package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("tr_canned_replies", "tr_tool_transitions")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"=== $q: exchanges=${"Exchange".r.findAllIn(p).size} windows=${"Window".r.findAllIn(p).size}")
      println(p.split("\n").take(22).mkString("\n"))
    }
    spark.stop()
  }
}
