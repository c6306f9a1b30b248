package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.extract.Extract

/** Gates the spark-submit integration path: a session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` must expose the
  * native expressions to pure SQL, with results identical to the
  * bridge / pure extractor.
  */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("extensions-spec")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("spark.sql.extensions registers extract_turn/minhash_sig/simhash for SQL") {
    val row = spark.sql(
      "SELECT extract_turn('MRN: 7\nStatus: ok').doc_type AS dt, " +
        "extract_turn('MRN: 7\nStatus: ok').status AS st, " +
        "simhash(array('ab','cd')) AS sh, " +
        "minhash_sig(array('ab','cd'), 4) AS mh").head()
    val e = Extract.extractTurn("", 0, "MRN: 7\nStatus: ok")
    assert(row.getAs[String]("dt") == e.doc_type)
    assert(row.getAs[String]("st") == e.status)
    val toks = new GenericArrayData(Array[Any](
      UTF8String.fromString("ab"), UTF8String.fromString("cd")))
    assert(row.getAs[Long]("sh") == TextHashBridge.simHash(toks))
    val wantMh = TextHashBridge.minHashSig(toks, 4).toLongArray.toSeq
    assert(row.getAs[scala.collection.Seq[Long]]("mh").toSeq == wantMh)
  }

  test("argument validation: wrong arity / non-literal k fail at analysis") {
    intercept[Exception](spark.sql("SELECT extract_turn('a','b')").head())
    intercept[Exception](spark.sql("SELECT minhash_sig(array('a'))").head())
    // non-foldable k (rand() is evaluated per-row, not constant)
    intercept[Exception](spark.sql(
      "SELECT minhash_sig(array('a'), cast(rand()*4 as int))").head())
  }
}
