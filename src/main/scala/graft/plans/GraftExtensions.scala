package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** spark-submit integration point: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` registers the library's native
  * expressions in every session the cluster builds, so pure-SQL users
  * get `extract_turn`, `minhash_sig` and `simhash` without Scala imports
  * (the per-session [[ExtractTurnExpr.register]] stays for notebook use).
  * The same hook would carry optimizer rules / strategies (preference
  * path (c) of the operator policy); everything this library needs is
  * expressible as native expressions + the declarative DataFrame API, so
  * only functions are injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, cls: Class[_]) =
    new ExpressionInfo(cls.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("extract_turn"),
      info("extract_turn", classOf[ExtractTurnExpr]),
      (es: Seq[Expression]) => {
        require(es.size == 1, "usage: extract_turn(text)")
        ExtractTurnExpr(es.head)
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSigExpr]),
      (es: Seq[Expression]) => {
        val usage = "usage: minhash_sig(tokens, k) with a literal k"
        require(es.size == 2 && es(1).foldable, usage)
        // fold the literal ourselves: a null / fractional / non-numeric k
        // must fail with the usage message at analysis, not leak an NPE
        // or NumberFormatException out of toString.toInt
        val k = es(1).eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long
              if l >= 1L && l <= Int.MaxValue => l.intValue()
          case s: java.lang.Short => s.intValue()
          case b: java.lang.Byte  => b.intValue()
          case _ => throw new IllegalArgumentException(usage)
        }
        require(k >= 1 && k <= 1024, usage)
        MinHashSigExpr(es.head, k)
      }))
    ext.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", classOf[SimHashExpr]),
      (es: Seq[Expression]) => {
        require(es.size == 1, "usage: simhash(tokens)")
        SimHashExpr(es.head)
      }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", classOf[CosineSimExpr]),
      (es: Seq[Expression]) => {
        require(es.size == 2, "usage: cosine_sim(vec_a, vec_b)")
        CosineSimExpr(es(0), es(1))
      }))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", classOf[NfcNormalizeExpr]),
      (es: Seq[Expression]) => {
        require(es.size == 1, "usage: nfc_normalize(text)")
        NfcNormalizeExpr(es.head)
      }))
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      info("strip_accents", classOf[StripAccentsExpr]),
      (es: Seq[Expression]) => {
        require(es.size == 1, "usage: strip_accents(text)")
        StripAccentsExpr(es.head)
      }))
  }
}
