package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import graft.extract.Extract
import graft.gen.TranscriptGen

/** Diagnostic: raw multithreaded scaling of the pure extractor, no Spark.
  * Usage: sbt "Test/runMain graft.tools.MicroBench"
  */
object MicroBench {
  def run(threads: Int, payloads: Array[(String, Int, String)]): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val done = new AtomicLong()
    val t0 = System.nanoTime()
    val chunk = payloads.length / threads
    (0 until threads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val end = if (t == threads - 1) payloads.length else (t + 1) * chunk
          var i = t * chunk
          var acc = 0
          while (i < end) {
            val p = payloads(i)
            acc += Extract.extractTurn(p._1, p._2, p._3).fields.size
            i += 1
          }
          done.addAndGet(acc)
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(600, TimeUnit.SECONDS)
    val secs = (System.nanoTime() - t0) / 1e9
    payloads.length / secs
  }

  def main(args: Array[String]): Unit = {
    val payloads = TranscriptGen.turns(30000, 10000)
      .map(t => (t.conv_id, t.turn_idx, t.text)).toArray
    println(s"payloads: ${payloads.length}")
    run(4, payloads) // warmup
    run(32, payloads) // warmup
    for (t <- Seq(1, 8, 32)) {
      val thr = run(t, payloads)
      println(f"threads=$t%2d throughput=${thr}%.0f turns/s")
    }
  }
}
