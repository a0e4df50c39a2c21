package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** Dev probe: why don't d4's two self-join exchanges canonicalize equal
  * (ReuseExchange not firing)? Walks the two subtrees and reports the
  * first node whose canonicalized forms differ.
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[4]")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val df = operators.Dedup.d4(s, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: ShuffleExchangeExec if e.toString.contains("hashpartitioning(bi") => e
    }
    println(s"shuffle exchanges on (bi, probe): ${exchanges.size}")
    if (exchanges.size >= 2) {
      val Seq(e1, e2) = exchanges.take(2)
      println(s"canonical equal: ${e1.canonicalized == e2.canonicalized}")
      def firstDiff(a: SparkPlan, b: SparkPlan, depth: Int): Unit = {
        if (a.canonicalized == b.canonicalized) {
          println(s"  [$depth] EQUAL at ${a.nodeName}")
        } else {
          println(s"  [$depth] DIFF at ${a.nodeName} vs ${b.nodeName}")
          if (a.children.size == b.children.size && a.children.nonEmpty)
            a.children.zip(b.children).foreach { case (x, y) => firstDiff(x, y, depth + 1) }
          else if (a.children.isEmpty) {
            println("    a.canonical: " + a.canonicalized.toString.take(2000))
            println("    b.canonical: " + b.canonicalized.toString.take(2000))
          }
        }
      }
      firstDiff(e1, e2, 0)
      // deepest diff: walk down while children count matches
      var x: SparkPlan = e1; var y: SparkPlan = e2
      while (x.canonicalized != y.canonicalized && x.children.size == y.children.size &&
             x.children.nonEmpty &&
             x.children.zip(y.children).exists { case (a, b) => a.canonicalized != b.canonicalized }) {
        val (nx, ny) = x.children.zip(y.children)
          .find { case (a, b) => a.canonicalized != b.canonicalized }.get
        x = nx; y = ny
      }
      if (x.canonicalized != y.canonicalized) {
        println("deepest differing node: " + x.nodeName)
        println("  a: " + x.canonicalized.toString.take(3000))
        println("  b: " + y.canonicalized.toString.take(3000))
      }
    }
    s.stop()
  }
}
