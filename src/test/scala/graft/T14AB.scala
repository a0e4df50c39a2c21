package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** t14 quality gate A/B at an SF dir: the shipped shared wideCheckpoint
  * (one tokenize, four serialized re-reads) vs full recompute (each
  * signal re-tokenizes; zero cached state). Round 13 made the t14
  * checkpoint serialized to survive sf100 — this measures whether the
  * checkpoint still pays for itself at all once each consumer pass has
  * to re-deserialize it, against the alternative that cannot OOM at any
  * scale because it stores nothing.
  *
  * Measured (sf10, 500k docs, min-of-3 same host, round 13): checkpoint
  * 13.33 s vs recompute 13.51 s — a wash on wall time (four extra
  * tokenize passes ≈ one serialize + four deserialize passes), with the
  * recompute reps noisier (17.4/16.6/13.5 vs 14.5/13.3/13.8). The
  * shipped checkpoint stays: equal cost, and the t16/t18-style
  * multi-consumer ops keep the one-tokenize discipline uniform.
  *
  * Usage: Test/runMain graft.T14AB [sfDir] [reps]
  */
object T14AB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/sf10data"
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = GraftSession.get("local[32]")
    import s.implicits._

    def best(name: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min ${ts.min}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // B: the same gate joins over the standalone signal queries — each
    // re-tokenizes the corpus internally, nothing is cached
    def recompute() = TextOps.t2(s, dir).select($"doc_id", $"quality")
      .join(TextOps.t10(s, dir).select($"doc_id", $"rep_ratio"), "doc_id")
      .join(TextOps.t12(s, dir).select($"doc_id", $"rare_frac"), "doc_id")
      .join(TextOps.t13(s, dir).select($"doc_id", $"fluency"), "doc_id")
      .select($"doc_id", $"quality", $"rep_ratio", $"rare_frac", $"fluency",
        ($"quality" >= TextOps.GateMinQuality).as("ok_quality"),
        ($"rep_ratio" <= TextOps.GateMaxRep).as("ok_rep"),
        ($"rare_frac" <= TextOps.GateMaxRareFrac).as("ok_rare"),
        ($"fluency" >= TextOps.GateMinFluency).as("ok_fluency"))
      .withColumn("keep",
        $"ok_quality" && $"ok_rep" && $"ok_rare" && $"ok_fluency")

    val a = TextOps.t14(s, dir).orderBy($"doc_id").collect().toSeq
    val b = recompute().orderBy($"doc_id").collect().toSeq
    require(a == b, "recompute variant changed the answer")

    best("t14 checkpoint (A)")(TextOps.t14(s, dir)
      .write.format("noop").mode("overwrite").save())
    best("t14 recompute (B)")(recompute()
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
