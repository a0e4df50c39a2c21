package graft

import graft.operators.Similarity

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("local[32]")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (d <- dirs) {
      val truth = Similarity.s1(s, d).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((name, df) <- Seq("s2" -> Similarity.s2(s, d), "s3" -> Similarity.s3(s, d),
          "s6" -> Similarity.s6(s, d))) {
        val got = df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"RECALL $d $name ${(truth & got).size.toDouble / truth.size}%.3f")
      }
    }
    s.stop()
  }
}
