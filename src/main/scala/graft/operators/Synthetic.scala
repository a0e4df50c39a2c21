package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic corpora for scale probes and workload
  * generation (the documents/embeddings analog of the reference's
  * TransactionGenerator — reference TransactionGenerator.scala). Rows are
  * generated DISTRIBUTED (one seeded RNG per id, derived by a splitmix
  * mix of the id — identical output across runs, JVMs and partitionings);
  * nothing corpus-sized touches the driver, so the same generators work
  * at probe scale and at cluster scale.
  */
object Synthetic {

  /** Per-id seed: splitmix64-style avalanche so neighboring ids get
    * uncorrelated streams.
    */
  private def mix(salt: Long, id: Long): Long = {
    var z = salt ^ (id * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `n` base docs of 60-120 words from a 3000-word vocab; every
    * `twinEvery`-th doc gets a near-dup twin (3 word substitutions) with
    * doc_id = n + base id, so planted near-dups are recoverable by id.
    */
  def documents(s: SparkSession, n: Long, twinEvery: Long = 50): DataFrame = {
    import s.implicits._
    s.range(n).flatMap { boxed =>
      val id = boxed.longValue
      val rnd = new scala.util.Random(mix(0x5eedL, id))
      val len = 60 + rnd.nextInt(61)
      val words = Array.fill(len)("w" + rnd.nextInt(3000))
      val base = (id, words.mkString(" "))
      if (id % twinEvery == 0) {
        val t = new scala.util.Random(mix(0x7715L, id))
        val twin = words.clone()
        for (_ <- 0 until 3) twin(t.nextInt(len)) = "w" + t.nextInt(3000)
        Seq(base, (n + id, twin.mkString(" ")))
      } else Seq(base)
    }.toDF("doc_id", "text")
  }

  /** `n` base 64-dim vectors in [-1, 1]; every `twinEvery`-th vector gets
    * a near-dup twin (±0.01 perturbation per dim, cosine ~0.999) with
    * vec_id = n + base id.
    */
  def embeddings(s: SparkSession, n: Long, dim: Int = 64,
      twinEvery: Long = 100): DataFrame = {
    import s.implicits._
    s.range(n).flatMap { boxed =>
      val id = boxed.longValue
      val rnd = new scala.util.Random(mix(0xeedL, id))
      val v = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
      val base = (id, v.toSeq)
      if (id % twinEvery == 0) {
        val t = new scala.util.Random(mix(0x3417L, id))
        val twin = v.map(x => x + (t.nextFloat() - 0.5f) * 0.02f)
        Seq(base, (n + id, twin.toSeq))
      } else Seq(base)
    }.toDF("vec_id", "embedding")
  }
}
