package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text primitives (SURVEY §3): every builder here has a `*Sql`
  * twin in [[TextSql]] producing the equivalent DuckDB expression. The two
  * must be edited in lockstep — the correctness gate hash-compares them.
  *
  * Tokenization: lowercase, collapse non-alphanumerics to single spaces,
  * trim, split, drop empties. Hashing: md5 hex (identical bytes in any
  * engine), so minhash = lexicographic MIN of seeded md5 strings and
  * simhash bits come from nibble arithmetic on the hex digits.
  */
object Text {
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  def tokens(c: Column): Column =
    filter(split(normText(c), " "), t => t =!= "")

  /** Word n-gram shingles (space-joined), empty array when too short.
    *
    * PASS A BOUND ATTRIBUTE (`withColumn("toks", tokens(...))` first), not
    * the tokens expression tree: the `element_at` calls inside the lambda
    * re-evaluate their array argument per output element, so an inlined
    * tokenizer runs ~3×shingle-count times per row (measured 8× slowdown).
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))

  def stopwordHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops.map(lit): _*)))

  /** MinHash via one md5 per shingle + a two-chunk universal hash family:
    * u1/u2 are the first two 32-bit words of the digest; signature i is
    * `min((u1*P1_i + u2*P2_i + i) mod 2^31-1)`. One digest feeds all
    * signatures (Spark's per-call md5 is ~20× DuckDB's, so digests are the
    * scarce resource); products stay < 2^43 so the arithmetic is exact in
    * both engines.
    */
  val MinhashP1: Seq[Int] = Seq(433, 541, 641, 757, 863, 977, 1091, 1201, 1327)
  val MinhashP2: Seq[Int] = Seq(389, 499, 607, 727, 839, 953, 1063, 1187, 1297)
  val MinhashMod = 2147483647L

  /** (u1, u2) digest-word columns for a shingle column. */
  def minhashWords(shingle: Column): (Column, Column) = {
    val m = md5(shingle)
    (conv(substring(m, 1, 8), 16, 10).cast("long"),
      conv(substring(m, 9, 8), 16, 10).cast("long"))
  }

  def minhashSig(u1: Column, u2: Column, i: Int): Column =
    min((u1 * MinhashP1(i) + u2 * MinhashP2(i) + lit(i)) % MinhashMod)

  val enStops: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "that")
  val deStops: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht")
  val esStops: Seq[String] = Seq("el", "la", "que", "y", "en", "los")
  val frStops: Seq[String] = Seq("le", "les", "des", "et", "pour", "dans")
}

/** DuckDB twins of [[Text]]. */
object TextSql {
  val norm: String = "trim(regexp_replace(lower(text),'[^a-z0-9]+',' ','g'))"
  val toks: String = s"list_filter(string_split($norm,' '), t -> t <> '')"

  def shingles(toksExpr: String, n: Int = 3): String = {
    val parts = (0 until n).map(k => s"toks[i+$k]").mkString("||' '||")
    s"list_transform(range(1, greatest(len($toksExpr)-${n - 2},1)), i -> $parts)"
  }

  def stopList(stops: Seq[String]): String =
    stops.map(s => s"'$s'").mkString("[", ",", "]")

  def stopwordHits(toksExpr: String, stops: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> list_contains(${stopList(stops)}, t)))"
}

/** Shared 64-bit SimHash spec over md5 hex nibbles, generating the Spark
  * Column aggregation and the DuckDB SQL from one definition (two BIGINT
  * halves h1/h2 to stay sign-safe in both engines).
  */
object SimHash {
  /** Per-element vote aggregates v0..v63 over a PRE-COMPUTED md5 hex
    * column (compute `md5(elem)` once per row before aggregating —
    * Catalyst does not CSE the digest across 64 aggregate expressions,
    * and recomputing it per bit is a 60× slowdown).
    */
  def voteAggs(md5Hex: Column): Seq[Column] =
    (0 until 64).map { b =>
      val k = b / 4; val j = 3 - b % 4
      val nib = conv(substring(md5Hex, k + 1, 1), 16, 10).cast("int")
      val bit = shiftright(nib, j).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$b")
    }

  def half(col: Int => Column, lo: Int, hi: Int, top: Int): Column =
    (lo until hi).map { b =>
      when(col(b) >= 0, lit(1L << (top - b))).otherwise(lit(0L))
    }.reduce(_ + _)

  def voteAggsSql(elemExpr: String): Seq[String] =
    (0 until 64).map { b =>
      val k = b / 4; val j = 3 - b % 4
      s"sum(CASE WHEN (((strpos('0123456789abcdef', substring(md5($elemExpr), ${k + 1}, 1)) - 1) >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }

  def halfSql(lo: Int, hi: Int, top: Int): String =
    (lo until hi).map { b =>
      s"(CASE WHEN v$b >= 0 THEN CAST(${1L << (top - b)} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
}
