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

  /** DuckDB twins of [[WindowPolyHash]]'s arithmetic — shared by the
    * d13/t10/t12/t13 oracles so the constants can never drift from the
    * native expression (they interpolate from the same object).
    */
  def packedTokenHash(tExpr: String): String = {
    import graft.functions.{WindowPolyHash => W}
    def w(off: Int) = s"CAST(('0x'||substring(md5($tExpr),$off,8))::UBIGINT AS BIGINT)"
    s"((((${w(1)} * ${W.P11} + ${w(9)} * ${W.P12} + ${W.C1}) % ${W.M1}) << 31) + " +
      s"((${w(1)} * ${W.P21} + ${w(9)} * ${W.P22} + ${W.C2}) % ${W.M2}))"
  }

  /** Per-token packed-hash list for a token-array expression. */
  def tokenHashes(toksExpr: String): String =
    s"list_transform($toksExpr, t -> ${packedTokenHash("t")})"

  /** The two-chain window fold lambda over packed token hashes. */
  def windowFoldLambda: String = {
    import graft.functions.{WindowPolyHash => W}
    s"""(a, b) -> ((((a >> 31) * ${W.B1} + (b >> 31)) % ${W.M1}) << 31)
      + (((a & 2147483647) * ${W.B2} + (b & 2147483647)) % ${W.M2})"""
      .linesIterator.map(_.trim).mkString(" ")
  }

  /** All stride-1 k-window hashes of a packed-token-hash list —
    * element-for-element equal to `WindowPolyHash(toks, k)`.
    */
  def windowHashes(thExpr: String, k: Int): String =
    s"""list_transform(range(0, CAST(greatest(len($thExpr) - $k + 1, 0) AS INT)),
      i -> list_reduce([0::BIGINT] || ($thExpr)[i+1 : i+$k], $windowFoldLambda))"""
      .linesIterator.map(_.trim).mkString(" ")
}

/** Shared 128-bit SimHash spec over md5 hex nibbles (the full digest = 32
  * nibbles = 128 signature bits), generating the Spark Column aggregation
  * and the DuckDB SQL from one definition. The signature is carried as
  * four sign-safe 32-bit BIGINT halves h1..h4 (bit b of the signature is
  * bit `31 - b%32` of half `b/32`).
  *
  * Why 128 and not 64: per-bit flip probability between two documents is
  * a property of their shingle overlap, independent of signature length —
  * so doubling the bits doubles the Hamming radius of true near-dups but
  * also doubles the *separation* from random pairs (measured on the test
  * corpus: planted ~0.98-jaccard dups sit at Hamming 3–20 of 128 while
  * random pairs center at ~54), which is what lets the pigeonhole blocks
  * be wide enough to prune.
  */
object SimHash {
  val Bits = 128
  val Halves = 4

  /** Per-element vote aggregates v0..v127 over a PRE-COMPUTED md5 hex
    * column (compute `md5(elem)` once per row before aggregating —
    * Catalyst does not CSE the digest across the aggregate expressions,
    * and recomputing it per bit is a 60× slowdown).
    */
  def voteAggs(md5Hex: Column): Seq[Column] =
    (0 until Bits).map { b =>
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
    (0 until Bits).map { b =>
      val k = b / 4; val j = 3 - b % 4
      s"sum(CASE WHEN (((strpos('0123456789abcdef', substring(md5($elemExpr), ${k + 1}, 1)) - 1) >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }

  def halfSql(lo: Int, hi: Int, top: Int): String =
    (lo until hi).map { b =>
      s"(CASE WHEN v$b >= 0 THEN CAST(${1L << (top - b)} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-index-Hashing block layout (Norouzi/Punjani/Fleet, "Fast Search
    * in Hamming Space with Multi-Index Hashing", CVPR 2012 — public
    * method): `m = radius/(SubRadius+1) + 1` disjoint blocks covering the
    * 128 bits. A pair at Hamming <= radius must agree within [[SubRadius]]
    * on at least one block (if every block differed by >= SubRadius+1 bits
    * the total would be >= m*(SubRadius+1) > radius), so an equi-join of
    * one side's exact block values against the other side's <=SubRadius
    * probe set has EXACT recall while the join key stays 128/m bits wide.
    * At the d4 default radius 20 that is 7 blocks of 18-19 bits: a random
    * pair collides on some probe with probability
    * 2*C(19,<=2)/2^19 + 5*C(18,<=2)/2^18 ~= 0.4% — vs ~47% for the naive
    * radius+1 disjoint-block pigeonhole whose keys are only 128/21 bits.
    * Returns (bitOffset, width) per block; blocks may cross the 32-bit
    * half boundaries (see [[blockVal]]).
    */
  val SubRadius = 2
  def mihBlocks(radius: Int): Seq[(Int, Int)] = {
    require(radius >= 0 && radius < Bits, s"radius must be in [0,$Bits)")
    val m = radius / (SubRadius + 1) + 1
    val base = Bits / m
    val extra = Bits - base * m
    val widths = Seq.fill(extra)(base + 1) ++ Seq.fill(m - extra)(base)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** XOR masks at Hamming <= [[SubRadius]]/2 — the SYMMETRIC probe set:
    * when BOTH join sides emit `bv ^ mask` for every mask here, a pair
    * whose block differs in d <= [[SubRadius]] bits matches on some
    * (ma, mb) split of the xor (d=0: ma=mb=0; d=1: one bit vs 0; d=2: one
    * bit each), so recall is identical to one-sided <=[[SubRadius]]
    * probing but each side emits only `1 + width` rows instead of the
    * one-sided `1 + width + C(width,2)` — ~10x fewer generated rows for
    * an 18-bit block. Requires [[SubRadius]] even (it is 2).
    */
  def symProbeMasks(width: Int): Seq[Long] = {
    require(width > 0 && width <= 62, s"block width out of range: $width")
    require(SubRadius % 2 == 0, "symmetric probing needs an even SubRadius")
    Seq(0L) ++ (0 until width).map(1L << _)
  }

  /** Value of signature bits [lo, lo+w) assembled from the four half
    * columns (signature bit b is bit `31 - b%32` of half `b/32`); handles
    * blocks crossing half boundaries by OR-ing per-half segments.
    */
  def blockVal(half: Int => Column, lo: Int, w: Int): Column = {
    require(lo >= 0 && w > 0 && lo + w <= Bits)
    val segs = for {
      h <- (lo / 32) to ((lo + w - 1) / 32)
      a = math.max(lo, 32 * h)
      b = math.min(lo + w, 32 * h + 32)
    } yield {
      val seg = shiftrightunsigned(half(h), 32 * h + 32 - b)
        .bitwiseAND(lit((1L << (b - a)) - 1))
      shiftleft(seg, lo + w - b)
    }
    segs.reduce(_ bitwiseOR _)
  }
}
