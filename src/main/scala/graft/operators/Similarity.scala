package graft.operators

import graft.functions.{Vec, VecSql}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY §2 E).
  *
  * s1 is the exact baseline (bounded query set × corpus — a broadcast of
  * the queries, so the corpus side streams); s2 (random-hyperplane LSH) and
  * s3 (IVF with Lloyd refinement) are the scale paths that bound the
  * candidate set per query; their recall is spec-tested against s1.
  */
object Similarity {
  private type Q = (SparkSession, String) => DataFrame
  val Dim = 64
  val TopK = 10
  val NumQueries = 5 // query set = vec_id < 5

  /** Hyperplane count from corpus size: the smallest p >= 6 with
    * 4 * 2^p >= N (bucket occupancy target 4, capped at [[MaxPlanes]]) —
    * bucket population stays ~flat as the corpus grows instead of the
    * bucket space being a constant 64. 500 vectors (the sf0.01 gate
    * corpus) -> 7 planes; 2000 -> 9; 50k -> 14; 1e9 -> 28. Defined with
    * INTEGER comparisons so the d5 oracle can mirror it as exact CASE
    * thresholds — a float log2 would risk ULP disagreement at
    * power-of-two boundaries.
    */
  val MaxPlanes = 30
  def numPlanes(n: Long): Int = {
    var p = 6
    while (p < MaxPlanes && (4L << p) < n) p += 1
    p
  }

  /** Multi-probe budget from plane count (query-directed multi-probe, Lv
    * et al., VLDB'07): Hamming radius 3 through 10 planes — the ring that
    * measures recall 0.96 at sf0.1 — radius 4 through 14 planes, and the
    * flips are restricted to the query's [[MaxWeakBits]] LOWEST-|dot|
    * planes. A true neighbor disagrees exactly on the low-margin bits, so
    * flipping those first buys the most recall per probe, and the budget
    * is bounded (C(14, <=4) = 1,471 masks per table through 14 planes;
    * [[RankedProbeBudget]] = 6,885 above) NO MATTER how many planes the
    * corpus needs — bounded in N, where naive Hamming-r probing grows
    * C(p, r) ~ p^r. Probes stay on the bounded query side only.
    *
    * Above 14 planes the probe set is the Lv-et-al PROBING SEQUENCE
    * proper: every <=[[poolRadius]]-flip subset of the weak bits is
    * scored by the summed |dot| margin of its flipped planes (the
    * cheapest perturbations first) and only the [[RankedProbeBudget]]
    * best-ranked masks per table are probed. Measured at sf10 (200k
    * vectors, p = 16, S2TierProbe, ground truth s1): the round-10
    * full-enumeration tier (wb 14, r 5, all 3,473 masks) recalls 0.84;
    * the same 6,885-mask budget spent on the TOP-ranked masks of the
    * deeper r<=6 / wb=16 pool recalls 1.00 — vs 0.92 for full
    * enumeration of the r<=5 pool at the identical budget, i.e. ranking
    * beats ring-exhaustion at equal cost. Budget halves (3,473 ranked:
    * 0.86; 1,732: 0.78) sit below the 0.9 bar, so 6,885 is the tier
    * point. Candidates stay probe-bounded (~4 bucket occupants x 4
    * tables x T masks, INDEPENDENT of N — a shrinking corpus fraction
    * as N grows).
    *
    * DEEPER plane counts were swept and rejected (round 11, S2TierProbe
    * at sf10, same budget): p=18 recalls 0.76 (r<=6) / 0.84 (r<=8) /
    * 0.94 only at a DOUBLED 13,770-mask budget; p=20 collapses to
    * 0.58-0.62 at 4% candidates — true neighbors disagree on more bits
    * than any bounded flip budget reaches once buckets get that fine.
    * So [[numPlanes]]' ~4-occupant rule is the evidence-backed knee for
    * this hyperplane family: recall 1.00 costs ~39% of the corpus as
    * exactly-scored candidates at 200k vectors. A sub-5% candidate scan
    * at >=0.9 recall is NOT reachable by hyperplane LSH here — that
    * operating point belongs to the partition-based indexes ([[s3]] IVF:
    * 0.98 recall at 4.9% candidates; [[s8]] IVF-PQ: same pruning over
    * 42x-smaller codes), which is why the library ships the ladder
    * rather than one index.
    */
  val MaxWeakBits = 16
  val RankedProbeBudget = 6885
  def poolRadius(p: Int): Int =
    if (p <= 10) 3 else if (p <= 14) 4 else 6
  def weakBits(p: Int): Int = math.min(p, MaxWeakBits)

  /** Probe masks actually spent per table: the full subset pool through
    * 14 planes (ranking a pool we would exhaust anyway is a no-op), the
    * ranked top-[[RankedProbeBudget]] of the deeper pool above.
    */
  def probeBudget(p: Int): Int = {
    val pool = probeSubsets(weakBits(p), poolRadius(p)).size
    if (p <= 14) pool else math.min(pool, RankedProbeBudget)
  }

  /** All flip masks as position subsets into the weak-bit list: every
    * subset of {0..w-1} of size <= r (the empty subset = the exact
    * bucket), in deterministic (size, lexicographic) order.
    */
  private[operators] def probeSubsets(w: Int, r: Int): Seq[Seq[Int]] =
    (0 to r).flatMap(k => (0 until w).combinations(k).map(_.toSeq))

  /** IVF centroid count ~sqrt(N) (bounded cell occupancy ~sqrt(N)), and
    * cells probed per query ~sqrt(k) — candidates/query ~ N^(3/4).
    * Defined with `ceil(sqrt(double))` on both engines: sqrt/ceil are
    * IEEE-exact, so the DuckDB oracle derives the identical k / nprobe.
    */
  def numCentroids(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
  def nProbe(k: Int): Int =
    math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)
  val LloydIters = 2

  private def topkPerQuery(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
  }

  /** s1: brute-force cosine top-k for the fixed query set. */
  def s1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val q = e.filter($"vec_id" < NumQueries).select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
      .select($"query_id", $"neighbor_id", $"cos")
    topkPerQuery(scored)
  }

  val s1Sql: String = s"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(${VecSql.cosine("q.embedding", "c.embedding", 64)}, 6) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id < $NumQueries
        AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= $TopK"""

  val NumTables = 4 // independent LSH tables; candidates are unioned

  /** Deterministic pseudo-random hyperplane weights from md5 nibbles, one
    * plane set per hash table (table 0 keeps the original seeds — Dedup.d5
    * and its DuckDB oracle mirror depend on them).
    */
  private[operators] def planeTable(t: Int, planes: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes) { p =>
      Array.tabulate(Dim) { i =>
        val seed = if (t == 0) s"$p|$i" else s"t$t|$p|$i"
        val hex = md.digest(seed.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        Integer.parseInt(hex.substring(0, 1), 16) - 7.5
      }
    }
  }

  private[operators] def planeWeights(planes: Int): Array[Array[Double]] =
    planeTable(0, planes)

  /** In-order plane dot product — the ONE float expression both the
    * bucket sign test and the weak-bit ranking derive from (and the
    * DuckDB oracle's `list_sum` mirrors term-for-term). The native
    * [[Vec.dotFast]] kernel keeps the identical ascending
    * multiply-accumulate order; the portable `aggregate(zip_with(...))`
    * form it replaced has no codegen, and bucketCol evaluates this
    * N x planes x tables times over the corpus (12.8M interpreted
    * 64-element folds at sf10).
    */
  private def dotCol(emb: Column, wgt: Array[Double]): Column =
    Vec.dotFast(emb, array(wgt.map(lit): _*))

  /** Sign-bit bucket id for one embedding column (table 0 is shared with
    * Dedup.d5's candidate gating). One native nested-loop kernel
    * ([[graft.functions.SignBucket]]) rather than a per-plane
    * `when(dot >= 0, 1<<p)` tree: four such trees in the one corpus
    * bucketing projection blew the generated method past the JIT's
    * huge-method threshold and de-optimized the whole stage to the
    * bytecode interpreter (measured at sf10: 42 s for what the kernel
    * does in ~2 s — see SignBucket's scaladoc). The kernel's per-plane
    * dot is the identical ascending IEEE chain, so every hash gate that
    * replays this bucket id (s2/s5/d5/d11 oracles) is unmoved. NULL
    * embeddings land in bucket 0 (the coalesce below) — SignBucket is a
    * null-intolerant UnaryExpression, and without the wrap a null row
    * would silently drop out of every bucket join, where the
    * pre-round-12 `when(dot >= 0, ...)` tree kept it in bucket 0.
    */
  private[operators] def bucketCol(emb: Column, table: Int, planes: Int): Column =
    coalesce(graft.functions.SignBucket(planeTable(table, planes), emb), lit(0))

  /** s2: random-hyperplane LSH ANN — [[NumTables]] independent hash
    * tables, query-directed multi-probe per table (<=[[poolRadius]] bit
    * flips restricted to the query's [[weakBits]] lowest-|dot| planes,
    * the best [[probeBudget]] masks by flipped-margin rank),
    * candidates unioned, then exact cosine top-k within them. The bucket
    * id is the join key and the plane count grows with the corpus
    * ([[numPlanes]]), so bucket occupancy stays ~flat instead of a fixed
    * 64-bucket space that degenerates to N/3 per query — and because the
    * flips come from a FIXED-width weak-bit list under a fixed budget,
    * the probe cost is bounded (<= C(14,<=4) = 1,471 masks/table through
    * 14 planes, [[RankedProbeBudget]] = 6,885 ranked masks above) no
    * matter how large p grows.
    * The probe explosion is on the BOUNDED query side only (the corpus
    * side emits exactly one bucket per table), so probing costs probe-set
    * size, never a corpus blowup. All four tables' buckets are computed
    * in ONE pass over the corpus (checkpointed), not one scan per table.
    */
  def s2(s: SparkSession, dir: String): DataFrame =
    topkPerQuery(s2Scored(s, dir))

  /** The distinct exact-scored candidate set behind [[s2]] (pre-top-k) —
    * exposed so the bench can report candidates/query next to recall.
    */
  def s2Scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.embeddings(s, dir)
    val p = numPlanes(e0.count())
    val r = poolRadius(p)
    val wb = weakBits(p)
    val budget = probeBudget(p)
    // parallelized: the bucket checkpoint feeds all four per-table
    // candidate joins (the Materialize.parallelized rationale)
    val e = graft.plans.Materialize.parallelized(
      e0.select(($"vec_id" +: $"embedding" +: (0 until NumTables).map(t =>
        bucketCol($"embedding", t, p).as(s"b$t"))): _*))
      .localCheckpoint(true)
    // probe masks as POSITION SUBSETS into the query's weak-bit list —
    // ONE array literal + transform lambdas, not C(wb,<=r) XOR literal
    // expressions (a plan with thousands of literal nodes is slow to
    // analyze and blows string dumps)
    val subsets = typedLit(probeSubsets(wb, r))
    val pow2 = typedLit((0 until p).map(1 << _))
    (0 until NumTables).map { t =>
      // per-plane |dot| ranking on the BOUNDED query side only: the wb
      // lowest-margin planes are this query's flip candidates
      val dots = array(planeTable(t, p).map(w => dotCol($"q_emb", w)): _*)
      val weak = slice(array_sort(transform(sequence(lit(0), lit(p - 1)),
        i => struct(abs(element_at(dots, i + 1)).as("a"), i.as("i")))),
        1, wb)
      // per-subset (quality = summed flipped |dot| in ascending weak-rank
      // order, xor mask); array_sort ranks by (quality, mask) so the
      // top-[[probeBudget]] slice IS the Lv-et-al probing sequence. For
      // p <= 14 the budget equals the pool, the slice is the whole pool,
      // and the probe SET is identical to plain subset enumeration.
      val qm = transform(subsets, sub => struct(
        aggregate(sub, lit(0.0), (acc, pos) =>
          acc + element_at($"wk", pos + lit(1)).getField("a")).as("qual"),
        aggregate(sub, lit(0), (acc, pos) => acc +
          element_at(pow2,
            element_at($"wk", pos + lit(1)).getField("i") + lit(1)))
          .as("mask")))
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
          col(s"b$t").as("qb"))
        .select($"query_id", $"q_emb", $"qb", weak.as("wk"))
        .select($"query_id", $"q_emb",
          explode(transform(slice(array_sort(qm), 1, budget),
            x => $"qb".bitwiseXOR(x.getField("mask")))).as("probe"))
      val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("n_emb"),
        col(s"b$t").as("n_bucket"))
      c.join(broadcast(q),
          $"probe" === $"n_bucket" && $"query_id" =!= $"neighbor_id")
        .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
        .select($"query_id", $"neighbor_id", $"cos")
    }.reduce(_ union _).distinct() // same pair in several tables: one row
  }

  /** s3: IVF — deterministic seed centroids (lowest vec_ids), Lloyd
    * refinement, nprobe-cell search. FULL hash gate: every stage is
    * bit-reproducible in DuckDB (see [[s3Sql]]).
    *
    * k = [[numCentroids]] ~ sqrt(N) and nprobe ~ sqrt(k), so cell
    * occupancy and candidates/query both grow sublinearly instead of the
    * old fixed k=16 whose cells were N/16. Assignment is a broadcast
    * cross-join against the (k, 64)-double codebook DataFrame + min_by —
    * the N x k distance work streams through one stage regardless of k,
    * where the previous expression-literal argmin would have blown past
    * codegen limits at k ~ sqrt(N). Only the codebook (k x 64 doubles) and
    * the bounded query set ever reach the driver.
    *
    * Lloyd means are ORDER-INDEPENDENT fixed-point sums: each coordinate
    * is floored to 1e-6 ticks (one IEEE multiply + floor per row — bitwise
    * identical across engines), summed exactly as integers, and the mean
    * is two IEEE divisions — so the refined codebook is byte-equal no
    * matter how Spark orders the partial aggregates, and DuckDB can replay
    * it. A plain float `avg()` here was the one order-dependent step that
    * kept s3 rows-only.
    */
  def s3(s: SparkSession, dir: String): DataFrame =
    topkPerQuery(s3Scored(s, dir))

  /** The IVF build behind [[s3]] and [[s8]]: checkpointed double-cast
    * corpus, the Lloyd-refined coarse codebook, and the final cell
    * assignment (vec_id, cid, emb), checkpointed. Deterministic end to
    * end ([[s3Scored]]'s scaladoc), so both consumers share one DuckDB
    * replay ([[ivfSqlPrefix]]).
    */
  private[graft] def ivfTrain(s: SparkSession, dir: String)
      : (DataFrame, Array[Array[Double]], DataFrame) = {
    import s.implicits._
    // parallelized: this checkpoint feeds FIVE corpus passes (3 assigns +
    // 2 means) — frozen skewed input splits idle most cores on each (see
    // Materialize.parallelized's measurements)
    val e = graft.plans.Materialize.parallelized(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("emb")))
      .localCheckpoint(true)
    val k = numCentroids(e.count())
    // seed: the k lowest vec_ids by RANK (sort-limit, so exactly k seeds
    // even if vec_ids are sparse — `vec_id < k` would silently under-seed).
    // The codebook stays a DISTRIBUTED k-row DataFrame through the Lloyd
    // loop (round-10 verdict item 7): per-iteration MEANS never collect.
    // Since round 12, assign() does collect the codebook — once per call
    // (each Lloyd iteration + the final assignment) — to bake it into the
    // native L2ArgMin kernel; every such transfer is bounded at k×Dim ~
    // √N·64 doubles, never data-sized.
    var cdf: DataFrame = e.orderBy($"vec_id").limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"vec_id")).cast("int").minus(1).as("cid"),
        $"emb".as("c_emb"))
      .localCheckpoint(true)

    // argmin over the codebook: a native single-projection kernel
    // ([[graft.functions.L2ArgMin]], the [[pqEncode]] treatment applied
    // to the coarse quantizer — round 12). History: one-pass
    // min(struct(d2, cid)) + first(emb) planned a SortAggregate that
    // sorted N x k scored rows with the 64-double payload (46 GB spilled
    // at sf10, interpreted distance — >6 min/pass at 200k x 448);
    // round 11 replaced it with TWO broadcast cross-join scoring passes +
    // two skinny HashAggregates (min d2, then min cid among exact ties);
    // round 12 retires both passes for one fused k x dim argmin loop per
    // row — no scored-row materialization, no aggregation, no join
    // (interleaved A/B in the scaladoc of L2ArgMin's probe: see
    // docs/BENCH_sf10_r12 ann splits). Tie semantics identical (strict <
    // over ascending cid = lowest cid at the bitwise-equal minimum; each
    // d2 the same ascending IEEE chain), so the DuckDB replay is
    // untouched. The codebook reference object is k x Dim doubles — the
    // SAME bounded sqrt(N)*Dim transfer the final probe-selection collect
    // below already pays (16 MB at N=1e9); the means-side Lloyd fold
    // stays fully distributed.
    def assign(codebook: DataFrame): DataFrame = {
      val cents = codebook.orderBy($"cid").collect()
        .map(_.getSeq[Double](1).toArray) // k x Dim, cids dense by seed
      e.select($"vec_id", Vec.l2ArgMin(cents, $"emb").as("cid"), $"emb")
    }

    // Lloyd iterations: assignment + order-independent fixed-point mean
    // per cell/dim (exact integer sum of 1e-6 ticks, then two IEEE
    // divisions — bit-equal in DuckDB regardless of aggregation order).
    // The per-dim tick sums come from ONE unexploded pass over the
    // corpus ([[graft.functions.TickSumAgg]] — round 12; the previous
    // posexplode → (cid, dim) hash agg built 12.8M Generate rows per
    // iteration, 7 s of the ~30 s sf10 build, to compute the same
    // order-free integer sums). The mean is the identical
    // (sum.toDouble / n) / 1e6 two-division chain, so the replay is
    // unmoved. An EMPTY cell keeps its previous centroid (left join +
    // fallback on the k-row frame), matching the driver-array semantics
    // the DuckDB replay pins; one k-row localCheckpoint per iteration
    // keeps the lineage flat instead of stacking assignments.
    for (_ <- 0 until LloydIters) {
      val sums = assign(cdf).groupBy($"cid")
        .agg(graft.functions.TickSumAgg($"emb", Dim).as("ts"))
      cdf = cdf
        .join(sums, Seq("cid"), "left_outer")
        .select($"cid",
          when($"ts".isNull, $"c_emb").otherwise(
            transform(slice($"ts", 2, Dim), t =>
              (t.cast("double") / element_at($"ts", 1).cast("double")) / 1e6))
            .as("c_emb"))
        .localCheckpoint(true)
    }

    val centroids: Array[Array[Double]] = cdf.orderBy($"cid").collect()
      .map(_.getSeq[Double](1).toArray)
    (e, centroids, assign(cdf).localCheckpoint(true))
  }

  /** The exact-scored candidate set behind [[s3]] (pre-top-k) — exposed
    * so the bench can report candidates/query next to recall.
    */
  def s3Scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, centroids, assigned) = ivfTrain(s, dir)
    val k = centroids.length
    // nprobe cells per query, computed on the driver over the tiny codebook
    val queries = assigned.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"emb".as("q_emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s0 += d * d; i += 1 }
      s0
    }
    val probeRows = queries.flatMap { case (qid, qe) =>
      centroids.zipWithIndex.sortBy { case (c, i) => (d2(qe, c), i) }
        .take(nProbe(k)).map { case (_, cid) => (qid, cid, qe) }
    }
    val probes = s.createDataFrame(probeRows.toSeq)
      .toDF("query_id", "p_cid", "q_emb")
    assigned
      .join(broadcast(probes), $"cid" === $"p_cid" && $"query_id" =!= $"vec_id")
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"emb"), 6))
      .select($"query_id", $"vec_id".as("neighbor_id"), $"cos")
  }

  /** s2's full oracle: although s2 is an APPROXIMATE-recall index, its
    * candidate set is perfectly deterministic (md5-derived planes, exact
    * in-order dot products, tie-broken top-k) — so the DuckDB twin can
    * reproduce it bit-for-bit and s2 graduates from rows-only to a full
    * hash match. "Candidate in some table's probe set" is one OR over
    * the four tables' conditions `bit_count(xor(qb, cb)) <= radius AND
    * the differing bits all lie in the query's weak-bit mask` — the
    * set-membership form of the Spark side's flip enumeration (flipping
    * <= r of the query's w weakest bits reaches exactly the buckets
    * whose diff is <= r bits inside the weak mask). The plane count is
    * N-adaptive exactly like d5's oracle (integer CASE thresholds over
    * all [[MaxPlanes]] emitted plane rows); radius and weak width derive
    * from it in SQL.
    */
  /** The WITH-prefix shared by [[s2Sql]] and [[s5Sql]]: plane tables,
    * N-adaptive plane count, per-table buckets, per-query weak-bit
    * masks, and the `scored` CTE of exact cosines over the deterministic
    * query-directed multi-probe candidate set.
    */
  private val s2ScoredSql: String = {
    val caseArms = (6 until MaxPlanes)
      .map(p => s"WHEN c <= ${4L << p} THEN $p")
      .mkString(" ")
    val planeCtes = (0 until NumTables).map { t =>
      val rows = planeTable(t, MaxPlanes).zipWithIndex.map { case (w, p) =>
        s"($p, CAST([${w.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(", ")
      s"planes$t(p, w) AS (VALUES $rows)"
    }.mkString(",\n    ")
    val dot =
      "list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i]))"
    val bktCtes = (0 until NumTables).map { t =>
      s"""bkt$t AS (
      SELECT e.vec_id,
        CAST(sum(CASE WHEN $dot >= 0 THEN 1 << p.p ELSE 0 END) AS INTEGER) AS b
      FROM embeddings e CROSS JOIN (SELECT planes$t.* FROM planes$t, np
        WHERE planes$t.p < np.np) p
      GROUP BY e.vec_id)"""
    }.mkString(",\n    ")
    // per-query RANKED weak-bit list per table: the LEAST(np, MaxWeakBits)
    // planes with the smallest (|dot|, plane-id) — same ranking the Spark
    // side slices its weak array by
    val wrCtes = (0 until NumTables).map { t =>
      s"""wr$t AS (
      SELECT vec_id, p, a, rnk FROM (
        SELECT e.vec_id, p.p, abs($dot) AS a,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY abs($dot), p.p) AS rnk
        FROM embeddings e CROSS JOIN (SELECT planes$t.* FROM planes$t, np
          WHERE planes$t.p < np.np) p
        WHERE e.vec_id < $NumQueries)
      WHERE rnk <= (SELECT LEAST(np, $MaxWeakBits) FROM np))"""
    }.mkString(",\n    ")
    val radius =
      "(SELECT CASE WHEN np <= 10 THEN 3 WHEN np <= 14 THEN 4 ELSE 6 END FROM np)"
    val budget =
      s"(SELECT CASE WHEN np <= 14 THEN 1000000 ELSE $RankedProbeBudget END FROM np)"
    // the probe pool as a recursive subset walk over the ranked weak
    // list (each subset built once, in ASCENDING-rank order, so `qual`
    // accumulates the flipped |dot|s in exactly the order Spark's
    // aggregate() folds them — float-sum order is part of the contract);
    // topm keeps the (qual, mask)-ranked top-`budget` masks = the
    // Lv-et-al probing sequence the Spark side slices
    val mkCtes = (0 until NumTables).map { t =>
      s"""mk$t AS (
      SELECT vec_id, 0::BIGINT AS mask, 0.0::DOUBLE AS qual,
        0 AS lastrnk, 0 AS sz
      FROM (SELECT DISTINCT vec_id FROM wr$t)
      UNION ALL
      SELECT m.vec_id, m.mask | (1::BIGINT << w.p), m.qual + w.a,
        w.rnk, m.sz + 1
      FROM mk$t m JOIN wr$t w ON w.vec_id = m.vec_id AND w.rnk > m.lastrnk
      WHERE m.sz < $radius),
    topm$t AS (
      SELECT vec_id, mask FROM (
        SELECT vec_id, mask, row_number() OVER (PARTITION BY vec_id
          ORDER BY qual, mask) AS rn
        FROM mk$t)
      WHERE rn <= $budget)"""
    }.mkString(",\n    ")
    // UNION ALL inside a subquery + explicit DISTINCT: a bare multi-arm
    // UNION as a CTE body is mis-parsed under WITH RECURSIVE by DuckDB
    // 1.0 (the last arm becomes a "recursive term" and dedup is skipped
    // across it), so the dedup must not rely on the set operator
    val candUnion = (0 until NumTables).map { t =>
      s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM topm$t m JOIN bkt$t q ON q.vec_id = m.vec_id
        JOIN bkt$t c ON c.b::BIGINT = xor(q.b::BIGINT, m.mask)
          AND c.vec_id <> m.vec_id"""
    }.mkString("\n      UNION ALL\n      ")
    s"""
    WITH RECURSIVE np AS (
      SELECT CASE $caseArms ELSE $MaxPlanes END AS np
      FROM (SELECT count(*) AS c FROM embeddings)),
    $planeCtes,
    $bktCtes,
    $wrCtes,
    $mkCtes,
    cand AS (
      SELECT DISTINCT query_id, neighbor_id FROM (
      $candUnion) allc),
    scored AS (
      SELECT x.query_id, x.neighbor_id,
        round(${VecSql.cosine("qe.embedding", "ce.embedding", 64)}, 6) AS cos
      FROM cand x
        JOIN embeddings qe ON qe.vec_id = x.query_id
        JOIN embeddings ce ON ce.vec_id = x.neighbor_id)"""
  }

  val s2Sql: String = s"""$s2ScoredSql,
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= $TopK"""

  /** Cosine radius for [[s5]] — random 64-dim vectors concentrate near
    * cos 0, so 0.3 is a strong-signal neighborhood on this corpus
    * (per-query top-1 cosines run ~0.25-0.4).
    */
  val RadiusTau = 0.3

  /** s5: RADIUS search — the vector-store companion to top-k: every
    * candidate within cosine >= [[RadiusTau]] of a query, however many
    * or few there are. Same deterministic multi-probe candidate set as
    * [[s2]] (so the same full hash gate), one filter instead of a rank:
    * radius results need no window at all.
    */
  def s5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s2Scored(s, dir).filter($"cos" >= RadiusTau)
  }

  val s5Sql: String = s"""$s2ScoredSql
    SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= $RadiusTau"""

  /** s3's full oracle: the ENTIRE IVF build is deterministic — seed
    * centroids are the k lowest vec_ids, Lloyd means are exact fixed-point
    * sums ([[s3Scored]]), assignment and probe selection tie-break on
    * (distance, cid) — so DuckDB replays codebook construction, cell
    * assignment, probe selection and the tie-broken top-k bit-for-bit.
    * k and nprobe derive from count(*) with the same `ceil(sqrt(...))` as
    * [[numCentroids]]/[[nProbe]]; the [[LloydIters]] refinement rounds are
    * unrolled as CTE triples (assign -> fixed-point mean -> next codebook,
    * empty cells keeping their previous coordinates via the left join).
    */
  private def ivfD2Sql(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  /** The IVF build as a WITH-prefix shared by [[s3Sql]] and [[s8Sql]]:
    * kk/np (N-adaptive k and nprobe), double-cast `emb`, seed codebook
    * `c0`, the [[LloydIters]] unrolled refinement triples, ending at the
    * final assignment `a{LloydIters}` over codebook `c{LloydIters}`.
    */
  private[operators] val ivfSqlPrefix: String = {
    def assignCte(name: String, cents: String) = s"""
    $name AS (
      SELECT vec_id, emb, cid FROM (
        SELECT e.vec_id, e.emb, s.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${ivfD2Sql("e.emb", "s.c")}, s.cid) AS rn
        FROM emb e CROSS JOIN $cents s) z
      WHERE rn = 1)"""
    def meanCte(name: String, assigned: String) = s"""
    $name AS (
      SELECT cid, t.i AS dim,
        (CAST(sum(CAST(floor(emb[t.i] * 1e6) AS BIGINT)) AS DOUBLE)
          / count(*)) / 1e6 AS m
      FROM $assigned CROSS JOIN range(1, ${Dim + 1}) t(i)
      GROUP BY cid, t.i)"""
    def nextCte(name: String, prev: String, mean: String) = s"""
    $name AS (
      SELECT s.cid, list(coalesce(m.m, s.c[t.i]) ORDER BY t.i) AS c
      FROM $prev s CROSS JOIN range(1, ${Dim + 1}) t(i)
      LEFT JOIN $mean m ON m.cid = s.cid AND m.dim = t.i
      GROUP BY s.cid)"""
    val iters = (0 until LloydIters).map { j =>
      assignCte(s"a$j", s"c$j") + "," + meanCte(s"m$j", s"a$j") + "," +
        nextCte(s"c${j + 1}", s"c$j", s"m$j")
    }.mkString(",")
    val f = LloydIters // the final codebook / assignment index
    s"""
    WITH kk AS (
      SELECT greatest(16,
        CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS INTEGER)) AS k
      FROM embeddings),
    np AS (
      SELECT greatest(4, CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS INTEGER)) AS np
      FROM kk),
    emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings),
    c0 AS (
      SELECT CAST(rn - 1 AS INTEGER) AS cid, emb AS c
      FROM (SELECT vec_id, emb,
              row_number() OVER (ORDER BY vec_id) AS rn
            FROM emb) seeds, kk
      WHERE seeds.rn <= kk.k),
    $iters,
    ${assignCte(s"a$f", s"c$f").trim}"""
  }

  /** The nprobe-cells-per-query CTE over the shared prefix (s3 and s8
    * probe the SAME cells — s8's residual codes only change what gets
    * scanned inside them).
    */
  private val ivfProbeSql: String = {
    val f = LloydIters
    s"""pr AS (
      SELECT query_id, cid, q_emb FROM (
        SELECT q.vec_id AS query_id, c.cid, q.emb AS q_emb,
          row_number() OVER (PARTITION BY q.vec_id
            ORDER BY ${ivfD2Sql("q.emb", "c.c")}, c.cid) AS rn
        FROM a$f q CROSS JOIN c$f c
        WHERE q.vec_id < $NumQueries) z, np
      WHERE rn <= np.np)"""
  }

  val s3Sql: String = {
    val f = LloydIters
    s"""$ivfSqlPrefix,
    $ivfProbeSql,
    scored AS (
      SELECT pr.query_id, a.vec_id AS neighbor_id,
        round(${VecSql.cosine("pr.q_emb", "a.emb", Dim)}, 6) AS cos
      FROM pr JOIN a$f a ON a.cid = pr.cid AND a.vec_id <> pr.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= $TopK"""
  }

  /** All d5-bucket-gated scored pairs (a_id < b_id, Hamming <= 2, exact
    * cosine, NO cosine threshold) — the shared pair generator behind
    * [[Dedup.d5Sql]]'s thresholded near-dups and [[s4Sql]]'s kNN-join
    * oracle. Lives here (not in Dedup) so object initialization stays
    * one-directional: Dedup's vals may touch Similarity, never the
    * reverse.
    */
  private[operators] val d5ScoredPairsSql: String = {
    // the oracle is N-adaptive exactly like Dedup.d5Planes: all MaxPlanes
    // plane rows are emitted and the used prefix is selected by exact
    // integer CASE thresholds (smallest p >= 6 with 2^p >= count)
    val planeRows = planeWeights(MaxPlanes).zipWithIndex
      .map { case (w, p) =>
        s"($p, CAST([${w.mkString(", ")}] AS DOUBLE[]))"
      }.mkString(", ")
    val caseArms = (6 until MaxPlanes)
      .map(p => s"WHEN c <= ${1L << p} THEN $p")
      .mkString(" ")
    val dot =
      "list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i]))"
    s"""
    WITH np AS (
      SELECT CASE $caseArms ELSE $MaxPlanes END AS np
      FROM (SELECT count(*) AS c FROM embeddings)),
    planes(p, w) AS (VALUES $planeRows),
    pl AS (SELECT planes.* FROM planes, np WHERE planes.p < np.np),
    bkt AS (
      SELECT e.vec_id,
        CAST(sum(CASE WHEN $dot >= 0 THEN 1 << p.p ELSE 0 END) AS INTEGER) AS bucket
      FROM embeddings e CROSS JOIN pl p GROUP BY e.vec_id),
    v AS (
      SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN bkt b USING (vec_id))
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      round(${VecSql.cosine("a.embedding", "b.embedding", 64)}, 6) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
      AND bit_count(xor(a.bucket, b.bucket)) <= 2"""
  }

  /** s4: kNN JOIN — unlike s1-s3 (bounded query set), EVERY corpus
    * vector finds its best approximate neighbor: the d5 hyperplane
    * buckets gate candidates (Hamming <= 2, <1% of all pairs), exact
    * cosine scores them, and a per-vector rank keeps the top-1 (ties to
    * the lowest id). Vectors whose buckets are singletons emit with a
    * null neighbor. The all-pairs work never materializes — candidates
    * are the bucket join's output, and the ranking window runs over
    * candidates only — so the shape survives corpus-scale self-joins
    * (retrieval-augmentation / clustering-init workloads).
    */
  def s4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = Tables.embeddings(s, dir)
    val scored = Dedup.d5ScoredPairsOf(e0, Dedup.d5Planes(e0.count()))
    // Top-1 per vector WITHOUT materializing the pair set: both
    // orientations are emitted in one pass over the scored pairs, and a
    // hash aggregation with map-side partial combine picks the max of
    // (cos, -nn_id) — i.e. best cosine, ties to the lowest id, the same
    // row the previous window/rank form kept. The previous shape
    // (eager checkpoint of ALL scored pairs + union + window sort)
    // wrote the answer-sized pair set to disk and sorted it again: on
    // replica-clustered corpora the pair set is quadratic in cluster
    // multiplicity, and at sf100 (2M vectors) the checkpoint+sort
    // spilled past 59 GB of free disk before dying. The aggregation
    // shuffles at most one partial row per (vec_id, partition) — O(N),
    // never O(pairs) — and nothing is checkpointed.
    // the (cos, tie-break lowest id) argmax is packed into ONE long —
    // ticks(cos)·2^42 + (2^42−1−nn_id) — because max over a STRUCT has
    // no mutable agg buffer and silently demotes the whole aggregation
    // to SortAggregate: the partial combine disappears and the exploded
    // pair stream (1G rows at sf100) gets SORTED, ~55 GB of spill. With
    // two primitive maxes the plan is a HashAggregate with map-side
    // combine — at most one partial row per (vec_id, partition) ever
    // shuffles. cos is already rounded to 6 decimals, so ticks = cos·1e6
    // rounded is injective and order-preserving; ids stay below 2^42.
    val idM = (1L << 42) - 1
    val sym = scored.select(explode(array(
        struct($"a_id".as("vec_id"), $"b_id".as("nn_id"), $"cos"),
        struct($"b_id".as("vec_id"), $"a_id".as("nn_id"), $"cos"))).as("pr"))
      .select($"pr.vec_id", $"pr.cos",
        (round($"pr.cos" * 1e6).cast("long") * lit(idM + 1) +
          (lit(idM) - $"pr.nn_id")).as("k"))
    val best = sym.groupBy($"vec_id")
      .agg(max($"cos").as("nn_cos"), max($"k").as("k"))
      .select($"vec_id",
        (lit(idM) - $"k".bitwiseAND(lit(idM))).as("nn_id"), $"nn_cos")
    e0.select($"vec_id").join(best, Seq("vec_id"), "left_outer")
  }

  val s4Sql: String = s"""
    WITH cand AS ($d5ScoredPairsSql),
    sym AS (
      SELECT a_id AS vec_id, b_id AS nn_id, cos FROM cand
      UNION ALL SELECT b_id, a_id, cos FROM cand),
    best AS (
      SELECT vec_id, nn_id, cos FROM (
        SELECT vec_id, nn_id, cos,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, nn_id) AS rn
        FROM sym) z
      WHERE rn = 1)
    SELECT e.vec_id, b.nn_id, b.cos AS nn_cos
    FROM embeddings e LEFT JOIN best b ON e.vec_id = b.vec_id"""

  /** s6: PRODUCT QUANTIZATION (Jégou et al., PAMI'11) — the memory-scale
    * ANN path: each 64-dim float vector (256 B) compresses to
    * [[NumSub]] sub-codes of log2([[SubK]]) bits (48 bits total), and
    * queries scan codes with an asymmetric-distance lookup table instead
    * of touching raw vectors. At 100 TB of embeddings the raw corpus
    * cannot live in executor memory but the code table (~42× smaller)
    * can — PQ is how the scan stays memory-resident.
    *
    * Everything is deterministic, so the gate is a FULL hash match:
    *  - one JOINT Lloyd over (subspace m, centroid cid) pairs — the
    *    [[NumSub]] per-subspace k-means runs are rows of one grouped
    *    aggregation, not a driver loop over subspaces; seeds are the
    *    [[SubK]] lowest vec_ids' subvectors ([[s3Scored]]'s discipline:
    *    fixed-point means, (d2, cid) tie-break);
    *  - ADC distances are EXACT INTEGERS: each (query, m, cid) cell is
    *    floor(d2 * 1e6) — one IEEE multiply+floor on a bit-identical d2
    *    — and a vector's approximate distance is the exact BIGINT sum of
    *    its [[NumSub]] cells, so no float-order drift can flip a rank.
    *
    * Scale shape: codes are (vec_id, m, cid) — N×[[NumSub]] small rows;
    * the LUT is queries×[[NumSub]]×[[SubK]] rows (bounded, broadcast);
    * the scan is one broadcast-hash join + map-side-partial SUM, no
    * shuffle of raw embeddings anywhere past the one-time encode. The
    * final stage is IVFADC-R's exact re-rank: the ADC ranks pick a
    * [[rerankDepth]]-deep shortlist per query (4% of the corpus), and
    * only those raw vectors are fetched for exact cosine — a 25×
    * reduction in exact-distance work that keeps recall stable as N
    * grows, while the corpus-wide scan still only ever touches the
    * 64×-compressed code table.
    */
  val NumSub = 8      // subspaces
  val SubDim = Dim / NumSub
  val SubK = 64       // centroids per subspace -> 6-bit codes
  val PqIters = 2     // Lloyd refinement rounds (mirrors [[LloydIters]])
  /** ADC shortlist depth fed to exact re-ranking: max(250, N/25). The
    * ratio keeps recall stable as N grows (tight-margin neighbors need a
    * deeper shortlist to survive quantization noise) at a 25× reduction
    * over brute force; the floor is the SMALL-corpus lever — on the
    * 2000-vector sf0.1 corpus the old floor of 100 (5% of that corpus)
    * measured recall 0.76, because this corpus' cosine margins are so
    * tight that ADC ranks 100-250 still hold true top-k members. At scale
    * the floor is irrelevant (N/25 dominates past 6250 vectors) and the
    * corpus-wide scan still reads only codes. Integer floor-division on
    * both engines (`//` in DuckDB), so the oracle derives the identical
    * depth.
    */
  def rerankDepth(n: Long): Int = math.max(250, (n / 25).toInt)

  /** Learn the PQ codebook: checkpointed double-cast corpus + the joint
    * Lloyd over (m, cid) — one grouped fixed-point mean per round refines
    * all NumSub sub-quantizers in the same pass. Every round's assignment
    * is the native codegen'd [[pqEncode]] projection (no codebook join,
    * no per-vector groupBy — see functions/PqEncode.scala for the retired
    * shapes and their measurements), so a round costs one corpus scan +
    * one skinny aggregation. Returns the corpus and the
    * (NumSub × SubK × SubDim) codebook (driver-resident; ~25 KiB of
    * doubles).
    */
  private[graft] def pqTrain(s: SparkSession, dir: String)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    import s.implicits._
    // parallelized: feeds PqIters encode+mean passes plus the corpus
    // encode and every ADC scan (the Materialize.parallelized rationale)
    val e = graft.plans.Materialize.parallelized(
      Tables.embeddings(s, dir)
        .select($"vec_id", $"embedding".cast("array<double>").as("emb")))
      .localCheckpoint(true)
    (e, pqTrainOf(e))
  }

  /** [[pqTrain]]'s joint Lloyd over an arbitrary checkpointed
    * (vec_id, emb) frame — [[s8]] trains on RESIDUALS through this.
    */
  private[graft] def pqTrainOf(e: DataFrame)
      : Array[Array[Array[Double]]] = {
    import e.sparkSession.implicits._
    // seeds: subvectors of the SubK lowest vec_ids (rank, not vec_id<k —
    // exact count even with sparse ids), per subspace
    var cents: Array[Array[Array[Double]]] = {
      val seed = e.orderBy($"vec_id").limit(SubK).collect()
        .map(_.getSeq[Double](1).toArray)
      Array.tabulate(NumSub, SubK) { (m, c) =>
        seed(c).slice(m * SubDim, (m + 1) * SubDim)
      }
    }
    for (_ <- 0 until PqIters) {
      val means = e
        .select(posexplode(pqEncode(cents, $"emb")).as(Seq("m", "cid")), $"emb")
        .select($"m", $"cid",
          posexplode(slice($"emb", $"m" * SubDim + 1, lit(SubDim)))
            .as(Seq("dim", "x")))
        .groupBy($"m", $"cid", $"dim")
        .agg(((sum(floor($"x" * 1e6)).cast("double") / count(lit(1))) / 1e6)
          .as("mn"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getAs[Int]("m"))(r.getAs[Int]("cid"))(r.getAs[Int]("dim")) =
          r.getAs[Double]("mn")
      }
      cents = next
    }
    cents
  }

  /** Stateless per-row PQ encode against a baked-in codebook: the native
    * codegen'd [[graft.functions.PqEncode]] expression (tight primitive
    * argmin loops inside whole-stage codegen — same IEEE chain and
    * lowest-cid tie-break as the retired interpreted shapes; see that
    * file's scaladoc for the measurements). A pure projection: usable in
    * a streaming plan with no shuffle and no state, and as the batch
    * corpus encode. Returns the NumSub-element code array.
    */
  private[graft] def pqEncode(cs: Array[Array[Array[Double]]],
      emb: Column): Column = graft.functions.PqEncode(cs, emb)

  def s6(s: SparkSession, dir: String): DataFrame = {
    val (e, codes, cents) = pqIndex(s, dir)
    s6Query(s, e, codes, cents)
  }

  /** Build the COMPLETE stored PQ index: learned codebook + the encoded
    * code table. Both are one-time artifacts — the code table is what the
    * corpus-wide scan reads instead of raw vectors, persisted alongside
    * the ~16 KiB codebook in deployment (here: checkpointed, so query
    * timings never re-pay the encode).
    */
  private[graft] def pqIndex(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Array[Double]]]) = {
    import s.implicits._
    val (e, cents) = pqTrain(s, dir)
    val codes = e
      .select($"vec_id", posexplode(pqEncode(cents, $"emb")).as(Seq("m", "cid")))
      .localCheckpoint(true)
    (e, codes, cents)
  }

  /** The deployed-index query path of [[s6]]: ADC lookup-table build +
    * code-table scan + shortlist + exact re-rank against an
    * ALREADY-BUILT index ([[pqIndex]]'s codebook + code table). This is
    * the per-query-batch cost of a live PQ index — everything upstream
    * (Lloyd training AND corpus encode) is one-time build cost.
    */
  private[graft] def s6Query(s: SparkSession, e: DataFrame, codes: DataFrame,
      cents: Array[Array[Array[Double]]]): DataFrame = {
    import s.implicits._
    // ADC lookup table: bounded query set on the driver (the s3
    // discipline); each cell an exact integer of 1e-6 ticks
    val queries = e.filter($"vec_id" < NumQueries)
      .select($"vec_id", $"emb").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    s6QueryFor(s, e, codes, cents, queries)
  }

  /** [[s6Query]] for an EXPLICIT query set — the serving path `g15`
    * drives per streaming micro-batch (each batch's queries are
    * independent, so batched union ≡ the full run).
    */
  private[graft] def s6QueryFor(s: SparkSession, e: DataFrame,
      codes: DataFrame, cents: Array[Array[Array[Double]]],
      queries: Array[(Long, Array[Double])]): DataFrame = {
    import s.implicits._
    val lutRows = queries.toSeq.flatMap { case (qid, qe) =>
      (0 until NumSub).flatMap { m =>
        (0 until SubK).map { cid =>
          var s0 = 0.0; var i = 0
          while (i < SubDim) {
            val dd = qe(m * SubDim + i) - cents(m)(cid)(i)
            s0 += dd * dd; i += 1
          }
          (qid, m, cid, math.floor(s0 * 1e6).toLong)
        }
      }
    }
    val lut = lutRows.toDF("query_id", "m", "cid", "ticks")
    val scored = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter($"query_id" =!= $"vec_id")
      .groupBy($"query_id", $"vec_id")
      .agg(sum($"ticks").as("adist_ticks"))
    // ADC shortlist (integer-exact ranks), then EXACT re-rank: only the
    // rerankDepth(N) shortlisted raw vectors per query are ever fetched —
    // the IVFADC-R shape, so the exact-distance work per query is 4% of
    // the corpus while the corpus-wide scan reads only codes
    val wAdc = Window.partitionBy($"query_id")
      .orderBy($"adist_ticks".asc, $"vec_id")
    val shortlist = scored.withColumn("srn", row_number().over(wAdc))
      .filter($"srn" <= rerankDepth(e.count()))
      .select($"query_id", $"vec_id".as("neighbor_id"))
    val qEmb = queries.toSeq.map { case (qid, qe) => (qid, qe.toSeq) }
      .toDF("query_id", "q_emb")
    val rer = shortlist
      .join(e.select($"vec_id".as("neighbor_id"), $"emb".as("n_emb")),
        Seq("neighbor_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id")
    rer.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= TopK)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk")
  }

  private def pqD2Sql(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${SubDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"

  /** The WITH-chain both [[s6Sql]] and `g11`'s oracle share: the joint
    * Lloyd unrolled CTE-per-round over (m, cid) keys — s3Sql's triples
    * with the subspace folded into every join — ending at the final
    * assignment `pa{PqIters}` (= every vector's PQ codes).
    */
  /** The joint-Lloyd CTE chain over an arbitrary subvector CTE `$subv`
    * (columns vec_id, m, sub): seeds `${px}c0` from the [[SubK]] lowest
    * vec_ids, [[PqIters]] unrolled triples, final assignment
    * `${px}a{PqIters}` over codebook `${px}c{PqIters}`. [[s6Sql]]'s chain
    * runs it over raw subvectors (px = "p"); [[s8Sql]] over RESIDUAL
    * subvectors (px = "rp").
    */
  private def pqChainSql(subv: String, px: String): String = {
    def d2(a: String, b: String) = pqD2Sql(a, b)
    def assignCte(name: String, cents: String) = s"""
    $name AS (
      SELECT vec_id, m, sub, cid FROM (
        SELECT v.vec_id, v.m, v.sub, c.cid,
          row_number() OVER (PARTITION BY v.vec_id, v.m
            ORDER BY ${d2("v.sub", "c.c")}, c.cid) AS rn
        FROM $subv v JOIN $cents c ON c.m = v.m) z
      WHERE rn = 1)"""
    def meanCte(name: String, assigned: String) = s"""
    $name AS (
      SELECT m, cid, t.i AS dim,
        (CAST(sum(CAST(floor(sub[t.i] * 1e6) AS BIGINT)) AS DOUBLE)
          / count(*)) / 1e6 AS mn
      FROM $assigned CROSS JOIN range(1, ${SubDim + 1}) t(i)
      GROUP BY m, cid, t.i)"""
    def nextCte(name: String, prev: String, mean: String) = s"""
    $name AS (
      SELECT s.m, s.cid, list(coalesce(q.mn, s.c[t.i]) ORDER BY t.i) AS c
      FROM $prev s CROSS JOIN range(1, ${SubDim + 1}) t(i)
      LEFT JOIN $mean q ON q.m = s.m AND q.cid = s.cid AND q.dim = t.i
      GROUP BY s.m, s.cid)"""
    val iters = (0 until PqIters).map { j =>
      assignCte(s"${px}a$j", s"${px}c$j") + "," +
        meanCte(s"${px}m$j", s"${px}a$j") + "," +
        nextCte(s"${px}c${j + 1}", s"${px}c$j", s"${px}m$j")
    }.mkString(",")
    val f = PqIters
    s"""${px}c0 AS (
      SELECT s.m, CAST(seeds.rn - 1 AS INTEGER) AS cid, s.sub AS c
      FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
            FROM (SELECT DISTINCT vec_id FROM $subv)) seeds
      JOIN $subv s ON s.vec_id = seeds.vec_id
      WHERE seeds.rn <= $SubK),
    $iters,
    ${assignCte(s"${px}a$f", s"${px}c$f").trim}"""
  }

  private[graft] val pqCodesSqlPrefix: String = s"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings),
    subv AS (
      SELECT e.vec_id, t.m,
        list_slice(e.emb, t.m * $SubDim + 1, t.m * $SubDim + $SubDim) AS sub
      FROM emb e CROSS JOIN range(0, $NumSub) t(m)),
    ${pqChainSql("subv", "p")}"""

  /** s6's oracle: [[pqCodesSqlPrefix]]'s codes, then the integer-exact
    * ADC scan, shortlist and exact re-rank.
    */
  val s6Sql: String = {
    def d2(a: String, b: String) = pqD2Sql(a, b)
    val f = PqIters
    s"""$pqCodesSqlPrefix,
    lut AS (
      SELECT q.vec_id AS query_id, c.m, c.cid,
        CAST(floor(${d2("q.sub", "c.c")} * 1e6) AS BIGINT) AS ticks
      FROM subv q JOIN pc$f c ON c.m = q.m
      WHERE q.vec_id < $NumQueries),
    scored AS (
      SELECT l.query_id, k.vec_id AS neighbor_id,
        CAST(sum(l.ticks) AS BIGINT) AS adist_ticks
      FROM pa$f k JOIN lut l ON l.m = k.m AND l.cid = k.cid
      WHERE l.query_id <> k.vec_id
      GROUP BY l.query_id, k.vec_id),
    rr AS (
      SELECT greatest(250, count(*) // 25) AS rr FROM embeddings),
    shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adist_ticks, neighbor_id) AS srn
        FROM scored) z, rr
      WHERE srn <= rr.rr),
    rer AS (
      SELECT sl.query_id, sl.neighbor_id,
        round(${VecSql.cosine("q.emb", "n.emb", Dim)}, 6) AS cos
      FROM shortl sl
      JOIN emb q ON q.vec_id = sl.query_id
      JOIN emb n ON n.vec_id = sl.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM rer)
    SELECT query_id, neighbor_id, cos, rnk
    FROM ranked WHERE rnk <= $TopK"""
  }

  /** s7: the PQ index ROUND-TRIPPED THROUGH STORAGE — [[pqIndex]]'s two
    * artifacts (the ~16 KiB codebook as (m, cid, dim, x) rows; the code
    * table as (vec_id, m, cid) rows) are written to parquet, reloaded
    * into a fresh codebook array + code DataFrame, and the reloaded index
    * serves [[s6Query]]. This is the deployment shape at 100 TB: build
    * once, persist, and every query session thereafter reads the stored
    * code table (N×8 skinny rows, ~42× smaller than raw vectors) without
    * re-training or re-encoding. Doubles survive a parquet round-trip
    * bit-exactly, so the gate is [[s6Sql]] — the reloaded index must
    * reproduce the live index's ranks to the last tie-break.
    */
  def s7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (e, codes, cents) = pqIndex(s, dir)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_pq_index").toString
    (for {
      m <- cents.indices; cid <- cents(m).indices; d <- cents(m)(cid).indices
    } yield (m, cid, d, cents(m)(cid)(d)))
      .toDF("m", "cid", "dim", "x")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$idxDir/codebook")
    codes.write.mode("overwrite").parquet(s"$idxDir/codes")
    val reloaded = Array.ofDim[Double](NumSub, SubK, SubDim)
    s.read.parquet(s"$idxDir/codebook").collect().foreach { r =>
      reloaded(r.getAs[Int]("m"))(r.getAs[Int]("cid"))(r.getAs[Int]("dim")) =
        r.getAs[Double]("x")
    }
    // materialize the reloaded code table so the on-disk index copy can
    // be deleted before the query plan runs (repeated gate/bench
    // invocations must not accumulate index copies in the temp dir)
    val reloadedCodes = s.read.parquet(s"$idxDir/codes").localCheckpoint(true)
    rmTree(idxDir)
    s6Query(s, e, reloadedCodes, reloaded)
  }

  /** Recursive delete of a temp index directory once its contents are
    * materialized — repeated gate/bench invocations must not accumulate
    * index copies in the temp dir (shared by [[s7]]/[[s9]]/`g19`).
    */
  private[graft] def rmTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** s8: IVF-PQ with RESIDUAL encoding (Jégou PAMI'11 §IV, the FAISS
    * `IVFPQ` composite — the index shape production vector stores deploy
    * at billion scale): the coarse IVF quantizer ([[ivfTrain]], shared
    * with s3) partitions the corpus into ~sqrt(N) cells, each vector's
    * RESIDUAL against its cell centroid is PQ-encoded ([[pqTrainOf]] —
    * residuals are far more compressible than raw vectors, which is why
    * the composite beats flat PQ at equal code size), and a query scans
    * only its nprobe closest cells with a PER-CELL asymmetric-distance
    * table built from the query's residual in that cell, then
    * exact-re-ranks the shortlist. Cost per query = nprobe/k of the code
    * table + a bounded LUT + [[rerankDepth]] raw fetches — at 100 TB both
    * pruning levers compose: IVF skips (k-nprobe)/k of the corpus, PQ
    * makes what remains a 42×-smaller memory-resident scan.
    *
    * Deterministic end to end (both trainers' disciplines + integer-exact
    * ADC), so the gate is a FULL hash match: the oracle replays coarse
    * Lloyd, residuals, residual-PQ Lloyd, probes, per-cell LUTs, the
    * BIGINT ADC scan and the tie-broken re-rank bit-for-bit.
    */
  def s8(s: SparkSession, dir: String): DataFrame = {
    val (e, coarse, codes, cents) = s8Index(s, dir)
    s8Query(s, e, coarse, codes, cents)
  }

  /** [[s8]]'s one-time build half (the bench times it apart from the
    * per-query-batch serve cost, the s6_build/s6_query discipline):
    * coarse IVF training, residuals, residual-PQ codebooks, and the
    * stored (vec_id, cell, m, cid) code table. Returns (corpus, coarse
    * codebook, code table, PQ codebooks).
    */
  def s8Index(s: SparkSession, dir: String)
      : (DataFrame, Array[Array[Double]], DataFrame,
         Array[Array[Array[Double]]]) = {
    import s.implicits._
    val (e, coarse, assigned) = ivfTrain(s, dir)
    // residuals: one broadcast join against the k×64-double codebook
    val cdf = coarse.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "c_emb")
    val res = assigned
      .join(broadcast(cdf), $"cid" === $"cell")
      .select($"vec_id", $"cell",
        zip_with($"emb", $"c_emb", (x, y) => x - y).as("emb"))
      .localCheckpoint(true)
    val cents = pqTrainOf(res.select($"vec_id", $"emb"))
    // the stored index: (vec_id, cell, m, cid) — IVF list membership and
    // PQ code in one skinny table
    val codes = res
      .select($"vec_id", $"cell",
        posexplode(pqEncode(cents, $"emb")).as(Seq("m", "cid")))
      .localCheckpoint(true)
    (e, coarse, codes, cents)
  }

  /** [[s8]]'s per-query-batch serve half against a built index. */
  def s8Query(s: SparkSession, e: DataFrame, coarse: Array[Array[Double]],
      codes: DataFrame, cents: Array[Array[Array[Double]]]): DataFrame = {
    import s.implicits._
    // bounded driver work: query set, probe cells, per-(query, cell) LUTs
    val queries = e.filter($"vec_id" < NumQueries)
      .select($"vec_id", $"emb").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    s8QueryFor(s, e, coarse, codes, cents, queries)
  }

  /** [[s8Query]] for an EXPLICIT query set — the serving path `g19`
    * drives per streaming micro-batch against the persisted index
    * (queries are independent, so batched union ≡ the full run; the
    * s6QueryFor↔g15 discipline).
    */
  private[graft] def s8QueryFor(s: SparkSession, e: DataFrame,
      coarse: Array[Array[Double]], codes: DataFrame,
      cents: Array[Array[Array[Double]]],
      queries: Array[(Long, Array[Double])]): DataFrame = {
    import s.implicits._
    val k = coarse.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s0 += d * d; i += 1 }
      s0
    }
    val lutRows = queries.toSeq.flatMap { case (qid, qe) =>
      coarse.zipWithIndex.sortBy { case (c, i) => (d2(qe, c), i) }
        .take(nProbe(k)).flatMap { case (cEmb, cell) =>
          val qr = Array.tabulate(Dim)(i => qe(i) - cEmb(i))
          (0 until NumSub).flatMap { m =>
            (0 until SubK).map { cid =>
              var s0 = 0.0; var i = 0
              while (i < SubDim) {
                val dd = qr(m * SubDim + i) - cents(m)(cid)(i)
                s0 += dd * dd; i += 1
              }
              (qid, cell, m, cid, math.floor(s0 * 1e6).toLong)
            }
          }
        }
    }
    val lut = lutRows.toDF("query_id", "cell", "m", "cid", "ticks")
    // the scan: only codes in probed cells join; exact BIGINT ADC sums
    val scored = codes.join(broadcast(lut), Seq("cell", "m", "cid"))
      .filter($"query_id" =!= $"vec_id")
      .groupBy($"query_id", $"vec_id")
      .agg(sum($"ticks").as("adist_ticks"))
    val wAdc = Window.partitionBy($"query_id")
      .orderBy($"adist_ticks".asc, $"vec_id")
    val shortlist = scored.withColumn("srn", row_number().over(wAdc))
      .filter($"srn" <= rerankDepth(e.count()))
      .select($"query_id", $"vec_id".as("neighbor_id"))
    val qEmb = queries.toSeq.map { case (qid, qe) => (qid, qe.toSeq) }
      .toDF("query_id", "q_emb")
    val rer = shortlist
      .join(e.select($"vec_id".as("neighbor_id"), $"emb".as("n_emb")),
        Seq("neighbor_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .withColumn("cos", round(Vec.cosineFast($"q_emb", $"n_emb"), 6))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id")
    rer.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= TopK)
      .select($"query_id", $"neighbor_id", $"cos", $"rnk")
  }

  val s8Sql: String = {
    val f = LloydIters
    val g = PqIters
    s"""$ivfSqlPrefix,
    $ivfProbeSql,
    res AS (
      SELECT a.vec_id, a.cid AS cell,
        list_transform(range(1, ${Dim + 1}), i -> a.emb[i] - c.c[i]) AS remb
      FROM a$f a JOIN c$f c ON c.cid = a.cid),
    rsubv AS (
      SELECT r.vec_id, t.m,
        list_slice(r.remb, t.m * $SubDim + 1, t.m * $SubDim + $SubDim) AS sub
      FROM res r CROSS JOIN range(0, $NumSub) t(m)),
    ${pqChainSql("rsubv", "rp")},
    qres AS (
      SELECT pr.query_id, pr.cid AS cell,
        list_transform(range(1, ${Dim + 1}), i -> pr.q_emb[i] - c.c[i]) AS qr
      FROM pr JOIN c$f c ON c.cid = pr.cid),
    qrsub AS (
      SELECT query_id, cell, t.m,
        list_slice(qr, t.m * $SubDim + 1, t.m * $SubDim + $SubDim) AS sub
      FROM qres CROSS JOIN range(0, $NumSub) t(m)),
    lut AS (
      SELECT q.query_id, q.cell, q.m, c.cid,
        CAST(floor(${pqD2Sql("q.sub", "c.c")} * 1e6) AS BIGINT) AS ticks
      FROM qrsub q JOIN rpc$g c ON c.m = q.m),
    scored AS (
      SELECT l.query_id, k.vec_id AS neighbor_id,
        CAST(sum(l.ticks) AS BIGINT) AS adist_ticks
      FROM rpa$g k
      JOIN res r ON r.vec_id = k.vec_id
      JOIN lut l ON l.cell = r.cell AND l.m = k.m AND l.cid = k.cid
      WHERE l.query_id <> k.vec_id
      GROUP BY l.query_id, k.vec_id),
    rr AS (
      SELECT greatest(250, count(*) // 25) AS rr FROM embeddings),
    shortl AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adist_ticks, neighbor_id) AS srn
        FROM scored) z, rr
      WHERE srn <= rr.rr),
    rer AS (
      SELECT sl.query_id, sl.neighbor_id,
        round(${VecSql.cosine("q.emb", "n.emb", Dim)}, 6) AS cos
      FROM shortl sl
      JOIN emb q ON q.vec_id = sl.query_id
      JOIN emb n ON n.vec_id = sl.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      FROM rer)
    SELECT query_id, neighbor_id, cos, rnk
    FROM ranked WHERE rnk <= $TopK"""
  }

  /** s9: the IVF-PQ index ROUND-TRIPPED THROUGH STORAGE — [[s7]]'s
    * persist/serve discipline applied to the [[s8]] composite (the
    * round-11 verdict's one remaining deployment-shape gap: a rebuilt-
    * per-session IVF-PQ index doesn't match the reference's persistent
    * always-on store, reference runners/flink/.../StreamyDb.scala:177-242).
    * [[s8Index]]'s three artifacts — the k×Dim coarse codebook, the
    * NumSub×SubK×SubDim residual-PQ codebook, and the (vec_id, cell, m,
    * cid) code table — are written to parquet, reloaded COLD (k itself
    * is re-derived from the stored rows), and the reloaded index serves
    * [[s8Query]]. At 100 TB this is the shape that matters: the
    * two-trainer build runs once; every query session reads ~16 KiB of
    * codebooks plus the skinny code table. Doubles survive a parquet
    * round-trip bit-exactly, so the gate is the FULL [[s8Sql]] hash — the
    * reloaded index must reproduce the live composite to the last
    * tie-break.
    */
  def s9(s: SparkSession, dir: String): DataFrame = {
    val (e, idxDir) = s9Persist(s, dir)
    val (coarse, codes, cents) = s9Reload(s, idxDir)
    rmTree(idxDir)
    s8Query(s, e, coarse, codes, cents)
  }

  /** Build the s8 index and persist it; returns (corpus, index dir). */
  private[graft] def s9Persist(s: SparkSession, dir: String)
      : (DataFrame, String) = {
    val (e, coarse, codes, cents) = s8Index(s, dir)
    (e, s9PersistOf(s, coarse, codes, cents))
  }

  /** Persist an ALREADY-BUILT s8 index's three artifacts to a fresh
    * directory (split from [[s9Persist]] so the bench can time the
    * persist+reload round-trip apart from the two-trainer build).
    */
  private[graft] def s9PersistOf(s: SparkSession,
      coarse: Array[Array[Double]], codes: DataFrame,
      cents: Array[Array[Array[Double]]]): String = {
    import s.implicits._
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_index").toString
    (for { cid <- coarse.indices; d <- coarse(cid).indices }
      yield (cid, d, coarse(cid)(d)))
      .toDF("cid", "dim", "x").repartition(1)
      .write.mode("overwrite").parquet(s"$idxDir/coarse")
    (for {
      m <- cents.indices; cid <- cents(m).indices; d <- cents(m)(cid).indices
    } yield (m, cid, d, cents(m)(cid)(d)))
      .toDF("m", "cid", "dim", "x").repartition(1)
      .write.mode("overwrite").parquet(s"$idxDir/codebook")
    codes.write.mode("overwrite").parquet(s"$idxDir/codes")
    idxDir
  }

  /** Reload a persisted s8 index cold: nothing but the stored rows —
    * the cell count k comes from the coarse rows themselves. The code
    * table is materialized so the on-disk copy can be deleted before
    * the serve plan runs (the [[s7]] discipline).
    */
  private[graft] def s9Reload(s: SparkSession, idxDir: String)
      : (Array[Array[Double]], DataFrame, Array[Array[Array[Double]]]) = {
    val coarseRows = s.read.parquet(s"$idxDir/coarse").collect()
    val k = coarseRows.iterator.map(_.getAs[Int]("cid")).max + 1
    val coarse = Array.ofDim[Double](k, Dim)
    coarseRows.foreach { r =>
      coarse(r.getAs[Int]("cid"))(r.getAs[Int]("dim")) = r.getAs[Double]("x")
    }
    val cents = Array.ofDim[Double](NumSub, SubK, SubDim)
    s.read.parquet(s"$idxDir/codebook").collect().foreach { r =>
      cents(r.getAs[Int]("m"))(r.getAs[Int]("cid"))(r.getAs[Int]("dim")) =
        r.getAs[Double]("x")
    }
    val codes = s.read.parquet(s"$idxDir/codes").localCheckpoint(true)
    (coarse, codes, cents)
  }

  val queries: Map[String, Q] = Map(
    "s1_bruteforce_topk" -> s1, "s2_lsh_ann" -> s2, "s3_ivf_ann" -> s3,
    "s4_knn_join" -> s4, "s5_radius_search" -> s5, "s6_pq_ann" -> s6,
    "s7_pq_persist" -> s7, "s8_ivfpq_ann" -> s8, "s9_ivfpq_persist" -> s9)

  val oracles: Map[String, String] = Map(
    "s1_bruteforce_topk" -> s1Sql, "s2_lsh_ann" -> s2Sql,
    "s3_ivf_ann" -> s3Sql, "s4_knn_join" -> s4Sql,
    "s5_radius_search" -> s5Sql, "s6_pq_ann" -> s6Sql,
    "s7_pq_persist" -> s6Sql, "s8_ivfpq_ann" -> s8Sql,
    "s9_ivfpq_persist" -> s8Sql)
}
