package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Gate-time detector for the "silently serialized work" defect class:
  * plans that run CORRECTLY while quietly abandoning the scalable
  * execution path. Rounds 12-13 found four instances one at a time, each
  * only visible as an unexplained wall-clock cliff at 10-100x the gate
  * SF; this audit turns the class into a per-query check that runs over
  * every gate plan (graft.Verify prints violations and dumps
  * `plan_guard.json`; `PlanGuardSpec` asserts the allowlist).
  *
  * Detected, with the incident that motivated each:
  *
  *  - `codegen-compile`: a whole-stage codegen unit whose generated Java
  *    does not compile. Spark catches the Janino exception and SILENTLY
  *    re-executes the child plan interpreted (`spark.sql.codegen.fallback`
  *    default true) — the round-13 BloomProbe margin-strip bug ran every
  *    d14 probe through interpreted eval with only a WARN to show for it.
  *    Here the stage source is compiled eagerly (the compile cache makes
  *    the later real execution free) and a failure is a violation.
  *  - `jit-cliff`: a compiled stage whose largest method exceeds
  *    HotSpot's -XX:DontCompileHugeMethods threshold (8000 bytecodes,
  *    [[CodeGenerator.DEFAULT_JVM_HUGE_METHOD_LIMIT]]). The JVM never
  *    JIT-compiles such a method, so the stage runs in the bytecode
  *    interpreter at ~20x cost — the round-12 SignBucket incident
  *    (4x 19-plane dot-product `when` trees in one projection: 48 s for
  *    2 s of work at sf10). Spark itself only falls back past 65535.
  *  - `sort-agg`: a SortAggregateExec. Spark picks sort-based
  *    aggregation only when some aggregate buffer type is not mutable in
  *    an UnsafeRow, and on a large input that choice usually traces back
  *    to an avoidable expression shape in OUR query (the round-13 s4
  *    incident: `max(struct(cos, -id))` sorted a 1G-row exploded pair
  *    stream because the struct buffer demoted the agg; packing the pair
  *    into one long restored hash aggregation with map-side combine).
  *    Legitimate demotions (string-typed min/max) go on the caller's
  *    allowlist, so NEW demotions fail the spec by name.
  *  - `cartesian`: CartesianProductExec anywhere — never acceptable at
  *    scale; every intended all-pairs op in the library is bucketed.
  *  - `unpruned-scan`: a FilterExec evaluating directly over a parquet
  *    scan that pushed NOTHING (`PushedFilters: []`) — the h4/h10
  *    discipline generalized: a predicate that reaches the scan node
  *    but not the reader skips no row groups, so a selective query
  *    still reads the full 100 TB. Residual re-evaluation above a scan
  *    WITH pushed filters is normal (exactness); zero pushed filters
  *    under a live filter means every predicate failed to translate —
  *    legitimate only for expression predicates (modulo-class CDC/split
  *    workloads), which go on the caller's allowlist by query name.
  *  - `bnlj`: BroadcastNestedLoopJoinExec — acceptable ONLY for the
  *    bounded-small build sides PLANS.md documents (1-row aggregates,
  *    codebooks); allowlisted by query name so a new unbounded one fails.
  *
  * Lives in `org.apache.spark.sql.graft` for `private[sql]` access to
  * `WholeStageCodegenExec.doCodeGen` / `CodeGenerator.compile` /
  * `QueryStageExec.plan`.
  */
object PlanAudit {

  /** One violation: `kind` is the class tag above, `detail` pins the node. */
  final case class Violation(kind: String, detail: String) {
    override def toString: String = s"$kind: $detail"
  }

  /** HotSpot's huge-method threshold — methods past it are interpreted. */
  val JitMethodLimit: Int = CodeGenerator.DEFAULT_JVM_HUGE_METHOD_LIMIT

  /** Audit an executed (or planned) tree, descending through AQE
    * wrappers, query stages, reused exchanges, and subqueries. Safe to
    * call both before execution (AQE tree still on its initial plan —
    * codegen stages are then absent, which is why [[PlanGuardSpec]]
    * audits with AQE off) and after (final plan with codegen inserted).
    */
  def audit(plan: SparkPlan): Seq[Violation] = {
    val out = Seq.newBuilder[Violation]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())

    def node(p: SparkPlan): String =
      p.nodeName + " " + p.output.map(_.name).mkString("[", ",", "]")

    // the parquet scan a filter sits directly on, looking through the
    // row-shaping wrappers codegen inserts (projections keep the filter
    // "on the scan" for pushdown purposes — Catalyst pushes through them)
    @annotation.tailrec
    def scanUnder(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Some(f)
      case _: ProjectExec | _: InputAdapter | _: WholeStageCodegenExec =>
        scanUnder(p.children.head)
      case c if c.nodeName == "ColumnarToRow" => scanUnder(c.children.head)
      case _ => None
    }

    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case c: CartesianProductExec =>
          out += Violation("cartesian", node(c))
          c.children.foreach(walk)
        case j: BroadcastNestedLoopJoinExec =>
          out += Violation("bnlj", node(j))
          j.children.foreach(walk)
        case s: SortAggregateExec =>
          out += Violation("sort-agg",
            s.aggregateExpressions.map(_.sql).mkString(", "))
          s.children.foreach(walk)
        case f: FilterExec =>
          scanUnder(f.child).foreach { scan =>
            // a scan pruned purely by partition filters skips IO just as
            // correctly as a pushed row-group filter — don't flag it
            // (r14 advice: PushedFilters=="[]" alone over-flags)
            if (scan.metadata.get("PushedFilters").contains("[]") &&
                scan.metadata.get("PartitionFilters")
                  .getOrElse("[]") == "[]")
              out += Violation("unpruned-scan",
                s"${f.condition.sql.take(200)} over unpushed scan " +
                  scan.tableIdentifier.map(_.toString)
                    .getOrElse(scan.relation.location.rootPaths.headOption
                      .map(_.getName).getOrElse("?")))
          }
          f.children.foreach(walk)
        case w: WholeStageCodegenExec =>
          try {
            val (_, source) = w.doCodeGen()
            val (_, stats) = CodeGenerator.compile(source)
            if (stats.maxMethodCodeSize > JitMethodLimit)
              out += Violation("jit-cliff",
                s"maxMethodCodeSize=${stats.maxMethodCodeSize} > " +
                  s"$JitMethodLimit in ${node(w)}")
          } catch {
            case e: Exception =>
              out += Violation("codegen-compile",
                s"${node(w)}: ${String.valueOf(e.getMessage).take(400)}")
          }
          w.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }

    walk(plan)
    out.result()
  }

  /** [[audit]] over a DataFrame's executed plan. */
  def audit(df: org.apache.spark.sql.DataFrame): Seq[Violation] =
    audit(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
      org.apache.spark.sql.Row]].queryExecution.executedPlan)
}
