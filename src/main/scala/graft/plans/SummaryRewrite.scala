package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, KnownNotNull, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-summary routing: a Catalyst optimizer rule
  * that rewrites a matching `Aggregate` over a registered base table
  * into a scan of its (much smaller) materialized summary.
  *
  * The 100 TB story: dashboards and gate queries re-aggregate the same
  * fact table all day. With the summary maintained incrementally off
  * the CDC feed ([[graft.sinks.IncrementalView]] — count/sum are
  * self-maintainable), the optimizer can answer the recurring
  * aggregate from the view without the caller changing a line: the
  * query stays written against the base table, the plan reads
  * O(groups) instead of O(facts). Freshness is the registrant's
  * contract (register after each maintenance commit), exactly as in
  * any MV-rewrite system.
  *
  * Matching is deliberately conservative — rewrite only when the
  * answer is PROVABLY derivable from the registered summary:
  *  - the aggregate's child is the registered base relation (or a
  *    pure-attribute Project of it — column pruning's shape); any
  *    derived projection disqualifies, and a Filter qualifies only
  *    when it commutes (see below);
  *  - grouping expressions are exactly the registered group columns
  *    (direct routing: project the summary), or a NON-EMPTY STRICT
  *    SUBSET of them (roll-up routing: re-aggregate the summary —
  *    count(*) re-sums the maintained counts, sum re-sums, min/max
  *    re-extremize; the daily-view/monthly-query shape). The empty
  *    grouping (global aggregate) stays disqualified: over an empty
  *    base, count(*) is 0 but a re-sum of zero summary rows is NULL;
  *  - every output is a group column or an undistinct, unfiltered
  *    count(*) / count(col) / sum / min / max over a registered source
  *    column — or an avg(col) DECOMPOSED onto a registered
  *    (sum(col), count(col)) pair: sum/cnt directly, re-summed parts
  *    under roll-up (avg is algebraic, not distributive — the count(*)
  *    column never licenses it because avg ignores NULLs) — or a
  *    DETERMINISTIC SCALAR expression over those (CollapseProject puts
  *    `round(avg(x), 6)`-style post-processing INSIDE the aggregate's
  *    output list; equal inputs give equal values, so the wrapper
  *    rebuilds verbatim over the mapped leaves).
  *
  * The rewrite preserves the original output attribute ids (parents
  * re-bind nothing) and re-asserts non-nullability where the original
  * aggregate guaranteed it (count(*)).
  *
  * Scope and selection: registrations are SESSION-scoped (one
  * session's summaries never route another's queries), and a base may
  * carry SEVERAL summaries at once — e.g. a fine daily view and a
  * coarse monthly one. Candidates are tried coarsest-first, so a query
  * the coarse summary can answer reads the smaller table (direct
  * route) while finer queries fall through to the fine summary's
  * roll-up; selection never changes semantics, only which qualifying
  * summary pays the scan.
  *
  * Wire-up: session-wide via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or on a live session via the public
  * `spark.experimental.extraOptimizations` hook ([[SummaryRewrite.enable]]).
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** One registered summary: `aggCols` maps (function, base column) →
    * summary column; count(*) is keyed ("count", "*").
    *
    * `rebuildMaintained` declares HOW the summary is kept fresh:
    * count/sum are self-maintainable off the CDC feed
    * ([[graft.sinks.IncrementalView.maintain]]), but min/max are NOT
    * self-maintainable under deletes (a deleted extremum needs a group
    * rescan the delta rule never performs), so a summary carrying
    * min/max columns must be refreshed by a rebuild — full, or the
    * bounded dirty-group form
    * ([[graft.sinks.IncrementalView.maintainWithExtrema]], which
    * rescans exactly the delete-touched groups) — and the registrant
    * must say so, or [[register]] refuses. */
  final case class MaterializedSummary(
      basePath: String,
      summaryPath: String,
      groupCols: Seq[String],
      aggCols: Map[(String, String), String],
      rebuildMaintained: Boolean = false)

  /** Registrations are SESSION-SCOPED — keyed (session UUID, base
    * path) — so one session's summary can never route another
    * session's query (the process-global registry was an isolation
    * leak: any co-tenant session touching the same base path silently
    * inherited the routing and its freshness contract). Each key holds
    * a LIST of summaries over the same base (e.g. a fine daily view
    * and a coarse monthly one), kept coarsest-first so routing picks
    * the cheapest qualifying summary. */
  private val registry =
    new ConcurrentHashMap[(String, String), List[MaterializedSummary]]()

  /** Weak handles on every session that ever registered, keyed by its
    * minted UUID. NOTHING static may strongly reach the session — the
    * registry values are plain strings and the plan cache lives inside
    * the session itself ([[SessionPlanCache]]) — so abandoning a
    * session really does make it unreachable; the weak reference then
    * clears and [[reap]] sweeps its registry rows (its cached plans
    * were collected with it). Long-lived multi-session servers stop
    * accreting, and the registry.isEmpty fast path comes back once the
    * last live registration is gone. */
  private val sessionRefs = new ConcurrentHashMap[
    String, java.lang.ref.WeakReference[SparkSession]]()

  /** Analyzed summary scans, resolved ONCE per summary directory PER
    * REGISTRATION: a served version directory is immutable
    * (VersionedTable commit discipline), so the file listing + schema
    * resolution happen at first routing instead of on every matched
    * Aggregate. The cache lives INSIDE the session it serves — a
    * no-op optimizer rule attached to the session's
    * `experimental.extraOptimizations`, the one public per-session
    * slot a library can hang state off. It must NOT live in a static
    * map: an analyzed scan's HadoopFsRelation/InMemoryFileIndex
    * strongly reference their SparkSession, so a static cache would
    * keep every abandoned session that ever ROUTED a query strongly
    * reachable, its [[sessionRefs]] weak reference would never clear,
    * and [[reap]] could never sweep it (the r16 advisor's finding —
    * the registry kept accreting precisely in the common case). Held
    * this way, an abandoned session, its holder, and its cached plans
    * form an unreachable cycle and collect TOGETHER; the weak
    * reference then clears and reap sweeps the registry rows. Entries
    * still die with their own registration (register's same-shape
    * replacement, deregister) — two sessions registering the same
    * summary path each hold their own entry in their own holder, so
    * one session's deregister never evicts a plan the other still
    * serves. apply() is identity: the rule slot is a lifetime anchor,
    * not a rewrite. */
  private final class SessionPlanCache extends Rule[LogicalPlan] {
    val plans = new ConcurrentHashMap[String, LogicalPlan]()
    override def apply(plan: LogicalPlan): LogicalPlan = plan
  }

  /** The session's plan-cache holder, if the session has one (every
    * registered session does — [[register]] attaches it). Read-only:
    * the optimizer's lookup path must never mutate session state. */
  private def holderIfAny(spark: SparkSession): Option[SessionPlanCache] =
    spark.experimental.extraOptimizations.collectFirst {
      case h: SessionPlanCache => h
    }

  /** Attach (or find) the session's holder — write paths only. */
  private def holderOf(session: SparkSession): SessionPlanCache =
    session.experimental.synchronized {
      holderIfAny(session).getOrElse {
        val h = new SessionPlanCache
        session.experimental.extraOptimizations =
          session.experimental.extraOptimizations :+ h
        h
      }
    }

  /** Sweep every entry owned by a session the JVM has collected (its
    * plan cache died with it — see [[SessionPlanCache]]). Runs at each
    * register/deregister and on the optimizer's lookup path — cost is
    * one scan of the (registration-count-sized) session map, nothing
    * data-sized. */
  private def reap(): Unit =
    sessionRefs.forEach { (uuid, ref) =>
      if (ref.get() == null) {
        sessionRefs.remove(uuid)
        registry.keySet.removeIf(_._1 == uuid)
      }
    }

  private def normalize(p: String): String = new Path(p).toUri.getPath

  /** Session-conf key carrying the session's registry identity. SQL
    * conf is the natural per-session store: `newSession()` gets a
    * fresh conf (no inherited registrations), while a streaming
    * micro-batch's CLONED session keeps its parent's id — a stream
    * the session owns routes like the session. */
  private val SessionIdKey = "spark.graft.summaryRewrite.sessionId"

  /** Mint-on-first-use id — called only by the WRITE paths
    * (register/deregister). The lookup path uses [[sessionKeyIfAny]]:
    * a session that never registered has no id and therefore no
    * registrations, and the optimizer must never mutate session conf
    * mid-optimization just to discover that. */
  private def sessionKey(spark: SparkSession): String =
    spark.conf.getOption(SessionIdKey).getOrElse(synchronized {
      spark.conf.getOption(SessionIdKey).getOrElse {
        val id = java.util.UUID.randomUUID().toString
        spark.conf.set(SessionIdKey, id)
        id
      }
    })

  private def sessionKeyIfAny(spark: SparkSession): Option[String] =
    spark.conf.getOption(SessionIdKey)

  /** Cached analyzed-plan count across every LIVE registered session —
    * spec hook pinning that routing resolves each served summary once,
    * not once per query (and that deregistration evicts). */
  private[graft] def cachedSummaryPlanCount: Int = {
    val holders = scala.collection.mutable.Set.empty[SessionPlanCache]
    sessionRefs.forEach { (_, ref) =>
      Option(ref.get()).flatMap(holderIfAny).foreach(holders += _)
    }
    holders.toSeq.map(_.plans.size).sum
  }

  /** Spec hooks for the reaping contract. */
  private[graft] def registrySize: Int = registry.size()
  private[graft] def reapNow(): Unit = reap()

  /** Register `s` for `session` (defaults to the thread's active
    * session — callers building queries against an EXPLICIT session,
    * as the Wave builders do everywhere else, should pass it rather
    * than rely on the thread-local being the one they mean). */
  def register(s: MaterializedSummary,
      session: SparkSession = SparkSession.active): Unit = {
    reap()
    val extrema = s.aggCols.keys.filter {
      case (fn, _) => fn == "min" || fn == "max"
    }
    require(extrema.isEmpty || s.rebuildMaintained,
      s"summary for ${s.basePath} maps min/max columns " +
        s"(${extrema.mkString(", ")}) but is not declared " +
        "rebuildMaintained: min/max are not self-maintainable under " +
        "deletes, so IncrementalView.maintain cannot keep them fresh — " +
        "serve them only from a summary refreshed by rebuild (full, or " +
        "IncrementalView.maintainWithExtrema's dirty-group rescan) and " +
        "declare rebuildMaintained = true")
    val sk = sessionKey(session)
    sessionRefs.putIfAbsent(sk,
      new java.lang.ref.WeakReference(session))
    val holder = holderOf(session) // the session now anchors its cache
    val key = (sk, normalize(s.basePath))
    registry.compute(key, (_, old) => {
      // a re-registration of the same summary SHAPE (the maintenance
      // jobs serving version N+1) replaces its predecessor — an atomic
      // pointer swap; a different shape joins the candidate list
      val prev = Option(old).getOrElse(Nil)
      val (replaced, kept) = prev.partition(e =>
        e.groupCols == s.groupCols && e.aggCols == s.aggCols)
      replaced.foreach(e => holder.plans.remove(e.summaryPath))
      (kept :+ s).sortBy(_.groupCols.size) // coarsest-first = cheapest
    })
  }

  /** Drop every summary `session` (default: the thread's active
    * session) registered over `basePath`. */
  def deregister(basePath: String,
      session: SparkSession = SparkSession.active): Unit = {
    reap()
    val sk = sessionKey(session)
    val old = registry.remove((sk, normalize(basePath)))
    val holder = holderOf(session)
    Option(old).getOrElse(Nil)
      .foreach(e => holder.plans.remove(e.summaryPath))
  }

  /** Activate on a live session (idempotent). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** The ACTIVE session's registered summaries over this base
    * relation, coarsest-first (register keeps the order). */
  private def summariesFor(
      rel: LogicalRelation): Seq[MaterializedSummary] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toSeq match {
          case Seq(single) =>
            (for {
              sp <- SparkSession.getActiveSession.toSeq
              sk <- sessionKeyIfAny(sp).toSeq
              ss <- Option(registry.get((sk, single.toUri.getPath)))
                .getOrElse(Nil)
            } yield ss)
          case _ => Nil
        }
      case _ => Nil
    }

  /** The cached analyzed scan of an (immutable) summary directory,
    * re-instanced per use so two routed subtrees in one query plan
    * never share attribute ids. The cache is the SESSION's own holder
    * (a registered session always has one — register attaches it; a
    * cloned streaming session shares its parent's, matching the
    * conf-id inheritance); a session without a holder resolves
    * uncached rather than mutate session state mid-optimization. */
  private def summaryPlan(spark: SparkSession, path: String): LogicalPlan = {
    val plan = holderIfAny(spark) match {
      case Some(h) => h.plans.computeIfAbsent(path,
        p => spark.read.parquet(p).queryExecution.analyzed)
      case None => spark.read.parquet(path).queryExecution.analyzed
    }
    plan.transformUp { case r: LogicalRelation => r.newInstance() }
  }

  /** Base relation under any stack of pure-attribute Projects (column
    * pruning's shape) and Filters — the filters are RETURNED, not
    * accepted: the caller rewrites only when every condition commutes
    * with the grouping (deterministic, group-columns-only — e.g. the
    * `isnotnull(g)` a join infers), re-applying it above the summary
    * scan. Any other filter disqualifies the plan. */
  private def baseOf(
      plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case rel: LogicalRelation => Some((rel, Nil))
      case Project(list, child)
          if list.forall(_.isInstanceOf[AttributeReference]) =>
        baseOf(child)
      case Filter(cond, child) =>
        baseOf(child).map { case (r, cs) => (r, cond +: cs) }
      case _ => None
    }

  /** (function, source column) key for a supported aggregate call.
    * count over a COLUMN keys ("count", col) — the non-null count,
    * distinct from count(*) — and is also what licenses the avg
    * decomposition (see [[avgParts]]). */
  private def aggKey(ae: AggregateExpression): Option[(String, String)] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case c: Count =>
        c.children match {
          case Seq(_: Literal)            => Some(("count", "*"))
          case Seq(a: AttributeReference) => Some(("count", a.name))
          case _                          => None
        }
      case s: Sum =>
        s.child match {
          case a: AttributeReference => Some(("sum", a.name))
          case _                     => None
        }
      case m: Min =>
        m.child match {
          case a: AttributeReference => Some(("min", a.name))
          case _                     => None
        }
      case m: Max =>
        m.child match {
          case a: AttributeReference => Some(("max", a.name))
          case _                     => None
        }
      case _ => None
    }

  /** avg(x) decomposed onto summary columns: the (sum over x, non-null
    * count over x) pair, when BOTH are registered. Exact by algebra —
    * avg ignores NULLs, which is why the per-column count (never
    * count(*)) licenses it, and an all-NULL group divides NULL by 0
    * and stays NULL, matching avg. Only double-typed avg qualifies
    * (decimal avg carries its own precision arithmetic).
    *
    * Float bound, stated honestly: "exact by algebra" holds in real
    * arithmetic, not IEEE754. Spark's native Average over integral
    * inputs accumulates its sum in DOUBLE, so once a group's running
    * sum passes 2^53 the UNROUTED plan itself rounds intermediate
    * sums; the routed form divides an exactly-maintained integral sum
    * instead. Below 2^53 both sums are exact and the quotients are
    * bit-identical; beyond it they can differ past the last ulp — with
    * the routed answer the CLOSER one (one correctly-rounded division
    * of exact operands vs. a drifted accumulation). The divergence is
    * bounded by the native accumulation's own error, never introduced
    * by the rewrite. Serves the
    * direct route as sum_x / cnt_x and the roll-up route as
    * sum(sum_x) / sum(cnt_x) — the classic decomposition that makes
    * avg algebraic even though it is not distributive. */
  private def avgParts(
      ae: AggregateExpression,
      s: MaterializedSummary): Option[(String, String)] =
    if (ae.isDistinct || ae.filter.nonEmpty ||
      ae.dataType != DoubleType) None
    else ae.aggregateFunction match {
      case a: Average => a.child match {
        case c: AttributeReference =>
          for {
            sumCol <- s.aggCols.get(("sum", c.name))
            cntCol <- s.aggCols.get(("count", c.name))
          } yield (sumCol, cntCol)
        case _ => None
      }
      case _ => None
    }

  /** Rebuild a deterministic scalar expression tree over the summary:
    * aggregate calls map through `aggLeaf` (route-specific — the direct
    * route projects a summary column, the roll-up route re-aggregates
    * it), group columns map to their summary attributes, literals pass
    * through, and any other deterministic node rebuilds over its mapped
    * children — equal inputs give equal values, so the wrapper is
    * semantics-preserving by construction. Subquery expressions never
    * qualify (their value hangs off another plan), and any
    * non-deterministic node disqualifies the output. */
  private def mapScalar(
      e: Expression,
      groupOk: String => Boolean,
      sOut: Map[String, Attribute],
      aggLeaf: AggregateExpression => Option[Expression]): Option[Expression] =
    e match {
      case ae: AggregateExpression => aggLeaf(ae)
      case a: AttributeReference =>
        if (groupOk(a.name)) sOut.get(a.name).filter(_.dataType == a.dataType)
        else None
      case l: Literal           => Some(l)
      case _: PlanExpression[_] => None
      case other if other.deterministic =>
        val kids = other.children.map(mapScalar(_, groupOk, sOut, aggLeaf))
        if (kids.contains(None)) None
        else Some(other.withNewChildren(kids.map(_.get)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!sessionRefs.isEmpty) reap() // abandoned sessions: sweep, so an
    if (registry.isEmpty) return plan // empty registry fast-paths again
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        (for {
          (rel, conds) <- baseOf(child).iterator
          s <- summariesFor(rel).iterator // coarsest candidate first
          routed <- rewrite(agg, groupExprs, aggExprs, conds, s).iterator
        } yield routed).nextOption().getOrElse(agg)
    }
  }

  private def rewrite(
      agg: Aggregate,
      groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      conds: Seq[Expression],
      s: MaterializedSummary): Option[LogicalPlan] = {
    // grouping must be registered group columns: all of them (direct
    // routing) or a non-empty strict subset (roll-up routing)
    val groupAttrs = groupExprs.map {
      case a: AttributeReference => a
      case _                     => return None
    }
    val groupNames = groupAttrs.map(_.name)
    if (groupNames.distinct != groupNames) return None
    val exact = groupNames.sorted == s.groupCols.sorted
    if (!exact) {
      if (groupNames.isEmpty ||
        !groupNames.toSet.subsetOf(s.groupCols.toSet)) return None
      return rollup(groupAttrs, aggExprs, conds, s)
    }
    val groupSet = groupNames.toSet

    // every scan-side filter must commute with the grouping: a
    // deterministic predicate over group columns only keeps or drops
    // whole groups, so it re-applies unchanged above the summary (the
    // group output attributes ARE the base attributes it references)
    // ... and the rewritten Project must re-expose the exact attribute
    // ids the filter references, so only group columns passed through
    // UN-aliased into the output qualify as filter sources
    val passThroughGroupAttrs = org.apache.spark.sql.catalyst.expressions
      .AttributeSet(aggExprs.collect {
        case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId)
          => a
      })
    if (!conds.forall(c => c.deterministic &&
        c.references.subsetOf(passThroughGroupAttrs))) return None

    // summary scan (analyzed once per registration, cached; summary-
    // sized, already minimal columns)
    val spark = SparkSession.active
    val sPlan = summaryPlan(spark, s.summaryPath)
    val sOut: Map[String, Attribute] = sPlan.output.map(a => a.name -> a).toMap

    // map every output of the aggregate onto a summary column (or, for
    // a decomposable avg, the sum/count column pair), rebuilding any
    // deterministic scalar structure around the aggregate calls
    def aggLeaf(ae: AggregateExpression): Option[Expression] = {
      val direct = aggKey(ae).flatMap(s.aggCols.get).flatMap(sOut.get)
        .filter(_.dataType == ae.dataType)
        // parquet read-back is nullable; restore guarantees the
        // original aggregate carried (count(*) is non-null)
        .map(src => (if (!ae.nullable && src.nullable) KnownNotNull(src)
          else src): Expression)
      direct.orElse(avgParts(ae, s).flatMap { case (sc, cc) =>
        for { sa <- sOut.get(sc); ca <- sOut.get(cc) }
          yield Divide(Cast(sa, DoubleType), Cast(ca, DoubleType)): Expression
      })
    }
    def summaryCol(ne: NamedExpression): Option[Expression] = ne match {
      case a: AttributeReference =>
        mapScalar(a, groupSet.contains, sOut, aggLeaf)
      case Alias(child, _) =>
        mapScalar(child, groupSet.contains, sOut, aggLeaf)
      case _ => None
    }

    val mapped = aggExprs.map(ne => (ne, summaryCol(ne)))
    if (mapped.exists(_._2.isEmpty)) return None

    val projList: Seq[NamedExpression] = mapped.map { case (orig, srcOpt) =>
      val src = srcOpt.get
      // parquet read-back is nullable; restore guarantees the original
      // aggregate carried (count(*) is non-null) and types must agree
      if (src.dataType != orig.dataType) return None
      val expr: Expression =
        if (!orig.nullable && src.nullable) KnownNotNull(src) else src
      Alias(expr, orig.name)(exprId = orig.exprId)
    }
    val projected = Project(projList, sPlan)
    // commuted group-column filters go back on top (they reference the
    // group attrs' exprIds, which projList just re-exposed)
    Some(conds.foldLeft(projected: LogicalPlan)((p, c) => Filter(c, p)))
  }

  /** Roll-up routing: serve an aggregate grouping by a strict subset of
    * the registered group columns by RE-AGGREGATING the summary —
    * count(*) becomes sum of the maintained counts, sum re-sums,
    * min/max re-extremize. Each base fact lands in exactly one summary
    * row per fine-grained key, so the re-aggregation partitions the
    * facts and the algebra is exact; avg qualifies only through its
    * [[avgParts]] decomposition. The plan reads O(summary) and shuffles O(summary)
    * down to the coarse groups — the fact table still never appears.
    *
    * Scan-side filters qualify when deterministic over REGISTERED
    * group columns (they keep or drop whole summary rows exactly as
    * they keep or drop the base rows those rows summarize), and are
    * remapped onto the summary scan BELOW the re-aggregation — which
    * also serves filters on summary keys the query no longer groups by
    * (the region-filtered monthly roll-up of a daily view). */
  private def rollup(
      groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      conds: Seq[Expression],
      s: MaterializedSummary): Option[LogicalPlan] = {
    val groupSet = groupAttrs.map(_.name).toSet
    val spark = SparkSession.active
    val sPlan = summaryPlan(spark, s.summaryPath)
    val sOut: Map[String, Attribute] = sPlan.output.map(a => a.name -> a).toMap

    val condsOk = conds.forall { c =>
      c.deterministic && c.references.toSeq.forall {
        case a: AttributeReference =>
          s.groupCols.contains(a.name) && sOut.contains(a.name)
        case _ => false
      }
    }
    if (!condsOk) return None
    val remapped = conds.map(_.transform {
      case a: AttributeReference => sOut(a.name)
    })

    def aggLeaf(ae: AggregateExpression): Option[Expression] = {
      val direct = aggKey(ae).flatMap(s.aggCols.get).flatMap(sOut.get)
        .flatMap { src =>
          val fn: AggregateFunction = aggKey(ae).get._1 match {
            case "count" | "sum" => Sum(src)
            case "min"           => Min(src)
            case "max"           => Max(src)
          }
          val re = fn.toAggregateExpression()
          // re-aggregation must reproduce the original type exactly
          // (disqualifies e.g. decimal sums, whose re-sum widens)
          if (re.dataType != ae.dataType) None
          else {
            // sum over a group's (>= 1, non-null) maintained counts is
            // never null — restore count(*)'s non-null guarantee
            Some((if (!ae.nullable && re.nullable) KnownNotNull(re)
              else re): Expression)
          }
        }
      // decomposed avg re-aggregates BOTH parts: sum(sum_x)/sum(cnt_x)
      direct.orElse(avgParts(ae, s).flatMap { case (sc, cc) =>
        for { sa <- sOut.get(sc); ca <- sOut.get(cc) }
          yield Divide(
            Cast(Sum(sa).toAggregateExpression(), DoubleType),
            Cast(Sum(ca).toAggregateExpression(), DoubleType)): Expression
      })
    }
    def rolled(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference if groupSet.contains(a.name) =>
        sOut.get(a.name).filter(_.dataType == a.dataType)
          .map(src => Alias(src, a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        mapScalar(child, groupSet.contains, sOut, aggLeaf)
          .filter(_.dataType == al.dataType)
          .map(m => Alias(m, name)(exprId = al.exprId))
      case _ => None
    }

    val outs = aggExprs.map(rolled)
    if (outs.exists(_.isEmpty)) return None
    val groupOnSummary: Seq[Expression] =
      groupAttrs.map(a => sOut.getOrElse(a.name, return None))
    val child = remapped.foldLeft(sPlan: LogicalPlan)((p, c) => Filter(c, p))
    Some(Aggregate(groupOnSummary, outs.map(_.get), child))
  }
}
