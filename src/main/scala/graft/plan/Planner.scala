package graft.plan

import graft.model._

/** Per-flowgroup action planner: topological order by view-name edges, cycle
  * detection with the offending residual, and validation (≥1 load unless
  * self-contained, ≥1 write, no orphan transforms) — the semantics of the
  * reference's DependencyResolver
  * (src/lhp/core/dependencies/dependency_resolver.py:25-100,134-222). */
object Planner {

  final case class PlanError(msg: String) extends RuntimeException(msg)

  /** A materialized-view write with its own SQL — inline or sql_path — or
    * a snapshot-CDC write is self-contained: it needs no load in the
    * flowgroup (dependency_resolver.py:134-153). */
  private def selfContained(a: Action): Boolean = a match {
    case m: MaterializedViewWrite => m.sql.isDefined || m.sqlPath.isDefined
    case s: StreamingTableWrite => s.snapshotCdc
    case _ => false
  }

  /** Action-name → upstream-action-name edges, the graph `order` sorts.
    * A write also "produces" its table (qualified name always; the bare last
    * segment only when exactly ONE qualified table in the flowgroup carries
    * it — `a.events` and `b.events` both claiming the short name `events`
    * would fabricate edges for any consumer of either). A consumer that DOES
    * reference an ambiguous short name is a loud PlanError, not a guess. */
  def dependencies(actions: Seq[Action],
      inputs: Action => Seq[String] = _.inputNames): Map[String, Set[String]] = {
    val byTarget: Map[String, Action] =
      actions.flatMap(a => a.target.map(_ -> a)).toMap
    // only TABLE-MATERIALIZING writes produce a readable name; a SinkWrite's
    // `table` is just its action name (files/kafka/handler — nothing a later
    // action could read), and binding it would fabricate edges for any
    // action that happens to share a name with a consumed table. Fan-in:
    // a consumer must order after EVERY write to the table, so the map
    // carries all of them.
    val tableWrites: Seq[(String, Action)] = actions.collect {
      case w: StreamingTableWrite => w.table -> (w: Action)
      case w: MaterializedViewWrite => w.table -> (w: Action)
    }
    val byQualified: Map[String, Seq[Action]] =
      tableWrites.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }
    val byBare: Map[String, Seq[String]] = tableWrites.map(_._1).distinct
      .groupBy(_.split('.').last)
    val ambiguousBare: Set[String] = byBare.collect {
      case (b, quals) if quals.size > 1 => b }.toSet
    val byTable: Map[String, Seq[Action]] = byQualified ++ byBare.collect {
      case (b, Seq(qual)) if !byQualified.contains(b) => b -> byQualified(qual)
    }
    actions.map { a =>
      val ins = inputs(a) // one resolution per action (may parse SQL)
      val ambiguous = ins.filter(n =>
        ambiguousBare.contains(n) && !byTarget.contains(n) && !byQualified.contains(n))
      if (ambiguous.nonEmpty) throw PlanError(graft.ErrorCodes.VAL_001(
        s"action '${a.name}' reads short table name(s) ${ambiguous.mkString(", ")} " +
        s"that match multiple write targets (${ambiguous.flatMap(byBare(_)).mkString(", ")}); " +
        "use the qualified name"))
      a.name -> ins
        .flatMap(n => byTarget.get(n).map(Seq(_)).orElse(byTable.get(n)).getOrElse(Nil))
        .map(_.name).filterNot(_ == a.name).toSet
    }.toMap
  }

  /** Kahn topo-sort of actions by target→source edges. Sources that no action
    * produces are external tables (resolved from the catalog at run time).
    * A write action also "produces" its TABLE: SQL in the same flowgroup may
    * consume it (`FROM stream(bronze)`), so the consumer must order after
    * the write. View bindings take precedence — a view and a table sharing a
    * name resolve to the view producer, the pre-existing behavior. */
  def order(actions: Seq[Action],
      inputs: Action => Seq[String] = _.inputNames): Seq[Action] = {
    val deps = dependencies(actions, inputs)
    val byName = actions.map(a => a.name -> a).toMap

    var remaining = deps
    val out = Seq.newBuilder[Action]
    while (remaining.nonEmpty) {
      val ready = remaining.collect {
        case (n, ds) if ds.forall(d => !remaining.contains(d)) => n
      }.toSeq.sorted // deterministic order among ready actions
      if (ready.isEmpty)
        throw PlanError(graft.ErrorCodes.DEP_001(s"dependency cycle among actions: ${remaining.keys.toSeq.sorted.mkString(", ")}"))
      ready.foreach(n => out += byName(n))
      remaining = remaining -- ready
    }
    out.result()
  }

  def validate(fg: FlowGroup, inputs: Action => Seq[String] = _.inputNames): Unit = {
    val actions = fg.actions
    if (actions.isEmpty) throw PlanError(graft.ErrorCodes.VAL_002(s"flowgroup '${fg.flowgroup}' has no actions"))
    // duplicate action names / duplicate view targets (reference:
    // core/validators/config_validator.py:94-103): every map in
    // dependencies()/order() keys by name or target, so a duplicate
    // would otherwise collapse last-wins and one action SILENTLY never
    // runs (or a consumer orders after only one of two producers)
    val dupNames = actions.groupBy(_.name).collect {
      case (n, as) if as.size > 1 => n }
    if (dupNames.nonEmpty)
      throw PlanError(graft.ErrorCodes.VAL_002(s"flowgroup '${fg.flowgroup}': " +
        s"duplicate action name(s): ${dupNames.toSeq.sorted.mkString(", ")} — " +
        "names key the plan; one of the duplicates would silently never run"))
    val dupTargets = actions.flatMap(a => a.target.map(_ -> a.name))
      .groupBy(_._1).collect { case (t, as) if as.size > 1 => s"'$t' (${as.map(_._2).mkString(", ")})" }
    if (dupTargets.nonEmpty)
      throw PlanError(graft.ErrorCodes.VAL_002(s"flowgroup '${fg.flowgroup}': " +
        s"duplicate target view(s): ${dupTargets.toSeq.sorted.mkString(", ")} — " +
        "a consumer would order after only one producer"))
    val writes = actions.collect { case w: WriteAction => w }
    val hasLoad = actions.exists(_.isInstanceOf[LoadAction])
    // test-only flowgroups are valid pipelines in the reference
    // (dependency_resolver.py:78-89: `test_actions and not (load_actions
    // or write_actions)` — transforms feeding the tests are permitted,
    // only loads/writes disqualify)
    val testOnly = actions.exists(_.isInstanceOf[TestAction]) &&
      !hasLoad && writes.isEmpty
    if (!testOnly) {
      if (writes.isEmpty)
        throw PlanError(graft.ErrorCodes.VAL_003(s"flowgroup '${fg.flowgroup}' has no write action"))
      if (!hasLoad && !writes.exists(selfContained))
        throw PlanError(graft.ErrorCodes.VAL_004(s"flowgroup '${fg.flowgroup}' has no load action and no self-contained write"))
    }
    // orphan transforms: a non-write action whose target no other action
    // consumes (SQL-referenced views count — `inputs` may parse SQL)
    val consumed = actions.flatMap(inputs).toSet
    val orphans = actions.collect {
      case a if !a.isInstanceOf[WriteAction] && a.target.exists(t => !consumed.contains(t)) => a.name
    }
    if (orphans.nonEmpty)
      throw PlanError(graft.ErrorCodes.VAL_005(s"orphan actions (target never consumed): ${orphans.mkString(", ")}"))
    // sink identity collisions: two sinks sharing a sinkId share ONE
    // streaming checkpoint (the second silently resumes from the first's
    // offsets and skips its data) and one default files path — reject
    val dupSinks = actions.collect { case s: SinkWrite => s }
      .groupBy(_.sinkId).collect { case (id, ss) if ss.size > 1 => id }
    if (dupSinks.nonEmpty)
      throw PlanError(graft.ErrorCodes.VAL_006(s"flowgroup '${fg.flowgroup}': multiple sinks share " +
        s"sink identity ${dupSinks.mkString(", ")} — set distinct sink_name/action names"))
  }

  /** Write fan-in grouping: N writes to one table → one create + N flows
    * (reference: core/codegen/action_dispatch.py:179-206). */
  def groupWrites(actions: Seq[Action]): Map[String, Seq[WriteAction]] =
    actions.collect { case w: WriteAction => w }.groupBy(_.table)

  def plan(fg: FlowGroup,
      inputs: Action => Seq[String] = _.inputNames): Seq[Action] = {
    // memoize per action: `inputs` may Catalyst-parse SQL, and validate +
    // order would otherwise each resolve every action — doubling driver
    // parse work per plan for nothing
    val cache = new java.util.IdentityHashMap[Action, Seq[String]]()
    val memo: Action => Seq[String] = a => {
      val hit = cache.get(a)
      if (hit != null) hit else { val v = inputs(a); cache.put(a, v); v }
    }
    validate(fg, memo)
    order(fg.actions, memo)
  }
}
