package graft

import scala.util.{Failure, Success, Try}

import graft.config.Project
import graft.plan.{DependencyAnalyzer, Planner}

/** `validate` CLI — resolve and plan every flowgroup of a project for an
  * environment WITHOUT executing anything (the reference CLI's
  * `lhp validate` — src/lhp/cli/commands/validate_command.py): YAML parse,
  * template/preset/blueprint expansion, token substitution, action
  * validation, per-flowgroup topological plan, and the cross-flowgroup
  * dependency graph. Errors print with their source-file context; exit code
  * 1 if anything failed.
  *
  * {{{
  * sbt "runMain graft.ValidateProject <projectDir> <env>"
  * }}}
  */
object ValidateProject {

  /** One validation failure. `code` is the stable GRF error code
    * ([[ErrorCodes]]; GRF-GEN-000 for refusals the registry has not tagged
    * yet), recovered from the tagged message so the rendered report is
    * diffable across engine versions. `message` is the bare prose. */
  final case class Issue(context: String, message: String, code: String)

  object Issue {
    def apply(context: String, raw: String): Issue = {
      val (code, msg) = ErrorCodes.split(raw)
      Issue(context, msg, code)
    }
  }

  /** Pure validation pass, separated from `main` for spec coverage.
    * Returns (flowgroups validated OK, issues). */
  def validate(spark: org.apache.spark.sql.SparkSession, projectDir: String,
      env: String, pipelineConfig: Option[String] = None): (Int, Seq[Issue]) = {
    val project = Project.load(projectDir)
    val issues = Seq.newBuilder[Issue]
    var ok = 0
    // --pipeline-config: the file's whole validation contract fires HERE —
    // the reference's stated point of these checks is specific messages at
    // validate time instead of opaque deploy-time failures
    val loadedPipelineConfig = pipelineConfig.flatMap { p =>
      Try(graft.config.PipelineConfigs.load(p, projectDir,
          project.monitoringPipelineName)) match {
        case Success(pc) =>
          println(s"[graft] pipeline config: " +
            s"${pc.pipelineConfigs.size} pipeline entr(y/ies) ok")
          Some(pc)
        case Failure(e) =>
          issues += Issue(p, e.getMessage)
          None
      }
    }
    // required_lhp_version: validate reports the mismatch as an issue
    // instead of aborting, so the rest of the report still lands
    Try(graft.config.VersionCheck.enforce(
      project.requiredLhpVersion, project.name)) match {
      case Failure(e) => issues += Issue("lhp.yaml", e.getMessage)
      case Success(_) => ()
    }
    // validation must not require live secrets: fall back to a deterministic
    // placeholder when the env-var provider has nothing (reference validate
    // behaves the same — structure is checked, secret VALUES are not)
    val secrets: graft.config.Substitution.SecretProvider = (scope, key) =>
      graft.config.Substitution.envSecrets(scope, key)
        .orElse(Some(s"__${scope}_${key}__"))
    // the same file set the RUN resolves (pipeline files + instance files
    // reachable only via instance_include) — validating a narrower set
    // would pass an invalid instance that then fails the run
    val resolved = project.resolutionFiles.flatMap { p =>
      Try(project.resolvePipelineFile(p, env, lenient = true, secrets)) match {
        case Success(fgs) => fgs.map(p -> _)
        case Failure(e) =>
          issues += Issue(p.toString, e.getMessage)
          Nil
      }
    }
    resolved.foreach { case (p, fg) =>
      Try(Planner.plan(fg, a => DependencyAnalyzer.actionInputs(spark, a,
        projectRoot = projectDir))) match {
        case Success(_) => ok += 1
        case Failure(e) =>
          issues += Issue(s"$p (${fg.pipeline}.${fg.flowgroup})", e.getMessage)
      }
    }
    // cross-flowgroup cycles surface here, not at run time
    Try(DependencyAnalyzer.flowgroupGraph(spark, resolved.map(_._2),
      projectRoot = projectDir).generations) match {
      case Success(_) => ()
      case Failure(e) => issues += Issue(projectDir, e.getMessage)
    }
    // the RUN-blocking pipeline-config checks (continuous refusal,
    // cross-pipeline conf conflicts) fire over every pipeline the project
    // resolves PLUS every declared entry — a validate that passes must not
    // be followed by a run that aborts on the same file
    loadedPipelineConfig.foreach { pc =>
      val pipelines = (resolved.map(_._2.pipeline) ++
        pc.pipelineConfigs.keys ++ project.monitoringPipelineName.toSeq).distinct
      Try(graft.config.PipelineConfigs.refuseContinuous(pc, pipelines)) match {
        case Failure(e) => issues += Issue(pipelineConfig.get, e.getMessage)
        case Success(_) => ()
      }
      Try(pc.unionConfiguration(pipelines)) match {
        case Failure(e) => issues += Issue(pipelineConfig.get, e.getMessage)
        case Success(_) => ()
      }
    }
    (ok, issues.result())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ValidateProject <projectDir> <env> [--pipeline-config=<path>]")
    val Array(projectDir, env) = args.take(2)
    val pipelineConfig = args.drop(2).collectFirst {
      case f if f.startsWith("--pipeline-config=") =>
        f.stripPrefix("--pipeline-config=")
    }
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val (ok, issues) = validate(spark, projectDir, env, pipelineConfig)
    issues.foreach(i => System.err.println(
      s"[graft] INVALID [${i.code}] ${i.context}: ${i.message}"))
    println(s"[graft] validate: $ok flowgroup(s) ok, ${issues.size} issue(s)")
    spark.stop()
    if (issues.nonEmpty) sys.exit(1)
  }
}
