package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

import graft.model._
import graft.operators.Expectations

/** YAML front end: parse flowgroup documents into the [[graft.model]] case
  * classes (reference: src/lhp/parsers + models; we parse the same action
  * vocabulary). Parsing is deliberately lenient on unknown keys — like the
  * reference, unknown fields are ignored rather than fatal. */
object YamlConfig {

  final case class ConfigError(msg: String) extends RuntimeException(msg)

  def parseFlowGroup(yaml: String): FlowGroup = parseFlowGroup(yaml, lenient = false)

  def parseFlowGroup(yaml: String, lenient: Boolean): FlowGroup =
    parseRoot(asMap(new Yaml().load[Any](yaml)), lenient) match {
      case Seq(fg) => fg
      case many => throw ConfigError(
        graft.ErrorCodes.CFG_003(s"expected one flowgroup, found ${many.size} — use parseDocuments for flowgroups-list files"))
    }

  /** Parse a full YAML file: multiple `---` documents and the `flowgroups:`
    * list form (one pipeline header, N flowgroups each with their own
    * template parameters/actions) both yield one FlowGroup per entry. */
  def parseDocuments(yaml: String, lenient: Boolean = false): Seq[FlowGroup] =
    new Yaml().loadAll(yaml).asScala.toSeq
      .filter(_ != null)
      .flatMap(doc => parseRoot(asMap(doc), lenient))

  private def parseRoot(root: Map[String, Any], lenient: Boolean): Seq[FlowGroup] = {
    val pipeline = str(root, "pipeline").getOrElse(throw ConfigError(graft.ErrorCodes.CFG_001("missing 'pipeline'")))
    def build(m: Map[String, Any], flowgroup: String) = FlowGroup(
      pipeline = pipeline,
      flowgroup = flowgroup,
      presets = (strSeq(root, "presets") ++ strSeq(m, "presets")).distinct,
      useTemplate = str(m, "use_template").orElse(str(root, "use_template")),
      templateParameters = anyMap(root, "template_parameters") ++ anyMap(m, "template_parameters"),
      variables = (anyMap(root, "variables") ++ anyMap(m, "variables"))
        .map { case (k, v) => k -> v.toString },
      actions = seq(m, "actions").map(a => parseAction(asMap(a), lenient)),
      operationalMetadata = opMetaResolved(opMeta(m).orElse(opMeta(root))))
    root.get("flowgroups") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map { e =>
        val m = asMap(e)
        build(m, str(m, "flowgroup").getOrElse(throw ConfigError(graft.ErrorCodes.CFG_002("flowgroups entry missing 'flowgroup'"))))
      }
      case _ => Seq(build(root,
        str(root, "flowgroup").getOrElse(throw ConfigError(graft.ErrorCodes.CFG_002("missing 'flowgroup'")))))
    }
  }

  /** Substitute tokens/vars/secrets through every string in a YAML document
    * *textually* before parsing — matching the reference, which substitutes on
    * raw YAML text. */
  def resolveAndParse(yamlText: String, vars: Map[String, String],
      tokens: Map[String, String],
      secrets: Substitution.SecretProvider = Substitution.envSecrets): FlowGroup = {
    // read ONLY the variables block pre-substitution (the
    // FlowGroupResolver discipline): a full parseFlowGroup here would run
    // field validation against the RAW token text — a token in any
    // validated position ({rate} in maxFilesPerTrigger, {v} in
    // version_as_of) would throw on the placeholder before Substitution
    // ever supplies the value
    val raw = new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
    val localVars = raw match {
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.collectFirst {
          case (k, vm: java.util.Map[_, _]) if k.toString == "variables" =>
            vm.asScala.map { case (vk, vv) => vk.toString -> String.valueOf(vv) }.toMap
        }.getOrElse(Map.empty[String, String])
      case _ => Map.empty[String, String]
    }
    val allVars = localVars ++ vars
    parseFlowGroup(Substitution(yamlText, allVars, tokens, secrets))
  }

  // ---------------------------------------------------------------- actions

  def parseAction(m: Map[String, Any]): Action = parseAction(m, lenient = false)

  def parseAction(m: Map[String, Any], lenient: Boolean): Action = {
    val name = str(m, "name").getOrElse(throw ConfigError(s"action missing 'name': $m"))
    val actionType = str(m, "type").getOrElse(throw ConfigError(s"action '$name' missing 'type'"))
    val target = str(m, "target")
    val parsed = actionType match {
      case "load" => parseLoad(name, target, m, lenient)
      case "transform" => parseTransform(name, target, m)
      case "write" => parseWrite(name, m, lenient)
      case "test" => TestAction(name, str(m, "test_type").getOrElse("custom_sql"),
        sourceSeq(m), anyMap(m, "config") ++ (m - "name" - "type" - "source"))
      case other => throw ConfigError(graft.ErrorCodes.ACT_001(s"unknown action type '$other' on '$name'"))
    }
    // depends_on (reference _action.py:101-105): explicit upstream table
    // references for dependency edges that cannot be parsed from SQL/Python
    // sources — valid on EVERY action type, string or list. Fed into
    // Planner ordering and DependencyAnalyzer cross-flowgroup graphs via
    // Action.inputNames. operational_metadata is likewise an every-action
    // field (true | [col, ...]) — action-level selection wins over the
    // flowgroup toggle at run time.
    Action.withOperationalMetadata(
      Action.withDependsOn(parsed, strSeq(m, "depends_on")),
      opMeta(m))
  }

  private def parseLoad(name: String, target: Option[String], m: Map[String, Any],
      lenient: Boolean = false): Action = {
    val src = m.get("source") match {
      case Some(s: java.util.Map[_, _]) => asMap(s)
      case Some(s: String) => Map[String, Any]("type" -> "sql", "sql" -> s)
      case _ => Map.empty[String, Any]
    }
    val readMode0 = str(m, "readMode").orElse(str(src, "readMode"))
    readMode0.filterNot(v => v == "batch" || v == "stream").foreach(v =>
      throw ConfigError(s"load '$name': readMode must be 'batch' or " +
        s"'stream', got '$v' — every dispatch compares exactly 'stream', " +
        "so a typo would silently select batch (full re-reads, duplicate " +
        "downstream appends)"))
    val readMode = readMode0.getOrElse("batch")
    str(src, "type").getOrElse("sql") match {
      case "cloudfiles" => CloudFilesLoad(name, target,
        path = str(src, "path").getOrElse(throw ConfigError(s"cloudfiles '$name' missing path")),
        // reference configs may carry the format only as the Auto Loader
        // option (cloudFiles.format) rather than the `format` field.
        // The reference autoloader templates cover json/csv/parquet/text/
        // orc/xml/binaryFile/avro; all but avro map to built-in Spark 4
        // file sources. avro has no spark-avro connector in this
        // deployment's jars — it reads through the engine's own bridge
        // (sources/AvroBridge.scala: binaryFile stream + DataFileStream
        // decode on the serde jar that DOES ship).
        format = str(src, "format")
          .orElse(str(anyMap(src, "options"), "cloudFiles.format"))
          .getOrElse("json") match {
            case f @ ("json" | "csv" | "parquet" | "text" | "orc" | "xml" | "avro" | "warc") => f
            case "binaryFile" | "binaryfile" => "binaryFile"
            case other => throw ConfigError(s"load '$name': unknown " +
              s"cloudfiles format '$other' — supported: json, csv, parquet, " +
              "text, orc, xml, binaryFile, avro, warc")
          },
        options = anyMap(src, "options").map { case (k, v) => k -> v.toString },
        schemaPath = str(src, "schema_path").orElse(str(src, "schema_file")),
        schemaDdl = str(src, "table_schema"),
        readMode = readMode0.getOrElse("stream"))
      case "delta" | "table" =>
        // deprecated spelling, same posture as the reference
        // (generators/load/delta.py:26-46: removed field, hard error)
        if (src.contains("read_change_feed")) throw ConfigError(
          s"load '$name': 'read_change_feed' is removed — use " +
            """options: {readChangeFeed: "true", startingVersion: "N"}""")
        // scalar-aware stringify: YAML resolves unquoted dates to
        // java.util.Date, whose toString ("Thu Jan 01 ...") would defeat
        // timestamp parsing downstream — render ISO-8601 instead
        def scalarStr(v: Any): String = v match {
          case d: java.util.Date => java.time.Instant.ofEpochMilli(d.getTime).toString
          case other => other.toString
        }
        val opts = anyMap(src, "options").map { case (k, v) => k -> scalarStr(v) }
        // Never-silently-absorbed contract (mirrors the write_target
        // advisory pattern above): every options key must be one the
        // engine honors. A typo'd bound ('startingVerison') would
        // otherwise silently widen a change window; real Delta reader
        // options (maxFilesPerTrigger, ignoreDeletes) would vanish.
        val recognizedOpts = Set("readChangeFeed", "versionAsOf", "timestampAsOf",
          "startingVersion", "startingTimestamp", "endingVersion",
          "endingTimestamp", "skipChangeCommits", "ignoreDeletes",
          "maxFilesPerTrigger")
        (opts.keySet -- recognizedOpts).toSeq.sorted.foreach { k =>
          val msg = s"load '$name': unrecognized option '$k' — the parquet-backed " +
            s"table reader honors only ${recognizedOpts.toSeq.sorted.mkString(", ")}"
          if (lenient) graft.Log.warn(msg) else throw ConfigError(msg)
        }
        val srcNs = normalizeDeltaNamespace(name, src)
        val table = qualified(srcNs,
          str(srcNs, "table").orElse(str(srcNs, "path"))
            .getOrElse(throw ConfigError(s"table load '$name' missing table")))
        val cdf = opts.get("readChangeFeed").exists(boolOf(name, "readChangeFeed", _))
        val versionAsOf = str(src, "version_as_of").orElse(opts.get("versionAsOf"))
          .map { v =>
            scala.util.Try(v.toLong).getOrElse(throw ConfigError(
              s"load '$name': version_as_of must be an integer version, got '$v'"))
          }
        val timestampAsOf = src.get("timestamp_as_of").flatMap(Option(_)).map(scalarStr)
          .orElse(opts.get("timestampAsOf"))
        // time travel: both spellings are point-in-time snapshots — resolved
        // at run time against the change-log commit sidecars (SURVEY §7.3,
        // narrowed round 7). Reference incompatibility matrix applies
        // (generators/load/delta.py:108-155).
        if (versionAsOf.isDefined && timestampAsOf.isDefined) throw ConfigError(
          s"load '$name': versionAsOf and timestampAsOf are ambiguous together — use one")
        if ((versionAsOf.isDefined || timestampAsOf.isDefined) && cdf) throw ConfigError(
          s"load '$name': readChangeFeed and versionAsOf/timestampAsOf are incompatible — " +
            "a change stream and a point-in-time snapshot are different reads")
        if ((versionAsOf.isDefined || timestampAsOf.isDefined) && readMode == "stream")
          throw ConfigError(
            s"load '$name': version_as_of/timestamp_as_of is a point-in-time read — batch only")
        // CDF reads route to the engine-managed append-only `__changes`
        // companion (SURVEY §7.3b); version bounds become partition-prunable
        // `_commit_version` predicates (reference contract:
        // generators/load/delta.py:99-195). Commit TIMESTAMPS do not exist
        // in the parquet emulation — reject their spellings loudly.
        val skipChanges = opts.get("skipChangeCommits")
          .exists(boolOf(name, "skipChangeCommits", _))
        val ignoreDel = opts.get("ignoreDeletes")
          .exists(boolOf(name, "ignoreDeletes", _))
        val maxFiles = opts.get("maxFilesPerTrigger").map { v =>
          scala.util.Try(v.toInt).toOption.filter(_ > 0).getOrElse(throw ConfigError(
            s"load '$name': maxFilesPerTrigger must be a positive integer, got '$v'"))
        }
        // stream-only options on a batch read are CONTRACT errors, not
        // unknown-option warnings — accepting one would silently change
        // nothing (Delta contract: a batch read serves current state)
        def requireStream(set: Boolean, opt: String, why: String): Unit =
          if (set && readMode != "stream") throw ConfigError(
            s"load '$name': $opt requires readMode: stream — $why")
        requireStream(maxFiles.isDefined, "maxFilesPerTrigger",
          "it rate-limits a STREAM's microbatches; batch reads have no triggers")
        if (!cdf) {
          Seq("startingVersion", "startingTimestamp", "endingVersion",
            "endingTimestamp").foreach { k =>
            if (opts.contains(k)) throw ConfigError(
              s"load '$name': option '$k' requires readChangeFeed")
          }
          requireStream(skipChanges, "skipChangeCommits",
            "a batch read serves the current table state and has no " +
              "change commits to skip")
          // skipChangeCommits' narrower sibling: deletes excused,
          // rewrites still loud
          requireStream(ignoreDel, "ignoreDeletes",
            "a batch read serves the current table state and has no " +
              "delete commits to skip")
          if (ignoreDel && skipChanges)
            graft.Log.warn(s"load '$name': ignoreDeletes is " +
              "redundant with skipChangeCommits — skipChangeCommits already " +
              "drops every non-append commit, deletes included")
        } else {
          if (opts.contains("skipChangeCommits")) throw ConfigError(
            s"load '$name': readChangeFeed and skipChangeCommits are incompatible")
          // Delta parity (and reference e2e fixture 17_delta_cdc): the option
          // is ACCEPTED alongside readChangeFeed but has no effect there — a
          // change feed carries delete rows as data (_change_type='delete'),
          // so there is no stream-breaking delete to excuse. Advisory, like
          // sink-side 'comment'.
          if (ignoreDel)
            graft.Log.warn(s"load '$name': ignoreDeletes has " +
              "no effect on a readChangeFeed stream — delete commits arrive " +
              "as _change_type='delete' rows, not stream failures")
          // version and timestamp spellings of the SAME bound are ambiguous
          // — both directions (the reference rejects the starting pair;
          // accepting the ending pair would silently intersect them)
          Seq("starting", "ending").foreach { b =>
            if (opts.contains(s"${b}Version") && opts.contains(s"${b}Timestamp"))
              throw ConfigError(
                s"load '$name': ${b}Version and ${b}Timestamp are " +
                  "ambiguous together — use one")
          }
          if (readMode == "stream" &&
              (opts.contains("endingVersion") || opts.contains("endingTimestamp")))
            throw ConfigError(
              s"load '$name': endingVersion/endingTimestamp is only supported in batch mode")
          if (readMode != "stream" &&
              !opts.contains("startingVersion") && !opts.contains("startingTimestamp"))
            throw ConfigError(
              s"load '$name': readChangeFeed in batch mode requires " +
                "'startingVersion' or 'startingTimestamp' to bound the range " +
                "of changes (or readMode: stream for continuous consumption)")
        }
        def ver(k: String): Option[Long] = opts.get(k).map { v =>
          scala.util.Try(v.toLong).getOrElse(throw ConfigError(
            s"load '$name': option '$k' must be an integer version, got '$v'"))
        }
        TableLoad(name, target,
          table = if (cdf) s"${table}__changes" else table,
          whereClause = strSeq(src, "where_clause"),
          selectColumns = strSeq(src, "select_columns"),
          readMode = readMode,
          versionAsOf = versionAsOf,
          timestampAsOf = timestampAsOf,
          cdfStartingVersion = if (cdf) ver("startingVersion") else None,
          cdfEndingVersion = if (cdf) ver("endingVersion") else None,
          cdfStartingTimestamp = if (cdf) opts.get("startingTimestamp") else None,
          cdfEndingTimestamp = if (cdf) opts.get("endingTimestamp") else None,
          skipChangeCommits = skipChanges,
          ignoreDeletes = ignoreDel && !cdf && !skipChanges,
          maxFilesPerTrigger = maxFiles)
      case "sql" =>
        val sqlPath = str(src, "sql_path").orElse(str(m, "sql_path"))
        SqlLoad(name, target,
          sql = str(src, "sql").orElse(str(m, "sql")).getOrElse(
            if (sqlPath.isDefined) ""
            else throw ConfigError(s"sql load '$name' missing sql")),
          sqlPath = sqlPath,
          readMode = readMode)
      case "jdbc" =>
        // jdbc is batch-only (the reference's jdbc generator emits
        // spark.read); accepting readMode: stream would silently
        // full-re-read the table per run
        if (readMode == "stream") throw ConfigError(
          s"load '$name': jdbc loads are batch-only — poll via " +
            "snapshot_cdc source_function, or land files and stream those")
        JdbcLoad(name, target,
        url = str(src, "url").getOrElse(throw ConfigError(s"jdbc '$name' missing url")),
        query = str(src, "query"), dbtable = str(src, "dbtable"),
        options = anyMap(src, "options").map { case (k, v) => k -> v.toString },
        readMode = readMode)
      case "kafka" => KafkaLoad(name, target,
        bootstrapServers = str(src, "bootstrap_servers")
          .getOrElse(throw ConfigError(s"kafka '$name' missing bootstrap_servers")),
        subscribe = str(src, "subscribe"),
        subscribePattern = str(src, "subscribe_pattern"),
        assign = str(src, "assign"),
        options = anyMap(src, "options").map { case (k, v) => k -> v.toString })
      case "python" | "function" => FunctionLoad(name, target,
        functionClass = str(src, "function").orElse(str(src, "class"))
          .orElse(str(src, "function_name"))
          .getOrElse(throw ConfigError(s"function load '$name' missing function")),
        parameters = anyMap(src, "parameters"), readMode = readMode)
      case "custom_datasource" => CustomSourceLoad(name, target,
        providerClass = str(src, "custom_datasource_class")
          .getOrElse(throw ConfigError(s"custom_datasource '$name' missing custom_datasource_class")),
        options = anyMap(src, "options").map { case (k, v) => k -> v.toString },
        readMode = readMode)
      case other => throw ConfigError(graft.ErrorCodes.ACT_003(s"unknown load source type '$other' on '$name'"))
    }
  }

  private def parseTransform(name: String, target: Option[String], m: Map[String, Any]): Action = {
    str(m, "transform_type").getOrElse("sql") match {
      case "sql" => SqlTransform(name, target, sourceSeq(m),
        sql = str(m, "sql").getOrElse(
          if (str(m, "sql_path").isDefined) ""
          else throw ConfigError(s"sql transform '$name' missing sql")),
        sqlPath = str(m, "sql_path"))
      case "schema" =>
        // Three definition shapes, exactly one required:
        //  - schema_inline (reference, flat on the action): arrow lines or
        //    a columns:/legacy-keys YAML document, parsed here;
        //  - schema_file (reference): external file, resolved at RUN time
        //    project-relative (like expectations_file);
        //  - schema: {renames, casts, columns, enforcement} — this engine's
        //    pre-existing nested map.
        // A schema transform with NO definition is a silent no-op — loud.
        val inline = str(m, "schema_inline")
        val file = str(m, "schema_file")
        // a bare `schema:` key (null value — e.g. an indentation error
        // swallowed its children) or an empty map is NOT a definition; it
        // must fall through to the loud no-definition error below
        val nested = m.get("schema").map(asMap).filter(_.nonEmpty)
        if (Seq(inline, file, nested).count(_.isDefined) > 1) throw ConfigError(
          s"schema transform '$name': schema_inline, schema_file and schema: " +
            "are mutually exclusive — use one")
        // enforcement lives FLAT on the action in the reference; the nested
        // map's spelling is honored for this engine's own configs
        val strict = str(m, "enforcement")
          .orElse(nested.flatMap(str(_, "enforcement")))
          .map {
            case e @ ("strict" | "permissive") => e
            case other => throw ConfigError(
              s"schema transform '$name': unknown enforcement '$other' (strict | permissive)")
          }.contains("strict")
        (inline, file, nested) match {
          case (Some(text), _, _) =>
            val p = SchemaTransformParser.parseInline(text)
            SchemaTransformAction(name, target, sourceSeq(m).headOption.getOrElse(""),
              renames = p.renames, casts = p.casts, declared = p.declared,
              strict = strict)
          case (_, Some(f), _) =>
            SchemaTransformAction(name, target, sourceSeq(m).headOption.getOrElse(""),
              strict = strict, schemaFile = Some(f))
          case (_, _, Some(sm)) =>
            SchemaTransformAction(name, target, sourceSeq(m).headOption.getOrElse(""),
              renames = anyMap(sm, "renames").map { case (k, v) => k -> v.toString },
              casts = anyMap(sm, "casts").map { case (k, v) => k -> v.toString },
              declared = strSeq(sm, "columns"),
              strict = strict)
          case _ => throw ConfigError(
            s"schema transform '$name' has no schema definition — use " +
              "schema_inline (arrow lines), schema_file, or a schema: map")
        }
      case "data_quality" =>
        // `mode: quarantine` without a quarantine config would silently run
        // as plain dqe — the reference requires the config when the mode
        // asks for it (models/_action.py:86-90). The reference spelling is
        // `dlq_table` + `source_table` (models/_quarantine.py); `table` is
        // this engine's pre-existing alias.
        val qm = asMap(m.getOrElse("quarantine", new java.util.HashMap[String, Any]()))
        val quarantineTable = str(qm, "dlq_table").orElse(str(qm, "table"))
        // a quarantine block without its DLQ table would silently downgrade
        // to plain dqe (source_table alone names no destination)
        if (qm.nonEmpty && quarantineTable.isEmpty) throw ConfigError(
          s"data_quality '$name': quarantine config is missing 'dlq_table'")
        str(m, "mode").foreach {
          case "quarantine" => if (quarantineTable.isEmpty) throw ConfigError(
            s"data_quality '$name': mode: quarantine requires a " +
              "quarantine: {dlq_table: ...} configuration")
          case "dqe" =>
            // the runner routes on the quarantine config's presence — an
            // explicit dqe mode alongside one is a contradiction, not a
            // silent DLQ write the user opted out of
            if (quarantineTable.isDefined) throw ConfigError(
              s"data_quality '$name': mode: dqe contradicts the quarantine: " +
                "config — drop one")
          case other => throw ConfigError(
            s"data_quality '$name': unknown mode '$other' (dqe | quarantine)")
        }
        DataQualityTransform(name, target,
          sourceSeq(m).headOption.getOrElse(""),
          rules = parseRules(m.getOrElse("expectations", new java.util.ArrayList[Any]())),
          quarantineTable = quarantineTable,
          quarantineSourceTable = str(qm, "source_table"),
          expectationsFile = str(m, "expectations_file"))
      case "temp_table" => TempTableTransform(name, target, sourceSeq(m).headOption.getOrElse(""))
      case "watermark" => WatermarkTransform(name, target,
        sourceSeq(m).headOption.getOrElse(throw ConfigError(
          s"watermark transform '$name' missing source")),
        column = str(m, "column").getOrElse(throw ConfigError(
          s"watermark transform '$name' missing column")),
        delay = str(m, "delay").getOrElse(throw ConfigError(
          s"watermark transform '$name' missing delay")))
      case "python" | "function" => FunctionTransform(name, target, sourceSeq(m),
        functionClass = str(m, "function").orElse(str(m, "class"))
          .orElse(str(m, "function_name"))
          .getOrElse(throw ConfigError(s"function transform '$name' missing function")),
        parameters = anyMap(m, "parameters"))
      case other => throw ConfigError(s"unknown transform type '$other' on '$name'")
    }
  }

  private def parseWrite(name: String, m: Map[String, Any], lenient: Boolean = false): Action = {
    val wtRaw = asMap(m.getOrElse("write_target", new java.util.HashMap[String, Any]()))
    val writeType = str(wtRaw, "type").orElse(str(m, "write_type")).getOrElse("streaming_table")
    // legacy `database` normalization applies only to the table-producing
    // write types (reference namespace_normalizer.py:57-62); sinks have no
    // namespace
    val wt =
      if (writeType == "streaming_table" || writeType == "materialized_view")
        normalizeWriteNamespace(name, wtRaw)
      else wtRaw
    // Advisory options that are catalog/Databricks features with no
    // parquet-warehouse equivalent (reference: models/_action.py:11-62) —
    // loud by default so a user never ships a config believing they took
    // effect; `lenient` downgrades to a warning (they are safe no-ops, and
    // real reference example projects do use them). cluster_columns is NOT
    // here: it maps to range-clustered writes (see ClusterColumns below);
    // comment / tags / tags_file / table_schema are honored (sidecar +
    // hooks + write-time enforcement), not advisory.
    Map(
      "refresh_schedule" -> "scheduled refresh needs an external scheduler; run the flowgroup from one",
      "refresh_policy" -> "refresh policy is a DLT-scheduler concept; the interpreter refreshes on every run",
      "temporary" -> "temporary tables need a session catalog",
      "path" -> "external storage paths are not supported; tables live under the TableStore warehouse root",
      "spark_conf" -> "per-flow Spark conf belongs to the session running the flowgroup; set it there",
      "cluster_by_auto" -> "automatic clustering needs Delta predictive optimization; declare cluster_columns (+ cluster_strategy) instead"
    ).foreach { case (k, why) =>
      if (wt.contains(k)) {
        val msg = s"write '$name': '$k' is not supported on the parquet-backed warehouse — $why"
        if (lenient) graft.Log.warn(msg) else throw ConfigError(msg)
      }
    }
    // create_table: true is the default (and our store always materializes);
    // FALSE promises "the table is managed elsewhere", which the store
    // cannot honor — same advisory loud/lenient split.
    if (str(wt, "create_table").exists(v => !boolOf(name, "create_table", v))) {
      val msg = s"write '$name': 'create_table: false' is not supported — " +
        "the TableStore always materializes the write target"
      if (lenient) graft.Log.warn(msg) else throw ConfigError(msg)
    }
    // the DEFAULTED name (no `table:` key) must qualify exactly like an
    // explicit one — .getOrElse(name) after the map silently dropped the
    // write_target's declared catalog/schema for the defaulted spelling
    val table = qualified(wt, str(wt, "table").orElse(str(m, "table")).getOrElse(name))
    // governance metadata shared by both table-producing write types
    val comment = str(wt, "comment")
    val tags = anyMap(wt, "tags").map { case (k, v) =>
      k -> Option(v).map(_.toString).getOrElse("") // UC allows value-less tags
    }
    val tagsFile = str(wt, "tags_file")
    val tableSchemaDdl = str(wt, "table_schema")
    // write modes are a per-type allowlist: downstream dispatch is all
    // Option.contains, so a typo'd mode ('incrementall', 'snapshot-cdc')
    // would make every check false and the write silently run as plain
    // append / full refresh — the silent-config class this parser refuses
    // everywhere else (data_quality already validates its mode)
    locally {
      val validModes = Map(
        // "cdc" is the reference corpus's advisory spelling (the cdc_config
        // block is what actually drives the merge); "standard" is its
        // explicit plain-append spelling
        "streaming_table" -> Set("standard", "cdc", "snapshot_cdc"),
        "materialized_view" ->
          Set("incremental", "incremental_join", "incremental_recompute"))
      str(wt, "mode").foreach { md =>
        val allowed = validModes.getOrElse(writeType, Set.empty[String])
        if (!allowed.contains(md)) throw ConfigError(graft.ErrorCodes.ACT_010(
          s"write '$name': unknown mode '$md' for $writeType" +
            (if (allowed.nonEmpty) s" (valid: ${allowed.toSeq.sorted.mkString(", ")})"
             else " (this write type takes no mode)") +
            " — a typo here would silently degrade to plain append / full refresh"))
      }
      // mode: snapshot_cdc without its config would parse cdc = None and
      // plain-append every full snapshot per run (deletes never diffed,
      // re-runs duplicating the snapshot)
      // mode: cdc with a missing/typo'd cdc_config would parse cdc = None
      // and dispatch to plain append — duplicated keys, deletes never
      // applied, zero errors (the guard snapshot_cdc has always had)
      if (writeType == "streaming_table" && str(wt, "mode").contains("cdc") &&
          m.get("cdc_config").orElse(wt.get("cdc_config"))
            .orElse(wt.get("snapshot_cdc_config")).orElse(m.get("snapshot_cdc_config")).isEmpty)
        throw ConfigError(graft.ErrorCodes.ACT_010(
          s"write '$name': mode cdc needs cdc_config (keys + sequence_by " +
            "drive the merge) — without it every CDC batch would " +
            "plain-append"))
      if (writeType == "streaming_table" && str(wt, "mode").contains("snapshot_cdc") &&
          wt.get("snapshot_cdc_config").orElse(m.get("snapshot_cdc_config"))
            .orElse(m.get("cdc_config")).orElse(wt.get("cdc_config")).isEmpty)
        throw ConfigError(graft.ErrorCodes.ACT_010(
          s"write '$name': mode snapshot_cdc needs snapshot_cdc_config " +
            "(keys + sequence_by drive the snapshot diff)"))
    }
    writeType match {
      case "streaming_table" =>
        // snapshot mode carries its config under snapshot_cdc_config
        // (reference streaming_table.py:115-121); same CDC vocabulary plus
        // stored_as_scd_type naming and an optional polling source_function
        val snapMap = wt.get("snapshot_cdc_config").orElse(m.get("snapshot_cdc_config")).map(asMap)
        val cdcMap = m.get("cdc_config").orElse(wt.get("cdc_config")).map(asMap)
          .orElse(snapMap)
        val cdc = cdcMap.map { c =>
          CdcConfig(
            keys = strSeq(c, "keys"),
            sequenceBy = strSeq(c, "sequence_by"),
            scdType = c.get("scd_type").orElse(c.get("stored_as_scd_type"))
              .map(_.toString.toInt).getOrElse(1),
            ignoreNullUpdates = c.get("ignore_null_updates").exists(_.toString.toBoolean),
            applyAsDeletes = str(c, "apply_as_deletes"),
            applyAsTruncates = str(c, "apply_as_truncates"),
            columnList = if (strSeq(c, "column_list").nonEmpty) Some(strSeq(c, "column_list")) else None,
            exceptColumnList = strSeq(c, "except_column_list"),
            trackHistoryColumnList =
              if (strSeq(c, "track_history_column_list").nonEmpty)
                Some(strSeq(c, "track_history_column_list")) else None,
            trackHistoryExceptColumnList = strSeq(c, "track_history_except_column_list"))
        }
        // ingest-time bounded-state dedup: all three fields or none, and
        // only on standard append flows (CDC merges already dedup by
        // (key, sequence); a silent interaction would be the config class
        // this parser refuses everywhere else)
        val ddm = wt.get("dedup").map(asMap)
        val ddKeys = ddm.map(strSeq(_, "keys")).getOrElse(Nil)
        val ddCol = ddm.flatMap(str(_, "column"))
        val ddWithin = ddm.flatMap(str(_, "within"))
        ddm.foreach { _ =>
          if (ddKeys.isEmpty || ddCol.isEmpty || ddWithin.isEmpty)
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': dedup needs keys, column, and within " +
                "(bounded-state dedup has no full-row or unbounded form — " +
                "use a dedup-bearing incremental materialized_view for that)"))
          if (cdc.isDefined || snapMap.isDefined)
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': dedup only applies to standard append flows " +
                "— CDC flows dedup by (key, sequence) inside the merge"))
        }
        StreamingTableWrite(name,
          source = sourceSeq(m).headOption.getOrElse(""),
          table = table,
          partitionColumns = strSeq(wt, "partition_columns"),
          clusterColumns = strSeq(wt, "cluster_columns"),
          clusterStrategy = clusterStrategyOf(wt, name),
          once = m.get("once").exists(_.toString.toBoolean),
          cdc = cdc,
          snapshotCdc = str(wt, "mode").contains("snapshot_cdc") || snapMap.isDefined,
          snapshotFunction = snapMap.flatMap(c =>
            c.get("source_function").map(asMap).map { sf =>
              // a typo'd class key would silently switch the write from
              // polling mode to source-view diff mode
              str(sf, "class").orElse(str(sf, "function")).getOrElse(
                throw ConfigError(graft.ErrorCodes.ACT_010(
                  s"write '$name': snapshot_cdc_config.source_function " +
                    "needs 'class' (or 'function') naming the snapshot " +
                    s"poller — got keys: ${sf.keys.toSeq.sorted.mkString(", ")}")))
            }),
          changeLog = wt.get("change_log").exists(_.toString.toBoolean),
          rowFilter = str(wt, "row_filter"),
          tableProperties = anyMap(wt, "table_properties").map { case (k, v) => k -> v.toString },
          comment = comment, tags = tags, tagsFile = tagsFile,
          tableSchemaDdl = tableSchemaDdl,
          expectations = parseRules(m.getOrElse("expectations", new java.util.ArrayList[Any]())),
          dedupKeys = ddKeys, dedupColumn = ddCol, dedupWithin = ddWithin)
      case "materialized_view" =>
        // declared-incremental join MVs are a two-stage contract: both
        // stages present, the join stage actually streaming. Absorbing a
        // joined_sql outside the mode (or a mode without its stages) would
        // be the silent-config class this parser refuses everywhere else.
        val mode = str(wt, "mode")
        val joinedSql0 = str(m, "joined_sql").orElse(str(wt, "joined_sql"))
        if (mode.contains("incremental_join")) {
          if (joinedSql0.isEmpty) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': mode incremental_join needs joined_sql (the " +
              "stream-static join stage, with the fact side under stream(...))"))
          if (graft.plan.StreamRef.streamedViews(joinedSql0.get).isEmpty) throw ConfigError(
            graft.ErrorCodes.ACT_010(s"write '$name': incremental_join's joined_sql must stream its " +
              "fact side — wrap it as stream(<table>)"))
          if (str(m, "sql").orElse(str(wt, "sql"))
              .orElse(str(m, "sql_path")).orElse(str(wt, "sql_path")).isEmpty)
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': mode incremental_join needs sql (the aggregation " +
                s"stage over the ${table}__joined companion)"))
        } else if (joinedSql0.isDefined) throw ConfigError(graft.ErrorCodes.ACT_010(
          s"write '$name': joined_sql only applies with mode: incremental_join"))
        // declared watermark: a windowed-aggregation contract — both bound
        // fields present, mode incremental, and the aggregation in THIS
        // MV's sql (a watermark cannot be injected below an aggregation
        // already built by an upstream transform)
        // declared partition-scoped recompute: both bound fields present,
        // the mode named, and the batch sql to recompute — plus the
        // physical-layout constraint (the table's partitioning IS the
        // maintenance granularity, so a contradicting partition_columns
        // would silently change which rows a refresh replaces)
        val rc = wt.get("recompute").map(asMap)
        rc.foreach { rm =>
          val unknown = rm.keySet -- Set("keys", "view", "buckets")
          if (unknown.nonEmpty) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': unknown recompute key(s) " +
              s"${unknown.toSeq.sorted.mkString(", ")} (valid: keys, view, " +
              "buckets) — a typo'd key would silently fall back to its " +
              "default"))
        }
        val rcKeys = rc.map(strSeq(_, "keys")).getOrElse(Nil)
        val rcView = rc.flatMap(str(_, "view"))
        val rcBuckets = rc.flatMap(str(_, "buckets")).map { s =>
          val n = try s.toInt catch { case _: NumberFormatException =>
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': recompute.buckets must be an integer, got '$s'")) }
          if (n < 2 || n > 4096) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': recompute.buckets must be in [2, 4096], got $n"))
          if (rcKeys.nonEmpty) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': recompute.buckets only applies to the " +
              "global-window route (no keys) — keyed recompute partitions " +
              "by the keys themselves"))
          n
        }.getOrElse(64)
        if (mode.contains("incremental_recompute")) {
          // keys OPTIONAL: empty keys selects the GLOBAL-window route
          // (rank over the whole table, engine-derived range buckets) —
          // the view (delta) is required either way
          if (rcView.isEmpty) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': mode incremental_recompute needs recompute: " +
              "{view: <base table or streaming view>[, keys: [...]]} — " +
              "the delta deciding what changed; keys for partition-scoped " +
              "recompute, NO keys for a global-window (leaderboard) sql"))
          if (str(m, "sql").orElse(str(wt, "sql"))
              .orElse(str(m, "sql_path")).orElse(str(wt, "sql_path")).isEmpty)
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': mode incremental_recompute needs sql (the " +
                "batch query over the accumulated base table)"))
          val pc = strSeq(wt, "partition_columns")
          if (rcKeys.nonEmpty && pc.nonEmpty && pc != rcKeys) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': partition_columns (${pc.mkString(", ")}) must be " +
              s"empty or equal to recompute.keys (${rcKeys.mkString(", ")}) — " +
              "the recompute keys are the physical replace granularity"))
          if (rcKeys.isEmpty && pc.nonEmpty && pc != Seq("__gw_bucket"))
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': partition_columns (${pc.mkString(", ")}) must " +
                "be empty on the global-window route — the engine-derived " +
                "__gw_bucket is the physical replace granularity"))
          if (wt.contains("watermark")) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': watermark does not apply with mode: " +
              "incremental_recompute (the sql is batch; there is no " +
              "event-time state to bound)"))
        } else if (rc.isDefined) throw ConfigError(graft.ErrorCodes.ACT_010(
          s"write '$name': recompute only applies with mode: incremental_recompute"))
        val wm = wt.get("watermark").map(asMap)
        val wmCol = wm.flatMap(str(_, "column"))
        val wmDelay = wm.flatMap(str(_, "delay"))
        wm.foreach { _ =>
          if (wmCol.isEmpty || wmDelay.isEmpty) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': watermark needs both column and delay"))
          if (!mode.contains("incremental")) throw ConfigError(graft.ErrorCodes.ACT_010(
            s"write '$name': watermark only applies with mode: incremental " +
              "(append-mode windowed maintenance)"))
          if (str(m, "sql").orElse(str(wt, "sql"))
              .orElse(str(m, "sql_path")).orElse(str(wt, "sql_path")).isEmpty)
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': watermark needs the windowed aggregation in " +
                "this MV's sql — a source-only MV has no aggregation to bound"))
        }
        MaterializedViewWrite(name,
        source = sourceSeq(m).headOption,
        table = table,
        sql = str(m, "sql").orElse(str(wt, "sql")),
        sqlPath = str(m, "sql_path").orElse(str(wt, "sql_path")),
        partitionColumns = strSeq(wt, "partition_columns"),
        clusterColumns = strSeq(wt, "cluster_columns"),
        clusterStrategy = clusterStrategyOf(wt, name),
        rowFilter = str(wt, "row_filter"),
        tableProperties = anyMap(wt, "table_properties").map { case (k, v) => k -> v.toString },
        comment = comment, tags = tags, tagsFile = tagsFile,
        tableSchemaDdl = tableSchemaDdl,
        expectations = parseRules(m.getOrElse("expectations", new java.util.ArrayList[Any]())),
        incremental = str(wt, "mode").contains("incremental") ||
          wt.get("incremental").exists(_.toString.toBoolean),
        incrementalJoin = str(wt, "mode").contains("incremental_join"),
        joinedSql = str(m, "joined_sql").orElse(str(wt, "joined_sql")),
        watermarkColumn = wmCol,
        watermarkDelay = wmDelay,
        watermarkView = wm.flatMap(str(_, "view")),
        incrementalRecompute = str(wt, "mode").contains("incremental_recompute"),
        recomputeKeys = rcKeys,
        recomputeView = rcView,
        recomputeBuckets = rcBuckets)
      case "sink" =>
        // module_path is a Python import-path concept; JVM plugins resolve
        // from the classpath by class name — advisory, same split as above
        if (wt.contains("module_path")) {
          val msg = s"write '$name': 'module_path' is not supported — JVM " +
            "handler classes resolve from the classpath (custom_sink_class/batch_handler)"
          if (lenient) graft.Log.warn(msg) else throw ConfigError(msg)
        }
        // table-governance fields have nowhere to land on a sink (no table,
        // no sidecars) — refusing beats absorbing (the contract this file
        // establishes for every other write field)
        Seq("comment", "tags", "tags_file", "table_schema").foreach { k =>
          if (wt.contains(k)) {
            val msg = s"write '$name': '$k' has no effect on a sink — sinks " +
              "produce no managed table; move it to the table-producing write"
            if (lenient) graft.Log.warn(msg) else throw ConfigError(msg)
          }
        }
        // kafka's dedicated fields fold into the connector options map
        val kafkaOpts =
          str(wt, "bootstrap_servers").map("kafka.bootstrap.servers" -> _).toMap ++
            str(wt, "topic").map("topic" -> _).toMap
        SinkWrite(name,
          source = sourceSeq(m).headOption.getOrElse(""),
          sinkType = str(wt, "sink_type").orElse(str(wt, "format")).getOrElse(
            throw ConfigError(graft.ErrorCodes.ACT_010(
              s"write '$name': sink needs sink_type (files, kafka, " +
                "foreachbatch, custom) — the reference refuses a missing " +
                "sink_type too (sink.py:37), and a silent files default " +
                "would land parquet under the sink root while the " +
                "intended connector receives nothing"))),
          options = kafkaOpts ++ anyMap(wt, "options").map { case (k, v) => k -> v.toString },
          handlerClass = str(wt, "handler").orElse(str(wt, "custom_sink_class"))
            .orElse(str(wt, "batch_handler")),
          sinkName = str(wt, "sink_name"))
      case other => throw ConfigError(graft.ErrorCodes.ACT_002(s"unknown write type '$other' on '$name'"))
    }
  }

  private def clusterStrategyOf(wt: Map[String, Any], name: String): String =
    str(wt, "cluster_strategy").getOrElse("range") match {
      case "zorder" if strSeq(wt, "cluster_columns").isEmpty =>
        // without columns the strategy silently no-ops — the user believes
        // the table is z-ordered; reject like the Maintain CLI does
        throw ConfigError(
          s"write '$name': cluster_strategy: zorder needs cluster_columns to interleave")
      case s @ ("range" | "zorder") => s
      case other => throw ConfigError(
        s"write '$name': unknown cluster_strategy '$other' (range | zorder)")
    }

  /** Load an expectations file (JSON or YAML — both reference formats,
    * data_quality.py:73-96) into rules. */
  def rulesFromFile(path: String): Seq[Expectations.Rule] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val doc = new Yaml().load[Any](text)
    // list-format files may nest under an "expectations" key
    doc match {
      case m: java.util.Map[_, _] if asMap(m).contains("expectations") =>
        parseRules(asMap(m)("expectations"))
      case other => parseRules(other)
    }
  }

  /** Both reference expectation formats (data_quality.py:73-96): a list of
    * `{name, expression, failureAction}` or a map `constraint -> {action,name}`. */
  def parseRules(raw: Any): Seq[Expectations.Rule] = raw match {
    case l: java.util.List[_] => l.asScala.toSeq.map { e =>
      val m = asMap(e)
      Expectations.Rule(
        str(m, "name").getOrElse("expectation"),
        str(m, "expression").getOrElse(throw ConfigError(s"expectation missing expression: $m")),
        parseAction(str(m, "failureAction").orElse(str(m, "action")).getOrElse("warn")))
    }
    case m: java.util.Map[_, _] => asMap(m).map { case (constraint, cfg) =>
      val c = asMap(cfg)
      Expectations.Rule(
        str(c, "name").getOrElse(constraint),
        constraint,
        parseAction(str(c, "action").getOrElse("warn")))
    }.toSeq
    case null => Nil
    case other => throw ConfigError(s"unparseable expectations: $other")
  }

  private def parseAction(s: String): Expectations.FailureAction = s match {
    case "warn" => Expectations.Warn
    case "drop" => Expectations.Drop
    case "fail" => Expectations.Fail
    case other => throw ConfigError(s"unknown failureAction '$other'")
  }

  // ---------------------------------------------------------------- helpers

  /** Strict boolean parse with the ConfigError contract — a bare
    * `"1".toBoolean` would surface as a raw IllegalArgumentException with no
    * action name. YAML booleans arrive as "true"/"false" strings here. */
  private def boolOf(action: String, key: String, v: String): Boolean =
    v.toLowerCase match {
      case "true" => true
      case "false" => false
      case other => throw ConfigError(
        s"'$action': '$key' must be true or false, got '$other'")
    }

  /** `operational_metadata: true | false | [col, ...]` on a flowgroup or
    * action (reference models/_flowgroup.py / _action.py). TRI-state:
    * absent → None (inherit the enclosing level), explicit false →
    * OpMeta.Disabled (opt OUT of an enclosing toggle — collapsing false to
    * None made per-action opt-out unreachable), true → all default
    * columns, list → that subset. */
  private def opMeta(m: Map[String, Any]): Option[OpMeta] = m.get("operational_metadata") match {
    case Some(b: java.lang.Boolean) =>
      Some(if (b) OpMeta.Enabled(Nil) else OpMeta.Disabled)
    case Some(l: java.util.List[_]) =>
      Some(OpMeta.Enabled(l.asScala.toSeq.map(_.toString)))
    case _ => None
  }

  /** Collapse the tri-state at the flowgroup level (nothing above the
    * document root to inherit from): Disabled and absent both mean off. */
  private def opMetaResolved(sel: Option[OpMeta]): Option[Seq[String]] =
    sel match {
      case Some(OpMeta.Enabled(cols)) => Some(cols)
      case _ => None
    }

  /** Compose `catalog`/`schema` qualifiers around a table name (the
    * reference's three-part naming — generators/load/delta.py:54). An
    * already-qualified name is left as-is. Legacy `database` is gone by the
    * time this runs — the normalize*Namespace pass splits it. */
  private def qualified(m: Map[String, Any], table: String): String =
    if (table.contains(".")) table
    else {
      val quals = str(m, "catalog").toSeq ++ str(m, "schema").toSeq
      (quals :+ table).mkString(".")
    }

  /** SQL type keywords that mark a namespace `schema` value as actually
    * being column DDL (reference namespace_normalizer.py:33-38). */
  private val DdlTypeWord = ("(?i)\\b(BIGINT|STRING|INT|INTEGER|SMALLINT|" +
    "TINYINT|FLOAT|DOUBLE|DECIMAL|BOOLEAN|DATE|TIMESTAMP|BINARY|ARRAY|MAP|" +
    "STRUCT|LONG|SHORT|BYTE|VOID)\\b").r
  private def looksLikeDdl(s: String): Boolean =
    s.contains(" ") && DdlTypeWord.findFirstIn(s).isDefined

  /** Legacy `database` normalization for table-producing write targets
    * (reference core/processing/namespace_normalizer.py:73-131). Soft
    * deprecation: `database: "cat.sch"` auto-converts to catalog/schema
    * with a warning (both strict and lenient — the reference never fails
    * the conversion itself). Hard errors stay hard: a dot-less `database`
    * (CFG_011) and a namespace `schema` that is really column DDL
    * (CFG_013) are config mistakes the reference rejects in every mode. A
    * `schema` sitting next to `database` is the pre-0.7.8 DDL alias and
    * moves to `table_schema`. */
  private def normalizeWriteNamespace(name: String, wt: Map[String, Any]): Map[String, Any] = {
    val catalog = str(wt, "catalog").filter(_.nonEmpty)
    val schema = str(wt, "schema").filter(_.nonEmpty)
    // DDL-in-`schema` is a hard error whenever `schema` is NOT sitting
    // next to `database` (where it is the legacy DDL alias, redirected
    // below): checking only the catalog+schema case let a schema-ONLY DDL
    // value slip through as a garbage namespace qualifier ("id BIGINT,
    // name STRING.t") and fail later with an unrelated store error
    if (str(wt, "database").filter(_.nonEmpty).isEmpty)
      schema.filter(looksLikeDdl).foreach { s =>
        throw ConfigError(s"write '$name': 'schema' value '${s.take(60)}' " +
          "looks like a DDL column list — 'schema' is the namespace name; " +
          "put column DDL in 'table_schema'")
      }
    if (catalog.isDefined && schema.isDefined) {
      wt
    } else str(wt, "database").filter(_.nonEmpty) match {
      case None => wt
      case Some(db) =>
        val redirected = schema match {
          case Some(ddl) =>
            graft.Log.warn(s"write '$name': write_target " +
              "has both 'database' and 'schema' — interpreting 'schema' as " +
              "DDL table_schema (use the 'table_schema' field)")
            wt - "schema" + ("table_schema" -> ddl)
          case None => wt
        }
        if (db.contains(".")) {
          val Array(cat, sch) = db.split("\\.", 2)
          graft.Log.warn(s"write '$name': 'database' is " +
            s"""deprecated — auto-converted (database: "$db" -> catalog: """ +
            s""""$cat", schema: "$sch"); use explicit catalog/schema""")
          redirected - "database" + ("catalog" -> cat) + ("schema" -> sch)
        } else throw ConfigError(
          s"write '$name': write_target 'database' value '$db' has no dot " +
            "separator — it must be 'catalog.schema', or use the explicit " +
            "catalog and schema fields")
    }
  }

  /** Legacy `database` normalization for delta/table load sources
    * (reference namespace_normalizer.py:133-180). Format A: an explicit
    * `catalog` plus a dot-less `database` means the database IS the schema
    * name. Otherwise `database` must be dotted `catalog.schema`; a dot-less
    * value with no catalog is a hard error (CFG_012). */
  private def normalizeDeltaNamespace(name: String, src: Map[String, Any]): Map[String, Any] = {
    val catalog = str(src, "catalog").filter(_.nonEmpty)
    val schema = str(src, "schema").filter(_.nonEmpty)
    if (catalog.isDefined && schema.isDefined) src
    else str(src, "database").filter(_.nonEmpty) match {
      case None => src
      case Some(db) if catalog.isDefined && !db.contains(".") =>
        graft.Log.warn(s"load '$name': delta source " +
          "'database' is deprecated — treated as the schema name next to " +
          "the explicit catalog; use the 'schema' field")
        src - "database" + ("schema" -> db)
      case Some(db) if db.contains(".") =>
        val Array(cat, sch) = db.split("\\.", 2)
        graft.Log.warn(s"load '$name': 'database' is " +
          s"""deprecated — auto-converted (database: "$db" -> catalog: """ +
          s""""$cat", schema: "$sch"); use explicit catalog/schema""")
        src - "database" + ("catalog" -> cat) + ("schema" -> sch)
      case Some(db) => throw ConfigError(
        s"load '$name': delta source 'database' value '$db' has no dot " +
          "separator and no 'catalog' field — it must be 'catalog.schema', " +
          "or use the explicit catalog and schema fields")
    }
  }

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] => m.asScala.map { case (k, v) => k.toString -> v }.toMap
    case null => Map.empty
    case other => throw ConfigError(s"expected map, got: $other")
  }
  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).flatMap(Option(_)).map(_.toString)
  private def seq(m: Map[String, Any], k: String): Seq[Any] = m.get(k) match {
    case Some(l: java.util.List[_]) => l.asScala.toSeq
    case _ => Nil
  }
  private def strSeq(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
    case Some(null) | None => Nil
    case Some(s) => Seq(s.toString) // any YAML scalar → singleton list
  }
  private def anyMap(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k).map(asMap).getOrElse(Map.empty)
  private def sourceSeq(m: Map[String, Any]): Seq[String] = m.get("source") match {
    case Some(s: String) => Seq(s)
    case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
    case Some(mm: java.util.Map[_, _]) => str(asMap(mm), "view").toSeq
    case _ => Nil
  }
}
