package graft.sql

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{Catalog, MergeMode, SemanticType, TableSpec}
import graft.promql.{PromEval, PromParser}
import graft.promql.PromQL.{EvalParams, Metric}
import graft.streaming.Flow
import graft.streaming.Flow.FlowDef

/** SQL entry point — the Spark re-expression of the reference's
  * statement dispatch (operator/src/statement.rs:228 `execute_sql`,
  * SURVEY.md §3.1). GreptimeDB-specific statements are interpreted
  * here; everything else (the entire relational surface — joins,
  * windows, setops, CTEs, subqueries, TABLESAMPLE) passes through to
  * Catalyst via `spark.sql` over the catalog's registered read views.
  *
  * Handled statements:
  *  - `CREATE TABLE name (..., ts TIMESTAMP TIME INDEX, tag STRING
  *    PRIMARY KEY, ...) [PRIMARY KEY(...)] [WITH (k=v)]` — DDL with
  *    semantic roles (sql/src/statements/create.rs); options
  *    merge_mode / append_mode / ttl / path
  *  - `DROP TABLE`, `SHOW TABLES`, `DESC|DESCRIBE TABLE`
  *  - `INSERT INTO name VALUES ... | SELECT ...` → Parquet append +
  *    view refresh (read-time merge semantics stay intact)
  *  - `CREATE FLOW name SINK TO sink [EXPIRE AFTER 'd'] AS SELECT`
  *    (§2.10) + `ADMIN flush_flow(name)` to trigger a refresh
  *  - `TQL EVAL (start, end, step) <promql>` (§2.6, statements/tql.rs)
  *  - `col @@ 'term'` sugar → `matches_term(col, term)`
  *    (query/src/optimizer/transcribe_atat.rs)
  *  - `ADMIN fn(...)` no-op status stubs (common/function admin fns)
  */
final class GraftSession(spark0: SparkSession,
    warehouse: String = java.nio.file.Files.createTempDirectory("graft_wh").toString) {

  /** Own cloned session: the dialect function overrides (date_format,
    * trunc) and temp views must not leak into the caller's session —
    * Spark 4 resolves even functions.date_format(...) through the
    * session registry. */
  val spark: SparkSession = spark0.newSession()
  // java.time results skip the legacy hybrid-calendar rebase that mangles
  // far-era timestamps (insert/nullable_tag.result -19578-12-20)
  spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
  // single-quoted literals are verbatim in the reference (PG rules:
  // '\t' is backslash-t, '\d+' reaches regexp functions intact —
  // function/string/{repeat,regex}.result); Spark's default C-style
  // escape processing would eat the backslash
  spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")

  val catalog = new Catalog(spark)
  /** Serializable mirror of sessionTzOffsetMs for UDF closures (updated
    * by SET time_zone; declared before the UDF registration below). */
  private val tzOffsetRef = new java.util.concurrent.atomic.AtomicLong(0L)

  graft.functions.Registry.registerAll(spark)
  graft.functions.Registry.registerDialectOverrides(spark)
  // metric-engine __tsid (reference row_modifier.rs fxhash; UInt64 →
  // Decimal(20,0) so values above Long.MaxValue render unsigned)
  spark.udf.register("__graft_tsid",
    new org.apache.spark.sql.api.java.UDF2[scala.collection.Seq[String],
      scala.collection.Seq[String], java.math.BigDecimal] {
      def call(names: scala.collection.Seq[String],
          values: scala.collection.Seq[String]): java.math.BigDecimal = {
        val pairs = names.toSeq.zip(values.toSeq).filter(_._2 != null)
        graft.functions.Tsid.unsignedDecimal(graft.functions.Tsid.tsid(pairs))
      }
    }, org.apache.spark.sql.types.DecimalType(20, 0))
  // session-aware override: stored timestamps are UTC instants and the
  // reference renders date_format in the session time zone
  // (system/timezone.result) — including offsets Java rejects (+23:00)
  spark.udf.register("date_format", {
    val off = tzOffsetRef // serializable holder; do NOT capture `this`
    (ts: java.time.LocalDateTime, fmt: String) =>
      if (ts == null || fmt == null) null
      else graft.functions.Registry.Strftime.format(
        java.sql.Timestamp.valueOf(ts.plusNanos(off.get() * 1000000L)), fmt)
  })
  // `numbers` test table (table/src/table/numbers.rs:39-62): one UInt32
  // column `number`, default 100 rows; LIMIT n drives the generator
  // (numbers.rs:119 `request.limit.unwrap_or(100)`) — see dialect().
  spark.range(0, 100).selectExpr("CAST(id AS INT) AS number")
    .createOrReplaceTempView("numbers")

  // ---- databases (catalog/src/schema; USE swaps the visible tables) --
  /** Per-database saved table state: specs + session metadata, swapped
    * wholesale on USE. */
  private case class DbState(
      specs: Map[String, TableSpec],
      meta: Map[String, Vector[ColMeta]],
      dropped: Map[String, Set[String]],
      bfills: Map[String, Vector[(String, String, Long)]],
      casts: Map[String, Map[String, DataType]],
      tsUs: Map[String, Long],
      opts: Map[String, Seq[(String, String)]])
  private val dbOpts =
    scala.collection.concurrent.TrieMap[String, Seq[(String, String)]]("public" -> Nil)
  private val dbSaved = scala.collection.concurrent.TrieMap.empty[String, DbState]
  private var currentDb: String = "public"
  /** inside `USE information_schema` (virtual database: the real catalog
    * stays loaded; bare table names address the schema tables) */
  private var infoDb: Boolean = false
  private val InfoBareRx =
    ("(?i)\\b(FROM|JOIN)\\s+(TABLES|COLUMNS|FLOWS|TABLE_CONSTRAINTS|VIEWS|" +
      "TABLE_SEMANTICS|PROCEDURE_INFO|REGION_PEERS|SCHEMATA|PARTITIONS|" +
      "REGION_INFO|REGION_STATISTICS|KEY_COLUMN_USAGE|ENGINES|BUILD_INFO|" +
      "CHARACTER_SETS|COLLATIONS|COLLATION_CHARACTER_SET_APPLICABILITY|" +
      "COLUMN_PRIVILEGES|COLUMN_STATISTICS|CHECK_CONSTRAINTS|CLUSTER_INFO)\\b").r

  /** Deployment shape the engine reports through
    * information_schema.cluster_info / ssts node_id: a standalone node
    * by default; set for the distributed corpus, where the reference
    * runs 3 datanodes + frontend + flownode + metasrv
    * (tests/cases/distributed/information_schema/cluster_info.result). */
  @volatile var distributedCluster: Boolean = false
  private val engineStartMs = System.currentTimeMillis()

  private val flows = scala.collection.concurrent.TrieMap.empty[String, (FlowDef, String)]
  /** COMMENT ON FLOW / CREATE FLOW ... COMMENT '...' texts. */
  private val flowComments = scala.collection.concurrent.TrieMap.empty[String, String]
  // per-statement write order; strictly monotone within the session
  private val seqCounter =
    new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis() * 1000L)

  // ---- public API -----------------------------------------------------

  def sql(statement: String): DataFrame = {
    // strip /* block comments */ so dispatch sees the statement keyword
    val stmt = stripBlockComments(statement).trim.stripSuffix(";").trim
    val up = stmt.toUpperCase(Locale.ROOT)
    // information_schema is read-only (system/information_schema.result)
    if (infoDb && (up.startsWith("CREATE TABLE") || up.startsWith("DROP TABLE") ||
        up.startsWith("ALTER TABLE") || up.startsWith("INSERT")))
      throw new IllegalArgumentException("information_schema is read-only")
    if (up.startsWith("SHOW WARNINGS")) {
      import spark.implicits._
      val out = lastWarnings.toDF("Level", "Code", "Message")
      lastWarnings = Nil
      return out
    }
    lastWarnings = Nil // warnings live for exactly one following statement
    if (up.startsWith("SELECT") || up.startsWith("WITH") || up.startsWith("TQL"))
      catchUpScheduledFlows(stmt)
    if (up.startsWith("CREATE EXTERNAL TABLE")) createExternalTable(stmt)
    else if (up.startsWith("CREATE TABLE")) createTable(stmt)
    else if (up.startsWith("DROP TABLE")) {
      val tgt = normTable(stmt.split("\\s+")
        .filterNot(t => t.equalsIgnoreCase("IF") || t.equalsIgnoreCase("EXISTS")).last)
      if (externalTables.contains(tgt)) {
        spark.catalog.dropTempView(tgt)
        externalTables -= tgt
        status("table dropped")
      } else dropTable(stmt)
    }
    else if (up.startsWith("CREATE VIEW") || up.startsWith("CREATE OR REPLACE VIEW"))
      createView(stmt)
    else if (up.startsWith("DROP VIEW")) {
      val v = normTable(stmt.split("\\s+")
        .filterNot(t => t.equalsIgnoreCase("IF") || t.equalsIgnoreCase("EXISTS")).last)
      spark.catalog.dropTempView(v)
      userViews -= v
      userViewDefs -= v
      status("view dropped")
    }
    else if (up.startsWith("SHOW CREATE VIEW")) {
      import spark.implicits._
      val v = unquote(stmt.split("\\s+").last)
      val defn = userViewDefs.getOrElse(v,
        throw new IllegalArgumentException(s"view $v not found"))._1
      Seq((v, defn)).toDF("View", "Create View")
    }
    else if (up.startsWith("SHOW VIEWS")) {
      import spark.implicits._
      userViews.toSeq.sorted.toDF("Views")
    }
    else if (up.startsWith("ALTER TABLE")) alterTable(stmt)
    else if (up.startsWith("SHOW COLUMNS") || up.startsWith("SHOW FULL COLUMNS"))
      showColumns(stmt)
    else if (up.startsWith("SHOW TABLE STATUS")) {
      // MySQL-compat status listing over the information_schema tables
      // snapshot (show/show_databases_tables.sql pins the 18-col shape;
      // timestamps are redacted by the golden's REPLACE)
      refreshInfoSchema()
      val fromDb = "(?i)\\b(?:FROM|IN)\\s+([A-Za-z_\"`][A-Za-z0-9_\"`-]*)".r
        .findFirstMatchIn(stmt).map(m => unquote(m.group(1)))
      val like = "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
      val where = "(?is)\\bWHERE\\s+(.*)$".r.findFirstMatchIn(stmt).map(_.group(1).trim)
      val db = fromDb.getOrElse(if (infoDb) "information_schema" else currentDb)
      var df = spark.table("__info_tables")
        .filter(col("table_schema") === db)
        .select(col("table_name").as("Name"), col("engine").as("Engine"),
          col("version").as("Version"), col("row_format").as("Row_format"),
          col("table_rows").as("Rows"), col("avg_row_length").as("Avg_row_length"),
          col("data_length").as("Data_length"),
          col("max_data_length").as("Max_data_length"),
          col("index_length").as("Index_length"), col("data_free").as("Data_free"),
          col("auto_increment").as("Auto_increment"),
          col("create_time").as("Create_time"), col("update_time").as("Update_time"),
          col("check_time").as("Check_time"),
          col("table_collation").as("Collation"), col("checksum").as("Checksum"),
          col("create_options").as("Create_options"),
          col("table_comment").as("Comment"))
        .orderBy(col("Name"))
      like.foreach(p => df = df.filter(col("Name").rlike("^" + likeRegex(p) + "$")))
      where.foreach(w => df = df.where(dialect(w)))
      df
    }
    else if (up.startsWith("SHOW TABLES") || up.startsWith("SHOW FULL TABLES"))
      showTables(stmt)
    else if (up.startsWith("SHOW CREATE TABLE")) {
      val target = normTable(stmt.split("\\s+")(3))
      if (up.contains("FOR POSTGRES_FOREIGN_TABLE"))
        showCreateForeignTable(target)
      else showCreateTable(target)
    }
    else if (up.startsWith("SHOW CREATE DATABASE")) {
      import spark.implicits._
      val db = unquote(stmt.split("\\s+")(3))
      if (!dbOpts.contains(db))
        throw new IllegalArgumentException(s"database $db not found")
      val opts = dbOpts(db).sortBy(_._1).map { case (k, v) =>
        val key = if (k.matches("[A-Za-z_][A-Za-z0-9_]*")) k else s"'$k'"
        val ev0 = (if (k == "ttl") humanDuration(v) else v)
          .replace("\\", "\\\\") // backslashes render escaped (CJK comment golden)
        // ReadableSize values normalize through a float rendering
        // ('1KiB' -> '1.0KiB', show/show_create.result)
        val ev =
          if (k == "write_buffer_size" && ev0.matches("\\d+[KMGT]i?B"))
            ev0.replaceFirst("(\\d+)", "$1.0")
          else ev0
        s"  $key = '$ev'" }
      val lines = s"CREATE DATABASE IF NOT EXISTS $db" +:
        (if (opts.nonEmpty) ("WITH(" +: opts.zipWithIndex.map { case (o, i) =>
          if (i < opts.size - 1) o + "," else o } :+ ")") else Vector.empty)
      lines.zipWithIndex.map { case (l, i) => (if (i == 0) db else "", l) }
        .toDF("Database", "Create Database")
    }
    else if (up.startsWith("CREATE DATABASE")) createDatabase(stmt)
    else if (up.startsWith("CREATE SCHEMA"))
      createDatabase(stmt.replaceFirst("(?i)CREATE\\s+SCHEMA", "CREATE DATABASE"))
    else if (up.startsWith("DROP DATABASE")) dropDatabase(stmt)
    else if (up.startsWith("DROP SCHEMA"))
      dropDatabase(stmt.replaceFirst("(?i)DROP\\s+SCHEMA", "DROP DATABASE"))
    else if (up.startsWith("USE ")) {
      val target = unquote(stmt.split("\\s+").last)
      if (target.equalsIgnoreCase("information_schema")) {
        // virtual database: keep the real catalog loaded (its views read it)
        infoDb = true
        status("using information_schema")
      } else if (target.equalsIgnoreCase("pg_catalog")) {
        infoDb = false
        status("using pg_catalog") // virtual schema, catalog stays loaded
      } else {
        infoDb = false
        useDatabase(target)
      }
    }
    else if (up.startsWith("SET ")) setSession(stmt)
    else if (up.startsWith("SHOW DATABASES") || up.startsWith("SHOW SCHEMAS") ||
      up.startsWith("SHOW FULL DATABASES") || up.startsWith("SHOW FULL SCHEMAS"))
      showDatabases(stmt)
    else if (up.startsWith("ALTER DATABASE")) {
      // SET/UNSET database options; only ttl affects query results
      val kv = "(?is)SET\\s+'?([A-Za-z_][A-Za-z0-9_.]*)'?\\s*=\\s*'([^']*)'".r
      val nm = stmt.split("\\s+")(2)
      val db = unquote(nm)
      if (!dbOpts.contains(db))
        throw new IllegalArgumentException(s"database $db not found")
      kv.findFirstMatchIn(stmt).foreach { m =>
        val (k, v) = (m.group(1).toLowerCase(Locale.ROOT), m.group(2))
        // database-level ttl cannot be 'instant' (ttl/show_ttl.result)
        if (k == "ttl" && v == "instant")
          throw new IllegalArgumentException("database ttl cannot be instant")
        if (k == "ttl" && v.nonEmpty && v != "forever") parseTtlMs(v)
        // only the known database options are stored; unknown keys (e.g.
        // 'invalid.compaction.option') error (alter/alter_database.result)
        val known = Set("ttl", "memtable.type", "append_mode", "merge_mode",
          "skip_wal", "sst_format")
        if (!known(k) && !k.startsWith("compaction."))
          throw new IllegalArgumentException(s"Invalid database option key: $k")
        dbOpts.put(db, dbOpts(db).filterNot(_._1 == k) :+ (k -> v))
        // a database-level ttl change re-resolves for every table in the
        // db that has no ttl of its own (ttl/database_ttl.result)
        if (k == "ttl" && db == currentDb) {
          val ms = v match {
            case "" | "forever" => None
            case "instant" => Some(0L)
            case x => Some(parseTtlMs(x))
          }
          catalog.tables.foreach { t =>
            if (!tableOpts.getOrElse(t, Nil).exists(_._1 == "ttl")) {
              catalog.register(catalog.spec(t).copy(ttlMillis = ms))
              refreshView(t)
            }
          }
        }
      }
      if (up.contains("UNSET")) {
        val k = "'([^']*)'".r.findFirstMatchIn(
          stmt.substring(stmt.toUpperCase(Locale.ROOT).indexOf("UNSET")))
        k.foreach(m => dbOpts.put(db, dbOpts(db).filterNot(_._1 == m.group(1))))
      }
      status(s"database $db altered")
    }
    else if (up.startsWith("DESCRIBE ") || up.startsWith("DESC ")) {
      val rawTarget = stmt.split("\\s+").last.stripSuffix(";")
      val target = normTable(rawTarget)
      val infoQualified = rawTarget.toLowerCase(Locale.ROOT)
        .startsWith("information_schema.")
      val bare = target.stripPrefix("information_schema__schema__")
      if (bare.startsWith("pg_") && infoTableDescs.contains(bare))
        describeInfoTable(bare)
      else if ((infoDb || infoQualified) && target.endsWith("table_constraints"))
        describeInfoConstraints()
      else if ((infoDb || infoQualified) && target.endsWith("table_semantics"))
        describeInfoTableSemantics()
      else if ((infoDb || infoQualified) && infoTableDescs.contains(bare))
        describeInfoTable(bare)
      else describeTable(target)
    }
    else if (up.startsWith("COMMENT ON ")) commentOn(stmt)
    else if (up.startsWith("INSERT INTO")) insert(stmt)
    // MySQL-style REPLACE INTO: same write path; duplicate keys resolve
    // through the last_row merge view
    else if (up.startsWith("REPLACE INTO"))
      insert("INSERT" + stmt.substring("REPLACE".length))
    else if (up.startsWith("DELETE FROM")) delete(stmt)
    else if (up.startsWith("TRUNCATE")) truncateTable(stmt)
    else if (up.startsWith("COPY ")) copyStatement(stmt)
    else if (up.startsWith("CREATE FLOW") || up.startsWith("CREATE OR REPLACE FLOW"))
      createFlow(stmt)
    else if (up.startsWith("DROP FLOW")) {
      val f = unquote(stmt.split("\\s+")
        .filterNot(t => t.equalsIgnoreCase("IF") || t.equalsIgnoreCase("EXISTS")).last)
      flows.remove(f)
      flowMeta.remove(f)
      flowComments.remove(f)
      status("flow dropped")
    }
    else if (up.startsWith("SHOW CREATE FLOW")) {
      import spark.implicits._
      val f = unquote(stmt.split("\\s+").last)
      val (_, query) = flows.getOrElse(f,
        throw new IllegalArgumentException(s"flow $f not found"))
      val sinkT = flowMeta.get(f).map(_.sinkTable).getOrElse("?")
      val q = query.replaceAll("\\s+", " ").trim
        .replaceAll("(?i)\\s+as\\s+", " AS ")
        .replaceAll("(?i)\\s+from\\s+", " FROM ")
        .replaceAll("(?i)\\s+where\\s+", " WHERE ")
        .replaceAll("(?i)\\s+group\\s+by\\s+", " GROUP BY ")
        .replaceAll("(?i)\\s+having\\s+", " HAVING ")
      val withLine = flowMeta.get(f).map(_.opts).filter(_.nonEmpty)
        .map(o => "WITH (" +
          o.toSeq.sortBy(_._1).map { case (k, v) => s"$k = '$v'" }.mkString(", ") +
          ")").toSeq
      val commentLine = flowComments.get(f).map(c => s"COMMENT '$c'").toSeq
      val lines = Seq(s"CREATE FLOW IF NOT EXISTS $f",
        s"SINK TO $currentDb.$sinkT") ++ commentLine ++ withLine ++ Seq(s"AS $q")
      lines.zipWithIndex.map { case (l, i) => (if (i == 0) f else "", l) }
        .toDF("Flow", "Create Flow")
    }
    else if (up.startsWith("SHOW SEARCH_PATH")) {
      import spark.implicits._
      Seq(currentDb).toDF("search_path")
    }
    else if (up.startsWith("SHOW VARIABLES")) {
      import spark.implicits._
      val name = stmt.trim.stripSuffix(";").split("\\s+").last.toLowerCase(Locale.ROOT)
      // the MySQL sysvar table doesn't carry max_execution_time — the
      // reference answers with one empty name/value row (common/basic.result)
      if (name == "max_execution_time")
        Seq(("", "")).toDF("Variable_name", "Value")
      else {
        val value = name match {
          case "time_zone" | "timezone" => sessionTz
          case "system_time_zone" => "UTC"
          case v => sessionVars.getOrElse(v, "")
        }
        Seq(value).toDF(name.toUpperCase(Locale.ROOT))
      }
    }
    else if (up.startsWith("SHOW INDEX")) {
      // MySQL-shape index listing from declared metadata
      // (show/show_index.result, alter/change_col_*_options.result)
      import spark.implicits._
      val m = "(?is)^SHOW\\s+INDEX\\s+(?:FROM|IN)\\s+([A-Za-z_\"`][A-Za-z0-9_.\"`]*)".r
        .findFirstMatchIn(stmt.trim).getOrElse(throw new IllegalArgumentException(
          "Unexpected token while parsing SQL statement, expected: '{FROM | IN} table'"))
      val t = normTable(m.group(1))
      val df = indexRowsOf(t).sortBy(r => (r._3, r._4))
        .map { case (tb, nu, key, seq, c, nl, kind) =>
          (tb, nu, key, seq, c, "A", "", "", "", nl, kind, "", "", "YES", "") }
        .toDF("Table", "Non_unique", "Key_name", "Seq_in_index", "Column_name",
          "Collation", "Cardinality", "Sub_part", "Packed", "Null",
          "Index_type", "Comment", "Index_comment", "Visible", "Expression")
      "(?is)\\bWHERE\\s+(.+?)\\s*;?\\s*$".r.findFirstMatchIn(stmt)
        .map(w => df.where(w.group(1))).getOrElse(df)
    }
    else if (up.startsWith("SHOW PROCESSLIST") || up.startsWith("SHOW FULL PROCESSLIST")) {
      // one row: this session's own statement (the reference's catalog
      // process registry; show/show_process_list.result shapes)
      import spark.implicits._
      val q = stmt.trim.stripSuffix(";")
      val id = "127.0.0.1:4001/0"
      if (up.startsWith("SHOW FULL"))
        Seq((id, "greptime", "public", "unknown [unknown client addr]",
          "127.0.0.1:4001", "2026-01-01T00:00:00.000", "PT0.001S", q))
          .toDF("Id", "Catalog", "Schema", "Client", "Frontend", "StartTime",
            "ElapsedTime", "Query")
      else Seq((id, "greptime", q, "PT0.001S"))
        .toDF("Id", "Catalog", "Query", "ElapsedTime")
    }
    else if (up.startsWith("SHOW REGION")) {
      // one region per PARTITION rule (show/show_region.result)
      import spark.implicits._
      val m = ("(?is)^SHOW\\s+REGION\\s+FROM\\s+([A-Za-z_\"`][A-Za-z0-9_.\"`]*)" +
        "(?:\\s+IN\\s+\\S+)?(?:\\s+WHERE\\s+(.*))?\\s*;?\\s*$").r
        .findFirstMatchIn(stmt.trim).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt"))
      val t = normTable(m.group(1))
      if (!catalog.tables.contains(t))
        throw new IllegalArgumentException(s"Table not found: $t")
      val n = partitionClause.get(t).map(_._2.size).getOrElse(1).max(1)
      val df = (0 until n).map(i => (t, 4398046511104L + i, 0, "Yes"))
        .toDF("Table", "Region", "Peer", "Leader")
      Option(m.group(2)).map(w => df.where(w.trim.stripSuffix(";"))).getOrElse(df)
    }
    else if (up.startsWith("SHOW CHARACTER SET") || up.startsWith("SHOW CHARSET")) {
      import spark.implicits._
      showFilter(Seq(("utf8", "UTF-8 Unicode", "utf8_bin", 4))
        .toDF("Charset", "Description", "Default collation", "Maxlen"),
        "Charset", stmt)
    }
    else if (up.startsWith("SHOW COLLATION")) {
      import spark.implicits._
      showFilter(Seq(("utf8_bin", "utf8", 1, "Yes", "Yes", 1))
        .toDF("Collation", "Charset", "Id", "Default", "Compiled", "Sortlen"),
        "Collation", stmt)
    }
    else if (up.startsWith("SHOW FLOW STATUS")) {
      // flow_statistics filtered by name (flow/flow_status.sql); the
      // no-match result renders headerless-empty like the reference
      import spark.implicits._
      val like = "(?i)LIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
      val rx = like.map(p => ("^" + p.replace("%", ".*").replace("_", ".") + "$").r)
      val names = flows.keys.toSeq.filter(f => rx.forall(_.matches(f))).sorted
      names.map { f =>
        val meta = flowMeta.get(f)
        val created = meta.map(_.createdMs).getOrElse(0L)
        (flowIdOf(f), f, new java.sql.Timestamp(created),
          flowLastExecMs.get(f).map(t => new java.sql.Timestamp(t)).orNull,
          Long.box(math.max(0L, (System.currentTimeMillis() - created) / 1000L)),
          Long.box(1L))
      }.toDF("flow_id", "flow_name", "start_time", "last_execution_time",
        "uptime_seconds", "state_size")
    }
    else if (up.startsWith("SHOW FLOWS")) {
      import spark.implicits._
      val like = "(?i)LIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
      val rx = like.map(p => ("^" + p.replace("%", ".*").replace("_", ".") + "$").r)
      flows.keys.toSeq.filter(f => rx.forall(_.matches(f))).sorted.toDF("Flows")
    }
    else if (up.startsWith("PREPARE")) {
      val m = "(?is)^PREPARE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+FROM\\s+'(.*)'\\s*;?\\s*$".r
        .findFirstMatchIn(stmt.trim).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt"))
      preparedStmts.put(m.group(1), m.group(2).trim.stripSuffix(";"))
      status("prepared")
    }
    else if (up.startsWith("EXECUTE")) {
      val m = "(?is)^EXECUTE\\s+([A-Za-z_][A-Za-z0-9_]*)(?:\\s+USING\\s+(.*))?\\s*;?\\s*$".r
        .findFirstMatchIn(stmt.trim).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt"))
      val tmpl = preparedStmts.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown prepared statement: ${m.group(1)}"))
      val args = Option(m.group(2)).map(splitTop(_).map(_.trim)).getOrElse(Nil)
      val it = args.iterator
      val substituted = new StringBuilder
      var inStr = false
      tmpl.foreach { c =>
        if (c == '\'') { inStr = !inStr; substituted.append(c) }
        else if (c == '?' && !inStr)
          substituted.append(if (it.hasNext) it.next()
            else throw new IllegalArgumentException(
              "Placeholder '?' was not provided a value for execution"))
        else substituted.append(c)
      }
      // evaluate EAGERLY: a parameter that cannot convert to the cast's
      // type must error at EXECUTE time (prepare/mysql_prepare.result).
      // localCheckpoint materializes on the EXECUTORS — no driver
      // roundtrip for a big prepared SELECT — and its blocks are
      // reclaimed by the ContextCleaner once the frame is unreferenced
      sql(substituted.toString).localCheckpoint(true)
    }
    else if (up.startsWith("DEALLOCATE")) {
      preparedStmts.remove(stmt.trim.split("\\s+").last.stripSuffix(";"))
      status("deallocated")
    }
    // ---- cursors (operator/src/statement/cursor.rs,
    //      sql/src/parsers/cursor_parser.rs) ---------------------------
    else if (up.startsWith("DECLARE")) {
      val m = ("(?is)^DECLARE\\s+(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s+" +
        "CURSOR\\s+FOR\\s+(.*?)\\s*;?\\s*$").r
        .findFirstMatchIn(stmt.trim).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt"))
      val body = m.group(2).trim
      val bu = body.toUpperCase(Locale.ROOT)
      // the reference only accepts SELECT/WITH bodies (cursor_parser.rs)
      if (!bu.startsWith("SELECT") && !bu.startsWith("WITH"))
        throw new IllegalArgumentException(
          "Expect select query in cursor statement")
      val df = sql(body)
      // toLocalIterator streams one partition at a time — a cursor over
      // a huge result never materializes it on the driver; successive
      // FETCHes drain the iterator like the reference's
      // RecordBatchStreamCursor (common/recordbatch/src/cursor.rs)
      cursors.put(unquote(m.group(1)).toLowerCase(Locale.ROOT),
        (df.toLocalIterator(), df.schema))
      status("cursor declared")
    }
    else if (up.startsWith("FETCH")) {
      val m = ("(?is)^FETCH\\s+(\\d+)\\s+(?:FROM|IN)\\s+" +
        "(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$").r
        .findFirstMatchIn(stmt.trim).getOrElse(
          throw new IllegalArgumentException(s"cannot parse: $stmt"))
      val name = unquote(m.group(2)).toLowerCase(Locale.ROOT)
      val (it, schema) = cursors.getOrElse(name,
        throw new IllegalArgumentException(s"Cursor not found: $name"))
      val n = m.group(1).toLong
      val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      while (rows.length < n && it.hasNext) rows += it.next()
      spark.createDataFrame(
        java.util.Arrays.asList(rows.toArray: _*), schema)
    }
    else if (up.startsWith("CLOSE")) {
      val name = unquote(stmt.trim.split("\\s+").last.stripSuffix(";"))
        .toLowerCase(Locale.ROOT)
      cursors.remove(name)
      status("cursor closed")
    }
    else if (up.startsWith("TQL EVAL")) tqlEval(stmt)
    else if (up.startsWith("WITH") &&
        ("(?is)\\bTQL\\s+EVAL\\b".r.findFirstIn(stmt).isDefined ||
          ("(?is)\\bALIGN\\s+'".r.findFirstIn(stmt).isDefined &&
            "(?is)\\bRANGE\\s+'".r.findFirstIn(stmt).isDefined))) {
      val rw = rewriteTqlCtes(stmt)
      if (rw == stmt)
        throw new IllegalArgumentException(s"unsupported TQL in WITH: $stmt")
      sql(rw)
    }
    else if (up.startsWith("TQL EXPLAIN") || up.startsWith("TQL ANALYZE")) {
      import spark.implicits._
      val plan = tqlEval("TQL EVAL" + stmt.substring("TQL EXPLAIN".length))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      plan.split("\n").toSeq.toDF("plan")
    }
    else if (up.contains("GREPTIME_PRIVATE") &&
        (up.contains("SEMANTIC_ENTITIES") || up.contains("SEMANTIC_RELATIONSHIPS"))) {
      // computed entity-graph registry: readable virtual tables, every
      // DDL/DML path rejected (system/semantic_graph.sql)
      if (!up.trim.startsWith("SELECT"))
        throw new IllegalArgumentException(
          "Cannot change read-only table: semantic_entities")
      semanticEntitiesDf().createOrReplaceTempView("__sem_entities")
      semanticRelationshipsDf().createOrReplaceTempView("__sem_rel")
      spark.sql(dialect(stmt)
        .replaceAll("(?i)greptime_private\\.semantic_entities", "__sem_entities")
        .replaceAll("(?i)greptime_private\\.semantic_relationships", "__sem_rel"))
    }
    else if (up.startsWith("ADMIN")) admin(stmt)
    else if (up.contains("INFORMATION_SCHEMA.") ||
        "(?s).*\\bPG_(CATALOG|NAMESPACE|CLASS|DATABASE|ATTRIBUTE|TYPE)\\b.*".r
          .matches(up) ||
        (infoDb && InfoBareRx.findFirstIn(stmt).isDefined)) {
      refreshInfoSchema()
      refreshPgCatalog()
      // inside `USE information_schema`, bare names address its tables
      val qualified0 =
        if (infoDb) InfoBareRx.replaceAllIn(stmt, m =>
          s"${m.group(1)} information_schema.${m.group(2)}")
        else stmt
      // pg_catalog surface (system/pg_catalog.sql): strip the schema
      // qualifier, map the tables to materialized views, fold the
      // postgres-only functions/operators
      var qualified = qualified0
        .replaceAll("(?i)\\bpg_catalog\\.", "")
        .replaceAll("(?i)\\bpg_namespace\\b", "__pg_namespace")
        .replaceAll("(?i)\\bpg_class\\b", "__pg_class")
        .replaceAll("(?i)\\bpg_database\\b", "__pg_database")
        .replaceAll("(?i)\\bpg_attribute\\b", "__pg_attribute")
        .replaceAll("(?i)\\bpg_type\\b", "__pg_type")
        .replaceAll("(?i)\\bpg_get_userbyid\\s*\\([^()]*\\)", "'postgres'")
        .replaceAll("(?i)\\bpg_table_is_visible\\s*\\([^()]*\\)", "true")
        .replaceAll("(?i)\\b(obj|col|shobj)_description\\s*\\([^()]*(?:\\([^()]*\\)[^()]*)*\\)",
          "CAST(NULL AS STRING)")
        .replaceAll("!~", " NOT RLIKE ")
      qualified = "(?i)'([A-Za-z_][A-Za-z0-9_]*)'::regclass(::oid)?".r
        .replaceAllIn(qualified, m => pgOidOf(normIdent(m.group(1))).toString)
      // psql/TimescaleDB introspection sugar (pg_catalog.result \dt/\d):
      // our identifiers never need quoting, so quote_ident folds away;
      // parse_ident over a literal is resolvable at rewrite time; the
      // search-path membership subquery collapses to its constant value
      qualified = qualified
        .replaceAll("(?i)\\bquote_ident\\s*\\(", "(")
      qualified = "(?i)array_length\\s*\\(\\s*parse_ident\\('([^']*)'\\)\\s*,\\s*1\\s*\\)".r
        .replaceAllIn(qualified, m => m.group(1).split("\\.").length.toString)
      qualified = "(?i)\\(\\s*parse_ident\\('([^']*)'\\)\\s*\\)\\s*\\[(\\d+)\\]".r
        .replaceAllIn(qualified, m => {
          val parts = m.group(1).split("\\.")
          val i = m.group(2).toInt
          scala.util.matching.Regex.quoteReplacement(
            if (i >= 1 && i <= parts.length) s"'${parts(i - 1)}'" else "NULL")
        })
      // the reference has no pg search_path setting — the membership
      // subquery matches nothing, every table renders schema-qualified
      // (pg_catalog.result: both my_db.foo AND public.numbers qualified)
      qualified = ("(?is)\\(\\s*SELECT\\s+CASE\\s+WHEN\\s+trim\\(s\\[i\\]\\).*?" +
        "string_to_array\\(current_setting\\('search_path'\\),','\\)\\s+s\\s*\\)").r
        .replaceAllIn(qualified, _ => "('')")
      spark.sql(dialect(qualified)
        .replaceAll("(?i)information_schema\\.table_constraints", "__info_constraints")
        .replaceAll("(?i)information_schema\\.table_semantics", "__info_table_semantics")
        .replaceAll("(?i)information_schema\\.tables", "__info_tables")
        .replaceAll("(?i)information_schema\\.columns", "__info_columns")
        .replaceAll("(?i)information_schema\\.flow_statistics", "__info_flow_statistics")
        .replaceAll("(?i)information_schema\\.statistics", "__info_statistics")
        .replaceAll("(?i)information_schema\\.flows", "__info_flows")
        .replaceAll("(?i)information_schema\\.views", "__info_views")
        .replaceAll("(?i)information_schema\\.procedure_info", "__info_procedure_info")
        .replaceAll("(?i)information_schema\\.region_peers", "__info_region_peers")
        .replaceAll("(?i)information_schema\\.schemata", "__info_schemata")
        .replaceAll("(?i)information_schema\\.partitions", "__info_partitions")
        .replaceAll("(?i)information_schema\\.region_info", "__info_region_info")
        .replaceAll("(?i)information_schema\\.region_statistics",
          "__info_region_statistics")
        .replaceAll("(?i)information_schema\\.ssts_manifest", "__info_ssts_manifest")
        .replaceAll("(?i)information_schema\\.ssts_storage", "__info_ssts_storage")
        .replaceAll("(?i)information_schema\\.ssts_index_meta", "__info_ssts_index_meta")
        .replaceAll("(?i)information_schema\\.key_column_usage", "__info_key_column_usage")
        .replaceAll("(?i)information_schema\\.engines", "__info_engines")
        .replaceAll("(?i)information_schema\\.build_info", "__info_build_info")
        .replaceAll("(?i)information_schema\\.character_sets", "__info_character_sets")
        .replaceAll("(?i)information_schema\\.collation_character_set_applicability",
          "__info_collation_character_set_applicability")
        .replaceAll("(?i)information_schema\\.collations", "__info_collations")
        .replaceAll("(?i)information_schema\\.column_privileges", "__info_column_privileges")
        .replaceAll("(?i)information_schema\\.column_statistics", "__info_column_statistics")
        .replaceAll("(?i)information_schema\\.check_constraints", "__info_check_constraints")
        .replaceAll("(?i)information_schema\\.cluster_info", "__info_cluster_info"))
    }
    else if (up.startsWith("SELECT") && RangeSql.looksLikeRange(stmt))
      RangeSql.execute(spark, rewriteAtAt(stmt), name => {
        val spec = catalog.spec(name)
        (spark.table(name), spec.timeIndex, spec.tags)
      }, sessionTzOffsetMs)
    else {
      var out = reorderUsingJoin(stmt, spark.sql(dialect(stmt)))
      // the ns-fidelity rewrite leaves rendered columns named after the
      // wrapping call — restore the bare column name
      val NsRenderName = "__ns_render\\(`?(\\w+)`?, `?__nsr_\\w+`?\\)".r
      if (out.columns.exists(c => NsRenderName.pattern.matcher(c).matches))
        out = out.toDF(out.columns.map {
          case NsRenderName(c) => c
          case other => other
        }: _*)
      // a FROM-less scalar-subquery select yields NO row when the inner
      // query is empty (DataFusion; subquery/offset.result), where Spark
      // returns one NULL row
      val scalarOnly = "(?is)^SELECT\\s*\\(\\s*SELECT\\b[^;]*\\)\\s*(AS\\s+\\S+)?\\s*;?\\s*$".r
        .matches(stmt) && !"(?is)\\)\\s*(AS\\s+\\S+)?\\s*FROM\\b".r
        .findFirstIn(stmt).isDefined
      if (scalarOnly && out.columns.length == 1) {
        val rows = out.collect()
        if (rows.length == 1 && rows(0).isNullAt(0)) out.limit(0) else out
      } else out
    }
  }

  /** DataFusion's `SELECT *` output for NATURAL / USING joins keeps the
    * join columns in the RIGHT table's declared positions (left side
    * minus the common columns, then the right side in full — see
    * `join/natural_join.result`). Spark hoists the coalesced keys to the
    * front; reorder to the reference layout. Bails (returns df as-is) on
    * anything it can't fully resolve. */
  private def reorderUsingJoin(stmt: String, df: DataFrame): DataFrame = {
    val up = stmt.toUpperCase(Locale.ROOT)
    if (!up.matches("(?s)^SELECT\\s+\\*\\s+FROM\\s+.*")) return df
    if (!(up.contains("NATURAL") || up.contains("USING"))) return df
    if (up.matches("(?s).*\\bON\\b.*")) return df
    try {
      val fromTail = stmt.substring(up.indexOf("FROM") + 4)
      val stop = "(?i)\\b(WHERE|ORDER|GROUP|LIMIT|OFFSET|HAVING)\\b".r
        .findFirstMatchIn(fromTail).map(_.start).getOrElse(fromTail.length)
      val fromClause = fromTail.substring(0, stop).trim
      val ident = "(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
      val joinRx = ("(?i)\\s+(NATURAL\\s+)?(LEFT\\s+|RIGHT\\s+|FULL\\s+|INNER\\s+)?(OUTER\\s+)?JOIN\\s+" +
        ident + "(\\s+USING\\s*\\(([^)]*)\\))?").r
      val firstRx = ("^" + ident).r
      val t0 = firstRx.findFirstMatchIn(fromClause).getOrElse(return df).group(1)
      def cols(name: String): Seq[String] = spark.table(unquote(name)).columns.toSeq
      // provenance-tagged desired layout: the reference drops a USING /
      // NATURAL key only from the FIRST table's block; every joined-in
      // right table keeps its full declared schema (join/using_join
      // .result, multi-table case: user_id appears once per right table)
      var desired: Seq[(Int, String)] = cols(t0).map((0, _))
      var sparkLayout = cols(t0)
      val joins = joinRx.findAllMatchIn(fromClause).toSeq
      if (joins.isEmpty) return df
      for ((m, ji) <- joins.zipWithIndex) {
        val right = cols(m.group(4))
        val usingCols = Option(m.group(6))
          .map(_.split(",").map(c => unquote(c.trim)).toSeq)
        val keys = usingCols.getOrElse(
          sparkLayout.filter(c => right.exists(_.equalsIgnoreCase(c))))
        if (keys.isEmpty) return df
        val keySet = keys.map(_.toLowerCase(Locale.ROOT)).toSet
        def minus(xs: Seq[String]) = xs.filterNot(c => keySet(c.toLowerCase(Locale.ROOT)))
        desired = desired.filterNot { case (ti, c) =>
          ti == 0 && keySet(c.toLowerCase(Locale.ROOT))
        } ++ right.map((ji + 1, _))
        sparkLayout = keys ++ minus(sparkLayout) ++ minus(right)
      }
      val n = df.columns.length
      if (sparkLayout.length != n) return df
      if (!sparkLayout.zip(df.columns).forall { case (a, b) => a.equalsIgnoreCase(b) }) return df
      val tmp = (0 until n).map(i => s"__c$i")
      val used = new Array[Boolean](n)
      val perm = desired.map { case (_, name) =>
        // coalesced keys exist once in Spark's output but once per right
        // table in the reference layout — reuse the source column then
        val idx = (0 until n).find(j => !used(j) && sparkLayout(j).equalsIgnoreCase(name))
          .orElse((0 until n).find(j => sparkLayout(j).equalsIgnoreCase(name)))
          .getOrElse(return df)
        if (idx < n) used(idx) = true
        idx
      }
      df.toDF(tmp: _*)
        .select(perm.map(i => org.apache.spark.sql.functions.col(s"__c$i")): _*)
        .toDF(perm.map(df.columns): _*)
    } catch { case _: Throwable => df }
  }

  /** Register an existing Parquet table (e.g. external testdata). */
  def register(spec: TableSpec): Unit = {
    catalog.register(spec)
    catalog.createView(spec.name)
  }

  def refreshFlow(name: String, pinnedMs: Option[Long] = None): Unit = {
    val (flowDef, query) = flows.getOrElse(name,
      throw new IllegalArgumentException(s"unknown flow: $name"))
    flowMeta.get(name) match {
      case Some(meta) if meta.pending => // source never appeared — no-op
      case Some(meta) if meta.srcTable.exists(t =>
          !catalog.tables.contains(t) ||
            tableEpoch.getOrElse(t, 0L) != meta.srcEpoch) =>
        // the source was dropped (and possibly re-created): the flow is
        // bound to the old table id and stops updating (flow_rebuild)
        ()
      case Some(meta) =>
        flowLastExecMs.put(name, System.currentTimeMillis())
        val spec = catalog.spec(meta.sinkTable)
        // a streaming non-aggregating flow appends only the rows since
        // its LAST refresh (show_create_flow accumulates across evals);
        // an aggregating flow re-evaluates everything since creation
        val appendMode = meta.streaming && !aggregatingQuery(query)
        // batching flows re-evaluate every row in the time-windows
        // DIRTIED by writes since creation — a pre-creation row in a
        // dirty window IS included (flow_rebuild's "4 is also expected"),
        // while with no post-creation writes nothing evaluates at all
        // (flow_flush's empty sink). Streaming non-aggregating flows
        // instead append only the rows since their last refresh.
        if (appendMode) {
          val sinceSeq = flowLastSeq.getOrElse(name, meta.createSeq)
          meta.srcTable.foreach(s => refreshView(s, Some(sinceSeq)))
        } else meta.srcTable match {
          case Some(s) =>
            refreshView(s, Some(meta.createSeq))
            val BinRx = ("(?i)date_bin\\s*\\(\\s*INTERVAL\\s+'([^']+)'\\s*,\\s*" +
              "([A-Za-z_][A-Za-z0-9_]*)").r
            BinRx.findFirstMatchIn(query) match {
              case Some(mm) if spark.table(s).columns.contains(mm.group(2)) =>
                // time-windowed flow: only windows DIRTIED by new rows
                // re-evaluate; with none, nothing does (flow_flush)
                val ms = intervalMs(mm.group(1))
                val tsC = mm.group(2)
                def win(c: Column) =
                  floor(unix_millis(c.cast("timestamp")) / ms)
                val wins = spark.table(s)
                  .select(win(col(tsC)).as("w")).distinct()
                  .collect().map(_.getLong(0)).toSeq
                if (wins.isEmpty) { refreshView(s); return }
                // an instant-ttl source's pre-creation rows were already
                // consumed-and-dropped — only post-creation rows replay
                val seqF = if (catalog.spec(s).ttlMillis.contains(0L))
                  Some(meta.createSeq) else None
                refreshView(s, seqF,
                  rowFilter = Some(win(col(tsC)).isin(wins: _*)))
              case _ =>
                // no declared time window: the whole table re-evaluates
                // on every tick/flush (flow_rebuild's count(*), TQL avg) —
                // except an instant-ttl source, whose rows only exist
                // for the flow between arrival and consumption
                // (flow_advance_ttl keeps accumulating 20,22 then 23)
                if (!catalog.spec(s).ttlMillis.contains(0L)) refreshView(s)
            }
          case None => ()
        }
        // a scheduled flow evaluates with now()/current_timestamp()
        // PINNED to its schedule boundary — the reference's batching
        // engine plans each tick at the aligned instant, which
        // flow_scheduled_now_boundary asserts (create_time lands exactly
        // on the second, filters don't drift with wall clock)
        val evalQuery = meta.evalInterval match {
          case Some(_) =>
            // pinned to the SECOND boundary: finer-grained than the eval
            // interval (a '5m' flow still sees this tick's data,
            // flow_batch_join_subquery) yet exact enough that
            // flow_scheduled_now_boundary's create_time =
            // date_trunc('second', create_time) holds
            val pinned = pinnedMs.getOrElse(
              math.floorDiv(System.currentTimeMillis(), 1000L) * 1000L)
            rewriteOutsideQuotes(query)(
              _.replaceAll("(?i)\\b(?:now|current_timestamp)\\s*\\(\\s*\\)",
                s"timestamp_millis(${pinned}L)"))
          case None => query
        }
        var out =
          try flowQueryDf(evalQuery).toDF(meta.outNames: _*)
          finally meta.srcTable.foreach(s => refreshView(s))
        // a flow may project its own update_at literal — only fill the
        // engine timestamp when the query didn't (flow_last_non_null)
        if (!out.columns.contains("update_at"))
          out = out.withColumn("update_at", current_timestamp())
        if (meta.placeholder)
          out = out.withColumn("__ts_placeholder", timestamp_millis(lit(0L)))
        out = out.withColumn(SeqCol, lit(seqCounter.incrementAndGet()))
        // align to the sink's physical schema (declared metadata when the
        // sink parquet hasn't been materialized yet)
        val sinkP = new org.apache.hadoop.fs.Path(spec.path)
        val sinkFs = sinkP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val target: StructType = {
          val declared = colMeta.getOrElse(meta.sinkTable, Vector.empty)
          if (sinkFs.exists(sinkP) && sinkFs.listStatus(sinkP).nonEmpty) {
            val phys =
              spark.read.option("mergeSchema", "true").parquet(spec.path).schema
            // ALTER ADD COLUMN on the sink may exist only as declared
            // metadata (an empty-table ALTER writes no part file) — the
            // flow must still produce it (flow_aft_alter's sample_cnt)
            StructType(phys.fields ++
              declared.filterNot(m => phys.fieldNames.contains(m.name)).map(m =>
                StructField(m.name, sparkType(showCreateType(m.gtype)), m.nullable)))
          }
          else StructType(
            declared.map(m =>
              StructField(m.name, sparkType(showCreateType(m.gtype)), m.nullable))
              :+ StructField(SeqCol, LongType))
        }
        // a sink column the flow doesn't produce takes its DECLARED
        // default (show_create_flow: ts DEFAULT CURRENT_TIMESTAMP gives
        // each appended batch a distinct ts), else null
        val sinkDefaults = colMeta.getOrElse(meta.sinkTable, Vector.empty)
          .flatMap(m => m.default.map(m.name -> _)).toMap
        val aligned = out.select(target.map(f =>
          (if (out.columns.contains(f.name)) col(s"`${f.name}`")
           else sinkDefaults.get(f.name)
             .map(d => scala.util.Try(expr(dialect(d)))
               .getOrElse(lit(null).cast(f.dataType)))
             .getOrElse(lit(null)))
            .cast(f.dataType).as(f.name)): _*)
        if (appendMode) {
          aligned.write.mode("append").parquet(spec.path)
          refreshPath(spec.path)
          flowLastSeq.put(name, seqCounter.get())
        }
        else if (spec.mergeMode == MergeMode.LastNonNull)
          // the sink's own merge view coalesces per column (null keeps
          // the old value) — append and let storage-merge resolve, like
          // the reference region write path (flow_last_non_null)
          { aligned.write.mode("append").parquet(spec.path); refreshPath(spec.path) }
        else if (flowDef.keys.nonEmpty)
          Flow.upsert(aligned, spec.path, flowDef.keys)
        else {
          // keyless flow (global aggregate): full recompute replaces the
          // sink — staging + rename so readers never see a partial sink
          val fs = new org.apache.hadoop.fs.Path(spec.path)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val staging = new org.apache.hadoop.fs.Path(spec.path + "__staging")
          aligned.write.mode("overwrite").parquet(staging.toString)
          val old = new org.apache.hadoop.fs.Path(spec.path + "__old")
          if (fs.exists(old)) fs.delete(old, true)
          val sinkP = new org.apache.hadoop.fs.Path(spec.path)
          if (fs.exists(sinkP)) fs.rename(sinkP, old)
          fs.rename(staging, sinkP)
          fs.delete(old, true)
        }
        refreshPath(spec.path)
        refreshView(meta.sinkTable)
      case None =>
        Flow.refreshOnce(spark.sql(dialect(query)), flowDef.copy(transform = identity))
    }
  }

  /** Cross-schema table references (select/multi_column_ref.sql,
    * select/qualified_view.sql, flow/flow_batch_join_subquery.sql):
    * `db.tbl` resolves to the per-schema mangled view. A FROM/JOIN
    * without a user alias gains the bare table name as alias so both
    * `db.tbl.col` and `tbl.col` column qualifiers keep resolving. */
  private def rewriteDbQualified(s0: String): String = {
    val dbs = (dbOpts.keySet ++ dbSaved.keySet) - currentDb - "public" -
      "information_schema" - "greptime_private" - "pg_catalog"
    if (dbs.isEmpty) return s0
    var s = s0
    val stopWords = Set("WHERE", "GROUP", "ORDER", "LIMIT", "ON", "JOIN",
      "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "UNION", "HAVING", "USING",
      "VALUES", "SET", "WITH", "INTERSECT", "EXCEPT", "OFFSET")
    val tok = "(?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"
    for (d <- dbs if s.toLowerCase(Locale.ROOT).contains(d.toLowerCase(Locale.ROOT))) {
      // the db name may appear backtick-quoted (keywords_expressions'
      // CREATE DATABASE "SCHEMA" → `SCHEMA`.`TABLE` after ident rewrite)
      val dq = "(?:`" + java.util.regex.Pattern.quote(d) + "`|\\b" +
        java.util.regex.Pattern.quote(d) + ")"
      // FROM/JOIN db.tbl [alias]: mangle; add the bare name as alias when
      // the user gave none
      s = ("(?is)\\b(FROM|JOIN)\\s+" + dq + "\\.(" + tok + ")" +
        "(\\s+(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*)?").r.replaceAllIn(s, m => {
        val bare = normIdent(m.group(2))
        val mangled = s"${d}__schema__$bare"
        val alias = Option(m.group(3)).map(_.trim)
          .filterNot(a => stopWords.contains(
            a.stripPrefix("AS ").stripPrefix("as ").trim.toUpperCase(Locale.ROOT)))
        scala.util.matching.Regex.quoteReplacement(alias match {
          case Some(a) => s"${m.group(1)} $mangled $a"
          case None =>
            val kept = Option(m.group(3)).getOrElse("")
            // backtick the implicit alias: the bare table name may be a
            // reserved word (keywords_expressions' "TABLE")
            s"${m.group(1)} $mangled `$bare`$kept"
        })
      })
      // column qualifiers db.tbl.col → tbl.col
      s = ("(?i)" + dq + "\\.(" + tok + ")\\.").r.replaceAllIn(s, m =>
        scala.util.matching.Regex.quoteReplacement(normIdent(m.group(1)) + "."))
      // any remaining db.tbl reference → the mangled name
      s = ("(?i)" + dq + "\\.(" + tok + ")").r.replaceAllIn(s, m =>
        scala.util.matching.Regex.quoteReplacement(
          s"${d}__schema__${normIdent(m.group(1))}"))
    }
    s
  }

  /** FROM-less `SELECT unnest(...)` forms (select/unnest.sql): nested
    * unnest flattens; multiple array generators ZIP positionally padded
    * with null; a struct unnest expands to its fields. Re-expressed as a
    * sequence-index explode with `try_element_at`. */
  private def rewriteScalarUnnest(sel0: String): String = {
    var s = sel0
    var changed = true
    while (changed) {
      val next = s.replaceAll("(?i)\\bunnest\\s*\\(\\s*unnest\\s*\\(",
        "unnest(flatten(")
      changed = next != s
      s = next
    }
    // collect balanced unnest(arg) spans
    def collect(str: String): Seq[(Int, Int, String)] = {
      val out = Seq.newBuilder[(Int, Int, String)]
      val rx = "(?i)\\bunnest\\s*\\(".r
      for (m <- rx.findAllMatchIn(str)) {
        var d = 0; var i = m.end - 1; var close = -1
        while (i < str.length && close < 0) {
          str.charAt(i) match {
            case '(' => d += 1
            case ')' => d -= 1; if (d == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close > 0) out += ((m.start, close + 1, str.substring(m.end, close).trim))
      }
      out.result()
    }
    val spans = collect(s)
    if (spans.isEmpty) return s
    val args = spans.map(_._3).distinct
    if (args.length == 1 && args.head.toLowerCase(Locale.ROOT).startsWith("struct")) {
      // struct unnest → one row of its fields
      return s"SELECT inline(array(${args.head}))"
    }
    // rewrite right-to-left so spans stay valid
    var out = s
    spans.sortBy(-_._1).foreach { case (a, b, arg) =>
      out = out.substring(0, a) + s"try_element_at(($arg), __i + 1)" +
        out.substring(b)
    }
    val sizes = args.map(a => s"size(($a))").mkString(", ")
    val great = if (args.length == 1) sizes else s"greatest($sizes)"
    // guard the generator: for an all-empty input `sequence(0, -1)` is
    // the DESCENDING sequence [0, -1], which would emit two null rows
    // where unnest of an empty array must emit zero
    s"$out FROM (SELECT explode(CASE WHEN ($great) <= 0 THEN array() " +
      s"ELSE sequence(0, $great - 1) END) AS __i)"
  }

  /** SHOW CHARACTER SET / COLLATION filter handling: `LIKE 'pat'`
    * matches against `likeCol`; a `WHERE cond` tail applies verbatim
    * (show/show_charset.sql, show/show_collation.sql). */
  private def showFilter(df: DataFrame, likeCol: String, stmt: String): DataFrame = {
    val like = "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
    val where = "(?is)\\bWHERE\\s+(.+)$".r.findFirstMatchIn(stmt)
      .map(_.group(1).trim.stripSuffix(";"))
    val d1 = like.map(p => df.where(col(likeCol).like(p))).getOrElse(df)
    where.map(w => d1.where(w)).getOrElse(d1)
  }

  // ---- @@ sugar (transcribe_atat.rs) ----------------------------------

  /** LHS of `@@` may be a column, a backticked column, a string literal
    * or a one-level function call (expr/atat.sql: `lower(x) @@ 'y'`). */
  private[graft] def rewriteAtAt(s: String): String =
    s.replaceAll(
      "('(?:[^'\\\\]|\\\\.)*'|`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*\\s*\\([^()]*\\)|" +
        "[A-Za-z_][A-Za-z0-9_.]*)\\s*@@\\s*('(?:[^'\\\\]|\\\\.)*')",
      "matches_term($1, $2)")

  // ---- dialect shims (DataFusion/Postgres syntax the corpus uses) -----

  private val CastRx =
    // the function-call operand allows two paren-nesting levels with
    // possessive quantifiers (FIRST_VALUE(CAST('0.1' AS DECIMAL(4,1)))
    // ::VARCHAR in types/decimal/decimal_aggregates.sql)
    ("(?i)((?:TIMESTAMP|DATE)\\s+'[^']*'|'[^']*'|`[^`]+`|\"[^\"]+\"|" +
      "[A-Za-z_][A-Za-z0-9_.]*\\((?:[^()]++|\\((?:[^()]++|\\([^()]*+\\))*+\\))*+\\)|" +
      "\\((?:[^()]++|\\([^()]*+\\))*+\\)|" + // parenthesized expr: (-300)::SMALLINT
      "[A-Za-z_][A-Za-z0-9_.]*|[0-9][0-9.]*)" +
      "\\s*::\\s*([A-Za-z_][A-Za-z0-9_]*(?:\\s*\\(\\s*\\d+(?:\\s*,\\s*\\d+)?\\s*\\))?)").r

  private def castType(t: String): String = {
    val u = t.trim.toUpperCase(Locale.ROOT)
    u.takeWhile(_ != '(') match {
      case "VARCHAR" | "TEXT" | "CHAR" => "STRING"
      case "INT4" => "INT"
      case "INT8" | "INT64" => "BIGINT"
      case "INT2" | "INT16" => "SMALLINT"
      case "INT32" => "INT"
      case "FLOAT8" | "FLOAT64" => "DOUBLE"
      case "FLOAT4" | "FLOAT32" | "REAL" => "FLOAT"
      case "BOOL" => "BOOLEAN"
      // BYTEA stores the literal's raw bytes (types/blob/blob.result)
      case "BYTEA" => "BINARY"
      case "UINT8" | "UINT16" => "INT"
      case "UINT32" | "UINT64" => "BIGINT"
      case "TIMESTAMPSECOND" | "TIMESTAMPMILLISECOND" | "TIMESTAMPMICROSECOND" |
        "TIMESTAMPNANOSECOND" | "DATETIME" | "TIMESTAMP" | "TIMESTAMP_SEC" |
        "TIMESTAMP_S" | "TIMESTAMP_MS" | "TIMESTAMP_US" | "TIMESTAMP_NS" |
        "TIMESTAMPTZ" => "TIMESTAMP"
      case "INTERVAL" => "INTERVAL DAY TO SECOND"
      // bare DECIMAL defaults to (38,10) in DataFusion, not Spark's
      // (10,0) (types/decimal/decimal_ops.sql '0.1'::DECIMAL keeps 0.1)
      case "DECIMAL" | "NUMERIC" =>
        if (u.contains('(')) u else "DECIMAL(38,10)"
      case _ => u
    }
  }

  /** `"ident"` → `` `ident` `` outside single-quoted strings; `""`
    * inside an identifier unescapes to one `"`. */
  private def backtickIdents(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => // copy single-quoted string verbatim ('' escape)
          val j = { var k = i + 1
            while (k < s.length && (s.charAt(k) != '\'' ||
              (k + 1 < s.length && s.charAt(k + 1) == '\'' && { k += 1; true }))) k += 1
            k }
          out.append(s.substring(i, math.min(j + 1, s.length))); i = j + 1
        case '"' =>
          val id = new StringBuilder
          var k = i + 1
          var closed = false
          while (k < s.length && !closed) {
            if (s.charAt(k) == '"') {
              if (k + 1 < s.length && s.charAt(k + 1) == '"') { id.append('"'); k += 2 }
              else { closed = true; k += 1 }
            } else { id.append(s.charAt(k)); k += 1 }
          }
          out.append('`').append(id).append('`'); i = k
        case c => out.append(c); i += 1
      }
    }
    out.toString
  }

  private val DateBinRx =
    ("(?i)DATE_BIN\\(\\s*(?:'([^']+)'\\s*::\\s*INTERVAL|INTERVAL\\s+'([^']+)')\\s*,\\s*" +
      "([A-Za-z_][A-Za-z0-9_.]*)\\s*(?:,\\s*'([^']+)'[^)]*)?\\)").r

  /** After `approx_distinct(` is textually rewritten to
    * `__approx_distinct(__ahash64(`, insert the matching extra `)` at
    * each original call's close paren (regexes can't balance nesting).
    */
  private def closeApproxDistinct(s: String): String = {
    val marker = "__approx_distinct(__ahash64("
    val at = s.indexOf(marker)
    if (at < 0) return s
    var depth = 2
    var j = at + marker.length
    while (j < s.length && depth > 1) {
      val c = s.charAt(j)
      if (c == '\'') { // skip string literal ('' is the escape)
        j += 1
        var done = false
        while (j < s.length && !done) {
          if (s.charAt(j) == '\'') {
            if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 1
            else done = true
          }
          j += 1
        }
        j -= 1 // loop tail re-increments
      }
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      j += 1
    }
    val closed = depth == 1 // j is just past the original `)`
    val inner =
      closeApproxDistinct(s.substring(at + marker.length, if (closed) j - 1 else j))
    s.substring(0, at) + marker + inner + (if (closed) "))" else "") +
      closeApproxDistinct(s.substring(j))
  }

  /** Fold integer-literal products in VALUES bodies with 64-bit math —
    * the reference evaluates integer literals as Int64, while Spark's
    * ANSI inline table overflows `456*456*456*456` at INT width
    * (types/decimal/decimal_aggregates.sql). */
  private def foldIntProducts(s: String): String = {
    val rx = "(?<![\\w.'])(\\d+)\\s*\\*\\s*(\\d+)(?![\\w.'])".r
    var cur = s
    var prev: String = null
    while (prev != cur) {
      prev = cur
      cur = rx.replaceAllIn(cur, m =>
        try (m.group(1).toLong * m.group(2).toLong).toString
        catch { case _: Exception => m.matched })
    }
    cur
  }

  /** Parse the reference's interval grammar to MonthDayNano-at-µs:
    * PG verbose (`1 year 2 months`), humantime compact (`-1h5m`,
    * `1y2w3d4h`, `3y2mon`), fractional units (`1.5 year` → 18 mons),
    * and ISO-8601 (`p3y3m700dt133h17m36.789s` — converted WHOLLY to a
    * duration with 365-day years / 30-day months, months:0, matching
    * types/interval/interval.result). */
  private[graft] def parseIntervalMdn(text0: String): Option[(Int, Int, Long)] = {
    val text = text0.trim
    if (text.isEmpty) return None
    val iso = ("(?i)^([+-]?)p(?:(\\d+(?:\\.\\d+)?)y)?(?:(\\d+(?:\\.\\d+)?)m)?" +
      "(?:(\\d+(?:\\.\\d+)?)w)?(?:(\\d+(?:\\.\\d+)?)d)?" +
      "(?:t(?:(\\d+(?:\\.\\d+)?)h)?(?:(\\d+(?:\\.\\d+)?)m)?" +
      "(?:(\\d+(?:\\.\\d+)?)s)?)?$").r
    iso.findFirstMatchIn(text) match {
      case Some(m) if (2 to 8).exists(m.group(_) != null) =>
        val sign = if (m.group(1) == "-") -1 else 1
        def g(i: Int) = Option(m.group(i)).map(_.toDouble).getOrElse(0.0)
        val secs = g(2) * 365 * 86400 + g(3) * 30 * 86400 + g(4) * 7 * 86400 +
          g(5) * 86400 + g(6) * 3600 + g(7) * 60 + g(8)
        return Some((0, 0, math.round(sign * secs * 1e6)))
      case _ =>
    }
    val tok = ("(?i)([+-]?\\d+(?:\\.\\d+)?)\\s*" +
      "(milliseconds?|microseconds?|nanoseconds?|minutes?|months?|seconds?|" +
      "msecs?|usecs?|nsecs?|years?|yrs?|weeks?|wks?|hours?|mons?|mins?|" +
      "days?|secs?|hrs?|ms|us|ns|y|w|d|h|m|s)").r
    var months = 0.0; var days = 0.0; var micros = 0.0
    val sb = new StringBuilder(text)
    var any = false
    for (mm <- tok.findAllMatchIn(text)) {
      any = true
      var k = mm.start
      while (k < mm.end) { sb.setCharAt(k, ' '); k += 1 }
      val v = mm.group(1).toDouble
      mm.group(2).toLowerCase(Locale.ROOT) match {
        case u if u.startsWith("year") || u.startsWith("yr") || u == "y" =>
          months += v * 12
        case u if u.startsWith("mon") => months += v
        case u if u.startsWith("week") || u.startsWith("wk") || u == "w" =>
          days += v * 7
        case u if u.startsWith("day") || u == "d" => days += v
        case u if u.startsWith("hour") || u.startsWith("hr") || u == "h" =>
          micros += v * 3.6e9
        case u if u.startsWith("millisecond") || u.startsWith("msec") || u == "ms" =>
          micros += v * 1000
        case u if u.startsWith("microsecond") || u.startsWith("usec") || u == "us" =>
          micros += v
        case u if u.startsWith("nanosecond") || u.startsWith("nsec") || u == "ns" =>
          micros += v / 1000
        case u if u.startsWith("min") || u == "m" => micros += v * 6e7
        case u if u.startsWith("sec") || u == "s" => micros += v * 1e6
      }
    }
    if (!any || sb.toString.exists(c => !c.isWhitespace && c != ',')) return None
    // fractional months/days spill down (1.5 year → 18 mons exactly;
    // 1.5 months → 1 mon 15 days)
    val mWhole = months.toLong
    days += (months - mWhole) * 30
    val dWhole = days.toLong
    micros += (days - dWhole) * 86400e6
    Some((mWhole.toInt, dWhole.toInt, math.round(micros)))
  }

  /** `make_interval(...)` call text for a parsed MonthDayNano. */
  private def mdnSql(mdn: (Int, Int, Long)): String = {
    val secs = java.math.BigDecimal.valueOf(mdn._3).movePointLeft(6).toPlainString
    s"make_interval(0, ${mdn._1}, 0, ${mdn._2}, 0, 0, $secs)"
  }

  private def intervalMs(text: String): Long = {
    val compact = "(?i)^(\\d+)\\s*(ms|s|min|m|h|d)$".r
    val verbose = "(?i)^(\\d+)\\s+(millisecond|second|minute|hour|day)s?$".r
    text.trim match {
      case compact(n, u) => n.toLong * (u.toLowerCase(Locale.ROOT) match {
        case "ms" => 1L; case "s" => 1000L
        case "m" | "min" => 60000L // humantime accepts both spellings
        case "h" => 3600000L; case "d" => 86400000L })
      case verbose(n, u) => n.toLong * (u.toLowerCase(Locale.ROOT) match {
        case "millisecond" => 1L; case "second" => 1000L; case "minute" => 60000L
        case "hour" => 3600000L; case "day" => 86400000L })
      case other => throw new IllegalArgumentException(s"bad interval: $other")
    }
  }

  /** Rewrites for passthrough SQL: `@@` sugar, `expr::type` casts,
    * DataFusion `date_bin`, null-keeping `array_agg`, and the `numbers`
    * generator where LIMIT sets the row count. */
  /** Postgres `SELECT DISTINCT ON (keys) list FROM ... ORDER BY ord`
    * (inherited by the reference via DataFusion; aggregate/distinct.sql,
    * window/latest_per_series.sql) → row_number-over-window rewrite:
    * keep the first row per key group according to the ORDER BY, result
    * ordered by the same clause. Handles the form standalone or inside
    * one subquery level (the span ends at the enclosing close-paren). */
  private[graft] def rewriteDistinctOn(s0: String): String = {
    val m = "(?is)\\bSELECT\\s+DISTINCT\\s+ON\\s*\\(".r
      .findFirstMatchIn(s0).getOrElse(return s0)
    // keys: up to the matching close paren
    var i = m.end; var depth = 1
    while (i < s0.length && depth > 0) {
      s0.charAt(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
      i += 1
    }
    if (depth > 0) return s0
    val keys = s0.substring(m.end, i - 1).trim
    // span of this SELECT: to the close paren of the enclosing subquery
    // (depth -1) or end of statement
    var j = i; depth = 0
    while (j < s0.length && depth >= 0) {
      s0.charAt(j) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
      if (depth >= 0) j += 1
    }
    val body = s0.substring(i, j)
    // top-level clause offsets within the body
    def topLevel(rx: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] =
      rx.findAllMatchIn(body).find { mm =>
        val pre = body.substring(0, mm.start)
        pre.count(_ == '(') == pre.count(_ == ')')
      }
    val fromM = topLevel("(?is)\\bFROM\\b".r).getOrElse(return s0)
    val ordM = topLevel("(?is)\\bORDER\\s+BY\\b".r).getOrElse(return s0)
    val limM = topLevel("(?is)\\bLIMIT\\b".r)
    val selectList = body.substring(0, fromM.start).trim
    val fromPart = body.substring(fromM.end, ordM.start).trim
    val ordEnd = limM.map(_.start).getOrElse(body.length)
    val ordList = body.substring(ordM.end, ordEnd).trim.stripSuffix(";").trim
    val tail = limM.map(l => " " + body.substring(l.start).trim.stripSuffix(";")).getOrElse("")
    val outerList = if (selectList == "*") "* EXCEPT (__don_rn)" else selectList
    val rewritten =
      s"SELECT $outerList FROM (SELECT *, row_number() OVER " +
        s"(PARTITION BY $keys ORDER BY $ordList) AS __don_rn FROM $fromPart) " +
        s"WHERE __don_rn = 1 ORDER BY $ordList$tail"
    rewriteDistinctOn(s0.substring(0, m.start) + rewritten + s0.substring(j))
  }

  private[graft] def dialect(s: String): String = {
    var r = rewriteAtAt(rewriteDistinctOn(s))
    // ANSI double-quoted identifiers → backticks ("hOsT" = ..., ORDER BY
    // "id"; "" escapes a quote). Aware of single-quoted strings, and
    // VALUES tuples keep double quotes: the corpus' MySQL-ish inserts
    // use them as string literals there ((1, "a")).
    val valuesAt = "(?i)\\bVALUES\\b".r.findFirstMatchIn(r).map(_.start)
      .getOrElse(r.length)
    r = backtickIdents(r.substring(0, valuesAt)) + r.substring(valuesAt)
    // date_bin(interval, ts[, origin]) → epoch-ms floor arithmetic
    // (constant interval/origin resolved at rewrite time)
    r = DateBinRx.replaceAllIn(r, m => {
      val ms = intervalMs(Option(m.group(1)).getOrElse(m.group(2)))
      val ts = m.group(3)
      val origin = Option(m.group(4)).map { o =>
        java.time.Instant.parse(
          (if (o.endsWith("Z")) o else o.replace(" ", "T") + "Z")).toEpochMilli
      }.getOrElse(0L)
      scala.util.matching.Regex.quoteReplacement(
        s"TIMESTAMP_MILLIS($origin + CAST(FLOOR((UNIX_MILLIS(CAST($ts AS TIMESTAMP)) - $origin) / $ms) * $ms AS BIGINT))")
    })
    // geo_path / json_encode_path are Column-level aggregates (VectorAggs);
    // expand their SQL spellings macro-style. Reference arg order (lat,lng,ts).
    val GeoPathArgs = "([^(),]+)\\s*,\\s*([^(),]+)\\s*,\\s*([^(),]+)"
    def geoPathSql(lat: String, lng: String, ts: String): String =
      s"struct(transform(array_sort(collect_list(struct(($ts) AS ts, CAST(($lat) AS DOUBLE) AS lat, CAST(($lng) AS DOUBLE) AS lng))), p -> p.lat) AS lat, " +
        s"transform(array_sort(collect_list(struct(($ts) AS ts, CAST(($lat) AS DOUBLE) AS lat, CAST(($lng) AS DOUBLE) AS lng))), p -> p.lng) AS lng)"
    r = s"(?i)\\bUNNEST\\(\\s*geo_path\\(\\s*$GeoPathArgs\\s*\\)\\s*\\)".r.replaceAllIn(r, m =>
      scala.util.matching.Regex.quoteReplacement {
        val e = geoPathSql(m.group(1), m.group(2), m.group(3))
        s"($e).lat AS lat, ($e).lng AS lng"
      })
    r = s"(?i)\\bgeo_path\\(\\s*$GeoPathArgs\\s*\\)".r.replaceAllIn(r, m =>
      scala.util.matching.Regex.quoteReplacement(geoPathSql(m.group(1), m.group(2), m.group(3))))
    r = s"(?i)\\bjson_encode_path\\(\\s*$GeoPathArgs\\s*\\)".r.replaceAllIn(r, m =>
      scala.util.matching.Regex.quoteReplacement {
        val (lat, lng, ts) = (m.group(1), m.group(2), m.group(3))
        s"concat('[', concat_ws(',', transform(array_sort(collect_list(struct(($ts) AS ts, CAST(($lat) AS DOUBLE) AS lat, CAST(($lng) AS DOUBLE) AS lng))), " +
          s"p -> concat('[', cast(p.lng AS STRING), ',', cast(p.lat AS STRING), ']'))), ']')"
      })
    // MySQL-compat FIELD(x, a, b, ...) → 1-based position, 0 when
    // absent/NULL; case-sensitive (function/string/mysql_compat.result)
    r = "(?i)\\bFIELD\\s*\\(((?:[^()']|'[^']*'|\\([^()]*\\))*)\\)".r
      .replaceAllIn(r, m => {
        val args = splitTop(m.group(1))
        if (args.length < 2) scala.util.matching.Regex.quoteReplacement(m.matched)
        else scala.util.matching.Regex.quoteReplacement(
          s"coalesce(array_position(array(${args.tail.mkString(", ")}), ${args.head}), 0)")
      })
    // MySQL INSERT(str, pos, len, newstr) — the keyword can't be a
    // function name in Spark's parser; route to the mysql_insert UDF
    r = rewriteOutsideQuotes(r)(_.replaceAll("(?i)\\bINSERT\\s*\\(", "mysql_insert("))
    // FROM-less scalar unnest: DataFusion zips multiple generators
    // positionally with null padding (select/unnest.result:
    // `unnest([1,2,3]) + unnest([4,5])` → 5, 7, null)
    if ("(?is)^\\s*SELECT\\b.*".r.matches(r) &&
        "(?i)\\bFROM\\b".r.findFirstIn(r).isEmpty &&
        "(?i)\\bunnest\\s*\\(".r.findFirstIn(r).isDefined)
      r = rewriteScalarUnnest(r)
    // remaining UNNEST over arrays → explode
    r = rewriteOutsideQuotes(r)(_.replaceAll("(?i)\\bUNNEST\\s*\\(", "explode("))
    // MySQL numeric IF condition → boolean (starrocks_compatibility.sql;
    // function/expression.sql covers negative and decimal literals)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bIF\\s*\\(\\s*([+-]?\\d+(?:\\.\\d+)?)\\s*,", "IF($1 <> 0,"))
    // MySQL MID(s, pos, len) ≡ SUBSTRING (function/function_alias.sql)
    r = rewriteOutsideQuotes(r)(_.replaceAll("(?i)\\bMID\\s*\\(", "substring("))
    // MySQL ELT with a literal out-of-range index is NULL, not an error
    // (function/string/mysql_compat.sql's ELT(0,...)/ELT(4,...))
    r = "(?i)\\bELT\\s*\\(\\s*(-?\\d+)\\s*,((?:[^()']|'[^']*')*)\\)".r
      .replaceAllIn(r, m => {
        val n = m.group(1).toInt
        val argc = splitTop(m.group(2)).length
        if (n < 1 || n > argc) "CAST(NULL AS STRING)"
        else scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    // integral arithmetic WRAPS in DataFusion (two's complement) where
    // ANSI Spark raises (overflow/integer_overflow.sql: 100::TINYINT +
    // 50::TINYINT = -106) — fold literal op literal statically
    locally {
      // a parenthesized operand consumes its parens ATOMICALLY — an
      // optional unpaired `\(?` would swallow surrounding text
      val num = "(?:\\(\\s*(-?\\d+)\\s*\\)|(-?\\d+))"
      r = rewriteOutsideQuotes(r)(seg =>
        ("(?i)" + num + "\\s*::\\s*(TINYINT|SMALLINT|INTEGER|INT|BIGINT)" +
          "\\s*([+\\-*])\\s*" + num + "\\s*::\\s*" +
          "(TINYINT|SMALLINT|INTEGER|INT|BIGINT)").r.replaceAllIn(seg, m => {
        def bits(t: String): Int = t.toUpperCase(Locale.ROOT) match {
          case "TINYINT" => 8; case "SMALLINT" => 16
          case "INT" | "INTEGER" => 32; case "BIGINT" => 64
        }
        val w = math.max(bits(m.group(3)), bits(m.group(7)))
        val a = BigInt(Option(m.group(1)).getOrElse(m.group(2)))
        val b = BigInt(Option(m.group(5)).getOrElse(m.group(6)))
        val raw = m.group(4) match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
        }
        val span = BigInt(1) << w
        val half = BigInt(1) << (w - 1)
        val wrapped = ((raw + half).mod(span)) - half
        val tok = if (w == 64) "BIGINT" else if (w == 32) "INT"
          else if (w == 16) "SMALLINT" else "TINYINT"
        scala.util.matching.Regex.quoteReplacement(s"CAST($wrapped AS $tok)")
      }))
    }
    // DataFusion coerces a numeric/string UNION of bare literals to
    // STRING (setops' `SELECT 1 UNION ALL SELECT 'asdf'`); ANSI Spark
    // rejects the implicit cast — stringify the numeric side
    r = r.replaceAll(
      "(?is)^\\s*SELECT\\s+(\\d+)\\s+UNION\\s+(ALL\\s+)?SELECT\\s+(?=')",
      "SELECT CAST($1 AS STRING) UNION $2SELECT ")
    // zero-arg count() ≡ count(*) (DataFusion; types/json/jsonbench.sql)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bcount\\s*\\(\\s*\\)", "count(*)"))
    // current_time(): Spark has no TIME type — render the reference's
    // HH:mm:ss.micro shape under the original header
    // (function/time.sql redacts the value, not the name)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bcurrent_time\\s*\\(\\s*\\)(?!\\s*[A-Za-z_(])",
      "substring(__ts_render(now()), 12) AS `current_time()`"))
    // DataFusion's integer-epoch constructors → Spark's (jsonbench.sql)
    r = rewriteOutsideQuotes(r) { s0 =>
      s0.replaceAll("(?i)\\bto_timestamp_micros\\s*\\(", "timestamp_micros(")
        .replaceAll("(?i)\\bto_timestamp_millis\\s*\\(", "timestamp_millis(")
        .replaceAll("(?i)\\bto_timestamp_seconds\\s*\\(", "timestamp_seconds(")
    }
    // TIMESTAMPTZ literal keyword (types/timestamp/timestamp_tz.sql) —
    // the session clock is UTC, matching the reference's rendering
    r = "(?i)\\btimestamptz\\s+'".r.replaceAllIn(r, _ => "TIMESTAMP '")
    // vector aggregates accept '[..]' strings or array<float>
    // (function/vector/vector.sql) — parse first, then aggregate
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bvec_(sum|avg|product)\\s*\\(([^()]*)\\)", "__vec_$1_agg(parse_vec($2))"))
    // count_hash(cols) → distinct-count of a 64-bit hash (VectorAggs
    // .countHash; aggrs/count_hash.rs) — macro-expanded so the SQL
    // surface works without a registered UDAF
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bcount_hash\\s*\\(([^()]*)\\)", "count(DISTINCT xxhash64($1))"))
    // DataFusion coerces an integer literal compared against a TIME
    // INDEX column to the column's epoch unit (expr/atat.sql:
    // `WHERE id <= 6` on a TIMESTAMP(3) index means 6 ms).
    // Only tables actually referenced in a FROM/JOIN clause participate
    // — a name-substring coincidence (table `log` inside the word
    // `logs`) must not pick the wrong table's epoch unit — and a
    // table-qualified occurrence (`t2.ts`) is rewritten only with t2's
    // own unit, never another FROM table's.
    val tiRefs = fromClauseTables(r)
    for (t <- catalog.tables if tiRefs.contains(t)) {
      val ti = catalog.spec(t).timeIndex
      val isTs = scala.util.Try(spark.table(t).schema(ti).dataType).toOption
        .exists(d => d == TimestampType || d == TimestampNTZType)
      if (isTs) {
        val us = tsLiteralUs.getOrElse(t, 1000L)
        val conv = (n: String) =>
          if (us > 0) s"TIMESTAMP_MICROS($n * $us)"
          else s"TIMESTAMP_MICROS($n div 1000)"
        // optional qualifier: skip the occurrence when it names ANOTHER
        // catalog table (aliases stay eligible — they're unresolvable
        // here, and the bare-column first-wins behavior is unchanged)
        val q = "(?:([A-Za-z_][A-Za-z0-9_]*)\\.)?"
        def qualOk(qual: String): Boolean =
          qual == null || qual == t || !catalog.tables.contains(qual)
        def emitQ(qual: String): String =
          if (qual == null) "" else qual + "."
        val rx = (q + "(`" + java.util.regex.Pattern.quote(ti) + "`|\\b" +
          java.util.regex.Pattern.quote(ti) + "\\b)\\s*(<=|>=|<|>|=)\\s*(\\d+)(?![\\d.])").r
        r = rewriteOutsideQuotes(r)(rx.replaceAllIn(_, m =>
          scala.util.matching.Regex.quoteReplacement(
            if (!qualOk(m.group(1))) m.matched
            else s"${emitQ(m.group(1))}${m.group(2)} ${m.group(3)} ${conv(m.group(4))}")))
        val betweenRx = ("(?i)" + q + "(`" + java.util.regex.Pattern.quote(ti) + "`|\\b" +
          java.util.regex.Pattern.quote(ti) + "\\b)\\s+BETWEEN\\s+(\\d+)\\s+AND\\s+(\\d+)").r
        r = rewriteOutsideQuotes(r)(betweenRx.replaceAllIn(_, m =>
          scala.util.matching.Regex.quoteReplacement(
            if (!qualOk(m.group(1))) m.matched
            else s"${emitQ(m.group(1))}${m.group(2)} BETWEEN ${conv(m.group(3))} AND ${conv(m.group(4))}")))
      }
    }
    // --- TimestampNanosecond fidelity (gated: only tables that hold
    // sub-µs data — types/timestamp/{ts_precision_comparison,
    // timestamp_types,timestamp_precision,timestamp_precision_display}).
    // µs-storage column + hidden __nsr_ remainder; reads go through the
    // __nsq_ view that exposes the remainder.
    {
      val nsTabs = fromClauseTables(r).filter(t =>
        nsRemainderTables.contains(t) && catalog.tables.contains(t))
      for (t <- nsTabs) {
        val nsCols = colMeta.getOrElse(t, Vector.empty)
          .filter(_.gtype == "TimestampNanosecond").map(_.name)
        // comparisons vs datetime string literals: lexicographic
        // (µs, remainder) pair compare — `ts = '….000000195'` must hit
        // only the row with remainder 195
        for (c <- nsCols) {
          val qc = java.util.regex.Pattern.quote(c)
          val cmpRx = ("(?i)(?<![\\w.`])(" + qc + ")\\s*(<=|>=|<|>|=)\\s*" +
            "'(\\d{4}-\\d\\d-\\d\\d[ T]\\d\\d:\\d\\d:\\d\\d(?:\\.\\d+)?)'").r
          r = cmpRx.replaceAllIn(r, m => {
            val lit0 = m.group(3)
            val dot = lit0.indexOf('.')
            val (whole, frac) =
              if (dot < 0) (lit0, "") else (lit0.take(dot), lit0.drop(dot + 1))
            val frac9 = frac.padTo(9, '0').take(9)
            val baseUs = whole + "." + frac9.take(6)
            val rem = frac9.substring(6).toInt
            val op = m.group(2)
            val tcol = s"`$c`"
            val tlit = s"TIMESTAMP '$baseUs'"
            val remCol = s"coalesce(`__nsr_$c`, 0)"
            scala.util.matching.Regex.quoteReplacement(op match {
              case "=" => s"($tcol = $tlit AND $remCol = $rem)"
              case "<" => s"($tcol < $tlit OR ($tcol = $tlit AND $remCol < $rem))"
              case "<=" => s"($tcol < $tlit OR ($tcol = $tlit AND $remCol <= $rem))"
              case ">" => s"($tcol > $tlit OR ($tcol = $tlit AND $remCol > $rem))"
              case _ => s"($tcol > $tlit OR ($tcol = $tlit AND $remCol >= $rem))"
            })
          })
        }
        // SELECT * over a remainder table: expand to the declared list
        // so the hidden companion stays hidden and the ns column renders
        // at 9 digits
        val collist = colMeta.getOrElse(t, Vector.empty).map { cm =>
          if (cm.gtype == "TimestampNanosecond")
            s"__ns_render(`${cm.name}`, `__nsr_${cm.name}`) AS `${cm.name}`"
          else s"`${cm.name}`"
        }.mkString(", ")
        r = ("(?i)^(\\s*SELECT\\s+)\\*(\\s+FROM\\s+`?" +
          java.util.regex.Pattern.quote(t) + "`?)\\b").r
          .replaceFirstIn(r,
            "$1" + java.util.regex.Matcher.quoteReplacement(collist) + "$2")
        // bare ns-column references render through the remainder; skip
        // `::` casts (unit-cast rewrite handles those), EXTRACT(... FROM
        // c) and table positions (FROM-preceded), and already-backticked
        // occurrences emitted by the rewrites above
        for (c <- nsCols) {
          val qc = java.util.regex.Pattern.quote(c)
          val qt = java.util.regex.Pattern.quote(t)
          // optional table qualifier (timestamp_types.sql's self-join
          // `timestamp.nano = timestamp_two.nano`) — the qualified
          // remainder column rides the same alias
          r = ("(?i)(?<!\\bFROM\\s{0,20})(?<![\\w.`$])(?:(`?" + qt + "`?)\\.)?" + qc +
            "(?![\\w`$])(?!\\s*::)").r
            .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
              Option(m.group(1)).map(_.stripPrefix("`").stripSuffix("`")) match {
                case Some(q) => s"__ns_render(`$q`.`$c`, `$q`.`__nsr_$c`)"
                case None => s"__ns_render(`$c`, `__nsr_$c`)"
              }))
        }
        // reads resolve against the remainder-exposing view, ALIASED
        // back to the original name so table-qualified column refs keep
        // resolving (timestamp_types.sql's `timestamp.milli` self-join;
        // the alias is backticked — `timestamp` is a keyword). A
        // user-supplied alias right after the name wins instead.
        r = ("(?i)\\b(FROM|JOIN)\\s+`?" + java.util.regex.Pattern.quote(t) +
          "`?(?![\\w`])(\\s+(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*)?").r
          .replaceAllIn(r, m => {
            val stop = Set("WHERE", "GROUP", "ORDER", "LIMIT", "ON", "JOIN",
              "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "UNION", "HAVING",
              "USING", "VALUES", "SET", "INTERSECT", "EXCEPT", "OFFSET",
              "RANGE", "ALIGN")
            val userAlias = Option(m.group(2)).map(_.trim).filterNot(a =>
              stop.contains(a.stripPrefix("AS ").stripPrefix("as ")
                .trim.toUpperCase(Locale.ROOT)))
            scala.util.matching.Regex.quoteReplacement(userAlias match {
              case Some(a) => s"${m.group(1)} __nsq_$t $a"
              case None =>
                val kept = Option(m.group(2)).getOrElse("")
                s"${m.group(1)} __nsq_$t `$t`$kept"
            })
          })
      }
    }
    // JSON2 dot-path access: j.a.b → json_get(j, 'a.b'); an arithmetic
    // context adds DataFusion's Int64 hint (types/json/json2.result:
    // `select j.a.b + 1` renders integers, non-numeric leaves → null)
    {
      val j2cols: Seq[String] = fromClauseTables(r).toSeq
        .flatMap(t => colMeta.getOrElse(t, Vector.empty)
          .filter(_.gtype == "Json2").map(_.name)).distinct
      for (c <- j2cols) {
        val qc = java.util.regex.Pattern.quote(c)
        r = ("(?i)(?<![\\w.`'])" + qc +
          "\\.([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)*)").r
          .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
            s"json_get(`$c`, '${m.group(1)}')"))
      }
      if (j2cols.nonEmpty)
        r = r.replaceAll(
          "(?i)(json_get\\(`[A-Za-z_][A-Za-z0-9_]*`, '[^']*'\\))\\s*([+\\-*/])\\s*(\\d)",
          "try_cast($1 AS BIGINT) $2 $3")
    }
    // comparison literal finer than the µs storage: the column coerces
    // to the literal's precision, so no stored value lands strictly
    // between two µs ticks — fold the sub-µs remainder into the
    // operator (ts_precision_comparison.sql: ts >= '….000000195' on a
    // TIMESTAMP(3) column excludes the .000 row)
    {
      val tsCols: Set[String] = fromClauseTables(r).flatMap(t =>
        colMeta.getOrElse(t, Vector.empty)
          .filter(cm => cm.gtype.startsWith("Timestamp") &&
            cm.gtype != "TimestampNanosecond")
          .map(_.name)).toSet
      if (tsCols.nonEmpty) {
        val rx = ("(?i)(?<![\\w.`])([A-Za-z_][A-Za-z0-9_]*)\\s*(<=|>=|<|>|=)\\s*" +
          "'(\\d{4}-\\d\\d-\\d\\d[ T]\\d\\d:\\d\\d:\\d\\d)\\.(\\d{7,9})'").r
        r = rx.replaceAllIn(r, m => {
          val c = m.group(1)
          val frac9 = m.group(4).padTo(9, '0')
          if (!tsCols.contains(c) || !frac9.substring(6).exists(_ != '0'))
            m.matched
          else {
            val tlit = s"TIMESTAMP '${m.group(3)}.${frac9.take(6)}'"
            scala.util.matching.Regex.quoteReplacement(m.group(2) match {
              case ">" | ">=" => s"`$c` > $tlit"
              case "<" | "<=" => s"`$c` <= $tlit"
              case _ => s"(`$c` IS NOT NULL AND FALSE)"
            })
          }
        })
      }
    }
    // Spark's CAST grammar has no timestamp precision — strip it
    // (filter/cast_preimage.sql `CAST(ts AS TIMESTAMP(9))`)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\b(AS\\s+)TIMESTAMP\\s*\\(\\s*\\d+\\s*\\)", "$1TIMESTAMP"))
    // length-less VARCHAR/TEXT in CAST targets: Spark demands a length
    // parameter (order/order_variable_size_payload.sql `cast(i AS VARCHAR)`)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\b(AS\\s+)(?:VARCHAR|TEXT)\\s*(\\))", "$1STRING$2"))
    // PG accepts OFFSET before LIMIT; Spark's grammar wants LIMIT first
    // (subquery/offset.sql `ORDER BY c0 OFFSET 1 LIMIT 1`)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bOFFSET\\s+(\\d+)\\s+LIMIT\\s+(\\d+)", "LIMIT $2 OFFSET $1"))
    // arrow_cast(x, 'T') → CAST with the arrow type mapped; the operand
    // may itself be a call (jsonbench's arrow_cast(json_get(...),
    // 'Int64') after the json dot-path rewrite)
    r = ("(?i)\\barrow_cast\\s*\\(\\s*((?:[^()',]|'[^']*'|" +
      "\\((?:[^()']|'[^']*')*\\))+?)\\s*,\\s*'([^']+)'\\s*\\)").r
      .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
        s"CAST(${m.group(1)} AS ${castType(m.group(2)
          .replaceAll("\\(.*", "").toUpperCase(Locale.ROOT))})"))
    // single-arg CIDR forms take the auto-detect path (function/ip.sql)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\b(ipv[46]_to_cidr)\\s*\\(\\s*([^(),]+)\\s*\\)",
      "$1($2, CAST(NULL AS INT))"))
    // date_add/date_sub with INTERVAL or duration-string arguments
    // (function/date.sql): expand onto +/- make_interval so DATE inputs
    // stay DATE and timestamps stay timestamps
    val DateAddRx = ("(?i)\\b(date_add|date_sub)\\s*\\(\\s*" +
      "((?:[^(),']|'[^']*'|\\([^()]*\\))+?)\\s*,\\s*" +
      "(?:INTERVAL\\s+)?'([^']+)'\\s*\\)").r
    r = DateAddRx.replaceAllIn(r, m => {
      val spec = "(\\d+)\\s*(year|month|week|day|hour|minute|second)s?".r
      var (y, mo, w, d, h, mi, se) = (0L, 0L, 0L, 0L, 0L, 0L, 0L)
      spec.findAllMatchIn(m.group(3).toLowerCase(Locale.ROOT)).foreach { u =>
        val n = u.group(1).toLong
        u.group(2) match {
          case "year" => y += n; case "month" => mo += n; case "week" => w += n
          case "day" => d += n; case "hour" => h += n
          case "minute" => mi += n; case "second" => se += n
        }
      }
      val sign = if (m.group(1).equalsIgnoreCase("date_sub")) "-" else "+"
      scala.util.matching.Regex.quoteReplacement(
        s"(${m.group(2)} $sign make_interval($y, $mo, $w, $d, $h, $mi, $se))")
    })
    var prev: String = null
    while (prev != r) {
      prev = r
      // the `::` scan must not fire on text INSIDE a string literal
      // ('abc::def' in function/string/replace.sql is data, not a cast):
      // match against a same-length copy whose quoted content is blanked
      // (the '...' LHS alternative still matches through the quotes),
      // extract groups from the original
      val rr = r
      val masked = {
        val a = rr.toCharArray
        var in = false
        var k = 0
        while (k < a.length) {
          if (a(k) == '\'') in = !in else if (in) a(k) = '\u0001'
          k += 1
        }
        new String(a)
      }
      val out = new StringBuilder
      var last = 0
      for (m <- CastRx.findAllMatchIn(masked)) if (m.start >= last &&
        // an "operand" directly after `::` is really the TYPE slot of a
        // chained cast (100::DOUBLE::DECIMAL(38,35)::DOUBLE) — leave it
        // for the next fixpoint iteration, when its true operand is a
        // finished CAST(...) call
        { var k = m.start - 1
          while (k >= 0 && masked.charAt(k).isWhitespace) k -= 1
          k < 0 || masked.charAt(k) != ':' }) {
        val t = castType(rr.substring(m.start(2), m.end(2)))
        val operand = rr.substring(m.start(1), m.end(1))
        val typeTok = rr.substring(m.start(2), m.end(2))
        out.append(rr.substring(last, m.start))
        last = m.end
        out.append(
          // a JSON value casts through the type-aware helpers, never an
          // ANSI error. JSON2 columns cast LENIENTLY (json2_cast.sql:
          // "3.14"::BIGINT truncates, 42::BOOLEAN → true); plain
          // json_get is strict per JSON node type (json_get.sql:
          // 1.2::int8 → NULL, numbers never become booleans).
          if ("(?i)\\bjson_get\\s*\\(".r.findFirstIn(operand).isDefined &&
              Set("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
                "BOOLEAN").contains(t)) {
            val lenient = "(?i)json_get\\s*\\(\\s*`?([A-Za-z_][A-Za-z0-9_]*)`?".r
              .findFirstMatchIn(operand).exists(mm =>
                fromClauseTables(rr).exists(tb =>
                  colMeta.getOrElse(tb, Vector.empty).exists(cm =>
                    cm.name.equalsIgnoreCase(mm.group(1)) && cm.gtype == "Json2")))
            val raw = "(?i)\\bjson_get\\s*\\(".r
              .replaceAllIn(operand, "__json_get_raw(")
            t match {
              case "DOUBLE" => s"__json_cast_double($raw, $lenient)"
              case "FLOAT" => s"CAST(__json_cast_double($raw, $lenient) AS FLOAT)"
              case "BOOLEAN" => s"__json_cast_bool($raw, $lenient)"
              case it => s"try_cast(__json_cast_long($raw, $lenient) AS $it)"
            }
          }
          // integer literal → timestamp is epoch MILLIS in the reference
          else if (t == "TIMESTAMP" && operand.matches("-?\\d+"))
            s"TIMESTAMP_MILLIS($operand)"
          // unit-typed casts TRUNCATE to their storage unit; a BARE
          // ::TIMESTAMP is TimestampMillisecond in the reference's SQL
          // mapping (sql/src/statements.rs:262 — types/timestamp/
          // timestamp_types.result: nano::TIMESTAMP renders .889)
          else if ({
            val c = typeTok.trim.toUpperCase(Locale.ROOT)
            c == "TIMESTAMP_S" || c == "TIMESTAMP_SEC" || c == "TIMESTAMPSECOND"
          })
            s"date_trunc('second', CAST($operand AS TIMESTAMP))"
          else if (!operand.matches("-?\\d+") && {
            val c = typeTok.trim.toUpperCase(Locale.ROOT)
            c == "TIMESTAMP" || c == "TIMESTAMP_MS" || c == "TIMESTAMPMILLISECOND"
          })
            s"date_trunc('millisecond', CAST($operand AS TIMESTAMP))"
          // display of a sub-µs literal cast to TIMESTAMP(9) in a
          // literal-only statement renders the full ns text, zero-padded
          // to 9 digits (timestamp_precision.result: .12345678 →
          // .123456780); with a FROM clause the preimage rule below wins
          else if (t.startsWith("TIMESTAMP") &&
              typeTok.replaceAll("[^0-9]", "") == "9" &&
              !"(?i)\\bfrom\\b".r.findFirstIn(rr).isDefined && {
                val m = "'([^']*?)\\.(\\d{7,9})'".r.findFirstMatchIn(operand)
                m.isDefined
              }) {
            val m = "'([^']*?)\\.(\\d{7,9})'".r.findFirstMatchIn(operand).get
            val frac9 = m.group(2).padTo(9, '0')
            val frac =
              if (frac9.endsWith("000000")) frac9.take(3)
              else if (frac9.endsWith("000")) frac9.take(6)
              else frac9
            s"'${m.group(1).replace(' ', 'T')}.$frac'"
          }
          // sub-microsecond literal cast to TIMESTAMP(9): unrepresentable
          // at µs storage, so an equality against it matches NOTHING
          // (filter/cast_preimage's '…05.000000001'::TIMESTAMP(9) →
          // empty). Lower-precision casts TRUNCATE instead (below).
          else if (t.startsWith("TIMESTAMP") &&
              typeTok.replaceAll("[^0-9]", "") == "9" &&
              "'[^']*\\.\\d{6}(\\d*[1-9]\\d*)'".r.findFirstMatchIn(operand)
                .exists(g => g.group(1).exists(_ != '0')))
            "CAST(NULL AS TIMESTAMP)"
          // interval literal → MonthDayNano as a calendar interval
          // ('30s'::interval, '1 year 2 months'::interval,
          // 'P3Y...'::INTERVAL — types/interval/interval.result)
          else if (t.startsWith("INTERVAL") && operand.startsWith("'") &&
              parseIntervalMdn(operand.stripPrefix("'").stripSuffix("'")).isDefined)
            mdnSql(parseIntervalMdn(
              operand.stripPrefix("'").stripSuffix("'")).get)
          // float → string casts render Rust-style inf/-inf
          // (types/float/nan_cast.result: 'inf'::FLOAT::VARCHAR = inf)
          else if (t == "STRING" && {
            val up = operand.toUpperCase(Locale.ROOT)
            up.endsWith("AS FLOAT)") || up.endsWith("AS DOUBLE)") ||
              probeType(operand, rr).exists(d => d == FloatType || d == DoubleType)
          })
            s"replace(CAST($operand AS STRING), 'Infinity', 'inf')"
          // timestamp → string renders arrow-style (T separator,
          // fraction at the value's natural 3/6 digits —
          // types/timestamp/timestamp.result '…01.5'::VARCHAR =
          // 2008-01-01T00:00:01.500)
          else if (t == "STRING" && {
            val up = operand.toUpperCase(Locale.ROOT)
            up.startsWith("TIMESTAMP ") || up.endsWith("AS TIMESTAMP)") ||
              up.contains("DATE_TRUNC(") ||
              probeType(operand, rr).exists(d =>
                d == TimestampType || d == TimestampNTZType)
          })
            s"__ts_render(CAST($operand AS TIMESTAMP))"
          // ::TIME extracts the time-of-day, rendered at the value's
          // natural digits (types/timestamp/timestamp_types.result:
          // milli::TIME = 00:00:01.594; nano::TIME = .889268321 via the
          // sub-µs remainder)
          else if (typeTok.trim.equalsIgnoreCase("TIME")) {
            val op = operand.trim.stripPrefix("`").stripSuffix("`")
            val isNsCol = op.matches("[A-Za-z_][A-Za-z0-9_]*") && {
              import scala.jdk.CollectionConverters._
              nsRemainderTables.asScala.exists(t =>
                colMeta.getOrElse(t, Vector.empty).exists(cm =>
                  cm.name == op && cm.gtype == "TimestampNanosecond"))
            }
            if (isNsCol)
              s"substring(__ns_render(`$op`, `__nsr_$op`), 12)"
            else s"substring(__ts_render(CAST($operand AS TIMESTAMP)), 12)"
          }
          // TIMESTAMP(p) casts truncate to the precision
          // (timestamp_precision.result: '…123456789'::TIMESTAMP(0))
          else if (t == "TIMESTAMP" && {
            val compact = typeTok.toUpperCase(Locale.ROOT).replaceAll("\\s", "")
            compact.startsWith("TIMESTAMP(")
          }) {
            val p = typeTok.replaceAll("[^0-9]", "").toInt
            if (p == 0) s"date_trunc('second', CAST($operand AS TIMESTAMP))"
            else if (p == 3) s"date_trunc('millisecond', CAST($operand AS TIMESTAMP))"
            else s"CAST($operand AS TIMESTAMP)"
          }
          else s"CAST($operand AS $t)")
      }
      out.append(rr.substring(last))
      r = out.toString
    }
    // sub-second EXTRACT fields (PG semantics: value within the MINUTE —
    // types/timestamp/timestamp_precision.result pins 45123456 for
    // :45.123456); Spark has no subsecond extract fields
    r = ("(?i)\\bEXTRACT\\s*\\(\\s*(MICROSECONDS?|MILLISECONDS?|NANOSECONDS?)" +
      "\\s+FROM\\s+([^()]+?)\\s*\\)").r
      .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
        m.group(1).toUpperCase(Locale.ROOT).stripSuffix("S") match {
          case "MICROSECOND" =>
            s"(unix_micros(CAST(${m.group(2)} AS TIMESTAMP)) % 60000000)"
          case "MILLISECOND" =>
            s"(unix_millis(CAST(${m.group(2)} AS TIMESTAMP)) % 60000)"
          case _ =>
            s"(unix_micros(CAST(${m.group(2)} AS TIMESTAMP)) % 60000000 * 1000)"
        }))
    // whitespace-padded timestamp literals parse in the reference
    // (timestamp '    2017-07-23     13:10:11    ')
    r = "(?i)\\b(TIMESTAMP|DATE)\\s+'\\s*([0-9][^']*?)\\s*'".r
      .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
        s"${m.group(1)} '${m.group(2).replaceAll("\\s+", " ")}'"))
    // INTERVAL-literal comparisons. Both sides literal → fold statically
    // on the parsed MonthDayNano (interval.sql's '6 years' = '72
    // months'); one side literal → the single-unit SECOND/MONTH literal
    // spelling, whose DayTime/YearMonth type Spark CAN compare against a
    // timestamp difference (inequality_joins.sql's
    // `e2.ts - e1.ts <= INTERVAL '30 minutes'`)
    r = ("(?i)\\bINTERVAL\\s+'([^']+)'\\s*(=|!=|<>|<=|>=|<|>)\\s*" +
      "INTERVAL\\s+'([^']+)'").r.replaceAllIn(r, m =>
      (parseIntervalMdn(m.group(1)), parseIntervalMdn(m.group(3))) match {
        case (Some(a), Some(b)) =>
          // logical total ordering on (months, days, micros) normalized
          // to micros with the reference's 30-day month convention
          def us(x: (Int, Int, Long)): Long =
            x._1 * 30L * 86400000000L + x._2 * 86400000000L + x._3
          val c = java.lang.Long.compare(us(a), us(b))
          val res = m.group(2) match {
            case "=" => c == 0
            case "!=" | "<>" => c != 0
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          }
          String.valueOf(res)
        case _ => scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    locally {
      def singleUnit(text: String): Option[String] =
        parseIntervalMdn(text).map { case (months, days, micros) =>
          if (months != 0 && days == 0 && micros == 0L)
            s"INTERVAL '$months' MONTH"
          else {
            // mixed-unit literal: fold months into days with the same
            // 30-day convention the literal-vs-literal fold above uses,
            // so the months component is not silently dropped
            val secs = java.math.BigDecimal.valueOf(micros)
              .movePointLeft(6)
              .add(java.math.BigDecimal.valueOf(
                (months * 30L + days) * 86400L))
              .stripTrailingZeros.toPlainString
            s"INTERVAL '$secs' SECOND"
          }
        }
      val opThenIv = "(?i)(=|!=|<>|<=|>=|<|>)\\s*INTERVAL\\s+'([^']+)'".r
      r = opThenIv.replaceAllIn(r, m => singleUnit(m.group(2)) match {
        case Some(lit) => scala.util.matching.Regex.quoteReplacement(
          s"${m.group(1)} $lit")
        case None => scala.util.matching.Regex.quoteReplacement(m.matched)
      })
      val ivThenOp = "(?i)\\bINTERVAL\\s+'([^']+)'\\s*(=|!=|<>|<=|>=|<|>)".r
      r = ivThenOp.replaceAllIn(r, m => singleUnit(m.group(1)) match {
        case Some(lit) => scala.util.matching.Regex.quoteReplacement(
          s"$lit ${m.group(2)}")
        case None => scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    }
    // a window-frame bound must stay a LITERAL — the make_interval
    // rewrite below would turn `RANGE INTERVAL '5 minutes' PRECEDING`
    // (function/anomaly.sql) into a non-literal call Spark rejects.
    // Canonicalize to the single-unit SECOND/MONTH literal spelling,
    // which the compound rewrite's lookahead then leaves alone.
    r = "(?i)\\bINTERVAL\\s+'([^']+)'\\s+(PRECEDING|FOLLOWING)".r
      .replaceAllIn(r, m => parseIntervalMdn(m.group(1)) match {
        case Some((months, days, micros)) =>
          val lit =
            if (months != 0 && days == 0 && micros == 0L)
              s"INTERVAL '$months' MONTH"
            else {
              // 30-day month fold for mixed-unit frame bounds (see
              // singleUnit above)
              val secs = java.math.BigDecimal.valueOf(micros)
                .movePointLeft(6)
                .add(java.math.BigDecimal.valueOf(
                  (months * 30L + days) * 86400L))
                .stripTrailingZeros.toPlainString
              s"INTERVAL '$secs' SECOND"
            }
          scala.util.matching.Regex.quoteReplacement(s"$lit ${m.group(2)}")
        case None => scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    // INTERVAL '<compound text>' literals (INTERVAL '1 year 2 months',
    // INTERVAL '-1h5m', INTERVAL 'p3y...') — Spark's parser rejects the
    // compound/compact forms; the SQL-standard `INTERVAL 'n' UNIT`
    // spelling is left for Spark itself
    r = ("(?i)\\bINTERVAL\\s+'([^']+)'" +
      "(?!\\s*(?:YEAR|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND|MILLISECOND|MICROSECOND))").r
      .replaceAllIn(r, m => parseIntervalMdn(m.group(1)) match {
        case Some(mdn) => scala.util.matching.Regex.quoteReplacement(mdnSql(mdn))
        case None => scala.util.matching.Regex.quoteReplacement(m.matched)
      })
    // DATE ± interval stays a DATE in the reference (interval.result:
    // DATE '2000-10-30' + '1 days'::interval = 2000-10-31)
    r = ("(?i)(DATE\\s*'[^']*')\\s*([+\\-])\\s*(make_interval\\([^()]*\\))").r
      .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
        s"CAST(${m.group(1)} ${m.group(2)} ${m.group(3)} AS DATE)"))
    // DATE - DATE yields a day count in the reference (types/date/
    // test_date.result: i - DATE '1993-08-14' = 0), not an interval
    r = ("(?i)\\b([A-Za-z_][A-Za-z0-9_.]*)\\s*-\\s*(DATE\\s*'[^']*')").r
      .replaceAllIn(r, m =>
        if (probeType(m.group(1), r).contains(DateType))
          scala.util.matching.Regex.quoteReplacement(
            s"datediff(${m.group(1)}, ${m.group(2)})")
        else m.matched)
    // DataFusion's within-aggregate ORDER BY: first/last_value become
    // min_by/max_by on the sort key; order is irrelevant for the
    // commutative aggregates so it's just dropped there
    // (flow/flow_scheduled_late_overlap.sql, range/nest.sql)
    r = rewriteOutsideQuotes(r)(
      ("(?i)\\b(first_value|last_value|min|max|sum|count|avg)\\s*\\(" +
        "([^()]*?)\\s+ORDER\\s+BY\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*(ASC|DESC)?\\s*\\)").r
        .replaceAllIn(_, m => {
          val (fn, arg, ord) = (m.group(1).toLowerCase(Locale.ROOT),
            m.group(2).trim, m.group(3))
          val desc = Option(m.group(4)).exists(_.equalsIgnoreCase("DESC"))
          scala.util.matching.Regex.quoteReplacement(fn match {
            case "last_value" => s"${if (desc) "min_by" else "max_by"}($arg, $ord)"
            case "first_value" => s"${if (desc) "max_by" else "min_by"}($arg, $ord)"
            case _ => s"$fn($arg)"
          })
        }))
    // approx_percentile_cont family → the t-digest aggregate
    // (aggregates/TDigest.scala); the reference renders the estimate in
    // the ORDER BY column's type, so integral inputs truncate — decided
    // at runtime via typeof since the rewrite can't resolve column types
    def apcExpand(x: String, w: String, p: String, desc: Boolean): String = {
      val q = if (desc) s"(1.0 - ($p))" else s"($p)"
      val call = s"__approx_pct_td(CAST(($x) AS DOUBLE), CAST(($w) AS DOUBLE), $q)" +
        s" FILTER (WHERE ($x) IS NOT NULL AND ($w) IS NOT NULL)"
      // the reference renders the estimate in the ORDER BY column's own
      // type (integral input truncates to an integer). Resolve that type
      // STATICALLY via probeType so the result stays numeric — sorting /
      // comparing / arithmetic on it keeps numeric semantics. Only when
      // the probe can't resolve (exotic FROM shapes) fall back to the
      // runtime-typed CASE, whose branches must share the STRING type.
      probeType(x, r).map(isIntegral) match {
        case Some(true)  => s"CAST($call AS BIGINT)"
        case Some(false) => s"CAST($call AS DOUBLE)"
        case None =>
          s"CASE WHEN any_value(typeof($x)) RLIKE 'int' " +
            s"THEN CAST(CAST($call AS BIGINT) AS STRING) " +
            s"ELSE CAST($call AS STRING) END"
      }
    }
    def splitOrd(ord: String): (String, Boolean) =
      "(?is)^(.*?)\\s+(ASC|DESC)\\s*$".r.findFirstMatchIn(ord.trim) match {
        case Some(m) => (m.group(1).trim, m.group(2).equalsIgnoreCase("DESC"))
        case None => (ord.trim, false)
      }
    r = rewriteOutsideQuotes(r) { s0 =>
      var s = s0
      s = ("(?is)\\bapprox_percentile_cont_with_weight\\s*\\(\\s*([^(),]+?)\\s*,\\s*" +
        "([^(),]+?)\\s*\\)\\s*WITHIN\\s+GROUP\\s*\\(\\s*ORDER\\s+BY\\s+([^()]+?)\\s*\\)").r
        .replaceAllIn(s, m => {
          val (x, desc) = splitOrd(m.group(3))
          scala.util.matching.Regex.quoteReplacement(
            apcExpand(x, m.group(1), m.group(2), desc))
        })
      s = ("(?is)\\bapprox_percentile_cont\\s*\\(\\s*([^(),]+?)\\s*\\)\\s*" +
        "WITHIN\\s+GROUP\\s*\\(\\s*ORDER\\s+BY\\s+([^()]+?)\\s*\\)").r
        .replaceAllIn(s, m => {
          val (x, desc) = splitOrd(m.group(2))
          scala.util.matching.Regex.quoteReplacement(
            apcExpand(x, "1.0", m.group(1), desc))
        })
      s = "(?i)\\bapprox_median\\s*\\(\\s*([^()]+?)\\s*\\)".r
        .replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
          apcExpand(m.group(1), "1.0", "0.5", desc = false)))
      s
    }
    // anomaly scorers as window functions (scalars/anomaly/*.rs): the
    // current row scores against its frame's statistics. zscore/iqr
    // expand onto built-in windowed aggregates; MAD uses the
    // __mad_stats struct aggregate (aggregates/AnomalyWindowAggs).
    // Applied to the FULL statement, not quote-masked segments: the
    // OVER spec may carry an INTERVAL '...' frame literal
    // (function/anomaly.sql's RANGE INTERVAL '5 minutes' PRECEDING),
    // which would split a masked segment mid-spec.
    locally {
      val OvT = "(\\((?:[^()']|'[^']*')*\\)|[A-Za-z_][A-Za-z0-9_]*)" // (spec) | named window
      val inf = "CAST('Infinity' AS DOUBLE)"
      var s = r
      s = ("(?is)\\banomaly_score_zscore\\s*\\(\\s*([^()]+?)\\s*\\)\\s*OVER\\s*" + OvT).r
        .replaceAllIn(s, m => {
          val (v, ov) = (m.group(1), m.group(2))
          val n = s"count($v) OVER $ov"
          val mean = s"(avg($v) OVER $ov)"
          val sd = s"(stddev_pop($v) OVER $ov)"
          scala.util.matching.Regex.quoteReplacement(
            s"(CASE WHEN ($v) IS NULL THEN NULL WHEN $n < 2 THEN NULL " +
              s"WHEN $sd = 0.0 THEN (CASE WHEN ($v) = $mean THEN 0.0 ELSE $inf END) " +
              s"ELSE abs(($v) - $mean) / $sd END)")
        })
      s = ("(?is)\\banomaly_score_iqr\\s*\\(\\s*([^(),]+?)\\s*,\\s*([^(),]+?)\\s*\\)\\s*OVER\\s*" + OvT).r
        .replaceAllIn(s, m => {
          val (v, k, ov) = (m.group(1), m.group(2), m.group(3))
          val n = s"count($v) OVER $ov"
          val q1 = s"(percentile($v, 0.25) OVER $ov)"
          val q3 = s"(percentile($v, 0.75) OVER $ov)"
          val iqr = s"($q3 - $q1)"
          val lo = s"($q1 - ($k) * $iqr)"
          val hi = s"($q3 + ($k) * $iqr)"
          scala.util.matching.Regex.quoteReplacement(
            s"(CASE WHEN ($v) IS NULL THEN NULL WHEN $n < 3 THEN NULL " +
              s"WHEN ($v) >= $lo AND ($v) <= $hi THEN 0.0 " +
              s"WHEN $iqr = 0.0 THEN $inf " +
              s"WHEN ($v) < $lo THEN ($lo - ($v)) / $iqr " +
              s"ELSE (($v) - $hi) / $iqr END)")
        })
      s = ("(?is)\\banomaly_score_mad\\s*\\(\\s*([^()]+?)\\s*\\)\\s*OVER\\s*" + OvT).r
        .replaceAllIn(s, m => {
          val (v, ov) = (m.group(1), m.group(2))
          val n = s"count($v) OVER $ov"
          val st = s"(__mad_stats(CAST(($v) AS DOUBLE)) OVER $ov)"
          scala.util.matching.Regex.quoteReplacement(
            s"(CASE WHEN ($v) IS NULL THEN NULL WHEN $n < 3 THEN NULL " +
              s"WHEN $st.mad = 0.0 THEN " +
              s"(CASE WHEN ($v) = $st.med THEN 0.0 ELSE $inf END) " +
              s"ELSE abs(($v) - $st.med) / (1.4826 * $st.mad) END)")
        })
      r = s
    }
    // approx_distinct: bit-compatible DataFusion HLL sketch
    // (aggregates/ApproxDistinct.scala) — the pinned goldens include its
    // exact ±1 estimates, so this is the real estimator, not an exact
    // count. Runs on the FULL statement (not inside a quote-masked
    // segment) because the paren balancer must see past string-literal
    // arguments; the balancer itself skips over quotes.
    r = closeApproxDistinct(rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bapprox_distinct\\s*\\(", "__approx_distinct(__ahash64(")))
    // within-aggregate ORDER BY (aggregate/{array_agg,string_agg}.sql):
    // Spark's parser rejects the PG-style inline syntax.
    // string_agg/listagg map onto Spark 4's listagg WITHIN GROUP form
    // (DISTINCT supported there natively; nulls are skipped either way)
    r = ("(?i)\\b(?:string_agg|listagg)\\s*\\(\\s*(DISTINCT\\s+)?" +
      "((?:[^(),']|'(?:[^']|'')*'|\\([^()]*\\))+?)\\s*,\\s*('(?:[^']|'')*')" +
      "\\s+ORDER\\s+BY\\s+((?:[^(),']|'(?:[^']|'')*'|\\([^()]*\\))+?)\\s*\\)").r
      .replaceAllIn(r, m => scala.util.matching.Regex.quoteReplacement(
        s"string_agg(${Option(m.group(1)).getOrElse("")}${m.group(2)}, " +
          s"${m.group(3)}) WITHIN GROUP (ORDER BY ${m.group(4)})"))
    // array_agg(x ORDER BY k [DESC]) expands onto sorted-struct
    // collection; the __n field forces DataFusion's null placement
    // (ASC NULLS LAST; the DESC reverse yields NULLS FIRST)
    r = ("(?i)\\barray_agg\\s*\\(\\s*(DISTINCT\\s+)?" +
      "((?:[^(),']|'(?:[^']|'')*'|\\([^()]*\\))+?)\\s+ORDER\\s+BY\\s+" +
      "((?:[^(),']|'(?:[^']|'')*'|\\([^()]*\\))+?)(\\s+ASC|\\s+DESC)?\\s*\\)").r
      .replaceAllIn(r, m => {
        val (v, k) = (m.group(2).trim, m.group(3).trim)
        val desc = Option(m.group(4)).exists(_.trim.equalsIgnoreCase("DESC"))
        val base = s"collect_list(struct((($k) IS NULL) AS __n, ($k) AS __k, ($v) AS __v))"
        val dd = if (m.group(1) != null) s"array_distinct($base)" else base
        val ordered = if (desc) s"reverse(array_sort($dd))" else s"array_sort($dd)"
        scala.util.matching.Regex.quoteReplacement(
          s"nullif(transform($ordered, s -> s.__v), array())")
      })
    // array_agg keeps nulls and returns NULL on empty input (DataFusion);
    // the struct wrapper defeats collect_list's null-dropping
    r = r.replaceAll("(?i)\\bARRAY_AGG\\(\\s*([A-Za-z_][A-Za-z0-9_.]*)\\s*\\)",
      "nullif(transform(collect_list(struct($1 AS __v)), s -> s.__v), array())")
    r = r.replaceAll("(?i)FROM\\s+(?:public\\.)?numbers\\s+LIMIT\\s+(\\d+)",
      "FROM (SELECT CAST(id AS INT) AS number FROM range(0, $1))")
    r = r.replaceAll("(?i)FROM\\s+(?:public\\.)?numbers\\s+WHERE\\b",
      "FROM (SELECT CAST(id AS INT) AS number FROM range(0, 100)) WHERE")
    // system functions / session vars resolved at rewrite time
    // the reference parses TABLESAMPLE but does not sample yet — every
    // form returns the full table (sample/basic_sample.result pins
    // count(*) = full count under PERCENT/ROWS/SYSTEM/BERNOULLI)
    r = rewriteOutsideQuotes(r)(_.replaceAll(
      "(?i)\\bTABLESAMPLE\\s+(?:SYSTEM|BERNOULLI)?\\s*\\([^)]*\\)" +
        "(?:\\s*REPEATABLE\\s*\\([^)]*\\))?", " "))
    // MySQL aggregate aliases bind POPULATION variants in DataFusion
    // (function_alias.result: std -> stddev_pop, variance -> var_pop);
    // Spark's natives are the sample variants, so rewrite by name
    r = rewriteOutsideQuotes(r)(
      _.replaceAll("(?i)\\bstd\\s*\\(", "stddev_pop(")
        .replaceAll("(?i)\\bvariance\\s*\\(", "var_pop("))
    // PG regex-match operators (function/string/regex.sql: 'x' ~ '\d+');
    // never inside TQL bodies, whose label matchers use =~/!~
    if (!"(?i)\\bTQL\\s".r.findFirstIn(r).isDefined)
      r = rewriteOutsideQuotes(r)(
        _.replaceAll("\\s!~\\s", " NOT RLIKE ").replaceAll("\\s~\\s", " RLIKE "))
    // system functions with environment-specific output render the
    // reference's shapes (function/system.result pins the sqlness
    // REPLACE-able forms: semver-only version, multi-line build)
    // the pg-client probe's column is `version` without parens
    // (system/pg_catalog.result's collapsed header compare)
    if ("(?i)current_schemas\\s*\\(".r.findFirstIn(r).isDefined)
      r = r.replaceAll("(?i)\\bversion\\(\\)",
        "'PostgreSQL 16.3 GreptimeDB' AS `version`")
    r = rewriteOutsideQuotes(r)(
      _.replaceAll("(?i)\\bversion\\(\\)", "'0.14.0' AS `version()`")
        .replaceAll("(?i)\\bbuild\\(\\)",
          // real newlines: escapedStringLiterals keeps \n literal
          "'branch: main\ncommit: 0000000000000000000000000000000000000000\n" +
            "commit_short: 0000000\nclean: true\nversion: 0.14.0' AS `build()`")
        .replaceAll("(?i)\\bpg_backend_pid\\(\\)", "'1' AS `pg_backend_pid()`")
        .replaceAll("(?i)\\bconnection_id\\(\\)", "'1' AS `connection_id()`"))
    r = rewriteOutsideQuotes(r)(_.replaceAll("(?i)\\btimezone\\(\\)",
      s"'$sessionTz' AS `timezone()`")
      // the ANY(...) form must rewrite BEFORE the scalar current_schemas
      // folding consumes its argument (pg_catalog.result issue-7313 query)
      .replaceAll("(?i)=\\s*ANY\\s*\\(\\s*current_schemas\\(\\s*true\\s*\\)\\s*\\)",
        "IN ('public','information_schema','pg_catalog','greptime_private')")
      .replaceAll("(?i)\\bcurrent_schemas\\(\\s*true\\s*\\)",
        "'{public,information_schema,pg_catalog,greptime_private}' AS `current_schemas(Boolean(true))`")
      .replaceAll("(?i)\\bcurrent_schemas\\(\\s*false\\s*\\)",
        "'{public}' AS `current_schemas(Boolean(false))`")
      .replaceAll("(?i)\\bpg_my_temp_schema\\(\\)", "0"))
    // to_unixtime through Spark's session-tz-aware cast (zone-less
    // strings parse in the session zone — system/timezone.result);
    // numerics are already epoch seconds (ANSI forbids their cast).
    // NOT quote-masked: the argument is usually a quoted literal, which
    // the masked rewriter would hide from the pattern.
    r = "(?i)\\bto_unixtime\\s*\\(\\s*('[^']*'|[^()']*(?:\\([^()]*\\)[^()']*)*)\\s*\\)".r
      .replaceAllIn(r, m => {
        val a = m.group(1).trim
        scala.util.matching.Regex.quoteReplacement(
          if (a.matches("-?\\d+(\\.\\d+)?")) s"CAST($a AS BIGINT)"
          else s"unix_seconds(coalesce(try_cast(($a) AS TIMESTAMP), " +
            s"try_to_timestamp(trim(CAST(($a) AS STRING)), 'yyyy-MM-dd HH:mm:ssZ')))")
      })
    r = rewriteOutsideQuotes(r)(_.replaceAll("(?i)\\bdatabase\\(\\)",
      s"'${if (infoDb) "information_schema" else currentDb}'")
      .replaceAll("(?i)\\bcurrent_schema\\(\\)",
        s"'${if (infoDb) "information_schema" else currentDb}' AS `current_schema()`")
      .replaceAll("(?i)\\bcurrent_database\\(\\)",
        s"'${if (infoDb) "information_schema" else currentDb}' AS `current_database()`")
      .replaceAll("(?i)\\bsession_user\\b(?!\\s*\\()", "'greptime'")
      .replaceAll("(?i)\\bread_preference\\(\\)",
        s"'${sessionVars("read_preference").toUpperCase(Locale.ROOT)}'"))
    r = rewriteOutsideQuotes(r)(s =>
      "@@(?:session\\.)?([A-Za-z_][A-Za-z0-9_]*)".r.replaceAllIn(s, m => {
        val v = sessionVars.getOrElse(m.group(1).toLowerCase(Locale.ROOT), "0")
        // non-numeric variable values substitute as string literals
        // (common/mysql.result: @@tx_isolation -> 'REPEATABLE-READ')
        scala.util.matching.Regex.quoteReplacement(
          if (v.matches("-?\\d+(\\.\\d+)?")) v else s"'$v'")
      }))
    // current-schema qualification: `public.table` resolves to the bare
    // temp view when public is the active database (view/create.result)
    if (currentDb == "public")
      r = rewriteOutsideQuotes(r)(
        _.replaceAll("(?i)\\bpublic\\.(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)", "$1"))
    r = rewriteOutsideQuotes(r)(rewriteDbQualified)
    // the reference tolerates a trailing comma in the SELECT list
    // (flow/flow_blog.sql: `avg(...) as avg_speed, FROM ...`)
    r = r.replaceAll("(?is),\\s*(FROM)\\b", " $1")
    // ...and before a closing paren (geo.sql subselects)
    r = rewriteOutsideQuotes(r)(_.replaceAll(",\\s*\\)", ")"))
    // DataFusion array literals `[a, b]` → array(a, b); brackets preceded by
    // an identifier/closing token are subscripts and stay untouched
    r = rewriteBracketArrays(r)
    // MySQL-style single-quoted aliases: `country as 'country'`
    r = r.replaceAll("(?i)\\bAS\\s+'([^']+)'", "AS `$1`")
    // DataFusion TIMESTAMP literals are naive-UTC regardless of the
    // session time zone; bare strings follow the session tz
    // (query/type_conversion_traversal.result under +8:00)
    r = "(?i)\\bTIMESTAMP\\s*'([0-9][^']*)'".r.replaceAllIn(r, m => {
      val lit0 = m.group(1)
      // a date-only literal needs a midnight time part before the
      // offset can attach (timestamp_limits.sql's timestamp '1970-01-01')
      val lit = if (lit0.matches("\\d{4}-\\d{2}-\\d{2}")) lit0 + " 00:00:00"
        else lit0
      // an explicit zone may be +HH:MM, +HHMM, or hour-only +HH
      // (distributed/flow-tql/tsid_on_phy.sql: '2026-01-23 03:30:00+00')
      if (lit.matches(".*([+-]\\d{2}(:?\\d{2})?|Z)$")) m.matched
      else s"CAST('$lit+00:00' AS TIMESTAMP)"
    })
    r = rewriteUddsketch(r)
    r = rewriteMedian(r)
    r = rewriteIntDiv(r)
    r = rewriteDivDecimalLit(r)
    r = rewriteEpochExtract(r)
    r = rewriteTsLiteralCompare(r)
    defaultNullOrdering(r)
  }

  /** DataFusion compares TIMESTAMP columns against bare integer literals in
    * the column's native unit (`WHERE ts < 43` on a ms column means 43 ms);
    * Spark rejects the comparison. Wrap the literal when the identifier
    * probes to a timestamp (view/view.result). */
  private def rewriteTsLiteralCompare(s: String): String = {
    if (!s.toUpperCase(Locale.ROOT).contains("FROM")) return s
    val cmp = "([A-Za-z_][A-Za-z0-9_]*)\\s*(<=|>=|<>|!=|<|>|=)\\s*(\\d+)(?![0-9.'\"A-Za-z_])".r
    if (cmp.findFirstIn(s).isEmpty) return s
    val fromTable = "(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)".r
      .findFirstMatchIn(s).map(_.group(1))
    val usPerUnit = fromTable.flatMap(tsLiteralUs.get).getOrElse(1000L)
    // derived column list `FROM v1 t1(x)` (view/view.sql): the renamed
    // columns map positionally onto the relation's schema
    val aliasTypes: Map[String, DataType] =
      "(?is)\\bFROM\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*\\s*\\(([^()]*)\\)".r
        .findFirstMatchIn(s).map { m =>
          val cols = m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
          scala.util.Try(spark.table(m.group(1)).schema).toOption
            .map(sch => cols.zip(sch.fields.map(_.dataType)).toMap)
            .getOrElse(Map.empty[String, DataType])
        }.getOrElse(Map.empty)
    val cache = scala.collection.mutable.Map.empty[String, Boolean]
    // probe against the bare table (the statement's own WHERE may be the
    // unrewritten comparison that fails analysis)
    val probeStmt = fromTable.map(t => s"SELECT 1 FROM $t").getOrElse(return s)
    rewriteOutsideQuotes(s)(seg => cmp.replaceAllIn(seg, m => {
      val isTs = cache.getOrElseUpdate(m.group(1),
        aliasTypes.get(m.group(1))
          .map(d => d == TimestampType || d == TimestampNTZType)
          .getOrElse(probeType(m.group(1), probeStmt) match {
            case Some(_: org.apache.spark.sql.types.TimestampType) => true
            case Some(org.apache.spark.sql.types.TimestampNTZType) => true
            case _ => false
          }))
      if (isTs)
        s"${m.group(1)} ${m.group(2)} TIMESTAMP_MICROS(${m.group(3)} * $usPerUnit)"
      else m.matched
    }))
  }

  /** Identifiers appearing in FROM/JOIN position anywhere in the
    * statement (CTE bodies included), plus the last segment of
    * db-qualified names — the set of tables a clause-level rewrite may
    * legitimately bind to. */
  private[graft] def fromClauseTables(s: String): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    val ident = "(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)"
    val rx = ("(?is)\\b(?:FROM|JOIN)\\s+(" + ident +
      "(?:\\s*,\\s*" + ident + ")*)").r
    for (m <- rx.findAllMatchIn(s); part <- m.group(1).split(",")) {
      val id = part.trim.stripPrefix("`").stripSuffix("`")
      out += id
      val dot = id.lastIndexOf('.')
      if (dot >= 0) out += id.substring(dot + 1)
    }
    out.toSet
  }

  /** Schema-probe an expression against the statement's FROM clause;
    * None when the expression or clause doesn't resolve. */
  private def probeType(expr: String, stmt: String): Option[DataType] = {
    val fromRx = "(?is)\\bfrom\\b(.*?)(\\bgroup\\b|\\border\\b|\\bhaving\\b|\\blimit\\b|\\boffset\\b|$)".r
    val fromPart = fromRx.findFirstMatchIn(stmt).map(_.group(1).trim).getOrElse("")
    if (fromPart.isEmpty) return None
    try Some(spark.sql(s"SELECT $expr AS __probe FROM $fromPart LIMIT 0")
      .schema.fields.head.dataType)
    catch { case _: Throwable => None }
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  /** DataFusion/Postgres `/` on two integer operands is integer
    * division (COUNT(x)/COUNT(y) → 2, not 2.5); Spark's `/` always
    * yields double. Rewrite `int / int` to `div` for the operand shapes
    * worth probing: COUNT(...) calls, plain (qualified) columns, and
    * integer literals. */
  private val IntDivRx = {
    val count = "COUNT\\s*\\((?:[^()]|\\([^()]*\\))*\\)"
    val ident = "[A-Za-z_`\"][A-Za-z0-9_.`\"]*"
    val lit = "[0-9]+"
    // integer-only parenthesized arithmetic (no '/', no floats) and
    // left-associative multiplicative chains: `6 * 1 / 2` is (6*1)/2=3,
    // `10 / (2 * 3)` is 1 (parser/operator_precedence.result)
    val paren = "\\((?:[0-9\\s*+%-]|\\([0-9\\s*+%-]*\\))*\\)"
    val operand = s"(?:$count|$ident|$lit|$paren)"
    val chain = s"$operand(?:\\s*[*%]\\s*$operand)*"
    s"(?i)(?<![0-9.])($chain)\\s*/\\s*($operand)(?![0-9.])".r
  }
  /** integer-only parenthesized arithmetic group */
  private val IntParenRx = "\\((?:[0-9\\s*+%-]|\\([0-9\\s*+%-]*\\))*\\)".r
  /** Strip `/* ... */` comments with single-quote awareness: a comment
    * marker inside a string literal is data, and an apostrophe inside a
    * comment must not open a string. */
  private def stripBlockComments(s: String): String = {
    if (!s.contains("/*")) return s
    val out = new StringBuilder(s.length)
    var i = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { out.append(c); if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { out.append(c); inQ = true; i += 1 }
      else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val close = s.indexOf("*/", i + 2)
        out.append(' ')
        i = if (close < 0) s.length else close + 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `[a, b]` array literals → `array(a, b)`, single-quote aware; a `[`
    * directly after an identifier, `)`, `]` or backtick is a subscript and
    * is left alone (nested literals handled via a bracket stack). */
  private def rewriteBracketArrays(s: String): String = {
    if (!s.contains('[')) return s
    val out = new StringBuilder(s.length + 16)
    val stack = scala.collection.mutable.Stack[Boolean]() // true = converted
    var i = 0; var inQ = false
    var lastNonSpace = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { out.append(c); if (c == '\'') inQ = false }
      else c match {
        case '\'' => out.append(c); inQ = true
        case '[' =>
          val subscript = lastNonSpace.isLetterOrDigit || lastNonSpace == '_' ||
            lastNonSpace == ')' || lastNonSpace == ']' || lastNonSpace == '`'
          if (subscript) { out.append(c); stack.push(false) }
          else { out.append("array("); stack.push(true) }
        case ']' =>
          if (stack.nonEmpty && stack.pop()) out.append(')') else out.append(c)
        case _ => out.append(c)
      }
      if (!inQ && !c.isWhitespace) lastNonSpace = c
      i += 1
    }
    out.toString
  }

  /** Apply a textual rewrite only to the spans OUTSIDE single-quoted
    * literals ('' escapes stay intact), so dialect rewrites can never
    * corrupt string data like '2024/01/02' or 'public.x'. */
  private def rewriteOutsideQuotes(s: String)(rw: String => String): String = {
    if (!s.contains('\'')) return rw(s)
    val out = new StringBuilder(s.length)
    var i = 0; var segStart = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        out.append(rw(s.substring(segStart, i)))
        val qStart = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          val c = s.charAt(i); i += 1
          if (c == '\'') {
            if (i < s.length && s.charAt(i) == '\'') i += 1 // '' escape
            else done = true
          }
        }
        out.append(s.substring(qStart, i))
        segStart = i
      } else i += 1
    }
    out.append(rw(s.substring(segStart)))
    out.toString
  }

  private def rewriteIntDiv(s: String): String = {
    if (!s.contains("/")) return s
    rewriteOutsideQuotes(s)(seg => if (!seg.contains("/")) seg
    else IntDivRx.replaceAllIn(seg, m => {
      def integral(op: String): Boolean = {
        val t = op.trim
        if (t.matches("[0-9]+")) true
        else if (t.toUpperCase(Locale.ROOT).startsWith("COUNT")) true
        else if (IntParenRx.pattern.matcher(t).matches()) true
        else if (t.matches("[A-Za-z_`\"][A-Za-z0-9_.`\"]*") &&
          !t.matches("(?i)(SELECT|FROM|WHERE|AND|OR|NOT|NULL|TRUE|FALSE|AS|ON|BY|IN)"))
          probeType(t, s).exists(isIntegral)
        // a parens-free multiplicative chain is integral when every
        // component is
        else if (!t.contains('(') && t.matches(".*[*%].*"))
          t.split("[*%]").forall(integral)
        else false
      }
      val (l, rr) = (m.group(1), m.group(2))
      scala.util.matching.Regex.quoteReplacement(
        if (integral(l) && integral(rr)) s"($l div $rr)" else m.matched)
    }))
  }

  /** `date_part('epoch', <interval>)` → fractional seconds. DataFusion
    * extracts epoch from a timestamp difference (jsonbench.sql's
    * activity span); Spark has no epoch field — anchor the interval to
    * the epoch origin and read unix millis. */
  private def rewriteEpochExtract(s: String): String = {
    val rx = "(?i)\\bdate_part\\s*\\(\\s*'epoch'\\s*,".r
    rx.findFirstMatchIn(s) match {
      case None => s
      case Some(m) =>
        var d = 1; var i = m.end; var inStr = false
        while (i < s.length && d > 0) {
          val c = s.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => d += 1
            case ')' => d -= 1
            case _ =>
          }
          i += 1
        }
        if (d > 0) return s
        val arg = s.substring(m.end, i - 1)
        val repl =
          s"((unix_millis(TIMESTAMP '1970-01-01 00:00:00' + ($arg))) / 1000.0)"
        rewriteEpochExtract(s.substring(0, m.start) + repl + s.substring(i))
    }
  }

  /** A bare decimal literal is Float64 in DataFusion but DECIMAL(p,s) in
    * Spark; in a DIVISION that truncates to decimal scale 6 where the
    * reference keeps full f64 ((max-min)/30.0 in flow_basic's
    * find_approx_rate). Cast division-adjacent decimal literals to
    * DOUBLE; elsewhere the literal's own decimal rendering matches. */
  private def rewriteDivDecimalLit(s: String): String = {
    if (!s.contains("/")) return s
    rewriteOutsideQuotes(s) { seg =>
      var r = seg.replaceAll("/\\s*(\\d+\\.\\d+)(?![\\w.])",
        "/ CAST($1 AS DOUBLE)")
      r = r.replaceAll("(?<![\\w.])(\\d+\\.\\d+)\\s*/",
        "CAST($1 AS DOUBLE) /")
      r
    }
  }

  /** uddsketch_state/_merge take the sketch parameters as leading
    * literal args (reference `aggrs/approximate/uddsketch.rs:37-77`);
    * Spark UDAFs are monomorphic, so each (buckets, alpha) pair gets a
    * dedicated registration and the call is rewritten to it. */
  private val uddRegistered = scala.collection.mutable.Set.empty[String]
  private val UddRx =
    "(?i)\\buddsketch_(state|merge)\\s*\\(\\s*([0-9]+)\\s*,\\s*([0-9]*\\.?[0-9]+)\\s*,".r
  private def rewriteUddsketch(s: String): String =
    UddRx.replaceAllIn(s, m => {
      val kind = m.group(1).toLowerCase(Locale.ROOT)
      val buckets = m.group(2).toInt
      val alpha = m.group(3).toDouble
      val name = s"__udd_${kind}_${buckets}_${m.group(3).replace('.', 'p')}"
      if (!uddRegistered(name)) {
        import org.apache.spark.sql.{functions => F, Encoders}
        if (kind == "state")
          spark.udf.register(name, F.udaf(graft.aggregates.UddSketch.stateAgg(buckets, alpha), Encoders.DOUBLE))
        else
          spark.udf.register(name, F.udaf(graft.aggregates.UddSketch.mergeAgg(buckets, alpha), Encoders.STRING))
        uddRegistered += name
      }
      scala.util.matching.Regex.quoteReplacement(name + "(")
    })

  /** DataFusion computes integer median in the native integer type:
    * for an even count the two middle values average with i64 division
    * (4,5 → 4). Probe the argument's type against the FROM clause and
    * rewrite to integer arithmetic when it is integral. */
  private def rewriteMedian(s: String): String = {
    if (!s.toLowerCase(Locale.ROOT).contains("median(")) return s
    val lower = s.toLowerCase(Locale.ROOT)
    val fromRx = "(?is)\\bfrom\\b(.*?)(\\bgroup\\b|\\border\\b|\\bhaving\\b|\\blimit\\b|\\boffset\\b|$)".r
    val fromPart = fromRx.findFirstMatchIn(s).map(_.group(1).trim).getOrElse("")
    if (fromPart.isEmpty) return s
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val at = lower.indexOf("median(", i)
      if (at < 0 || (at > 0 && Character.isLetterOrDigit(lower.charAt(at - 1)))) {
        if (at < 0) { out.append(s.substring(i)); i = s.length }
        else { out.append(s.substring(i, at + 7)); i = at + 7 }
      } else {
        out.append(s.substring(i, at))
        // balanced-paren argument
        var j = at + 7; var depth = 1
        while (j < s.length && depth > 0) {
          val c = s.charAt(j)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          if (depth > 0) j += 1
        }
        val arg = s.substring(at + 7, j)
        val intType: Option[String] =
          try {
            spark.sql(s"SELECT $arg AS __probe FROM $fromPart LIMIT 0")
              .schema.fields.head.dataType match {
              case org.apache.spark.sql.types.LongType => Some("BIGINT")
              case org.apache.spark.sql.types.IntegerType => Some("INT")
              case org.apache.spark.sql.types.ShortType => Some("SMALLINT")
              case org.apache.spark.sql.types.ByteType => Some("TINYINT")
              case _ => None
            }
          } catch { case _: Throwable => None }
        intType match {
          case Some(t) => out.append(
            s"CAST((CAST(round(percentile($arg, 0.5D) * 2, 0) AS BIGINT) div 2) AS $t)")
          case None => out.append(s"median($arg)")
        }
        i = j + 1
      }
    }
    out.toString
  }

  /** DataFusion/Postgres default null ordering is NULLS LAST for ASC and
    * NULLS FIRST for DESC; Spark defaults the opposite way. Make the
    * ordering explicit on every ORDER BY item that doesn't spell one. */
  private[graft] def defaultNullOrdering(s: String): String = {
    val up = s.toUpperCase(Locale.ROOT)
    val terminators = Seq("LIMIT", "OFFSET", "FETCH", "ROWS", "RANGE",
      "GROUPS", "WINDOW", "UNION", "INTERSECT", "EXCEPT")
    // '_' counts as an identifier char: `time_window` must not read as
    // the WINDOW keyword (flow_incremental_aggr's sink column)
    def identChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def keywordAt(pos: Int, kw: String): Boolean =
      up.startsWith(kw, pos) &&
        (pos + kw.length == up.length || !identChar(up.charAt(pos + kw.length))) &&
        (pos == 0 || !identChar(up.charAt(pos - 1)))
    val obRx = "(?i)\\bORDER\\s+BY\\b".r
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      obRx.findFirstMatchIn(s.substring(i)) match {
        case None => out.append(s.substring(i)); i = s.length
        case Some(m) =>
          // skip matches inside string literals (odd quote count before)
          val start = i + m.start
          if (s.substring(0, start).count(_ == '\'') % 2 == 1) {
            out.append(s.substring(i, i + m.end)); i = i + m.end
          } else {
            out.append(s.substring(i, i + m.end))
            var j = i + m.end
            val items = Vector.newBuilder[String]
            val item = new StringBuilder
            var depth = 0; var inQuote = false; var stop = false
            while (j < s.length && !stop) {
              val c = s.charAt(j)
              if (inQuote) { item.append(c); if (c == '\'') inQuote = false; j += 1 }
              else if (c == '\'') { item.append(c); inQuote = true; j += 1 }
              else if (c == '(') { depth += 1; item.append(c); j += 1 }
              else if (c == ')') {
                if (depth == 0) stop = true else { depth -= 1; item.append(c); j += 1 }
              }
              else if (c == ',' && depth == 0) { items += item.result(); item.clear(); j += 1; item.append(' ') }
              else if (c == ';' && depth == 0) stop = true
              else if (depth == 0 && terminators.exists(keywordAt(j, _))) stop = true
              else { item.append(c); j += 1 }
            }
            items += item.result()
            val fixed = items.result().map { it =>
              val t = it.replaceAll("\\s+$", "")
              val pad = it.substring(t.length)
              if (t.trim.isEmpty) it
              else if (t.matches("(?is).*\\bNULLS\\s+(FIRST|LAST)$")) it
              else if (t.matches("(?is).*\\bDESC$")) t + " NULLS FIRST" + pad
              else t + " NULLS LAST" + pad
            }
            out.append(fixed.mkString(","))
            i = j
          }
      }
    }
    out.toString
  }

  // ---- CREATE TABLE ---------------------------------------------------

  /** Internal ingestion-sequence column: stamped on INSERT, used by the
    * read view to order duplicate (pk, ts) writes, hidden from SQL. */
  private val SeqCol = "__seq"

  private val CreateTableHeadRx =
    ("(?is)CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "((?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)" +
      "(?:\\.(?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*))?)\\s*\\(").r

  /** Schema-qualified names ("S"."T") live in an isolated namespace: the
    * composite key keeps them unreachable from bare-name lookups
    * (tql/case_sensitive.result: bare MemTotal must NOT resolve to
    * AnotherSchema.MemTotal). */
  private def normTable(raw0: String): String = {
    val raw = raw0.trim
    val qual = ("^(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)" +
      "\\.(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)$").r
    raw match {
      case qual(a, b) => normIdent(a) + "__schema__" + normIdent(b)
      case _ => normIdent(raw)
    }
  }

  /** Declared column metadata, in declared order — drives DESC TABLE,
    * INSERT defaults and FIRST/AFTER column placement. */
  private case class ColMeta(name: String, gtype: String, nullable: Boolean,
      default: Option[String],
      sqlType: Option[String] = None,    // declared token when it differs
                                         // from the canonical rendering
                                         // (VARBINARY vs BINARY)
      indexDecl: Option[String] = None,  // FULLTEXT/SKIPPING/INVERTED
                                         // INDEX clause for SHOW CREATE
      comment: Option[String] = None)    // column COMMENT 'text'

  /** Column index modifier → SHOW CREATE rendering with the reference's
    * default parameters merged in (create/create_with_{fulltext,
    * skipping_index}.result). */
  private def indexDeclOf(item: String): Option[String] = {
    def kindOpts(kind: String): Option[String] =
      s"(?is)\\b$kind\\s+INDEX(\\s+WITH\\s*\\(([^)]*)\\))?".r
        .findFirstMatchIn(item).map(m => Option(m.group(2)).getOrElse(""))
    def opts(w: String, defaults: Seq[(String, String)]): Seq[(String, String)] = {
      val declared = splitTop(w).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k.trim.stripPrefix("'").stripSuffix("'")
          .toLowerCase(Locale.ROOT) -> v.trim.stripPrefix("'").stripSuffix("'"))
        case _ => None
      })
      (defaults.filterNot(d => declared.exists(_._1 == d._1)) ++ declared).sortBy(_._1)
    }
    def render(kind: String, w: String, defaults: Seq[(String, String)]): String =
      s"$kind INDEX WITH(" +
        opts(w, defaults).map { case (k, v) => s"$k = '$v'" }.mkString(", ") + ")"
    // a column may stack several index declarations; render in the
    // reference's order FULLTEXT, SKIPPING, INVERTED (show_create.result
    // test_column_constrain_composite_indexes)
    val parts = Seq.newBuilder[String]
    kindOpts("FULLTEXT").foreach { w =>
      // the bloom-tuning defaults are backend-specific: a tantivy
      // backend renders without them (change_col_fulltext_options.result)
      val tantivy = "(?i)backend\\s*=\\s*'?tantivy'?".r.findFirstIn(w).isDefined
      val defaults =
        if (tantivy) Seq("analyzer" -> "English", "case_sensitive" -> "false")
        else Seq("analyzer" -> "English", "backend" -> "bloom",
          "case_sensitive" -> "false", "false_positive_rate" -> "0.01",
          "granularity" -> "10240")
      parts += render("FULLTEXT", w, defaults)
    }
    kindOpts("SKIPPING").foreach(w =>
      parts += render("SKIPPING", w, Seq("false_positive_rate" -> "0.01",
        "granularity" -> "10240", "type" -> "BLOOM")))
    kindOpts("INVERTED").foreach(_ => parts += "INVERTED INDEX")
    val r = parts.result()
    if (r.isEmpty) None else Some(r.mkString(" "))
  }
  private val colMeta =
    scala.collection.concurrent.TrieMap.empty[String, Vector[ColMeta]]
  /** ADD COLUMN ... DEFAULT backfills: (column, default expr, seq at
    * ALTER time) — rows written before the ALTER read the default. */
  private val backfills =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, String, Long)]]
  /** MODIFY COLUMN type changes, applied as casts in the read view. */
  private val colCasts =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, DataType]]
  /** Per-column write-time type history after MODIFY COLUMN type
    * changes: (seq watermark, greptime type) — rows with __seq <= the
    * watermark were written under that type; storage is STRING and each
    * row casts write-type -> current type at read (alter_table.result). */
  private val typeHistory =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Vector[(Long, String)]]]
  /** Timestamp defaults resolved to absolute instants at DDL time —
    * the reference parses the literal under the session timezone ONCE
    * (alter_table_default.result: a later SET time_zone must not move
    * an already-declared default). ColMeta keeps the original string
    * for DESC/SHOW CREATE display. */
  private val colDefaultResolved =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  /** Quoted datetime default → `TIMESTAMP_MICROS(n)` under the CURRENT
    * session timezone; non-timestamp or non-literal defaults unchanged. */
  private def resolveTsDefault(gtype: String, d: String): String = {
    if (!gtype.startsWith("Timestamp")) return d
    val rx = ("^'([0-9]{4}-[0-9]{2}-[0-9]{2})[ T]" +
      "([0-9]{2}:[0-9]{2}(?::[0-9]{2})?(?:\\.[0-9]+)?)\\s*(Z|[+-][0-9:]+)?'$").r
    d.trim match {
      case rx(date, time0, off) =>
        try {
          val time = if (time0.count(_ == ':') == 1) time0 + ":00" else time0
          val zone = Option(off) match {
            case Some("Z") => java.time.ZoneId.of("UTC")
            case Some(o) => java.time.ZoneOffset.of(o)
            case None => java.time.ZoneId.of(
              spark.conf.get("spark.sql.session.timeZone", "UTC"))
          }
          val ldt = java.time.LocalDateTime.parse(s"${date}T$time")
          val inst = ldt.atZone(zone).toInstant
          s"TIMESTAMP_MICROS(${inst.getEpochSecond * 1000000L + inst.getNano / 1000L})"
        } catch { case _: Exception => d }
      case _ => d
    }
  }

  /** Reference type-name canonicalization (datatypes/src/data_type.rs
    * `ConcreteDataType` display names) from the declared SQL token. */
  private def greptimeTypeName(tok: String): String = {
    val u0 = tok.trim.toUpperCase(Locale.ROOT)
    // MySQL `INT UNSIGNED` two-token form → UInt* (show_create.result)
    if (u0.endsWith(" UNSIGNED"))
      return greptimeTypeName(u0.stripSuffix(" UNSIGNED")) match {
        case "Int8" => "UInt8"
        case "Int16" => "UInt16"
        case "Int32" => "UInt32"
        case "Int64" => "UInt64"
        case other => other
      }
    val u = u0
    val base = u.takeWhile(_ != '(').trim // `TIMESTAMP (9)` spaced form
    val args = if (u.contains('(')) u.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")").trim else ""
    base match {
      // int2/int4/int8 are Postgres BYTE-width aliases
      // (create/create_type_alias.result: int8 -> BIGINT)
      case "TINYINT" => "Int8"
      case "SMALLINT" | "INT16" | "INT2" => "Int16"
      case "INT" | "INTEGER" | "INT32" | "INT4" => "Int32"
      case "BIGINT" | "INT64" | "INT8" => "Int64"
      case "UINT8" => "UInt8"
      case "UINT16" => "UInt16"
      case "UINT32" => "UInt32"
      case "UINT64" => "UInt64"
      case "FLOAT" | "FLOAT32" | "REAL" | "FLOAT4" => "Float32"
      case "DOUBLE" | "FLOAT64" | "FLOAT8" => "Float64"
      case "STRING" | "TEXT" | "VARCHAR" | "CHAR" |
           "TINYTEXT" | "MEDIUMTEXT" | "LONGTEXT" => "String"
      case "BOOLEAN" | "BOOL" => "Boolean"
      case "BINARY" | "BLOB" | "VARBINARY" | "BYTEA" => "Binary"
      case "DATE" => "Date"
      case "DATETIME" => "TimestampMicrosecond"
      case "TIMESTAMP" => args match {
        case "0" => "TimestampSecond"
        case "6" => "TimestampMicrosecond"
        case "9" => "TimestampNanosecond"
        case _ => "TimestampMillisecond"
      }
      case "TIMESTAMPSECOND" | "TIMESTAMP_S" | "TIMESTAMP_SEC" => "TimestampSecond"
      case "TIMESTAMPMILLISECOND" | "TIMESTAMP_MS" => "TimestampMillisecond"
      case "TIMESTAMPMICROSECOND" | "TIMESTAMP_US" => "TimestampMicrosecond"
      case "TIMESTAMPNANOSECOND" | "TIMESTAMP_NS" => "TimestampNanosecond"
      case "DECIMAL" | "NUMERIC" =>
        if (args.isEmpty) "Decimal(38, 10)"
        else {
          val p = args.split(",").map(_.trim)
          s"Decimal(${p(0)}, ${if (p.length > 1) p(1) else "0"})"
        }
      case "JSON" => "Json"
      // JSON2 is the shredded variant type — distinct semantics (per-SST
      // schema-union rendering, dot-path access; types/json/json2.sql)
      case "JSON2" => "Json2"
      case "VECTOR" => s"Vector($args)"
      case "INTERVAL" => "IntervalMonthDayNano"
      case other => other.toLowerCase(Locale.ROOT).capitalize
    }
  }

  private def unquote(ident: String): String = {
    val t = ident.trim
    // doubled quote chars inside a quoted identifier unescape to one
    // (keywords/escaped_quotes.sql: "COL""UMN" names column COL"UMN)
    if (t.startsWith("`")) t.stripPrefix("`").stripSuffix("`").replace("``", "`")
    else if (t.startsWith("\""))
      t.stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")
    else t
  }

  /** DataFusion identifier normalization: UNQUOTED identifiers fold to
    * lowercase, quoted ones keep their case (create/upper_case_table_name
    * pins `AbCdEfGe` resolving as `abcdefge`). */
  private def normIdent(ident: String): String = {
    val t = ident.trim
    val n = if (t.startsWith("\"") || t.startsWith("`")) unquote(t)
      else t.toLowerCase(Locale.ROOT)
    // Spark temp-view names reject @/# (create/create.result's fuzzed
    // names) — map them to stable tokens
    n.replace("@", "__x40__").replace("#", "__x23__")
  }

  /** One column definition: name TYPE [NULL|NOT NULL] [DEFAULT expr]
    * [TIME INDEX] [PRIMARY KEY] [inverted/fulltext/skipping index
    * specs — performance hints, accepted and ignored] [COMMENT '...'].
    * (sql/src/statements/create.rs column grammar.) */
  private case class ColDef(name: String, typeTok: String, nullable: Boolean,
      default: Option[String], isTimeIndex: Boolean, isPrimaryKey: Boolean)

  private val DefaultRx =
    "(?is)\\bDEFAULT\\s+('[^']*'|[A-Za-z_][A-Za-z0-9_]*\\s*\\([^)]*\\)|-?[A-Za-z0-9_.+-]+)".r

  private def parseColumnDef(item0: String): ColDef = {
    val item = item0.trim
    val nameTok = item.takeWhile(!_.isWhitespace)
    val rest = item.drop(nameTok.length).trim
    val restUp = rest.toUpperCase(Locale.ROOT)
    val typeTok0 = {
      val ws0 = rest.takeWhile(!_.isWhitespace)
      // `TIMESTAMP (9)` — args may follow after a space
      // (types/timestamp/timestamp_precision.sql)
      val ws =
        if (!ws0.contains('(') &&
            rest.drop(ws0.length).dropWhile(_.isWhitespace).startsWith("("))
          rest.take(rest.indexOf('(', ws0.length) + 1) // unbalanced → extended below
        else ws0
      // a space inside the args must not cut the token
      // (`DECIMAL(3, 2)` in types/decimal/decimal_ops.sql)
      if (ws.count(_ == '(') != ws.count(_ == ')')) {
        var depth = 0; var i = 0; var stop = -1
        while (i < rest.length && stop < 0) {
          rest.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) stop = i
            case _ =>
          }
          i += 1
        }
        if (stop >= 0) rest.substring(0, stop + 1) else ws
      } else ws
    }
    // `INT UNSIGNED` style two-token types (show/show_create.result)
    val typeTok =
      if (restUp.drop(typeTok0.length).trim.startsWith("UNSIGNED"))
        typeTok0 + " UNSIGNED"
      else typeTok0
    // a JSON2 hint block carries NOT NULL / DEFAULT text INSIDE the
    // type parens — column options parse from the remainder only
    // (types/json/json2_type_hints.sql)
    val optSrc =
      if (typeTok.toUpperCase(Locale.ROOT).startsWith("JSON2") &&
          typeTok.contains('(')) rest.drop(typeTok.length)
      else rest
    val optUp = optSrc.toUpperCase(Locale.ROOT)
    ColDef(
      normIdent(nameTok),
      typeTok,
      nullable = !optUp.contains("NOT NULL"),
      default = DefaultRx.findFirstMatchIn(optSrc).map(_.group(1)),
      isTimeIndex = optUp.contains("TIME INDEX"),
      isPrimaryKey = optUp.contains("PRIMARY KEY"))
  }

  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inQuote = false // single-quoted SQL strings may contain , and ( )
    val cur = new StringBuilder
    s.foreach {
      case c if inQuote => cur += c; if (c == '\'') inQuote = false
      case '\'' => cur += '\''; inQuote = true
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private def sparkType(t: String): DataType = {
    val u1 = t.trim.toUpperCase(Locale.ROOT)
    if (u1.endsWith(" UNSIGNED"))
      return sparkType("U" + u1.stripSuffix(" UNSIGNED") match {
        case "UTINYINT" => "UINT8"
        case "USMALLINT" | "UINT2" => "UINT16"
        case "UINT" | "UINTEGER" | "UINT4" => "UINT32"
        case "UBIGINT" | "UINT8" => "UINT64"
        case other => other.drop(1)
      })
    val u = u1
    val base = u.takeWhile(_ != '(').trim // `TIMESTAMP (9)` spaced form
    base match {
      case "STRING" | "TEXT" | "VARCHAR" | "CHAR" |
           "TINYTEXT" | "MEDIUMTEXT" | "LONGTEXT" => StringType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "TINYINT" => ByteType
      case "INT16" | "SMALLINT" | "INT2" => ShortType
      case "INT32" | "INT" | "INTEGER" | "INT4" => IntegerType
      case "INT64" | "BIGINT" | "INT8" => LongType
      case "UINT8" | "UINT16" => IntegerType
      case "UINT32" => LongType
      // UInt64 → Decimal(20,0) per SURVEY §1.2 (full range, no overflow)
      case "UINT64" => DecimalType(20, 0)
      case "FLOAT32" | "FLOAT" | "REAL" | "FLOAT4" => FloatType
      case "FLOAT64" | "DOUBLE" | "FLOAT8" => DoubleType
      case "DECIMAL" | "NUMERIC" =>
        val args = u.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
        if (args.isEmpty) DecimalType(38, 10)
        else {
          val parts = args.split(",").map(_.trim.toInt)
          DecimalType(parts(0), if (parts.length > 1) parts(1) else 0)
        }
      case "TIMESTAMP" | "DATETIME" | "TIMESTAMPSECOND" | "TIMESTAMPMILLISECOND" |
        "TIMESTAMPMICROSECOND" | "TIMESTAMPNANOSECOND" |
        "TIMESTAMP_S" | "TIMESTAMP_MS" | "TIMESTAMP_US" | "TIMESTAMP_NS" | "TIMESTAMP_SEC" =>
        TimestampType // precision folded to µs
      case "DATE" => DateType
      case "TIME" | "DURATION" => LongType
      case "INTERVAL" => DayTimeIntervalType()
      case "BINARY" | "BLOB" | "VARBINARY" | "BYTEA" => BinaryType
      case "JSON" | "JSON2" => StringType
      case "VECTOR" => ArrayType(FloatType, containsNull = false)
      case other => throw new IllegalArgumentException(s"unknown type: $other")
    }
  }

  private val CreateLikeRx =
    ("(?is)CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+LIKE\\s+" +
      "(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*").r

  private def createTable(stmt: String): DataFrame = {
    // CREATE TABLE x LIKE y: clone y's declared schema (create/create.sql)
    CreateLikeRx.findFirstMatchIn(stmt).filter(_.matched.trim == stmt.trim).foreach { m =>
      val target = m.group(1)
      val src = normTable(m.group(2))
      val spec = catalog.spec(src)
      val metas = colMeta.getOrElse(src, Vector.empty)
      val colsSql = metas.map { cm =>
        s""""${cm.name}" ${showCreateType(cm.gtype)}""" +
          (if (!cm.nullable) " NOT NULL" else "") +
          cm.default.map(" DEFAULT " + _).getOrElse("") +
          (if (cm.name == spec.timeIndex) " TIME INDEX" else "")
      } ++ (if (spec.tags.nonEmpty)
        Seq(spec.tags.map(t => s""""$t"""").mkString("PRIMARY KEY (", ", ", ")"))
      else Nil)
      return createTable(s"CREATE TABLE $target (${colsSql.mkString(", ")})")
    }
    val head = CreateTableHeadRx.findFirstMatchIn(stmt).getOrElse(
      throw new IllegalArgumentException(s"cannot parse: $stmt"))
    val name = normTable(head.group(1))
    if (catalog.tables.contains(name)) {
      if ("(?is)CREATE\\s+TABLE\\s+IF\\s+NOT\\s+EXISTS.*".r.matches(stmt))
        return status(s"table $name exists")
      throw new IllegalArgumentException(s"table $name already exists")
    }
    // balanced-paren scan: regex greediness would swallow the WITH clause
    val open = head.end - 1
    var depth = 0; var i = open; var close = -1
    while (i < stmt.length && close < 0) {
      stmt.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > 0, s"unbalanced parens: $stmt")
    val colsPart = stmt.substring(open + 1, close)
    val withPart = {
      val tail = stmt.substring(close + 1)
      val rx = "(?is).*WITH\\s*\\((.*)\\).*".r
      tail match { case rx(w) => w; case _ => null }
    }

    {
      var timeIndex: Option[String] = None
      var tiCount = 0
      var tags = Vector.empty[String]
      var hintsByCol = Map.empty[String, Vector[J2Hint]]
      val fields = Vector.newBuilder[StructField]

      val metas = Vector.newBuilder[ColMeta]
      splitTop(colsPart).foreach { item =>
        val u = item.toUpperCase(Locale.ROOT)
        if (u.startsWith("PRIMARY KEY")) {
          tags ++= item.substring(item.indexOf('(') + 1, item.lastIndexOf(')'))
            .split(",").map(c => normIdent(c)).filter(_.nonEmpty)
        } else if (u.startsWith("TIME INDEX")) {
          // the reference rejects multi-column and duplicate TIME INDEX
          // constraints (create/create.result)
          val cols = item.substring(item.indexOf('(') + 1, item.lastIndexOf(')'))
            .split(",").map(c => normIdent(c.trim)).filter(_.nonEmpty)
          if (cols.length != 1) throw new IllegalArgumentException(
            "Invalid time index: it should contain only one column in time index")
          tiCount += 1
          if (!timeIndex.contains(cols.head)) timeIndex = Some(cols.head)
        } else {
          val cd = parseColumnDef(item)
          if (cd.isTimeIndex) {
            val gt = greptimeTypeName(cd.typeTok)
            if (!gt.startsWith("Timestamp")) throw new IllegalArgumentException(
              s"Invalid column option, column name: ${cd.name}, " +
                "error: time index column data type should be timestamp")
            val explicitNull = u.matches("(?s).*\\bNULL\\b.*") && !u.contains("NOT NULL")
            if (explicitNull) throw new IllegalArgumentException(
              s"Invalid column option, column name: ${cd.name}, " +
                "error: time index column can't be null")
            timeIndex = Some(cd.name)
            tiCount += 1
          }
          if (cd.isPrimaryKey) tags :+= cd.name
          val gtype = greptimeTypeName(cd.typeTok)
          if (cd.isTimeIndex || timeIndex.contains(cd.name))
            tsLiteralUs.put(name, gtype match {
              case "TimestampSecond" => 1000000L
              case "TimestampMicrosecond" => 1L
              case "TimestampNanosecond" => -1L
              case _ => 1000L
            })
          if (gtype == "Json2" && cd.typeTok.contains('(')) {
            val hs = parseJ2Hints(cd.typeTok)
            if (hs.nonEmpty) hintsByCol += cd.name -> hs
          }
          val sqlTok =
            if (cd.typeTok.toUpperCase(Locale.ROOT) == "VARBINARY") Some("VARBINARY")
            else None
          metas += ColMeta(cd.name, gtype, cd.nullable, cd.default,
            sqlType = sqlTok, indexDecl = indexDeclOf(item),
            comment = "(?is)\\bCOMMENT\\s+'((?:[^']|'')*)'".r
              .findFirstMatchIn(item).map(_.group(1)))
          fields += StructField(cd.name, sparkType(cd.typeTok), cd.nullable)
          // TimestampNanosecond columns carry a hidden sub-µs remainder
          // (0-999) beside the µs-storage column: Spark timestamps stop
          // at µs, the reference's ns unit doesn't
          // (types/timestamp/ts_precision_comparison.sql)
          if (gtype == "TimestampNanosecond")
            fields += StructField(s"__nsr_${cd.name}", IntegerType, nullable = true)
        }
      }
      if (tiCount > 1) throw new IllegalArgumentException(
        s"Invalid time index: expected only one time index constraint but actual $tiCount")
      var metasV = metas.result()
      // duplicate column defs error before anything registers
      // (create_metric_table.result pins the index-pair message shape)
      metasV.map(_.name).zipWithIndex.groupBy(_._1).find(_._2.size > 1).foreach {
        case (dup, idxs) => throw new IllegalArgumentException(
          s"Invalid SQL, error: column name `$dup` is duplicated at index " +
            s"${idxs.head._2} and ${idxs(1)._2}")
      }

      def unq(s: String): String = {
        val t = s.trim
        if (t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head)
          t.substring(1, t.length - 1)
        else t
      }
      val optSeq: Seq[(String, String)] = Option(withPart).map { w =>
        splitTop(w).flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) =>
              Some(unq(k).toLowerCase(Locale.ROOT) -> unq(v))
            case _ => None
          }
        }
      }.getOrElse(Nil)
      // SHOW CREATE echoes the original key quoting: WITH(COMMENT='x')
      // renders bare, WITH('comment'='x') quoted (create/create.result
      // vs the flow sink comment)
      Option(withPart).foreach { w =>
        val quoted = splitTop(w).flatMap(_.split("=", 2) match {
          case Array(k, _) if k.trim.startsWith("'") =>
            Some(unq(k).toLowerCase(Locale.ROOT))
          case _ => None
        }).toSet
        quotedOptNames.put(name, quoted)
      }
      // database options inherit into the table at create time — except
      // ttl (resolved dynamically so ALTER DATABASE SET ttl keeps
      // affecting existing tables) and compaction.* (db-level only,
      // create/create_database_opts.result)
      val inheritable = dbOpts.getOrElse(currentDb, Nil)
        .filterNot { case (k, _) => k.startsWith("compaction.") || k == "ttl" }
        .filterNot { case (k, _) => optSeq.exists(_._1 == k) }
      val opts: Map[String, String] = (optSeq ++ inheritable).toMap

      // ---- engine + PARTITION ON clause (metric engine, §SURVEY 2.1) --
      val tail = stmt.substring(close + 1)
      val engine = "(?i)\\bENGINE\\s*=\\s*([A-Za-z_]+)".r
        .findFirstMatchIn(tail).map(_.group(1).toLowerCase(Locale.ROOT))
        .getOrElse("mito")
      val partRx = "(?is)PARTITION\\s+ON\\s+COLUMNS\\s*\\(([^)]*)\\)\\s*\\(".r
      val partClause: Option[(Seq[String], Seq[String])] =
        partRx.findFirstMatchIn(tail).map { pm =>
          var d = 1; var j = pm.end
          while (j < tail.length && d > 0) {
            tail.charAt(j) match {
              case '(' => d += 1
              case ')' => d -= 1
              case _ => ()
            }
            j += 1
          }
          val cols = pm.group(1).split(",").map(c => unquote(c.trim)).toSeq
            .filter(_.nonEmpty)
          val rules = splitTop(tail.substring(pm.end, j - 1)).map(
            _.trim.replaceAll("\\s+", " ")
              .replaceAll("[`\"]", "") // identifiers render unquoted
              .replaceAll("(?i)\\band\\b", "AND").replaceAll("(?i)\\bor\\b", "OR"))
            .filter(_.nonEmpty)
          (cols, rules)
        }
      val isMetricPhy = engine == "metric" && opts.contains("physical_metric_table")
      val isMetricLogical = engine == "metric" && opts.contains("on_physical_table")
      if (isMetricPhy) {
        // index.* options validate eagerly (create_metric_table.result)
        opts.get("index.type").foreach { t =>
          if (!Set("skipping", "inverted", "none").contains(t))
            throw new IllegalArgumentException(
              s"Failed to parse region options: Invalid index type: $t")
        }
      }
      var inheritTtl: Option[Long] = None
      var inheritMerge: Option[MergeMode] = None
      if (isMetricLogical) {
        val phyName = normTable(opts("on_physical_table"))
        val phy = metricPhy.getOrElse(phyName, throw new IllegalArgumentException(
          s"physical table $phyName not found"))
        val phyMetas = colMeta.getOrElse(phyName, Vector.empty)
        val phySpec = catalog.spec(phyName)
        val myTags = tags.distinct.toSet
        // logical partition rule must equal the physical one verbatim
        partClause.foreach { case (_, rules) =>
          val phyRules = partitionClause.get(phyName).map(_._2).getOrElse(Nil)
          if (rules.nonEmpty && rules != phyRules)
            throw new IllegalArgumentException(
              "Invalid partition rule: logical table partition rule must " +
                "match the corresponding physical table's")
        }
        // validate each column against the physical schema
        metasV.foreach { m =>
          val isTag = myTags.contains(m.name)
          val isTs = timeIndex.contains(m.name)
          if (isTs) {
            val phyTs = phyMetas.find(_.name == phySpec.timeIndex)
            if (phyTs.exists(_.gtype != m.gtype))
              throw new IllegalArgumentException(
                s"Unexpected request: Metric has differenttime unit than the physical region")
          } else if (isTag) {
            if (m.gtype != "String")
              throw new IllegalArgumentException(
                "Column type mismatch. Expect String(StringType { size_type: Utf8 }), " +
                  s"got ${m.gtype}(${m.gtype}Type)")
          } else {
            phyMetas.find(_.name == m.name) match {
              case None => throw new IllegalArgumentException(
                s"Adding field column ${m.name} to physical table")
              case Some(pm) if pm.gtype != m.gtype =>
                throw new IllegalArgumentException(
                  s"Column type mismatch. Expect ${pm.gtype}(${pm.gtype}Type), " +
                    s"got ${m.gtype}(${m.gtype}Type)")
              case _ => ()
            }
          }
        }
        // inherit the physical table's partition columns as extra tags
        val phyPartCols = partitionClause.get(phyName).map(_._1).getOrElse(Nil)
        phyPartCols.filterNot(c => metasV.exists(_.name == c)).foreach { c =>
          metasV :+= ColMeta(c, "String", nullable = true, None)
          tags :+= c
        }
        // logical tables expose columns alphabetically (DESC t1 pins
        // host, ts, val; SELECT * and positional INSERT follow)
        metasV = metasV.sortBy(_.name)
        tags = tags.distinct.sortBy(identity)
        // add new tags to the physical table schema
        val phyAdd = tags.filterNot(t => colMeta.getOrElse(phyName, Vector.empty)
          .exists(_.name == t))
        if (phyAdd.nonEmpty) {
          val decor = tableOpts.getOrElse(phyName, Nil).toMap.get("index.type") match {
            case Some("skipping") =>
              val fpr = tableOpts.getOrElse(phyName, Nil).toMap
                .getOrElse("index.false_positive_rate", "0.01")
              val gran = tableOpts.getOrElse(phyName, Nil).toMap
                .getOrElse("index.granularity", "10240")
              Some(s"SKIPPING INDEX WITH(false_positive_rate = '$fpr', " +
                s"granularity = '$gran', type = 'BLOOM')")
            case _ => None
          }
          colMeta.put(phyName, colMeta.getOrElse(phyName, Vector.empty) ++
            phyAdd.map(t => ColMeta(t, "String", nullable = true, None,
              indexDecl = decor)))
          catalog.register(phySpec.copy(tags = (phySpec.tags ++ phyAdd).distinct))
          phy.addedTags ++= phyAdd
        }
        phy.everLogical = true
        phy.addChild(name)
        logicalParent.put(name, phyName)
        inheritTtl = catalog.spec(phyName).ttlMillis
        // logical tables share the physical region's storage semantics
        // (create_metric_table.result: append-mode phy → duplicate rows
        // survive in t1)
        inheritMerge = Some(catalog.spec(phyName).mergeMode)
      }
      if (engine != "mito") tableEngine.put(name, engine)
      if (isMetricPhy)
        metricPhy.put(name, new PhyState())
      partClause.foreach(pc => partitionClause.put(name, pc))

      // a table with its own compaction.* options is marked as
      // overriding the database's (create_database_opts.result)
      val withOverride =
        if (optSeq.exists(_._1.startsWith("compaction.")) &&
          !optSeq.exists(_._1 == "compaction.override"))
          optSeq :+ ("compaction.override" -> "true")
        else optSeq
      tableOpts.put(name, withOverride ++ inheritable)

      val ti = timeIndex.getOrElse(
        throw new IllegalArgumentException(s"table $name: TIME INDEX is mandatory"))
      // tags are dropped from primary key if they equal the time index
      val mergeMode =
        if (opts.get("append_mode").exists(_.toLowerCase == "true")) MergeMode.Append
        else opts.get("merge_mode").map(MergeMode.parse)
          .orElse(inheritMerge).getOrElse(MergeMode.LastRow)
      // table ttl, else inherited from the database (table/src/requests.rs
      // database-level TTL); 'instant' drops every historical row
      val ttlOpt = opts.get("ttl")
        .orElse(dbOpts.getOrElse(currentDb, Nil).toMap.get("ttl"))
      val ttl = ttlOpt.flatMap {
        case "instant" => Some(0L)
        case "forever" | "" => None
        case v => Some(parseTtlMs(v))
      }.orElse(inheritTtl)
      val path = opts.getOrElse("path", s"$warehouse/${currentDb}__$name")

      colMeta.put(name, metasV)
      if (hintsByCol.nonEmpty) j2Hints.put(name, hintsByCol)
      val declaredFields = fields.result()
      val orderedFields = metasV.flatMap { m =>
        val f = declaredFields.find(_.name == m.name).getOrElse(
          StructField(m.name, sparkType(showCreateType(m.gtype)), m.nullable))
        // ns columns carry their hidden sub-µs remainder companion
        if (m.gtype == "TimestampNanosecond")
          Seq(f, StructField(s"__nsr_${m.name}", IntegerType, nullable = true))
        else Seq(f)
      }
      val schema = StructType(orderedFields :+ StructField(SeqCol, LongType))
      val spec = TableSpec(name, path, ti, tags.distinct, mergeMode, ttl,
        seqColumn = Some(opts.getOrElse("seq_column", SeqCol)))
      catalog.register(spec)
      // materialize an empty table so the view exists immediately
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spec.annotate(schema)).write.mode("ignore").parquet(path)
      refreshView(name)
      procedureLog += (("metasrv-procedure::CreateTable",
        s"greptime/$currentDb/table/$name"))
      status(s"table $name created")
    }
  }

  /** Read view with the internal sequence column and any ALTER-dropped
    * columns hidden; ADD COLUMN DEFAULT backfills and MODIFY COLUMN
    * casts applied; columns in declared (FIRST/AFTER-adjusted) order. */
  /** A metric physical table scans as the union of its logical children
    * with the reserved __table_id/__tsid tags computed per row
    * (insert/logical_metric_table.result pins the fxhash tsid values). */
  /** One logical child's rows in the physical view's column shape. */
  private def phyShapedRows(phyName: String, child: String,
      tableId: Long): DataFrame = {
    val ps = metricPhy(phyName)
    val metas = colMeta.getOrElse(phyName, Vector.empty)
    val declared = metas.filterNot(m => ps.addedTags.contains(m.name))
    val added = metas.filter(m => ps.addedTags.contains(m.name))
    val cdf = spark.table(child)
    val cTags = catalog.spec(child).tags.sorted
    def colOr(n: String): org.apache.spark.sql.Column =
      if (cdf.columns.contains(n)) col(s"`$n`") else lit(null).cast("string")
    val cols: Seq[org.apache.spark.sql.Column] =
      declared.map(m => colOr(m.name).as(m.name)) ++
        Seq(lit(tableId).cast("long").as("__table_id"),
          call_udf("__graft_tsid",
            array(cTags.map(lit): _*),
            array(cTags.map(t => col(s"`$t`").cast("string")): _*)).as("__tsid")) ++
        added.map(m => colOr(m.name).as(m.name))
    cdf.select(cols: _*)
  }

  private def refreshMetricPhyView(phyName: String): Unit = {
    val ps = metricPhy.getOrElse(phyName, return)
    if (!ps.everLogical) return
    val kids = ps.children.filter(catalog.tables.contains)
    val parts = kids.map(c => phyShapedRows(phyName, c, ps.childIds(c)))
    // rows RETAINED from dropped logical tables: the physical region
    // owns the data, a logical DROP only removes the route to it
    // (insert/logical_metric_table.result keeps all 4 rows after both
    // drops) — dropOneTable materializes them into the phy's own dir
    val ownRows: Option[DataFrame] = scala.util.Try(catalog.spec(phyName))
        .toOption.flatMap { spec =>
      val p = new org.apache.hadoop.fs.Path(spec.path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        Some(spark.read.option("mergeSchema", "true").parquet(spec.path))
      else None
    }
    (parts ++ ownRows)
      .reduceOption(_.unionByName(_, allowMissingColumns = true)).foreach(
        _.createOrReplaceTempView(phyName))
  }

  private def refreshView(name: String, seqFloor: Option[Long] = None,
      rowFilter: Option[Column] = None): Unit = {
    if (metricPhy.get(name).exists(_.everLogical) && seqFloor.isEmpty &&
        rowFilter.isEmpty) {
      refreshMetricPhyView(name)
      return
    }
    // a seqFloor/rowFilter means a flow is evaluating: instant-ttl rows
    // (never visible to plain scans) ARE visible to the flow engine
    val spec0 = catalog.spec(name)
    var df =
      if ((seqFloor.isDefined || rowFilter.isDefined) &&
          spec0.ttlMillis.contains(0L))
        Catalog.readView(catalog.raw(name), spec0.copy(ttlMillis = None))
      else catalog.read(name)
    seqFloor.foreach(s => df = df.filter(col(SeqCol) > s))
    rowFilter.foreach(f => df = df.filter(f))
    // rows predating an ALTER ... DEFAULT read the default
    backfills.getOrElse(name, Vector.empty).foreach { case (c, d, seqAt) =>
      if (df.columns.contains(c))
        df = df.withColumn(c,
          when(col(s"`$c`").isNull && col(SeqCol) < seqAt, expr(dialect(d)))
            .otherwise(col(s"`$c`")))
    }
    // MODIFY-COLUMN casts are LOSSY like the reference's: a value the
    // narrower type can't hold reads as NULL, never an ANSI error
    // (change_col_type.sql's 'greptime' back to INTEGER)
    colCasts.getOrElse(name, Map.empty).foreach { case (c, t) =>
      if (df.columns.contains(c))
        df = df.withColumn(c, expr(s"try_cast(`$c` AS ${t.sql})"))
    }
    // type-changed columns: each row casts its write-time type to the
    // current one, selected by write sequence (alter_table.result)
    typeHistory.getOrElse(name, Map.empty).foreach { case (c, hist) =>
      if (df.columns.contains(c)) {
        val curG = colMeta.getOrElse(name, Vector.empty)
          .find(_.name == c).map(_.gtype).getOrElse("String")
        val cur = showCreateType(curG)
        def chain(from: String): org.apache.spark.sql.Column =
          expr(s"try_cast(try_cast(`$c` AS ${showCreateType(from)}) AS $cur)")
        val base: org.apache.spark.sql.Column = chain(curG) // rows written under the current type
        val cased = hist.foldRight(base) { case ((w, t), acc) =>
          when(col(SeqCol) <= w, chain(t)).otherwise(acc)
        }
        df = df.withColumn(c, cased)
      }
    }
    // JSON2 columns render against their flush batch's deep-union shape
    // (shredded "flat" SST semantics — types/json/json2.sql). Schema
    // derivation collects the column's documents; bounded per refresh
    // and gated to JSON2 tables, this is golden-dialect introspection,
    // not the scale path.
    val j2cols = colMeta.getOrElse(name, Vector.empty)
      .filter(_.gtype == "Json2").map(_.name)
    for (c <- j2cols if df.columns.contains(c)) {
      val bounds = j2Boundaries.getOrElse(name, Vector.empty)
      val rows = df.select(col(SeqCol).cast(LongType), col(s"`$c`").cast(StringType))
        .collect().map(r => (if (r.isNullAt(0)) 0L else r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1)))
      if (rows.nonEmpty) {
        def batchOf(seq: Long): Int = {
          val i = bounds.indexWhere(seq <= _)
          if (i < 0) bounds.size else i
        }
        val schemas: Map[Int, String] = rows.groupBy(r => batchOf(r._1))
          .map { case (b, rs) =>
            b -> graft.functions.JsonSql.shredSchema(rs.map(_._2).toSeq) }
        val caseCol = schemas.toSeq.sortBy(_._1).foldLeft(lit(null).cast(StringType)) {
          case (acc, (b, sch)) =>
            val cond =
              if (b < bounds.size) col(SeqCol) <= bounds(b) &&
                (if (b == 0) lit(true) else col(SeqCol) > bounds(b - 1))
              else (if (bounds.isEmpty) lit(true) else col(SeqCol) > bounds.last)
            when(cond, lit(sch)).otherwise(acc)
        }
        df = df.withColumn(c,
          call_udf("__json2_apply", col(s"`$c`"), caseCol))
      }
    }
    df = df.drop(SeqCol +: droppedCols.getOrElse(name, Set.empty).toSeq: _*)
    // declared order drives SELECT * and DESC; case-collision shadow
    // columns (alter/add_col.sql "IdC") surface as their default value,
    // aliased in the SAME single select — any later by-name reference
    // would be ambiguous under case-insensitive resolution
    val shadowMap = shadowCols.getOrElse(name, Vector.empty)
      .map { case (cn, d, tok) => cn -> ((d, tok)) }.toMap
    colMeta.get(name).foreach { metas =>
      val declared = metas.map(_.name)
      val cols = declared.flatMap { n =>
        if (df.columns.contains(n)) Some(col(s"`$n`"))
        else shadowMap.get(n).map { case (d, tok) =>
          d.map(x => expr(dialect(x))).getOrElse(lit(null))
            .cast(sparkType(tok)).as(n)
        }
      }
      val extraAll = df.columns.filterNot(declared.contains)
      // sub-µs remainder companions stay hidden from the user-facing
      // view (SELECT * must not show them); the __nsq_ variant below
      // keeps them for the ns-fidelity statement rewrites
      val extra = extraAll.filterNot(_.startsWith("__nsr_"))
      // flow-sink columns carry dots/parens in their names — backtick
      if (cols.nonEmpty) {
        if (extraAll.exists(_.startsWith("__nsr_")))
          df.select(cols ++ extraAll.map(c => col(s"`$c`")): _*)
            .createOrReplaceTempView(s"__nsq_$name")
        df = df.select(cols ++ extra.map(c => col(s"`$c`")): _*)
      }
    }
    df.createOrReplaceTempView(name)
    rebuildViews()
  }

  /** TTL durations accept compact ('90s') and humantime verbose
    * ('1 second', '6 hours') forms, possibly multi-part ('1h 30m'). */
  private def parseTtlMs(s: String): Long = {
    val part = "(?i)(\\d+)\\s*(milliseconds?|ms|seconds?|minutes?|hours?|days?|weeks?|months?|years?|[smhdwy])".r
    val parts = part.findAllMatchIn(s.trim).toSeq
    if (parts.isEmpty || parts.map(_.matched.replaceAll("\\s+", "").length).sum !=
      s.replaceAll("\\s+", "").length)
      throw new IllegalArgumentException(s"bad ttl: $s")
    parts.map { m =>
      val unit = m.group(2).toLowerCase(Locale.ROOT)
      m.group(1).toLong * (unit.head match {
        case 'm' if unit.startsWith("ms") || unit.startsWith("milli") => 1L
        case 'm' if unit.startsWith("month") => 2630016000L // humantime 30.44d
        case 'm' => 60000L
        case 's' => 1000L
        case 'h' => 3600000L
        case 'd' => 86400000L
        case 'w' => 604800000L
        case 'y' => 31557600000L // humantime 365.25d
      })
    }.sum
  }

  // ---- views + ALTER TABLE (sql/src/statements/{create,alter}.rs) ----

  private val CreateViewRx =
    ("(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?VIEW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "((?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)" +
      "(?:\\.(?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*))?)" +
      "\\s*(\\([^)]*\\))?\\s+AS\\s+(.*)").r

  /** CREATE VIEW-created view names (SHOW VIEWS / SHOW TABLES listing). */
  private val userViews = scala.collection.mutable.LinkedHashSet.empty[String]
  /** view name -> (normalized CREATE statement, dialected query) — the
    * statement feeds SHOW CREATE VIEW; the query re-executes after every
    * base-table refresh so views stay live (view/show_create.result). */
  private val userViewDefs =
    scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]

  /** re-derive every stored view from its SQL; a view whose base is gone
    * drops so reads fail like the reference's invalidated views */
  private def rebuildViews(): Unit =
    userViewDefs.foreach { case (v, (_, query)) =>
      try spark.sql(query).createOrReplaceTempView(v)
      catch { case _: Exception => spark.catalog.dropTempView(v) }
    }

  private def createView(stmt: String): DataFrame = stmt match {
    case CreateViewRx(name0, colList, query0) =>
      val name = normTable(name0) // `s.b` → mangled per-schema view name
      val up = stmt.toUpperCase(Locale.ROOT)
      if (up.contains("OR REPLACE") && up.contains("IF NOT EXISTS"))
        throw new IllegalArgumentException(
          "Create Or Replace and If Not Exist cannot be used together")
      // a TABLE of that name blocks view creation under every modifier
      // (view/create.result: plain, IF NOT EXISTS and OR REPLACE all fail)
      if (catalog.tables.contains(normIdent(name)))
        throw new IllegalArgumentException(
          s"Table already exists: `greptime.$currentDb.$name`")
      if (userViews.contains(name) && up.contains("IF NOT EXISTS") &&
        !up.contains("OR REPLACE"))
        return status(s"view $name exists")
      if (userViews.contains(name) && !up.contains("OR REPLACE") &&
        !up.contains("IF NOT EXISTS"))
        throw new IllegalArgumentException(s"view $name already exists")
      // optional column-alias list: CREATE VIEW v (a, b) AS ...
      val query = Option(colList).filter(_.trim.nonEmpty) match {
        case Some(cols) => s"SELECT * FROM ($query0) AS __view_cols$cols"
        case None => query0
      }
      val dialected = dialect(query)
      spark.sql(dialected).createOrReplaceTempView(name)
      userViews += name
      // SHOW CREATE VIEW re-renders the parsed statement: whitespace
      // collapses and binary operators get spaced (`n+1` -> `n + 1`)
      userViewDefs(name) =
        (stmt.replaceAll("\\s+", " ")
          .replaceAll("(?<=[A-Za-z0-9_)])\\s*([+*/-])\\s*(?=[A-Za-z0-9_(])", " $1 ")
          .trim,
          dialected)
      status(s"view $name created")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  /** Dropped columns are session metadata (files keep the bytes); adds
    * materialize a zero-row file carrying the widened schema so the
    * mergeSchema read picks it up without rewriting data. */
  private val droppedCols =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** table -> µs-per-unit for numeric literals into its TIME INDEX
    * (TIMESTAMP(0)=s, (3)=ms, (6)=µs, (9)=ns — reference precision). */
  private val tsLiteralUs = scala.collection.concurrent.TrieMap.empty[String, Long]
  /** Tables holding at least one row with a nonzero sub-µs remainder.
    * Only these need the ns-fidelity statement rewrites — everything
    * else renders identically from µs storage, so the rewrites (and
    * their blast radius) stay off for ordinary TIMESTAMP(9) tables. */
  private val nsRemainderTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** JSON2 shredding generations: the seq recorded at each flush bounds
    * a schema-union batch; compaction collapses prior batches into one
    * (types/json/json2.sql — rows 1-6 share one union after swcs). */
  private val j2Boundaries =
    scala.collection.concurrent.TrieMap.empty[String, Vector[Long]]

  /** One JSON2 type hint: dotted path, normalized SQL + arrow type
    * names, nullability, declared DEFAULT literal text
    * (sql/src/parsers/create_parser/json.rs; types/json/
    * json2_type_hints.sql). */
  private case class J2Hint(path: Vector[String], sqlType: String,
      arrowType: String, nullable: Boolean, default: Option[String])
  /** table → JSON2 column → its declared hints. */
  private val j2Hints =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Vector[J2Hint]]]

  /** Parse + validate the hint block of `JSON2 ( path TYPE [opts], ... )`.
    * Error shapes follow the reference parser (create_parser/json.rs). */
  private def parseJ2Hints(typeTok: String): Vector[J2Hint] = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"Invalid SQL, error: $msg")
    val inner = typeTok.substring(typeTok.indexOf('(') + 1,
      typeTok.lastIndexOf(')'))
    val hints = Vector.newBuilder[J2Hint]
    var seen = Vector.empty[Vector[String]]
    splitTop(inner).filter(_.nonEmpty).foreach { item =>
      val pathTok = item.takeWhile(!_.isWhitespace)
      val rest = item.drop(pathTok.length).trim
      // dotted path; segments may be quoted ("user"."age")
      val path = {
        val segs = Vector.newBuilder[String]
        val cur = new StringBuilder
        var inQ = false
        pathTok.foreach {
          case '"' => inQ = !inQ
          case '.' if !inQ => segs += cur.result(); cur.clear()
          case c => cur += c
        }
        segs += cur.result()
        segs.result().map(s => if (s == s.toUpperCase(Locale.ROOT) &&
          s == s.toLowerCase(Locale.ROOT)) s else normIdent(s))
      }
      if (path.length > 50)
        bad("JSON2 type hint path cannot exceed 50 segments")
      if (path.exists(_.isEmpty))
        bad("JSON2 type hint path segment cannot be empty")
      val typeDecl = rest.takeWhile(!_.isWhitespace)
      val afterType0 = rest.drop(typeDecl.length).trim
      val (typeFull, afterType) =
        if (afterType0.toUpperCase(Locale.ROOT).startsWith("UNSIGNED"))
          (typeDecl + " UNSIGNED", afterType0.drop("UNSIGNED".length).trim)
        else (typeDecl, afterType0)
      val (sqlT, arrowT) = greptimeTypeName(typeFull) match {
        case "String" => ("STRING", "String")
        case "Int8" | "Int16" | "Int32" | "Int64" => ("BIGINT", "Int64")
        case "UInt8" | "UInt16" | "UInt32" | "UInt64" =>
          ("BIGINT UNSIGNED", "UInt64")
        case "Float32" | "Float64" => ("DOUBLE", "Float64")
        case "Boolean" => ("BOOLEAN", "Boolean")
        case _ => bad("unsupported JSON2 type hint data type: " +
          typeFull.toUpperCase(Locale.ROOT))
      }
      val up = afterType.toUpperCase(Locale.ROOT)
      val nullable = !up.contains("NOT NULL")
      val dflt = DefaultRx.findFirstMatchIn(afterType).map(_.group(1))
      dflt.foreach { d =>
        if (!d.matches("(?i)'(?:[^']|'')*'|[+-]?\\d+(\\.\\d+)?([eE][+-]?\\d+)?|TRUE|FALSE|NULL"))
          bad("JSON2 type hint DEFAULT only supports literal values")
        if (d.equalsIgnoreCase("NULL") && !nullable)
          bad(s"invalid DEFAULT for JSON2 type hint '${path.mkString(".")}': " +
            "Default value should not be null for non null column")
      }
      seen.foreach { p =>
        if (p == path)
          bad(s"duplicated JSON2 type hint path '${path.mkString(".")}'")
        if (p.startsWith(path) || path.startsWith(p))
          bad(s"JSON2 type hint path '${path.mkString(".")}' conflicts with " +
            s"'${p.mkString(".")}'")
      }
      seen :+= path
      hints += J2Hint(path, sqlT, arrowT, nullable,
        dflt.filterNot(_.equalsIgnoreCase("NULL")))
    }
    hints.result()
  }

  /** Wire form handed to the __json2_hint UDF: JSON array of hint
    * objects with the DEFAULT literal folded to a JSON value. */
  private def j2HintSpecJson(hints: Vector[J2Hint]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = m.createArrayNode()
    hints.foreach { h =>
      val o = arr.addObject()
      val p = o.putArray("path")
      h.path.foreach(p.add)
      o.put("type", h.arrowType)
      o.put("nullable", h.nullable)
      h.default.foreach { d =>
        if (d.startsWith("'"))
          o.put("default", d.stripPrefix("'").stripSuffix("'").replace("''", "'"))
        else if (d.equalsIgnoreCase("TRUE")) o.put("default", true)
        else if (d.equalsIgnoreCase("FALSE")) o.put("default", false)
        else if (h.arrowType == "Float64") o.put("default", d.toDouble)
        else if (h.arrowType == "Int64" || h.arrowType == "UInt64")
          o.put("default", d.toLong)
        else o.put("default", d)
      }
    }
    arr.toString
  }

  private val AlterHeadRx =
    "(?is)ALTER\\s+TABLE\\s+(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s+(.*)".r

  /** ALTER TABLE (sql/src/statements/alter.rs `AlterTableOperation`):
    * ADD COLUMN [IF NOT EXISTS] (multi, comma-chained) with DEFAULT /
    * PRIMARY KEY / FIRST / AFTER placement, DROP COLUMN, MODIFY COLUMN
    * type change, RENAME, SET/UNSET table options. Index DDL (SET
    * INVERTED/FULLTEXT/SKIPPING INDEX) is a performance hint — accepted
    * as a no-op. */
  private def alterTable(stmt: String): DataFrame = stmt match {
    case AlterHeadRx(rawName, tail0) =>
      val name = unquote(rawName)
      val spec = catalog.spec(name)
      val tail = tail0.trim
      val up = tail.toUpperCase(Locale.ROOT)
      if (up.matches("(?s)^ADD\\s+COLUMN\\b.*")) {
        // the metric engine forbids structural alters on physical tables
        // (alter/alter_physical_table.result)
        if (metricPhy.contains(name))
          throw new IllegalArgumentException(
            "Alter request to physical region is forbidden")
        // comma-chained clauses: ADD COLUMN a ..., ADD COLUMN b ...
        splitTop(tail).foreach { clause =>
          val body = clause.trim.replaceAll("(?is)^ADD\\s+COLUMN\\s+", "")
          alterAddColumn(name, body)
        }
        // a logical metric table keeps alphabetical column order and
        // propagates new tags onto the physical table
        logicalParent.get(name).foreach { phyName =>
          colMeta.get(name).foreach(m => colMeta.put(name, m.sortBy(_.name)))
          val mySpec = catalog.spec(name)
          catalog.register(mySpec.copy(tags = mySpec.tags.sorted))
          val phySpec = catalog.spec(phyName)
          val newTags = mySpec.tags.filterNot(phySpec.tags.contains)
            .filterNot(t => colMeta.getOrElse(phyName, Vector.empty).exists(_.name == t))
          if (newTags.nonEmpty) {
            colMeta.put(phyName, colMeta.getOrElse(phyName, Vector.empty) ++
              newTags.map(t => ColMeta(t, "String", nullable = true, None)))
            catalog.register(phySpec.copy(tags = (phySpec.tags ++ newTags).distinct))
            metricPhy.get(phyName).foreach(_.addedTags ++= newTags)
          }
          refreshView(name)
        }
      } else if (up.matches("(?s)^DROP\\s+COLUMN\\b.*")) {
        val colName = unquote(tail.split("\\s+").last)
        if (metricPhy.contains(name))
          throw new IllegalArgumentException(
            s"Not allowed to remove index column $colName from table $name")
        droppedCols.put(name, droppedCols.getOrElse(name, Set.empty) + colName)
        colMeta.get(name).foreach(m =>
          colMeta.put(name, m.filterNot(_.name == colName)))
      } else if (up.matches("(?s)^(MODIFY|CHANGE)\\s+COLUMN\\b.*")) {
        // comma-chained clauses each carry their own column + action
        splitTop(tail).foreach { clause =>
          val body = clause.trim.replaceAll("(?is)^(MODIFY|CHANGE)\\s+COLUMN\\s+", "").trim
          val bodyUp = body.toUpperCase(Locale.ROOT)
          val colName = unquote(body.takeWhile(!_.isWhitespace))
          if (bodyUp.contains("UNSET") && bodyUp.contains("INDEX")) {
            colMeta.get(name).foreach(m => colMeta.put(name,
              m.map(c => if (c.name == colName) c.copy(indexDecl = None) else c)))
          } else if (bodyUp.contains("SET") && bodyUp.contains("INDEX")) {
            // SET FULLTEXT/SKIPPING/INVERTED INDEX [WITH(...)]
            // (alter/change_col_fulltext_options.result)
            colMeta.get(name).foreach(m => colMeta.put(name,
              m.map(c => if (c.name == colName) c.copy(indexDecl = indexDeclOf(body)) else c)))
          } else if (bodyUp.contains("SET DEFAULT")) {
            val d = body.replaceAll("(?is).*?SET\\s+DEFAULT\\s+", "").trim
            colMeta.get(name).foreach(m => colMeta.put(name,
              m.map(c => if (c.name == colName) c.copy(default = Some(d)) else c)))
          } else if (bodyUp.contains("DROP DEFAULT")) {
            colMeta.get(name).foreach(m => colMeta.put(name,
              m.map(c => if (c.name == colName) c.copy(default = None) else c)))
            // the resolved-at-DDL-time copy must go too, or DEFAULT
            // keywords keep resolving to the dropped value
            // (alter_table_alter_column_drop_default.result)
            colDefaultResolved.put(name,
              colDefaultResolved.getOrElse(name, Map.empty) - colName)
          } else if (bodyUp.contains("INDEX")) {
            // bare index hints: no-op
          } else {
            // MODIFY COLUMN <name> <type>: cast in the read view.
            // Rejections mirror alter/change_col_type.result: a quoted
            // name is case-sensitive; key columns can't change type;
            // the cast must be expressible.
            val rawTok = body.takeWhile(!_.isWhitespace)
            val schemaCols = spark.table(name).schema.fields
            val exact = schemaCols.exists(_.name == colName)
            val ci = schemaCols.find(_.name.equalsIgnoreCase(colName))
            if ((rawTok.startsWith("\"") && !exact) || ci.isEmpty)
              throw new IllegalArgumentException(
                s"Column $colName not exists in table $name")
            if (spec.tags.contains(ci.get.name))
              throw new IllegalArgumentException(
                s"Not allowed to change primary key index column '${ci.get.name}'")
            if (ci.get.name == spec.timeIndex)
              throw new IllegalArgumentException(
                s"Not allowed to change timestamp index column '${ci.get.name}' datatype")
            // NOT NULL columns reject type changes
            // (alter/change_col_type_not_null.result)
            if (colMeta.getOrElse(name, Vector.empty)
                .find(_.name == ci.get.name).exists(!_.nullable))
              throw new IllegalArgumentException(
                s"Invalid alter table($name) request: column '${ci.get.name}' " +
                  "must be nullable to ensure safe conversion.")
            val typeTok = body.drop(rawTok.length)
              .trim.takeWhile(!_.isWhitespace)
            if (typeTok.toUpperCase(Locale.ROOT).startsWith("INTERVAL"))
              throw new IllegalArgumentException("interval columns are not supported")
            val t = sparkType(typeTok)
            if (!org.apache.spark.sql.catalyst.expressions.Cast.canCast(ci.get.dataType, t))
              throw new IllegalArgumentException(
                s"column '${ci.get.name}' cannot be cast automatically to type '$typeTok'")
            // Per-write-time type semantics (mito keeps each SST's
            // schema; alter_table.result: a float 0.1 written before
            // `MODIFY i BOOLEAN` then `MODIFY i INTEGER` reads 0, and
            // `MODIFY i STRING` reads back "0.1"). Storage widens to
            // STRING once; every row casts original-type -> current at
            // read, selected by its write sequence.
            val cn = ci.get.name
            val oldG = colMeta.getOrElse(name, Vector.empty)
              .find(_.name == cn).map(_.gtype)
              .getOrElse(greptimeNameOf(ci.get.dataType))
            val newG = greptimeTypeName(typeTok)
            if (oldG != newG) {
              if (!typeHistory.getOrElse(name, Map.empty).contains(cn))
                migrateParquet(spec)(df =>
                  df.withColumn(cn, col(s"`$cn`").cast("string")))
              val hist = typeHistory.getOrElse(name, Map.empty)
              typeHistory.put(name, hist +
                (cn -> (hist.getOrElse(cn, Vector.empty) :+
                  ((seqCounter.get(), oldG)))))
              // the declared default converts through the cast chain
              // (DESC pins 0.1 -> BOOLEAN -> INTEGER as 1)
              val newDefault = colMeta.getOrElse(name, Vector.empty)
                .find(_.name == cn).flatMap(_.default).flatMap { d =>
                  try {
                    val v = spark.sql(
                      s"SELECT CAST(CAST($d AS ${showCreateType(oldG)}) AS " +
                        s"${showCreateType(newG)})").first().get(0)
                    Option(v).map(_.toString)
                  } catch { case _: Exception => Some(d) }
                }
              colMeta.get(name).foreach(m => colMeta.put(name, m.map(c =>
                if (c.name == cn) c.copy(gtype = newG, default = newDefault) else c)))
              colCasts.put(name, colCasts.getOrElse(name, Map.empty) - cn)
            }
          }
        }
      } else if (up.startsWith("RENAME")) {
        val rawNew = tail.substring("RENAME".length).trim
          .replaceFirst("(?i)^TO\\s+", "")
        val newName = normIdent(rawNew.stripPrefix("'").stripSuffix("'"))
        // the reference validates rename targets (alter/rename_table.result)
        if (!newName.matches("[A-Za-z_][A-Za-z0-9_]*"))
          throw new IllegalArgumentException(s"Invalid table name: $newName")
        if (catalog.tables.contains(newName))
          throw new IllegalArgumentException(s"table $newName already exists")
        catalog.deregister(name)
        catalog.register(spec.copy(name = newName))
        colMeta.remove(name).foreach(colMeta.put(newName, _))
        droppedCols.remove(name).foreach(droppedCols.put(newName, _))
        backfills.remove(name).foreach(backfills.put(newName, _))
        colCasts.remove(name).foreach(colCasts.put(newName, _))
        colDefaultResolved.remove(name).foreach(colDefaultResolved.put(newName, _))
        tsLiteralUs.remove(name).foreach(tsLiteralUs.put(newName, _))
        spark.catalog.dropTempView(name)
        refreshView(newName)
        return status(s"table $name renamed to $newName")
      } else if (up.startsWith("SET")) {
        // table options; ttl / append_mode / merge_mode affect queries,
        // storage tuning options are accepted as no-ops; option keys may
        // be quoted ('ttl') or bare (ttl) — ttl/alter_table_ttl uses both
        val kv = "(?is)'?([A-Za-z_][A-Za-z0-9_.]*)'?\\s*=\\s*(?:'([^']*)'|NULL)".r
        kv.findAllMatchIn(tail).foreach { m =>
          val v = Option(m.group(2)).filter(_.nonEmpty)
          val key = m.group(1).toLowerCase(Locale.ROOT)
          key match {
            case "ttl" =>
              val ms = v.flatMap {
                case "instant" => Some(0L)
                case "forever" => None
                case x => Some(parseTtlMs(x))
              }
              catalog.register(catalog.spec(name).copy(ttlMillis = ms))
              // a physical table's ttl governs its logical children
              // (ttl/metric_engine_ttl.result)
              metricPhy.get(name).foreach(_.children.foreach { c =>
                if (catalog.tables.contains(c)) {
                  catalog.register(catalog.spec(c).copy(ttlMillis = ms))
                  refreshView(c)
                }
              })
            case "append_mode" =>
              val toAppend = v.contains("true")
              val cur = catalog.spec(name)
              // append mode can be turned ON, never OFF
              // (alter/alter_append_mode.result)
              if (!toAppend && cur.mergeMode == MergeMode.Append)
                throw new IllegalArgumentException(
                  "Invalid request to alter table: append mode cannot be disabled")
              if (toAppend && cur.mergeMode != MergeMode.Append) {
                // the merged history compacts physically before append
                // semantics begin: pre-alter duplicates stay merged
                if (cur.mergeMode == MergeMode.LastRow)
                  migrateParquet(cur)(Catalog.dedupLastRow(_, cur))
                else migrateParquet(cur)(Catalog.dedupLastNonNull(_, cur))
                // append tables carry no merge_mode option
                tableOpts.put(name,
                  tableOpts.getOrElse(name, Nil).filterNot(_._1 == "merge_mode"))
              }
              catalog.register(cur.copy(
                mergeMode = if (toAppend) MergeMode.Append else MergeMode.LastRow))
            case "merge_mode" =>
              v.foreach(x => catalog.register(catalog.spec(name).copy(mergeMode = MergeMode.parse(x))))
            case "skip_wal" =>
              // skip_wal can only be enabled; disabling errors
              // (common/skip_wal.result)
              if (!v.contains("true"))
                throw new IllegalArgumentException(
                  "Invalid set table option request: Invalid set region " +
                    s"option request, key: skip_wal, value: ${v.getOrElse("")}")
              // rows written while the WAL was on stay restart-durable
              durableSeq.put(name, seqCounter.get())
            case _ => ()
          }
          val stored =
            if (key == "ttl" && v.isEmpty) Seq(key -> "forever") // SET ttl=NULL
            else v.map(key -> _).toSeq
          tableOpts.put(name, tableOpts.getOrElse(name, Nil)
            .filterNot(_._1 == key) ++ stored)
          // any compaction.twcs.* option implies the twcs strategy
          // (alter_table_options.result renders compaction.type = 'twcs')
          if (key.startsWith("compaction.twcs.") &&
            !tableOpts.getOrElse(name, Nil).exists(_._1 == "compaction.type"))
            tableOpts.put(name,
              tableOpts.getOrElse(name, Nil) :+ ("compaction.type" -> "twcs"))
        }
      } else if (up.startsWith("UNSET")) {
        "'([^']*)'".r.findFirstMatchIn(tail).foreach { m =>
          val key = m.group(1).toLowerCase(Locale.ROOT)
          if (key == "skip_wal")
            throw new IllegalArgumentException(
              "Invalid unset table option request: Invalid set region " +
                "option request, key: skip_wal")
          if (key == "ttl") catalog.register(spec.copy(ttlMillis = None))
          tableOpts.put(name, tableOpts.getOrElse(name, Nil).filterNot(_._1 == key))
        }
      } else throw new IllegalArgumentException(s"cannot parse: $stmt")
      refreshView(name)
      status(s"table $name altered")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  /** Invalidate Spark's cached file listing for a table path after any
    * physical write. Without this, a plan resolved before an in-place
    * rewrite reads the OLD file names through the cached
    * InMemoryFileIndex and dies with FAILED_READ_FILE.FILE_NOT_EXIST —
    * a benign retry at sandbox scale, a correctness race with
    * concurrent readers at cluster scale. */
  private[graft] def refreshPath(path: String): Unit =
    try spark.catalog.refreshByPath(path)
    catch { case _: Throwable => () }

  /** One-off physical rewrite of a table's Parquet (type migration /
    * dropped-column purge). DDL-time only — reads stay lazy; the
    * reference migrates lazily per-file, which Parquet mergeSchema
    * cannot express for type changes. */
  private def migrateParquet(spec: TableSpec)(f: DataFrame => DataFrame): Unit = {
    val out = f(spark.read.option("mergeSchema", "true").parquet(spec.path))
    val tmp = spec.path + "__mig_tmp"
    out.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(spec.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(spec.path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(spec.path))
    refreshPath(spec.path)
  }

  private def alterAddColumn(name: String, body0: String): Unit = {
    val spec = catalog.spec(name)
    val ifNotExists = "(?is)^IF\\s+NOT\\s+EXISTS\\s+".r.findFirstIn(body0).isDefined
    var body = body0.replaceAll("(?is)^IF\\s+NOT\\s+EXISTS\\s+", "").trim
    // placement: FIRST | AFTER <col> (alter.rs AddColumnLocation)
    val afterRx = "(?is)\\s+AFTER\\s+([A-Za-z_\"`][A-Za-z0-9_\"`]*)\\s*$".r
    val after = afterRx.findFirstMatchIn(body).map(m => unquote(m.group(1)))
    body = afterRx.replaceAllIn(body, "")
    val first = "(?is)\\s+FIRST\\s*$".r.findFirstIn(body).isDefined
    body = body.replaceAll("(?is)\\s+FIRST\\s*$", "")
    val cd = parseColumnDef(body)
    // a NOT NULL column without a default cannot be added to an existing
    // table (alter/add_incorrect_col.result) — and must leave NO side
    // effects behind
    if (!cd.nullable && cd.default.isEmpty)
      throw new IllegalArgumentException(
        s"Invalid column option, column name: ${cd.name}, " +
          "error: no default value can be built for NOT NULL column")
    // interval columns are rejected (reference issue #5422)
    if (cd.typeTok.toUpperCase(Locale.ROOT).startsWith("INTERVAL"))
      throw new IllegalArgumentException("interval columns are not supported")
    // reject trailing junk (reference: `ADD COLUMN x int xxx` errors and
    // the table stays unchanged — add_incorrect_col.result)
    val leftovers = body.split("\\s+").drop(2).mkString(" ")
      .toUpperCase(Locale.ROOT)
      .replaceAll("DEFAULT\\s+('[^']*'|[A-Za-z_][A-Za-z0-9_]*\\s*\\([^)]*\\)|-?[A-Za-z0-9_.+-]+)", "")
      .replaceAll("NOT\\s+NULL|NULL|TIME\\s+INDEX|PRIMARY\\s+KEY", "")
      .replaceAll("(FULLTEXT|INVERTED|SKIPPING)?\\s*INDEX(\\s*WITH\\s*\\([^)]*\\))?", "")
      .trim
    if (leftovers.nonEmpty)
      throw new IllegalArgumentException(s"cannot parse column def: $body")
    val metas = colMeta.getOrElse(name, Vector.empty)
    if (metas.exists(_.name == cd.name) &&
      !droppedCols.getOrElse(name, Set.empty).contains(cd.name)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(s"column ${cd.name} already exists")
    }
    val t = sparkType(cd.typeTok)
    // a quoted name that collides case-insensitively with an existing
    // column ("IdC" vs idc, alter/add_col.sql) cannot share a parquet
    // file under Spark's case-insensitive resolution — keep it as a
    // SHADOW column: declared metadata + default-valued in the view
    if (metas.exists(m => m.name.equalsIgnoreCase(cd.name) && m.name != cd.name)) {
      shadowCols.put(name, shadowCols.getOrElse(name, Vector.empty) :+
        ((cd.name, cd.default, cd.typeTok)))
      colMeta.put(name, metas :+
        ColMeta(cd.name, greptimeTypeName(cd.typeTok), cd.nullable, cd.default))
      if (cd.isPrimaryKey)
        catalog.register(spec.copy(tags = spec.tags :+ cd.name))
      refreshView(name)
      return
    }
    val existing = spark.read.option("mergeSchema", "true").parquet(spec.path).schema
    if (!existing.fieldNames.contains(cd.name)) {
      val widened = StructType(existing :+ StructField(cd.name, t, cd.nullable))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
        .write.mode("append").parquet(spec.path)
      refreshPath(spec.path)
    } else if (droppedCols.getOrElse(name, Set.empty).contains(cd.name)) {
      // re-ADD of a DROPped column: the old values are gone in the
      // reference; purge them so only the new default shows
      // (alter/drop_add_col.result)
      migrateParquet(spec)(df =>
        df.withColumn(cd.name, lit(null).cast(t)))
    }
    droppedCols.put(name, droppedCols.getOrElse(name, Set.empty) - cd.name)
    val meta = ColMeta(cd.name, greptimeTypeName(cd.typeTok), cd.nullable, cd.default)
    val withoutOld = metas.filterNot(_.name == cd.name)
    val placed =
      if (first) meta +: withoutOld
      else after match {
        case Some(a) =>
          val i = withoutOld.indexWhere(_.name == a)
          if (i < 0) withoutOld :+ meta
          else (withoutOld.take(i + 1) :+ meta) ++ withoutOld.drop(i + 1)
        case None => withoutOld :+ meta
      }
    colMeta.put(name, placed)
    if (cd.isPrimaryKey)
      catalog.register(spec.copy(tags = spec.tags :+ cd.name))
    // rows written before this ALTER read the column default (reference
    // add_col_default.result): gate on the ingest sequence. Timestamp
    // string defaults resolve against the session tz NOW, not at read.
    cd.default.foreach { d =>
      val resolved = resolveTsDefault(meta.gtype, d)
      if (resolved != d)
        colDefaultResolved.put(name,
          colDefaultResolved.getOrElse(name, Map.empty) + (cd.name -> resolved))
      backfills.put(name, backfills.getOrElse(name, Vector.empty) :+
        ((cd.name, resolved, seqCounter.incrementAndGet())))
    }
  }

  /** DROP TABLE [IF EXISTS] t1[, t2...]: without IF EXISTS every named
    * table must exist BEFORE anything is dropped (drop/drop_table.result:
    * `DROP TABLE foo, bar` with bar missing errors and foo survives). */
  private def dropTable(stmt: String): DataFrame = {
    val ifExists = "(?i)\\bIF\\s+EXISTS\\b".r.findFirstIn(stmt).isDefined
    val body = stmt.replaceAll("(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?", "")
    val names = body.split(",").map(_.trim).filter(_.nonEmpty).map(normTable)
    val known = catalog.tables.toSet
    if (!ifExists) names.find(n => !known.contains(n)).foreach { missing =>
      throw new IllegalArgumentException(
        s"Table not found: greptime.$currentDb.${missing.replace("__schema__", ".")}")
    }
    names.foreach(dropOneTable)
    status(s"table ${names.mkString(", ")} dropped")
  }

  private def dropOneTable(name: String): Unit = {
    // a physical metric region refuses to drop while logical tables
    // still use it (create_metric_table.result)
    metricPhy.get(name).foreach { ps =>
      if (ps.childIds.nonEmpty)
        throw new IllegalArgumentException(
          "Physical region is busy, there are still some logical regions using it")
      metricPhy.remove(name)
    }
    val parentPhy = logicalParent.remove(name)
    parentPhy.foreach { phy =>
      // the physical region OWNS the rows — materialize this logical
      // table's contribution into the phy's own dir before the route
      // (and the child's parquet) disappears
      // (insert/logical_metric_table.result keeps the rows)
      metricPhy.get(phy).foreach { ps =>
        ps.childIds.get(name).foreach { tid =>
          if (catalog.tables.contains(name) &&
              scala.util.Try(catalog.spec(phy)).isSuccess) {
            val dest = catalog.spec(phy).path
            scala.util.Try(
              phyShapedRows(phy, name, tid)
                .write.mode("append").parquet(dest))
            refreshPath(dest)
          }
        }
        ps.childIds.remove(name)
      }
    }
    tableEngine.remove(name)
    partitionClause.remove(name)
    // flows bound to this incarnation stop refreshing (flow_rebuild)
    tableEpoch.put(name, tableEpoch.getOrElse(name, 0L) + 1L)
    spark.catalog.dropTempView(name)
    // a subsequent CREATE TABLE of the same name must start empty
    catalog.deregister(name).foreach { spec =>
      if (spec.path.startsWith(warehouse)) {
        val p = new org.apache.hadoop.fs.Path(spec.path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        refreshPath(spec.path)
      }
    }
    // a re-CREATE of the same name must not see stale column metadata
    // (alter/change_col_type: leftover MODIFY casts broke the new table)
    droppedCols.remove(name)
    colMeta.remove(name)
    colCasts.remove(name)
    j2Hints.remove(name)
    j2Boundaries.remove(name)
    shadowCols.remove(name)
    sstFiles.filterInPlace(_.table != name)
    sstFlushSeq.remove(name)
    colDefaultResolved.remove(name)
    backfills.remove(name)
    tsLiteralUs.remove(name)
    tableOpts.remove(name)
    // a logical metric table's physical view unions its children's
    // files — rebuild AFTER this table's parquet is gone so a later
    // scan doesn't chase deleted part files
    // (insert/logical_metric_table's FAILED_READ_FILE race)
    parentPhy.foreach(phy => scala.util.Try(refreshMetricPhyView(phy)))
  }

  /** MySQL/Postgres-compatible session SET forms the reference accepts
    * (system/{max_execution_time,set_unsupported,pg_catalog}.sql):
    * `SET [SESSION|LOCAL|GLOBAL] [@@][scope.]var = v`, `SET NAMES x`,
    * `SET search_path TO x`. Time zone variants apply to the session;
    * everything else is accepted as a no-op like the reference. */
  /** session variables readable via `@@name` / helper functions */
  /** Session time zone as SET (may exceed Java's ±18h fixed-offset cap). */
  private var sessionTz: String = "UTC"

  /** Offset of the session tz at epoch, ms east of UTC — the RANGE
    * default ALIGN origin (reference aligns '1d' buckets to local
    * calendar midnight; range/to.result). */
  private def tzOffsetOf(tz: String): Long = {
    val fixed = "([+-])(\\d{1,2}):(\\d{2})".r
    tz match {
      case fixed(sg, h, m) =>
        (if (sg == "-") -1L else 1L) * (h.toLong * 3600000L + m.toLong * 60000L)
      case z =>
        try java.time.ZoneId.of(z).getRules
          .getOffset(java.time.Instant.EPOCH).getTotalSeconds * 1000L
        catch { case _: Exception => 0L }
    }
  }

  private def sessionTzOffsetMs: Long = tzOffsetOf(sessionTz)

  private val sessionVars = scala.collection.mutable.Map[String, String](
    "max_execution_time" -> "0", "read_preference" -> "leader",
    "tx_isolation" -> "REPEATABLE-READ",
    "transaction_isolation" -> "REPEATABLE-READ",
    "version_comment" -> "GreptimeDB")
  /** warnings from the previous statement only (SHOW WARNINGS contract) */
  private[graft] var lastWarnings: Seq[(String, Int, String)] = Nil

  private def setSession(stmt: String): DataFrame = {
    val body = stmt.trim.replaceFirst("(?is)^SET\\s+", "")
      .replaceFirst("(?is)^(SESSION|LOCAL|GLOBAL)\\s+", "")
    val up = body.toUpperCase(Locale.ROOT)
    if (up.startsWith("NAMES")) return status("names set")
    if (up.startsWith("SEARCH_PATH")) return status("search_path set")
    val kv = "(?is)@{0,2}([A-Za-z_][A-Za-z0-9_.]*)\\s*(?:=|\\bTO\\b)\\s*(.+)".r
    body match {
      case kv(rawKey, rawVal) =>
        val key = rawKey.toLowerCase(Locale.ROOT).replaceFirst("^(session|local|global)\\.", "")
        val v = rawVal.trim.stripPrefix("'").stripSuffix("'")
        key match {
          case "time_zone" | "timezone" =>
            // offsets normalize to ±HH:MM (system/timezone.result echoes
            // '+8:00' back as '+08:00'; Java also requires the padded form)
            sessionTz = "([+-])(\\d{1,2}):(\\d{2})".r.findFirstMatchIn(v.trim)
              .filter(_.matched == v.trim)
              .map(m => f"${m.group(1)}${m.group(2).toInt}%02d:${m.group(3)}")
              .getOrElse(v)
            // Java zones cap fixed offsets at ±18h; the reference accepts
            // up to ±23:59 (range/to.result '+23:00') — keep our own copy
            // for RANGE align-origin math and set Spark's when legal
            try spark.conf.set("spark.sql.session.timeZone", sessionTz)
            catch { case _: Exception => () }
            // date_format applies only the RESIDUAL offset Spark's own
            // LTZ→local conversion doesn't already cover
            tzOffsetRef.set(sessionTzOffsetMs -
              tzOffsetOf(spark.conf.get("spark.sql.session.timeZone")))
          case "read_preference" =>
            if (!Set("leader", "follower").contains(v.toLowerCase(Locale.ROOT)))
              throw new IllegalArgumentException(
                s"Invalid read preference expr $v in set variable statement")
            sessionVars(key) = v
          case "max_execution_time" => sessionVars(key) = v
          case "autocommit" | "sql_mode" | "wait_timeout" | "net_write_timeout" |
               "interactive_timeout" => () // accepted silently (MySQL compat)
          case other =>
            sessionVars(other) = v
            lastWarnings = Seq(("Warning", 1000,
              s"Unsupported set variable ${other.toUpperCase(Locale.ROOT)}"))
        }
        status(s"$key set")
      case _ => throw new IllegalArgumentException(s"cannot parse SET: $stmt")
    }
  }

  // ---- semantic entity graph (greptime_private.*, read-only) ---------

  /** Entities derived at read time (system/semantic_graph.sql): declared
    * via 'greptime.semantic.entity.<type>.{id,scope,descriptive}' table
    * options, plus implicit `service` entities from trace-model tables.
    * Only rows inside the one-hour derivation window contribute. */
  private def semanticEntitiesDf(): DataFrame = {
    import spark.implicits._
    val winStart = System.currentTimeMillis() - 3600000L
    val empty = Seq.empty[(java.sql.Timestamp, String, String, String,
      String, String, String)]
      .toDF("observed_at", "entity_type", "entity_id", "entity_id_attrs",
        "scope", "descriptive", "source_tables")
    val parts = catalog.tables.toSeq.sorted.flatMap { t =>
      val opts = tableOpts.getOrElse(t, Seq.empty).toMap
      val spec = catalog.spec(t)
      def recent = spark.table(t).filter(
        col(s"`${spec.timeIndex}`").cast("timestamp") >=
          timestamp_millis(lit(winStart)))
      val srcJson = s"""["public.$t"]"""
      val declared = opts.keys
        .collect { case k if k.startsWith("greptime.semantic.entity.") =>
          k.stripPrefix("greptime.semantic.entity.").split("\\.", 2)(0) }
        .toSeq.distinct.map { etype =>
        val p = s"greptime.semantic.entity.$etype"
        val idCols = opts(s"$p.id").split(",").map(_.trim).toSeq
        val scopeCol = opts.get(s"$p.scope")
        val descCols = opts.get(s"$p.descriptive")
          .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
        val selCols = (idCols ++ scopeCol ++ descCols).distinct
        val ids = idCols.sorted
        val idExpr =
          if (ids.length == 1) col(s"`${ids.head}`").cast("string")
          else concat_ws(",", ids.map(c =>
            concat(lit(c + "="), col(s"`$c`").cast("string"))): _*)
        val attrsExpr =
          if (ids.length == 1) lit(null).cast("string")
          else concat(lit("{"), concat_ws(",", ids.map(c =>
            concat(lit(s""""$c":""""), col(s"`$c`").cast("string"),
              lit("\""))): _*), lit("}"))
        val descExpr =
          if (descCols.isEmpty) lit(null).cast("string")
          else concat(lit("{"), concat_ws(",", descCols.sorted.map(c =>
            concat(lit(s""""$c":""""), col(s"`$c`").cast("string"),
              lit("\""))): _*), lit("}"))
        recent.select(selCols.map(c => col(s"`$c`")): _*).distinct()
          .select(
            timestamp_millis(lit(winStart + 3600000L)).as("observed_at"),
            lit(etype).as("entity_type"),
            idExpr.as("entity_id"),
            attrsExpr.as("entity_id_attrs"),
            scopeCol.map(c => col(s"`$c`").cast("string"))
              .getOrElse(lit(null).cast("string")).as("scope"),
            descExpr.as("descriptive"),
            lit(srcJson).as("source_tables"))
      }
      val trace =
        if (opts.get("table_data_model").contains("greptime_trace_v1") &&
            spark.table(t).columns.contains("service_name"))
          Seq(recent.select(col("service_name")).distinct()
            .select(
              timestamp_millis(lit(winStart + 3600000L)).as("observed_at"),
              lit("service").as("entity_type"),
              col("service_name").cast("string").as("entity_id"),
              lit(null).cast("string").as("entity_id_attrs"),
              lit(null).cast("string").as("scope"),
              lit(null).cast("string").as("descriptive"),
              lit(srcJson).as("source_tables")))
        else Nil
      declared ++ trace
    }
    parts.foldLeft(empty)(_ unionByName _)
  }

  /** service→service `calls` relationships from trace-model tables:
    * client/server span pairs joined on (trace_id, parent_span_id),
    * aggregated per service pair inside the derivation window. */
  private def semanticRelationshipsDf(): DataFrame = {
    import spark.implicits._
    val winStart = System.currentTimeMillis() - 3600000L
    val empty = Seq.empty[(java.sql.Timestamp, String, String, String,
      String, String, String, Double, Long, Long, Double, Long, String)]
      .toDF("observed_at", "src_type", "src_id", "dst_type", "dst_id",
        "rel_type", "provenance", "confidence", "request_count",
        "error_count", "duration_sum", "duration_count", "attributes")
    val parts = catalog.tables.toSeq.sorted.flatMap { t =>
      val opts = tableOpts.getOrElse(t, Seq.empty).toMap
      if (!opts.get("table_data_model").contains("greptime_trace_v1")) Nil
      else {
        val spec = catalog.spec(t)
        val df = spark.table(t).filter(
          col(s"`${spec.timeIndex}`").cast("timestamp") >=
            timestamp_millis(lit(winStart)))
        val client = df.filter(col("span_kind") === "SPAN_KIND_CLIENT")
          .select(col("trace_id").as("c_trace"), col("span_id").as("c_span"),
            col("service_name").as("src_id"))
        val server = df.filter(col("span_kind") === "SPAN_KIND_SERVER")
          .select(col("trace_id").as("s_trace"),
            col("parent_span_id").as("s_parent"),
            col("service_name").as("dst_id"),
            col("span_status_code").as("s_status"),
            col("duration_nano").cast("double").as("s_dur"))
        Seq(client.join(server,
            col("c_trace") === col("s_trace") && col("c_span") === col("s_parent"))
          .groupBy(col("src_id"), col("dst_id"))
          .agg(count(lit(1)).as("request_count"),
            sum(when(col("s_status") === "STATUS_CODE_ERROR", 1L)
              .otherwise(0L)).as("error_count"),
            (sum(col("s_dur")) / 1e9).as("duration_sum"),
            count(lit(1)).as("duration_count"))
          .select(
            timestamp_millis(lit(winStart + 3600000L)).as("observed_at"),
            lit("service").as("src_type"), col("src_id"),
            lit("service").as("dst_type"), col("dst_id"),
            lit("calls").as("rel_type"), lit("trace").as("provenance"),
            lit(1.0).as("confidence"), col("request_count"),
            col("error_count"), col("duration_sum"), col("duration_count"),
            lit(null).cast("string").as("attributes")))
      }
    }
    parts.foldLeft(empty)(_ unionByName _)
  }

  // ---- pg_catalog emulation (system/pg_catalog.sql) -------------------

  /** Stable pg-style oids, rebuilt by [[refreshPgCatalog]]. */
  private val pgOids = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def pgOidOf(t: String): Long = pgOids.getOrElse(t, 0L)

  /** pg type oid for a ColMeta gtype (the public PostgreSQL oids). */
  private def pgTypeOid(g: String): Long = g match {
    case "Boolean" => 16L
    case "Binary" => 17L
    case "Int64" | "UInt64" => 20L
    case "Int16" | "Int8" | "UInt16" | "UInt8" => 21L
    case "Int32" | "UInt32" => 23L
    case "Float32" => 700L
    case "Float64" => 701L
    case "Date" => 1082L
    case s if s.startsWith("Timestamp") || s == "DateTime" => 1114L
    case _ => 25L // text
  }

  private def refreshPgCatalog(): Unit = {
    import spark.implicits._
    // namespaces: the three built-ins plus every user database
    val userDbs = ((dbOpts.keySet ++ dbSaved.keySet) - "public")
      .toSeq.sorted.zipWithIndex.map { case (d, i) => d -> (16000L + i) }
    val ns = Seq(("greptime_private", 4200L), ("information_schema", 4201L),
      ("public", 2200L)) ++ userDbs
    ns.map { case (n, o) => (o, n, 10L, "", "") }
      .toDF("oid", "nspname", "nspowner", "nspacl", "options")
      .createOrReplaceTempView("__pg_namespace")
    val nsOid = ns.toMap
    // (db, bare name, meta table key) across the live catalog and the
    // saved databases; per-schema mangled names split back apart
    def split(t: String): (String, String) = t.split("__schema__", 2) match {
      case Array(d, b) => (d, b)
      case _ => (currentDb, t)
    }
    val live = catalog.tables.toSeq.sorted.map(t => (split(t)._1, split(t)._2, t))
    val saved = dbSaved.toSeq.filterNot(_._1 == currentDb).flatMap { case (db, st) =>
      st.specs.keys.toSeq.sorted.map(t => (db, t, t))
    }
    val all = (live ++ saved) :+ (("public", "numbers", "numbers"))
    pgOids.clear()
    all.zipWithIndex.foreach { case ((_, bare, _), i) =>
      pgOids.put(bare, 16384L + i) }
    all.map { case (db, bare, _) =>
      (pgOids(bare), bare, nsOid.getOrElse(db, 2200L),
        if (userViews.contains(bare)) "v" else "r", 10L)
    }.toDF("oid", "relname", "relnamespace", "relkind", "relowner")
      .createOrReplaceTempView("__pg_class")
    // pg_type: the stock PG catalog the reference embeds (PgTypeData,
    // pinned verbatim by system/pg_catalog.result). oid is numeric
    // (ORDER BY oid / joins on atttypid); the rest compare as text.
    locally {
      val tySchema = StructType(
        StructField("oid", LongType, nullable = false) +:
          PgTypeData.columns.drop(1).map(c => StructField(c, StringType)))
      val tyRows = PgTypeData.rows.map { line =>
        val cells = line.split("\\|", -1)
        org.apache.spark.sql.Row.fromSeq(
          cells(0).toLong +: cells.drop(1).toSeq)
      }
      spark.createDataFrame(
          spark.sparkContext.parallelize(tyRows, 1).toJavaRDD, tySchema)
        .createOrReplaceTempView("__pg_type")
    }
    // pg_database: the reference exposes no databases through it
    Seq.empty[(Long, String, Long, Int, String, String, String, Boolean,
      Boolean, Int, Long, Long, Long, Long, String, String, String)]
      .toDF("oid", "datname", "datdba", "encoding", "datlocprovider",
        "datcollate", "datctype", "datistemplate", "datallowconn",
        "datconnlimit", "datlastsysoid", "datfrozenxid", "datminmxid",
        "dattablespace", "daticulocale", "daticurules", "datacl")
      .createOrReplaceTempView("__pg_database")
    val attrRows = live.flatMap { case (_, bare, key) =>
      colMeta.getOrElse(key, Vector.empty).zipWithIndex.map { case (cm, i) =>
        (pgOids(bare), cm.name, pgTypeOid(cm.gtype), i + 1)
      }
    }
    attrRows.toDF("attrelid", "attname", "atttypid", "attnum")
      .createOrReplaceTempView("__pg_attribute")
  }


  /** Flushed SST files (information_schema/ssts.sql): one entry per
    * region that held unflushed rows at ADMIN FLUSH_TABLE time. */
  private case class SstEntry(table: String, tableId: Long, regionNo: Int,
      fileNo: Long, numRows: Long, minTsMs: Long, maxTsMs: Long,
      pkMin: String, pkMax: String, seq: Long)
  private val sstFiles = scala.collection.mutable.ListBuffer.empty[SstEntry]
  private val sstFlushSeq = scala.collection.concurrent.TrieMap.empty[String, Long]
  private var sstFileCounter = 0L

  /** mito's memcomparable primary-key encoding for an INT32 tag:
    * 0x01 not-null marker + sign-flipped big-endian u32 (pinned by
    * ssts.result: a=500 → 01800001f4). */
  private def pkEncode(v: Any): String = v match {
    case i: Int => f"01${i ^ 0x80000000}%08x"
    case l: Long => f"01${(l.toInt) ^ 0x80000000}%08x"
    case s: String => "01" + s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    case _ => ""
  }

  private def recordSstFlush(t: String): Unit = try {
    val spec = catalog.spec(t)
    val since = sstFlushSeq.getOrElse(t, 0L)
    val newRows = catalog.read(t).filter(col(SeqCol) > since)
    if (newRows.isEmpty) { return }
    val rules = partitionClause.get(t).map(_._2).getOrElse(Nil)
    val regions = if (rules.isEmpty) Seq((0, newRows))
      else rules.zipWithIndex.map { case (rule, i) => (i, newRows.filter(expr(rule))) }
    val tid = 1024L + catalog.tables.toSeq.sorted.indexOf(t)
    val pkCol = spec.tags.headOption
    regions.foreach { case (i, df) =>
      val rows = df.count()
      if (rows > 0) {
        val agg = df.agg(
          min(col(s"`${spec.timeIndex}`")).as("mn"),
          max(col(s"`${spec.timeIndex}`")).as("mx"))
          .head()
        def ms(v: Any): Long = v match {
          case ts: java.sql.Timestamp => ts.getTime
          case ldt: java.time.LocalDateTime =>
            ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          case l: Long => l
          case _ => 0L
        }
        val (pkMin, pkMax) = pkCol match {
          case Some(c) =>
            val r = df.agg(min(col(s"`$c`")), max(col(s"`$c`"))).head()
            (pkEncode(r.get(0)), pkEncode(r.get(1)))
          case None => ("", "")
        }
        sstFileCounter += 1
        sstFiles += SstEntry(t, tid, i, sstFileCounter, rows,
          ms(agg.get(0)), ms(agg.get(1)), pkMin, pkMax, sstFileCounter)
        // flush-time index build covers exactly the SST's own rows
        // (information_schema/ssts.result: the second flush's inverted
        // meta counts only the new increment's keys)
        val fileNo = sstFileCounter
        indexedColsOf(t).foreach { case (ci, kind, decl) =>
          addOneIndexEntry(t, fileNo, ci, kind, decl, df, rows)
        }
      }
    }
    sstFlushSeq.put(t, seqCounter.get())
  } catch { case _: Exception => () }

  /** Index blobs inside each flushed SST's puffin file — one entry per
    * (SST, indexed column). Created at flush for columns indexed at
    * flush time, and by ADMIN BUILD_INDEX for SSTs that predate the
    * index declaration (function/admin/build_index_table.sql). Sizes
    * are emulated with the reference backends' serialized layouts
    * (information_schema/ssts.result pins the meta_json cells):
    * bloom-family blobs are 64 bytes per 10240-row segment; inverted
    * blobs are null-bitmap(8) + one roaring bitmap per key (16+2·card)
    * + an FST sized 35 + 4·(trie edges of the memcomparable keys). */
  private case class SstIndexEntry(fileNo: Long, table: String, colIdx: Int,
      indexType: String, blobSize: Long, metaJson: String)
  private val sstIndexEntries =
    scala.collection.mutable.ListBuffer.empty[SstIndexEntry]

  /** (column position, physical index backend, declaration text) for
    * every indexed column of a table. */
  private def indexedColsOf(t: String): Seq[(Int, String, String)] =
    colMeta.getOrElse(t, Vector.empty).zipWithIndex.flatMap { case (cm, i) =>
      cm.indexDecl.toSeq.flatMap { d =>
        val du = d.toUpperCase(Locale.ROOT)
        val b = Seq.newBuilder[(Int, String, String)]
        if (du.contains("FULLTEXT"))
          b += ((i, if (du.contains("TANTIVY")) "fulltext_tantivy"
                    else "fulltext_bloom", d))
        if (du.contains("SKIPPING")) b += ((i, "bloom_filter", d))
        if (du.contains("INVERTED")) b += ((i, "inverted", d))
        b.result()
      }
    }

  /** Rows of one region's current contents (the flush emulation keeps
    * one SST per region, so a rebuild over "the SST's rows" reads the
    * region). */
  private def regionDf(t: String, regionNo: Int): DataFrame = {
    val df = catalog.read(t)
    partitionClause.get(t).map(_._2) match {
      case Some(rules) if rules.nonEmpty && regionNo < rules.size =>
        df.filter(expr(rules(regionNo)))
      case _ => df
    }
  }

  private def addOneIndexEntry(t: String, fileNo: Long, ci: Int,
      kind: String, decl: String, df: => DataFrame, rows: Long): Unit = {
    val cname = colMeta(t)(ci).name
    if (kind == "inverted") {
      // Σ(16 + 2·count) over groups = 16·ndv + 2·rows — computed
      // executor-side so a high-cardinality tag never lands on the
      // driver; only the FST prefix census needs values, and that
      // collect is CAPPED (exact below the cap — every corpus table is;
      // bounded estimate above it, introspection-only output)
      val grouped = df.groupBy(col(s"`$cname`")).count()
      val aggRow = grouped.agg(count(lit(1)), sum(col("count"))).head
      val ndv = aggRow.getLong(0)
      val total = if (aggRow.isNullAt(1)) 0L else aggRow.getLong(1)
      val fstOff = 8L + 16L * ndv + 2L * total
      val invertedStatCap = 10000
      val sampleKeys = grouped.select(col(s"`$cname`"))
        .limit(invertedStatCap).collect().map(r => pkEncode(r.get(0)))
      val prefixes = scala.collection.mutable.HashSet.empty[String]
      sampleKeys.foreach { k =>
        (2 to k.length by 2).foreach(e => prefixes += k.substring(0, e)) }
      val fst = 35L + 4L * prefixes.size
      val size = fst + fstOff
      sstIndexEntries += SstIndexEntry(fileNo, t, ci, kind, size,
        s"""{"inverted":{"base_offset":0,"bitmap_type":"Roaring","fst_size":$fst,""" +
          s""""inverted_index_size":$size,"null_bitmap_size":8,""" +
          s""""relative_fst_offset":$fstOff,"relative_null_bitmap_offset":0,""" +
          s""""segment_row_count":1024,"total_row_count":$rows}}""")
    } else {
      val segs = math.max(1L, (rows + 10239) / 10240)
      val bloom = s""""bloom":{"bloom_filter_size":${64 * segs},""" +
        s""""row_count":$rows,"rows_per_segment":10240,"segment_count":$segs}"""
      val meta =
        if (kind.startsWith("fulltext")) {
          val analyzer = "(?i)analyzer\\s*=\\s*'([^']+)'".r
            .findFirstMatchIn(decl).map(_.group(1)).getOrElse("English")
          val cs = "(?i)case_sensitive\\s*=\\s*'([^']+)'".r
            .findFirstMatchIn(decl).map(_.group(1)).getOrElse("false")
          s"""{$bloom,"fulltext":{"analyzer":"$analyzer","case_sensitive":$cs}}"""
        } else s"{$bloom}"
      sstIndexEntries += SstIndexEntry(fileNo, t, ci, kind, 64L * segs, meta)
    }
  }

  /** Flush-time index build: every column indexed at flush time gets a
    * blob in the new SSTs' puffin files. */
  private def addSstIndexEntries(t: String): Unit = {
    val idxCols = indexedColsOf(t)
    if (idxCols.isEmpty) return
    val covered = sstIndexEntries.filter(_.table == t)
      .map(e => (e.fileNo, e.colIdx)).toSet
    sstFiles.filter(_.table == t).foreach { e =>
      lazy val df = regionDf(t, e.regionNo)
      idxCols.filterNot(c => covered((e.fileNo, c._1))).foreach {
        case (ci, kind, decl) =>
          addOneIndexEntry(t, e.fileNo, ci, kind, decl, df, e.numRows)
      }
    }
  }

  /** DESC schemas of the storage-introspection info tables
    * (information_schema/{region_info,region_statistics,ssts}.result). */
  private val infoTableDescs: Map[String, Seq[(String, String, String)]] = Map(
    "pg_class" -> Seq(
      ("oid", "Int32", "NO"), ("relname", "String", "NO"),
      ("relnamespace", "Int32", "NO"), ("reltype", "Int32", "NO"),
      ("reloftype", "Int32", "YES"), ("relowner", "Int32", "NO"),
      ("relam", "Int32", "NO"), ("relfilenode", "Int32", "NO"),
      ("reltablespace", "Int32", "NO"), ("relpages", "Int32", "NO"),
      ("reltuples", "Float64", "NO"), ("relallvisible", "Int32", "NO"),
      ("reltoastrelid", "Int32", "NO"), ("relhasindex", "Boolean", "NO"),
      ("relisshared", "Boolean", "NO"), ("relpersistence", "String", "NO"),
      ("relkind", "String", "NO"), ("relnatts", "Int16", "NO"),
      ("relchecks", "Int16", "NO"), ("relhasrules", "Boolean", "NO"),
      ("relhastriggers", "Boolean", "NO"), ("relhassubclass", "Boolean", "NO"),
      ("relrowsecurity", "Boolean", "NO"),
      ("relforcerowsecurity", "Boolean", "NO"),
      ("relispopulated", "Boolean", "NO"), ("relreplident", "String", "NO"),
      ("relispartition", "Boolean", "NO"), ("relrewrite", "Int32", "YES"),
      ("relfrozenxid", "Int32", "NO"), ("relminmxid", "Int32", "NO"),
      ("relpartbound", "String", "YES")),
    "pg_namespace" -> Seq(
      ("oid", "Int32", "NO"), ("nspname", "String", "NO"),
      ("nspowner", "Int32", "NO"), ("nspacl", "String", "YES"),
      ("options", "String", "YES")),
    "schemata" -> Seq(
      ("catalog_name", "String", "NO"), ("schema_name", "String", "NO"),
      ("default_character_set_name", "String", "NO"),
      ("default_collation_name", "String", "NO"),
      ("sql_path", "String", "YES"), ("options", "String", "YES")),
    "build_info" -> Seq(
      ("git_branch", "String", "NO"), ("git_commit", "String", "NO"),
      ("git_commit_short", "String", "NO"), ("git_clean", "String", "NO"),
      ("pkg_version", "String", "NO")),
    "key_column_usage" -> Seq(
      ("constraint_catalog", "String", "NO"),
      ("constraint_schema", "String", "NO"),
      ("constraint_name", "String", "NO"),
      ("table_catalog", "String", "NO"),
      ("real_table_catalog", "String", "NO"),
      ("table_schema", "String", "NO"), ("table_name", "String", "NO"),
      ("column_name", "String", "NO"), ("ordinal_position", "UInt32", "NO"),
      ("position_in_unique_constraint", "UInt32", "YES"),
      ("referenced_table_schema", "String", "YES"),
      ("referenced_table_name", "String", "YES"),
      ("referenced_column_name", "String", "YES"),
      ("greptime_index_type", "String", "YES")),
    "column_privileges" -> Seq(
      ("grantee", "String", "NO"), ("table_catalog", "String", "NO"),
      ("table_schema", "String", "NO"), ("table_name", "String", "NO"),
      ("column_name", "String", "NO"), ("privilege_type", "String", "NO"),
      ("is_grantable", "String", "NO")),
    "column_statistics" -> Seq(
      ("schema_name", "String", "NO"), ("table_name", "String", "NO"),
      ("column_name", "String", "NO"), ("histogram", "String", "NO")),
    "check_constraints" -> Seq(
      ("constraint_catalog", "String", "NO"),
      ("constraint_schema", "String", "NO"),
      ("constraint_name", "String", "NO"), ("check_clause", "String", "NO")),
    "region_peers" -> Seq(
      ("table_catalog", "String", "NO"), ("table_schema", "String", "NO"),
      ("table_name", "String", "NO"), ("region_id", "UInt64", "NO"),
      ("peer_id", "UInt64", "YES"), ("peer_addr", "String", "YES"),
      ("is_leader", "String", "YES"), ("status", "String", "YES"),
      ("down_seconds", "Int64", "YES")),
    "region_info" -> Seq(
      ("region_id", "UInt64", "NO"), ("table_id", "UInt32", "NO"),
      ("region_number", "UInt32", "NO"), ("region_group", "UInt8", "NO"),
      ("region_sequence", "UInt32", "NO"), ("state", "String", "NO"),
      ("role", "String", "NO"), ("writable", "Boolean", "NO"),
      ("committed_sequence", "UInt64", "NO"),
      ("flushed_sequence", "UInt64", "YES"),
      ("manifest_version", "UInt64", "NO"),
      ("compaction_time_window", "String", "YES"),
      ("region_options", "String", "NO"), ("sst_format", "String", "NO"),
      ("node_id", "UInt64", "YES")),
    "region_statistics" -> Seq(
      ("region_id", "UInt64", "NO"), ("table_id", "UInt32", "NO"),
      ("region_number", "UInt32", "NO"), ("region_rows", "UInt64", "YES"),
      ("disk_size", "UInt64", "YES"), ("memtable_size", "UInt64", "YES"),
      ("manifest_size", "UInt64", "YES"), ("sst_size", "UInt64", "YES"),
      ("sst_num", "UInt64", "YES"), ("index_size", "UInt64", "YES"),
      ("engine", "String", "YES"), ("region_role", "String", "YES"),
      ("written_bytes_since_open", "UInt64", "YES"),
      ("query_cpu_time_millis", "UInt64", "YES"),
      ("query_scanned_bytes", "UInt64", "YES")),
    "ssts_manifest" -> Seq(
      ("table_dir", "String", "NO"), ("region_id", "UInt64", "NO"),
      ("table_id", "UInt32", "NO"), ("region_number", "UInt32", "NO"),
      ("region_group", "UInt8", "NO"), ("region_sequence", "UInt32", "NO"),
      ("file_id", "String", "NO"), ("index_version", "UInt64", "NO"),
      ("level", "UInt8", "NO"), ("file_path", "String", "NO"),
      ("file_size", "UInt64", "NO"), ("index_file_path", "String", "YES"),
      ("index_file_size", "UInt64", "YES"), ("num_rows", "UInt64", "NO"),
      ("num_row_groups", "UInt64", "NO"), ("num_series", "UInt64", "YES"),
      ("min_ts", "TimestampNanosecond", "YES"),
      ("max_ts", "TimestampNanosecond", "YES"),
      ("sequence", "UInt64", "YES"), ("origin_region_id", "UInt64", "NO"),
      ("node_id", "UInt64", "YES"), ("visible", "Boolean", "NO"),
      ("primary_key_min", "Binary", "YES"), ("primary_key_max", "Binary", "YES")),
    "ssts_storage" -> Seq(
      ("file_path", "String", "NO"), ("file_size", "UInt64", "YES"),
      ("last_modified_ms", "TimestampMillisecond", "YES"),
      ("node_id", "UInt64", "YES")),
    // DESC COLUMNS: the columns table's own schema is its rows in the
    // static inventory (system/information_schema.result)
    "columns" -> InfoColumnsData.rows.filter(_.startsWith("columns|")).map { l =>
      val p = l.split("\\|")
      (p(1), p(2), if (p(3) == "Y") "YES" else "NO")
    },
    "cluster_info" -> Seq(
      ("peer_id", "Int64", "NO"), ("peer_type", "String", "NO"),
      ("peer_addr", "String", "YES"), ("peer_hostname", "String", "YES"),
      ("total_cpu_millicores", "Int64", "NO"),
      ("total_memory_bytes", "Int64", "NO"),
      ("cpu_usage_millicores", "Int64", "NO"),
      ("memory_usage_bytes", "Int64", "NO"),
      ("version", "String", "NO"), ("git_commit", "String", "NO"),
      ("start_time", "TimestampMillisecond", "YES"),
      ("uptime", "String", "YES"), ("active_time", "String", "YES"),
      ("node_status", "String", "YES")),
    "ssts_index_meta" -> Seq(
      ("table_dir", "String", "NO"), ("index_file_path", "String", "NO"),
      ("region_id", "UInt64", "NO"), ("table_id", "UInt32", "NO"),
      ("region_number", "UInt32", "NO"), ("region_group", "UInt8", "NO"),
      ("region_sequence", "UInt32", "NO"), ("file_id", "String", "NO"),
      ("index_file_size", "UInt64", "YES"), ("index_type", "String", "NO"),
      ("target_type", "String", "NO"), ("target_key", "String", "NO"),
      ("target_json", "String", "NO"), ("blob_size", "UInt64", "NO"),
      ("meta_json", "String", "YES"), ("node_id", "UInt64", "YES")))

  private def describeInfoTable(name: String): DataFrame = {
    import spark.implicits._
    infoTableDescs(name).map { case (c, t, n) => (c, t, "", n, "", "FIELD") }
      .toDF("Column", "Type", "Key", "Null", "Default", "Semantic Type")
  }

  /** DESC of information_schema.table_semantics (its reference schema;
    * information_schema/table_semantics.result). */
  private def describeInfoTableSemantics(): DataFrame = {
    import spark.implicits._
    Seq(
      ("table_catalog", "String", "NO"), ("table_schema", "String", "NO"),
      ("table_name", "String", "NO"), ("table_id", "UInt32", "NO"),
      ("signal_type", "String", "YES"), ("source", "String", "YES"),
      ("source_version", "String", "YES"), ("pipeline", "String", "YES"),
      ("metadata_quality", "String", "YES"), ("semantic_options", "String", "YES"))
      .map { case (c, t, n) => (c, t, "", n, "", "FIELD") }
      .toDF("Column", "Type", "Key", "Null", "Default", "Semantic Type")
  }

  /** DESC of information_schema.table_constraints (its reference schema). */
  private def describeInfoConstraints(): DataFrame = {
    import spark.implicits._
    Seq("constraint_catalog", "constraint_schema", "constraint_name",
      "table_schema", "table_name", "constraint_type", "enforced")
      .map(c => (c, "String", "", "NO", "", "FIELD"))
      .toDF("Column", "Type", "Key", "Null", "Default", "Semantic Type")
  }

  /** information_schema.tables / .columns (reference information_schema
    * provider) materialized as temp views on demand. */
  private def refreshInfoSchema(): Unit = {
    import spark.implicits._
    // all databases: live catalog rows for the current one, saved states
    // for the rest, plus the numbers builtin under public
    val currentRows = catalog.tables.map { t =>
      val spec = catalog.spec(t)
      ("greptime", currentDb, t, "BASE TABLE",
        spec.mergeMode.toString.toLowerCase(Locale.ROOT),
        spec.timeIndex, spec.tags.mkString(","))
    }
    val savedRows = dbSaved.toSeq.filterNot(_._1 == currentDb).flatMap { case (db, st) =>
      st.specs.values.map(spec => ("greptime", db, spec.name, "BASE TABLE",
        spec.mergeMode.toString.toLowerCase(Locale.ROOT),
        spec.timeIndex, spec.tags.mkString(",")))
    }
    val numbersRow =
      if ((currentRows ++ savedRows).exists(r => r._2 == "public" && r._3 == "numbers")) Nil
      else Seq(("greptime", "public", "numbers", "LOCAL TEMPORARY", "append", "", "number"))
    // the reference information_schema.tables shape (24 columns, pinned
    // by system/information_schema.result and view/create.result)
    final case class InfoT(schema: String, name: String, ttype: String,
      id: Long, engine: String, temporary: String, cmt: String = "")
    def tableCommentOf(db: String, t: String): String =
      (if (db == currentDb) tableOpts.getOrElse(t, Nil)
       else dbSaved.get(db).map(_.opts.getOrElse(t, Nil)).getOrElse(Nil))
        .find(_._1 == "comment").map(_._2).getOrElse("")
    // real wall-clock (create_time > now()-interval filters run on it);
    // sqlness REPLACEs it to DATETIME in the goldens
    val fixedTime = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS"))
    val infoT = InfoTables.map { case (n, id) =>
      InfoT("information_schema", n, "LOCAL TEMPORARY", id.toLong, "", "Y") }
    val userT = (currentRows ++ savedRows).zipWithIndex.map { case (r, i) =>
      InfoT(r._2, r._3, "BASE TABLE", 1024L + i,
        tableEngine.getOrElse(r._3, "mito"), "N", tableCommentOf(r._2, r._3)) }
    val viewT = userViews.toSeq.distinct.zipWithIndex.map { case (v, i) =>
      InfoT(if (infoDb) "public" else currentDb, v, "VIEW", 2048L + i, "", "N") }
    val numT =
      if (numbersRow.nonEmpty) Seq(InfoT("public", "numbers", "LOCAL TEMPORARY", 2L,
        "test_engine", "Y")) else Nil
    val tblSchema = StructType(Seq(
      StructField("table_catalog", StringType), StructField("table_schema", StringType),
      StructField("table_name", StringType), StructField("table_type", StringType),
      StructField("table_id", LongType), StructField("data_length", LongType),
      StructField("max_data_length", LongType), StructField("index_length", LongType),
      StructField("max_index_length", LongType), StructField("avg_row_length", LongType),
      StructField("engine", StringType), StructField("version", LongType),
      StructField("row_format", StringType), StructField("table_rows", LongType),
      StructField("data_free", LongType), StructField("auto_increment", LongType),
      StructField("create_time", StringType), StructField("update_time", StringType),
      StructField("check_time", StringType), StructField("table_collation", StringType),
      StructField("checksum", LongType), StructField("create_options", StringType),
      StructField("table_comment", StringType), StructField("temporary", StringType)))
    val tblRows = (infoT ++ userT ++ viewT ++ numT).map(t =>
      org.apache.spark.sql.Row("greptime", t.schema, t.name, t.ttype, t.id,
        0L, 0L, 0L, 0L, 0L, t.engine, 11L, "Fixed", 0L, 0L, 0L,
        fixedTime, fixedTime, "", "utf8_bin", 0L, "", t.cmt, t.temporary))
    spark.createDataFrame(
      spark.sparkContext.parallelize(tblRows, 1).toJavaRDD, tblSchema)
      .createOrReplaceTempView("__info_tables")
    // TIME INDEX / PRIMARY constraints per table (table_constraints.result)
    val constraintRows = (currentRows ++ savedRows ++ numbersRow).flatMap {
      case (_, db, t, _, _, timeIndex, primaryKeys) =>
        val pk = if (primaryKeys.nonEmpty)
          Seq(("def", db, "PRIMARY", db, t, "PRIMARY KEY", "YES")) else Nil
        val ti = if (timeIndex.nonEmpty)
          Seq(("def", db, "TIME INDEX", db, t, "TIME INDEX", "YES")) else Nil
        pk ++ ti
    }
    constraintRows.toDF("constraint_catalog", "constraint_schema", "constraint_name",
      "table_schema", "table_name", "constraint_type", "enforced")
      .createOrReplaceTempView("__info_constraints")
    // reference columns shape: data_type is the SQL spelling, the
    // ConcreteDataType name rides in greptime_data_type
    // (system/information_schema.result's my_db.foo row)
    // the full reference columns shape — 24 columns incl. the MySQL
    // metadata cells (system/information_schema.result's complete
    // self-listing; derivation rules datatypes/src/data_type.rs:309-338,
    // columns.rs:88-90,313-316)
    val colSchema = StructType(Seq(
      StructField("table_catalog", StringType), StructField("table_schema", StringType),
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("ordinal_position", LongType),
      StructField("character_maximum_length", LongType),
      StructField("character_octet_length", LongType),
      StructField("numeric_precision", LongType), StructField("numeric_scale", LongType),
      StructField("datetime_precision", LongType),
      StructField("character_set_name", StringType), StructField("collation_name", StringType),
      StructField("column_key", StringType), StructField("extra", StringType),
      StructField("privileges", StringType), StructField("generation_expression", StringType),
      StructField("greptime_data_type", StringType), StructField("data_type", StringType),
      StructField("semantic_type", StringType), StructField("column_default", StringType),
      StructField("is_nullable", StringType), StructField("column_type", StringType),
      StructField("column_comment", StringType), StructField("srs_id", LongType)))
    def colRow(db: String, t: String, c: String, ordinal: Int, gtype: String,
        nullable: Boolean, sem: String, default: String, cmt: String):
        org.apache.spark.sql.Row = {
      val L = null.asInstanceOf[java.lang.Long]
      def l(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
      // (maxLen, octLen, numPrec, numScale, dtPrec, charset, collation, sql)
      val (maxLen, octLen, prec, scale, dtp, cs, coll, sqlName) = gtype match {
        case "String" => (l(2147483647L), l(2147483647L), L, L, L, "utf8", "utf8_bin", "string")
        case "Binary" => (L, L, L, L, L, null, null, "varbinary")
        case "Boolean" => (L, L, L, L, L, null, null, "boolean")
        case "Int8" => (L, L, l(3), l(0), L, null, null, "tinyint")
        case "Int16" => (L, L, l(5), l(0), L, null, null, "smallint")
        case "Int32" => (L, L, l(10), l(0), L, null, null, "int")
        case "Int64" => (L, L, l(19), l(0), L, null, null, "bigint")
        case "UInt8" => (L, L, l(3), l(0), L, null, null, "tinyint unsigned")
        case "UInt16" => (L, L, l(5), l(0), L, null, null, "smallint unsigned")
        case "UInt32" => (L, L, l(10), l(0), L, null, null, "int unsigned")
        case "UInt64" => (L, L, l(20), l(0), L, null, null, "bigint unsigned")
        case "Float32" => (L, L, l(12), L, L, null, null, "float")
        case "Float64" => (L, L, l(22), L, L, null, null, "double")
        case "TimestampSecond" => (L, L, L, L, l(0), null, null, "timestamp(0)")
        case "TimestampMillisecond" => (L, L, L, L, l(3), null, null, "timestamp(3)")
        case "TimestampMicrosecond" => (L, L, L, L, l(6), null, null, "timestamp(6)")
        case "TimestampNanosecond" => (L, L, L, L, l(9), null, null, "timestamp(9)")
        case "Date" => (L, L, L, L, L, null, null, "date")
        case other =>
          // Duration*/Interval*/Json/Vector spell as the concrete name
          // (self-listing pins DurationMillisecond verbatim)
          (L, L, L, L, L, null, null,
            if (other.startsWith("Duration") || other.startsWith("Interval")) other
            else showCreateType(other).toLowerCase(Locale.ROOT))
      }
      val key = sem match {
        case "TAG" => "PRI"
        case "TIMESTAMP" => "TIME INDEX"
        case _ => ""
      }
      org.apache.spark.sql.Row("greptime", db, t, c, ordinal.toLong,
        maxLen, octLen, prec, scale, dtp, cs, coll, key, "",
        "select,insert", "", gtype, sqlName, sem,
        Option(default).filter(_.nonEmpty).orNull,
        if (nullable) "YES" else "NO", sqlName,
        Option(cmt).filter(_.nonEmpty).orNull, L)
    }
    // static inventory: the information_schema virtual tables' own
    // columns (InfoColumnsData, extracted from the reference's pinned
    // self-listing)
    val infoColRows = InfoColumnsData.rows
      .groupBy(_.split("\\|")(0)).toSeq.flatMap { case (_, rs) =>
        rs.zipWithIndex.map { case (line, i) =>
          val p = line.split("\\|")
          colRow("information_schema", p(0), p(1), i + 1, p(2),
            p(3) == "Y", "FIELD", null, null)
        }
      }
    val userColRows = catalog.tables.toSeq.sorted.flatMap { t =>
      describeTable(t).collect().zipWithIndex.map { case (r, i) =>
        colRow(currentDb, t, r.getString(0), i + 1, r.getString(1),
          r.getString(3) == "YES", r.getString(5), r.getString(4),
          colMeta.getOrElse(t, Vector.empty).find(_.name == r.getString(0))
            .flatMap(_.comment).getOrElse(""))
      }
    } ++ dbSaved.toSeq.filterNot(_._1 == currentDb).flatMap { case (db, st) =>
      st.specs.toSeq.sortBy(_._1).flatMap { case (t, spec) =>
        st.meta.getOrElse(t, Vector.empty).zipWithIndex.map { case (cm, i) =>
          val sem = if (cm.name == spec.timeIndex) "TIMESTAMP"
            else if (spec.tags.contains(cm.name)) "TAG" else "FIELD"
          colRow(db, t, cm.name, i + 1, cm.gtype, cm.nullable, sem,
            cm.default.orNull, cm.comment.getOrElse(""))
        }
      }
    }
    val numbersColRow =
      colRow("public", "numbers", "number", 1, "UInt32", false, "TAG", null, null)
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          infoColRows ++ userColRows :+ numbersColRow, 1).toJavaRDD, colSchema)
      .createOrReplaceTempView("__info_columns")
    // key_column_usage: a row per PRIMARY-key column (system/
    // information_schema.result pins numbers.number with 'dense')
    val kcuRows = ((currentRows ++ savedRows).map(r => (r._2, r._3, r._7)) :+
      (("public", "numbers", "number"))).flatMap { case (db, t, pks) =>
      pks.split(",").filter(_.nonEmpty).zipWithIndex.map { case (c, i) =>
        ("def", db, "PRIMARY", "def", "greptime", db, t, c, i + 1,
          null: String, null: String, null: String, null: String, "dense")
      }
    }
    kcuRows.toDF("constraint_catalog", "constraint_schema", "constraint_name",
      "table_catalog", "real_table_catalog", "table_schema", "table_name",
      "column_name", "ordinal_position", "position_in_unique_constraint",
      "referenced_table_schema", "referenced_table_name",
      "referenced_column_name", "greptime_index_type")
      .createOrReplaceTempView("__info_key_column_usage")
    // engines / build_info / charsets / collations and the always-empty
    // privilege tables (system/information_schema.result)
    Seq(("mito", "DEFAULT", "Storage engine for time-series data", "NO", "NO", "NO"),
      ("metric", "YES",
        "Storage engine for observability scenarios, which is adept at " +
          "handling a large number of small tables, making it particularly " +
          "suitable for cloud-native monitoring", "NO", "NO", "NO"))
      .toDF("engine", "support", "comment", "transactions", "xa", "savepoints")
      .createOrReplaceTempView("__info_engines")
    Seq(("main", "0" * 40, "0000000", "true", "0.14.0"))
      .toDF("git_branch", "git_commit", "git_commit_short", "git_clean",
        "pkg_version")
      .createOrReplaceTempView("__info_build_info")
    Seq(("utf8", "utf8_bin", "UTF-8 Unicode", 4))
      .toDF("character_set_name", "default_collate_name", "description", "maxlen")
      .createOrReplaceTempView("__info_character_sets")
    Seq(("utf8_bin", "utf8", 1, "Yes", "Yes", 1))
      .toDF("collation_name", "character_set_name", "id", "is_default",
        "is_compiled", "sortlen")
      .createOrReplaceTempView("__info_collations")
    Seq(("utf8_bin", "utf8"))
      .toDF("collation_name", "character_set_name")
      .createOrReplaceTempView("__info_collation_character_set_applicability")
    Seq.empty[(String, String, String, String, String, String, String)]
      .toDF("grantee", "table_catalog", "table_schema", "table_name",
        "column_name", "privilege_type", "is_grantable")
      .createOrReplaceTempView("__info_column_privileges")
    Seq.empty[(String, String, String, String)]
      .toDF("schema_name", "table_name", "column_name", "histogram")
      .createOrReplaceTempView("__info_column_statistics")
    Seq.empty[(String, String, String, String)]
      .toDF("constraint_catalog", "constraint_schema", "constraint_name",
        "check_clause")
      .createOrReplaceTempView("__info_check_constraints")
    flows.toSeq.map { case (f, (_, q)) =>
      val meta = flowMeta.get(f)
      val pending = meta.exists(_.pending)
      // ALL catalog tables the query references (a join flow lists every
      // source — flow_batch_join_subquery checks both sides by LIKE)
      val srcs =
        if (pending) Nil
        else flowSourceTables(q, meta.map(_.sinkTable).getOrElse(""))
      val sinkT = meta.map(_.sinkTable).getOrElse("")
      val qNorm = q.replaceAll("\\s+", " ").trim
        .replaceAll("(?i)\\s+where\\s+", " WHERE ")
        .replaceAll("(?i)\\s+from\\s+", " FROM ")
        .replaceAll("(?i)\\s+as\\s+", " AS ")
      // the reference stores the full CREATE statement, pretty-printed
      // (flow/show_create_flow.result); WITH options echo on their own line
      val withLine = meta.map(_.opts).filter(_.nonEmpty)
        .map(o => "\nWITH (" +
          o.toSeq.sortBy(_._1).map { case (k, v) => s"$k = '$v'" }.mkString(", ") +
          ")").getOrElse("")
      val defn =
        s"CREATE FLOW IF NOT EXISTS $f\nSINK TO public.$sinkT$withLine\nAS $qNorm"
      // instant-ttl sources and non-aggregating queries force streaming
      // mode (flow/flow_advance_ttl.result, flow/flow_no_aggr.result)
      val mode = if (!pending && flowModeStreaming(q, meta.flatMap(_.srcTable)))
        "streaming" else "batching"
      val optJson = (meta.map(_.opts).getOrElse(Map.empty) - "flow_type")
        .toSeq.sortBy(_._1).map { case (k, v) => s""""$k":"$v"""" }
      val options = (optJson :+ s""""flow_type":"$mode"""").mkString("{", ",", "}")
      // full reference schema (information_schema/flows.rs:104-126):
      // name, id, state_size, catalog, definition, comment, expire_after,
      // source_table_ids, sink_table_name, flownode_ids, options,
      // created_time, updated_time, last_execution_time,
      // source_table_names, flownode_addrs
      val expireSecs: Option[Long] = flows.get(f).flatMap(_._1.expireAfter)
        .map(e => PromParser.parseDuration(e) / 1000L)
      (f, flowIdOf(f),
        // rough in-memory state estimate; goldens only assert > 0
        math.max(1L, defn.length.toLong),
        "greptime", defn,
        flowComments.get(f).orNull,
        expireSecs.map(Long.box).orNull,
        if (pending) "[]" else srcs.map(_ => "0").mkString("[", ", ", "]"),
        s"greptime.public.$sinkT",
        if (pending) "{}" else "{}",
        options,
        meta.map(m => new java.sql.Timestamp(m.createdMs)).orNull,
        meta.map(m => new java.sql.Timestamp(m.updatedMs)).orNull,
        flowLastExecMs.get(f).map(t => new java.sql.Timestamp(t)).orNull,
        srcs.map(_.split("__schema__", 2) match {
          case Array(d, t) => s"greptime.$d.$t"
          case a => s"greptime.public.${a.head}"
        }).mkString(","),
        // single-node: flows have no assigned flownode addresses
        // (standalone/flow-tql/flow_tql_flownode_addrs.result pins
        // NULL); the distributed twin pins NOT NULL — the test
        // cluster's single flownode address
        (if (distributedCluster) "127.0.0.1:4004"
         else null.asInstanceOf[String]))
    }.toDF("flow_name", "flow_id", "state_size", "table_catalog",
      "flow_definition", "comment", "expire_after", "source_table_ids",
      "sink_table_name", "flownode_ids", "options", "created_time",
      "updated_time", "last_execution_time",
      "source_table_names", "flownode_addrs")
      .createOrReplaceTempView("__info_flows")
    // information_schema.statistics: per-table index inventory in the
    // MySQL shape + greptime_index_type (show/show_index.sql queries it
    // alongside SHOW INDEX)
    locally {
      import spark.implicits._
      val db = if (infoDb) "public" else currentDb
      val gtype = Map("PRIMARY" -> "dense", "TIME" -> "",
        "FULLTEXT" -> "fulltext_bloom", "INVERTED" -> "inverted",
        "SKIPPING" -> "bloom_filter")
      catalog.tables.toSeq.sorted.flatMap(t =>
        scala.util.Try(indexRowsOf(t)).getOrElse(Nil)).map {
        case (t, nu, key, seq, c, nl, kind) =>
          ("greptime", db, t, nu, key, seq, c, "A", "", "", "", nl,
            kind, "", "", "YES", "", gtype.getOrElse(kind, ""))
      }.toDF("table_catalog", "table_schema", "table_name", "non_unique",
        "index_name", "seq_in_index", "column_name", "collation",
        "cardinality", "sub_part", "packed", "nullable", "index_type",
        "comment", "index_comment", "visible", "expression",
        "greptime_index_type")
        .createOrReplaceTempView("__info_statistics")
    }
    // information_schema.flow_statistics (flow_statistics.rs:81-92)
    flows.keys.toSeq.sorted.map { f =>
      val meta = flowMeta.get(f)
      val created = meta.map(_.createdMs).getOrElse(0L)
      (flowIdOf(f), f,
        new java.sql.Timestamp(created),
        flowLastExecMs.get(f).map(t => new java.sql.Timestamp(t)).orNull,
        Long.box(math.max(0L, (System.currentTimeMillis() - created) / 1000L)),
        Long.box(1L))
    }.toDF("flow_id", "flow_name", "start_time", "last_execution_time",
      "uptime_seconds", "state_size")
      .createOrReplaceTempView("__info_flow_statistics")
    // information_schema.views (information_schema/views.result): the
    // stored definition re-rendered with uppercase keywords
    def upKw(s: String): String =
      ("(?i)\\b(create|or|replace|view|as|select|from|where|inner|outer|" +
        "join|on|and|group|by|order|limit|union|all|left|right|full|" +
        "distinct|having)\\b").r
        .replaceAllIn(s, m => m.group(1).toUpperCase(Locale.ROOT))
    userViews.toSeq.sorted.map { v =>
      val (db, name) = v.split("__schema__", 2) match {
        case Array(d, n) => (d, n)
        case _ => (if (infoDb) "public" else currentDb, v)
      }
      val defn = userViewDefs.get(v).map(d => upKw(d._1.stripSuffix(";")))
        .getOrElse("")
      ("greptime", db, name, defn)
    }.toDF("table_catalog", "table_schema", "table_name", "view_definition")
      .createOrReplaceTempView("__info_views")
    // information_schema.table_semantics: tables carrying
    // 'greptime.semantic.*' WITH options, promoted columns + residual
    // JSON (information_schema/table_semantics.result)
    val semRows = (currentRows ++ savedRows).flatMap { case (_, db, t, _, _, _, _) =>
      val opts = tableOpts.getOrElse(t, Seq.empty)
        .collect { case (k, v) if k.startsWith("greptime.semantic.") =>
          k.stripPrefix("greptime.semantic.") -> v }
      if (opts.isEmpty) None
      else {
        val m = opts.toMap
        val signal = m.get("signal_type")
        val mq = signal.flatMap(sg => m.get(s"$sg.metadata_quality"))
        val promoted = Set("signal_type", "source", "source_version",
          "pipeline") ++ signal.map(sg => s"$sg.metadata_quality")
        val residual = opts.filterNot(o => promoted.contains(o._1))
          .sortBy(_._1).map { case (k, v) => s""""$k":"$v"""" }
        Some(("greptime", db, t, 1024L,
          signal.orNull, m.get("source").orNull,
          m.get("source_version").orNull, m.get("pipeline").orNull,
          mq.orNull,
          if (residual.isEmpty) null else residual.mkString("{", ",", "}")))
      }
    }
    semRows.toDF("table_catalog", "table_schema", "table_name", "table_id",
      "signal_type", "source", "source_version", "pipeline",
      "metadata_quality", "semantic_options")
      .createOrReplaceTempView("__info_table_semantics")
    // information_schema.procedure_info: the DDL procedure log
    // (information_schema/procedure_info.result)
    val procRows = procedureLog.toSeq.zipWithIndex.map { case ((pt, lk), i) =>
      (s"$i", pt, fixedTime, fixedTime, "Done", lk)
    }
    procRows.toDF("procedure_id", "procedure_type", "start_time", "end_time",
      "status", "lock_keys")
      .createOrReplaceTempView("__info_procedure_info")
    // information_schema.region_peers: one region per partition rule
    // (information_schema/region_peers.result: 4 tables → 6 regions)
    var regionIdx = 0L
    val peerRows = (currentRows ++ savedRows).flatMap { case (_, db, t, _, _, _, _) =>
      val n = partitionClause.get(t).map(_._2.size).getOrElse(1).max(1)
      (0 until n).map { _ =>
        regionIdx += 1
        ("greptime", db, t, 4398046511104L + regionIdx, 0L,
          "127.0.0.1:4001", "Yes", "ALIVE", 0L)
      }
    }
    peerRows.toDF("table_catalog", "table_schema", "table_name",
      "region_id", "peer_id", "peer_addr", "is_leader",
      "status", "down_seconds")
      .createOrReplaceTempView("__info_region_peers")
    // information_schema.schemata + .partitions (StarRocks client probes;
    // system/starrocks_compatibility.sql)
    val allDbs = (Seq("greptime_private", "information_schema", "public") ++
      (dbOpts.keySet ++ dbSaved.keySet - "public").toSeq.sorted).distinct
    allDbs.map(d => ("greptime", d, "utf8", "utf8_bin", null: String, null: String))
      .toDF("catalog_name", "schema_name", "default_character_set_name",
        "default_collation_name", "sql_path", "options")
      .createOrReplaceTempView("__info_schemata")
    val partRows = (currentRows ++ savedRows).flatMap { case (_, db, t, _, _, _, _) =>
      partitionClause.get(t) match {
        case Some((cols, rules)) =>
          // an empty rule list still has ONE region (PARTITION ON
          // COLUMNS (host) () — starrocks_compatibility.sql); the rule
          // text is the partition_description (common/partition.result)
          (0 until math.max(rules.size, 1)).map(i =>
            ("greptime", db, t, s"p$i", "RANGE", cols.mkString(", "),
              rules.lift(i).map(_.trim).orNull,
              4398046511104L + i, fixedTime.take(19), null: String))
        case None => Seq(("greptime", db, t, "p0", "RANGE", null: String,
          null: String, 4398046511104L, fixedTime.take(19), null: String))
      }
    }
    partRows.toDF("table_catalog", "table_schema", "table_name", "partition_name",
      "partition_method", "partition_expression", "partition_description",
      "greptime_partition_id", "create_time", "update_time")
      .createOrReplaceTempView("__info_partitions")
    // information_schema.region_info / .region_statistics: one row per
    // region, ids consistent with region_peers and tables.table_id
    // (information_schema/region_info.sql, region_statistics.sql)
    val tableIds = (currentRows ++ savedRows).zipWithIndex
      .map { case (r, i) => r._3 -> (1024L + i) }.toMap
    var ri = 0L
    val regionRows = (currentRows ++ savedRows).flatMap { case (_, _, t, _, _, _, _) =>
      val n = partitionClause.get(t).map(_._2.size).getOrElse(1).max(1)
      (0 until n).map { k =>
        ri += 1
        (4398046511104L + ri, tableIds.getOrElse(t, 0L), k, t)
      }
    }
    regionRows.map { case (rid, tid, k, t) =>
      (rid, tid, k, 0, k, "Leader(Writable)", "Leader", true, 1L, 1L, 1L,
        null: String,
        s"""{"compaction":{}}""",
        tableOpts.getOrElse(t, Seq.empty).toMap
          .getOrElse("sst_format", "primary_key"),
        0L)
    }.toDF("region_id", "table_id", "region_number", "region_group",
      "region_sequence", "state", "role", "writable", "committed_sequence",
      "flushed_sequence", "manifest_version", "compaction_time_window",
      "region_options", "sst_format", "node_id")
      .createOrReplaceTempView("__info_region_info")
    // index_size = total puffin file bytes for the region's SSTs: a
    // puffin with blobs is 254 bytes of framing + the blob bytes, and
    // an SST without any index entry has no puffin at all
    // (function/admin/build_index_table.result pins 0 → 318)
    val puffinBySst: Map[Long, Long] = sstIndexEntries.groupBy(_.fileNo)
      .map { case (f, es) => f -> (254L + es.map(_.blobSize).sum) }
    val idxSizeByRegion: Map[(String, Int), Long] =
      sstFiles.toSeq.groupBy(e => (e.table, e.regionNo))
        .map { case (key, es) =>
          key -> es.map(e => puffinBySst.getOrElse(e.fileNo, 0L)).sum }
    regionRows.map { case (rid, tid, k, t) =>
      (rid, tid, k, 3L, 100L, 1L, 1L, 100L, 1L,
        idxSizeByRegion.getOrElse((t, k), 0L), "mito", "Leader",
        100L, 1L, 100L)
    }.toDF("region_id", "table_id", "region_number", "region_rows",
      "disk_size", "memtable_size", "manifest_size", "sst_size", "sst_num",
      "index_size", "engine", "region_role", "written_bytes_since_open",
      "query_cpu_time_millis", "query_scanned_bytes")
      .createOrReplaceTempView("__info_region_statistics")
    // information_schema.ssts_manifest / .ssts_storage from the flush
    // log (information_schema/ssts.sql)
    def uuidOf(n: Long): String = f"00000000-0000-4000-8000-$n%012d"
    val sstSchema = StructType(Seq(
      StructField("table_dir", StringType), StructField("region_id", LongType),
      StructField("table_id", LongType), StructField("region_number", IntegerType),
      StructField("region_group", IntegerType),
      StructField("region_sequence", IntegerType),
      StructField("file_id", StringType), StructField("index_version", LongType),
      StructField("level", IntegerType), StructField("file_path", StringType),
      StructField("file_size", LongType),
      StructField("index_file_path", StringType),
      StructField("index_file_size", LongType), StructField("num_rows", LongType),
      StructField("num_row_groups", LongType), StructField("num_series", LongType),
      StructField("min_ts", TimestampType), StructField("max_ts", TimestampType),
      StructField("sequence", LongType), StructField("origin_region_id", LongType),
      StructField("node_id", LongType), StructField("visible", BooleanType),
      StructField("primary_key_min", StringType),
      StructField("primary_key_max", StringType)))
    val sstRows = sstFiles.toSeq.map { e =>
      val rid = 4400000000000L + e.tableId * 100L + e.regionNo
      val dir = s"data/greptime/public/${e.tableId}/"
      val fp = s"data/greptime/public/${e.tableId}/${rid}_${e.regionNo}/${uuidOf(e.fileNo)}.parquet"
      val ip = s"data/greptime/public/${e.tableId}/${rid}_${e.regionNo}/index/${uuidOf(e.fileNo)}.puffin"
      // regions spread round-robin over the emulated datanodes when the
      // engine reports a distributed deployment (ssts_limit.result pins
      // COUNT(DISTINCT node_id) > 1 on a 3-partition table)
      val nodeId = if (distributedCluster) (e.regionNo % 3).toLong else 0L
      org.apache.spark.sql.Row(dir, rid, e.tableId, e.regionNo, 0, e.regionNo,
        uuidOf(e.fileNo), 0L, 0, fp, 4096L, ip, 1024L, e.numRows, 1L, 1L,
        new java.sql.Timestamp(e.minTsMs), new java.sql.Timestamp(e.maxTsMs),
        e.seq, rid, nodeId, true, e.pkMin, e.pkMax)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(sstRows, 1).toJavaRDD, sstSchema)
      .createOrReplaceTempView("__info_ssts_manifest")
    sstRows.flatMap(r => Seq(
        (r.getString(9), 4096L, r.getTimestamp(16), 0L),
        (r.getString(11), 1024L, r.getTimestamp(16), 0L)))
      .toDF("file_path", "file_size", "last_modified_ms", "node_id")
      .createOrReplaceTempView("__info_ssts_storage")
    // information_schema.cluster_info (cluster membership + node
    // telemetry; servers expose it from the meta heartbeat channel):
    // one STANDALONE peer, or the reference test cluster's 3 datanodes +
    // flownode + frontend + metasrv when distributedCluster is set.
    // Volatile cells (addr/version/commit/start/uptime) are REPLACEd by
    // the goldens; totals must be nonzero (cluster_info.result pins
    // total_cpu_millicores != 0).
    locally {
      val upMs = math.max(1L, System.currentTimeMillis() - engineStartMs)
      val up =
        if (upMs < 1000L) s"${upMs}ms"
        else s"${upMs / 1000}s ${upMs % 1000}ms"
      val started = new java.sql.Timestamp(engineStartMs)
      val ver = "0.17.2"
      val hash = "c446b3f51"
      val dnStatus =
        """{"workloads":["HYBRID"],"leader_regions":1,"follower_regions":0}"""
      val ciSchema = StructType(Seq(
        StructField("peer_id", LongType, nullable = false),
        StructField("peer_type", StringType, nullable = false),
        StructField("peer_addr", StringType), StructField("peer_hostname", StringType),
        StructField("total_cpu_millicores", LongType, nullable = false),
        StructField("total_memory_bytes", LongType, nullable = false),
        StructField("cpu_usage_millicores", LongType, nullable = false),
        StructField("memory_usage_bytes", LongType, nullable = false),
        StructField("version", StringType, nullable = false),
        StructField("git_commit", StringType, nullable = false),
        StructField("start_time", TimestampType),
        StructField("uptime", StringType), StructField("active_time", StringType),
        StructField("node_status", StringType)))
      def peer(id: Long, tpe: String, addr: String, active: String,
          status: String): org.apache.spark.sql.Row =
        org.apache.spark.sql.Row(id, tpe, addr,
          Option(addr).map(_ => "127.0.0.1").orNull,
          Runtime.getRuntime.availableProcessors().toLong * 1000L,
          137438953472L, 250L, 1073741824L, ver, hash, started, up,
          active, status)
      val peers =
        if (distributedCluster) Seq(
          peer(0, "DATANODE", "127.0.0.1:4101", up, dnStatus),
          peer(1, "DATANODE", "127.0.0.1:4102", up, dnStatus),
          peer(2, "DATANODE", "127.0.0.1:4103", up, dnStatus),
          peer(0, "FLOWNODE", "127.0.0.1:4201", up, null),
          peer(1, "FRONTEND", "127.0.0.1:4001", up, null),
          peer(1, "METASRV", "127.0.0.1:3002", null, null))
        else Seq(peer(0, "STANDALONE", null, null, null))
      spark.createDataFrame(
          spark.sparkContext.parallelize(peers, 1).toJavaRDD, ciSchema)
        .createOrReplaceTempView("__info_cluster_info")
    }
    // information_schema.ssts_index_meta: one row per index blob in a
    // flushed SST's puffin file (information_schema/ssts.result,
    // function/admin/build_index_table_restart.sql)
    val sstByNo = sstFiles.map(e => e.fileNo -> e).toMap
    val idxSchema = StructType(Seq(
      StructField("table_dir", StringType),
      StructField("index_file_path", StringType),
      StructField("region_id", LongType), StructField("table_id", LongType),
      StructField("region_number", IntegerType),
      StructField("region_group", IntegerType),
      StructField("region_sequence", IntegerType),
      StructField("file_id", StringType),
      StructField("index_file_size", LongType),
      StructField("index_type", StringType),
      StructField("target_type", StringType),
      StructField("target_key", StringType),
      StructField("target_json", StringType),
      StructField("blob_size", LongType), StructField("meta_json", StringType),
      StructField("node_id", LongType)))
    val idxRows = sstIndexEntries.toSeq.flatMap { en =>
      sstByNo.get(en.fileNo).map { e =>
        val rid = 4400000000000L + e.tableId * 100L + e.regionNo
        val dir = s"data/greptime/public/${e.tableId}/"
        val ip = s"data/greptime/public/${e.tableId}/${rid}_${e.regionNo}/index/${uuidOf(e.fileNo)}.puffin"
        org.apache.spark.sql.Row(dir, ip, rid, e.tableId, e.regionNo, 0,
          e.regionNo, uuidOf(e.fileNo), puffinBySst.getOrElse(e.fileNo, 0L),
          en.indexType, "column", en.colIdx.toString,
          s"""{"column":${en.colIdx}}""", en.blobSize, en.metaJson, 0L)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(idxRows, 1).toJavaRDD, idxSchema)
      .createOrReplaceTempView("__info_ssts_index_meta")
  }

  /** ConcreteDataType display name → SHOW CREATE TABLE SQL type token
    * (sql/src/statements/show.rs DDL rendering). */
  private def showCreateType(g: String): String = g match {
    case "Int8" => "TINYINT"
    case "Int16" => "SMALLINT"
    case "Int32" => "INT"
    case "Int64" => "BIGINT"
    case "UInt8" => "TINYINT UNSIGNED"
    case "UInt16" => "SMALLINT UNSIGNED"
    case "UInt32" => "INT UNSIGNED"
    case "UInt64" => "BIGINT UNSIGNED"
    case "Float32" => "FLOAT"
    case "Float64" => "DOUBLE"
    case "String" => "STRING"
    case "Boolean" => "BOOLEAN"
    case "Binary" => "BINARY"
    case "Date" => "DATE"
    case "TimestampSecond" => "TIMESTAMP(0)"
    case "TimestampMillisecond" => "TIMESTAMP(3)"
    case "TimestampMicrosecond" => "TIMESTAMP(6)"
    case "TimestampNanosecond" => "TIMESTAMP(9)"
    case "Json" => "JSON"
    case "Json2" => "JSON2"
    case other if other.startsWith("Decimal") => other.toUpperCase(Locale.ROOT)
    case other if other.startsWith("Vector") => other.toUpperCase(Locale.ROOT)
    case other => other.toUpperCase(Locale.ROOT)
  }

  /** humantime-style duration rendering used by SHOW CREATE ('7d' →
    * '7days', '1 second' → '1s'). */
  private def humanDuration(s: String): String =
    if (s.isEmpty || s == "forever") "forever"
    else if (s == "instant") "instant"
    else try {
      var ms = intervalMs(s)
      if (ms == 0) return "forever" // zero ttl = no expiry (ttl/show_ttl)
      val parts = Seq.newBuilder[String]
      val d = ms / 86400000L; ms %= 86400000L
      val h = ms / 3600000L; ms %= 3600000L
      val m = ms / 60000L; ms %= 60000L
      val sec = ms / 1000L; ms %= 1000L
      if (d > 0) parts += s"${d}day" + (if (d > 1) "s" else "")
      if (h > 0) parts += s"${h}h"
      if (m > 0) parts += s"${m}m"
      if (sec > 0) parts += s"${sec}s"
      if (ms > 0) parts += s"${ms}ms"
      val r = parts.result()
      if (r.isEmpty) "0s" else r.mkString(" ")
    } catch { case _: Exception => s }

  /** Original WITH options per table, for SHOW CREATE TABLE. */
  private val tableOpts =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, String)]]

  /** Per-table durability watermark for skip_wal tables: rows with
    * `__seq` <= watermark survive a restart (they were WAL-protected
    * before skip_wal was enabled, or flushed to SST). A skip_wal table
    * with no watermark loses everything unflushed (common/skip_wal
    * .result). */
  private val durableSeq = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Emulate a server restart: skip-WAL tables drop rows newer than
    * their durability watermark; everything else persists (the catalog
    * itself is durable — create/recover_created.result). */
  def restart(): Unit =
    catalog.tables.foreach { t =>
      val skip = tableOpts.getOrElse(t, Nil)
        .exists(o => o._1 == "skip_wal" && o._2 == "true")
      if (skip) {
        val wm = durableSeq.getOrElse(t, Long.MinValue)
        val spec = catalog.spec(t)
        migrateParquet(spec)(_.filter(col(SeqCol) <= wm))
        refreshView(t)
      }
    }

  // ---- metric engine (reference src/metric-engine) --------------------
  /** One shared physical storage region; logical tables project label
    * subsets onto it. */
  private final class PhyState {
    var everLogical: Boolean = false
    /** logical child → its stable __table_id, assigned once at CREATE
      * and never renumbered — a drop must not shift surviving ids (the
      * drop-time materialization writes rows stamped with the dropped
      * child's id, which would otherwise collide) */
    val childIds = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    private var nextChildId: Long = 1025L
    def addChild(name: String): Unit =
      if (!childIds.contains(name)) {
        childIds.put(name, nextChildId); nextChildId += 1
      }
    def children: Seq[String] = childIds.keys.toSeq
    val addedTags = scala.collection.mutable.LinkedHashSet.empty[String]
  }
  private val metricPhy =
    scala.collection.concurrent.TrieMap.empty[String, PhyState]
  private val logicalParent =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** Table engine when not mito (metric; numbers' test_engine is
    * hardcoded in refreshInfoSchema). */
  private val tableEngine =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** PARTITION ON COLUMNS (cols) (rules) clause, normalized. */
  private val partitionClause =
    scala.collection.concurrent.TrieMap.empty[String, (Seq[String], Seq[String])]

  /** WITH-option keys the user single-quoted (SHOW CREATE echoes the
    * original quoting). */
  private val quotedOptNames =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  private def showCreateTable(name: String): DataFrame = {
    import spark.implicits._
    val spec = catalog.spec(name)
    val metas = colMeta.getOrElse(name, Vector.empty)
      .filterNot(m => droppedCols.getOrElse(name, Set.empty).contains(m.name))
    val colLines: Vector[Vector[String]] = metas.map { m =>
      val hinted = j2Hints.getOrElse(name, Map.empty).get(m.name)
        .filter(_ => m.gtype == "Json2")
      val base = hinted match {
        case Some(_) => s"""  "${m.name}" JSON2("""
        case None =>
          s"""  "${m.name}" ${m.sqlType.getOrElse(showCreateType(m.gtype))}"""
      }
      val nul = if (m.nullable && m.name != spec.timeIndex) " NULL" else " NOT NULL"
      // the reference renders the default through its expression printer:
      // CURRENT_TIMESTAMP -> current_timestamp()
      val dft = m.default.map { d =>
        val norm =
          if (d.matches("(?i)current_timestamp(\\(\\))?")) "current_timestamp()"
          // timestamp string defaults render with the +0000 offset
          // (alter/alter_table_alter_column_set_default.result)
          else if (m.gtype.startsWith("Timestamp") &&
            d.matches("'[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][^'+]*'"))
            d.dropRight(1) + "+0000'"
          else d
        s" DEFAULT $norm"
      }.getOrElse("")
      val idx = m.indexDecl.map(" " + _).getOrElse("")
      val cmt = m.comment.map(c => s" COMMENT '$c'").getOrElse("")
      hinted match {
        case Some(hs) =>
          // hint block: one line per hint, comma-separated, closing
          // paren carries the column options (json2_type_hints.result)
          val hintLines = hs.zipWithIndex.map { case (h, i) =>
            val pathQ = h.path.map(s => s""""$s"""").mkString(".")
            val line = s"    $pathQ ${h.sqlType}" +
              (if (h.nullable) " NULL" else " NOT NULL") +
              h.default.map(" DEFAULT " + _).getOrElse("")
            if (i < hs.size - 1) line + "," else line
          }
          (base +: hintLines) :+ ("  )" + nul + dft + cmt + idx)
        case None => Vector(base + nul + dft + cmt + idx)
      }
    }
    val keyLines = Vector(Vector(s"""  TIME INDEX ("${spec.timeIndex}")""")) ++
      (if (spec.tags.nonEmpty)
        Vector(Vector(spec.tags.map(t => s""""$t"""").mkString("  PRIMARY KEY (", ", ", ")")))
      else Vector.empty)
    val innerBlocks = colLines ++ keyLines
    // the statement-level comma lands on each block's LAST line
    val body = innerBlocks.zipWithIndex.flatMap { case (block, i) =>
      if (i < innerBlocks.size - 1) block.init :+ (block.last + ",")
      else block
    }
    val own = tableOpts.getOrElse(name, Nil)
    // a db-level ttl shows as an (inherited) table option; the WITH
    // block renders sorted by key (create/create_database_opts.result)
    val effective = (if (own.exists(_._1 == "ttl")) own
      else dbOpts.getOrElse(currentDb, Nil).find(_._1 == "ttl")
        .map(own :+ _).getOrElse(own)).sortBy(_._1)
    // the reference renders its well-known option keys bare and quotes
    // the rest (comment, memtable.type, ...); storage-tuning keys are
    // hidden but still leave an (empty) WITH block behind
    // (alter/alter_auto_flush_interval.result, alter/alter_format.result)
    val bareKeys = Set("ttl", "append_mode", "merge_mode", "skip_wal",
      "auto_flush_interval", "sst_format", "max_row_group_row_count",
      "physical_metric_table", "on_physical_table")
    val hiddenKeys = Set.empty[String]
    val visible = effective.filterNot(e => hiddenKeys(e._1))
    val hasHidden = effective.exists(e => hiddenKeys(e._1))
    val opts = visible
      .map { case (k, v) =>
        // echo the original quoting: bare for well-known keys and keys
        // the user wrote unquoted; quoted otherwise (create.result's
        // comment vs the flow sink's 'comment')
        val key =
          if (bareKeys(k)) k
          else if (k.matches("[A-Za-z_][A-Za-z0-9_]*") &&
            !quotedOptNames.getOrElse(name, Set.empty).contains(k)) k
          else s"'$k'"
        val ev0 = (if (k == "ttl") humanDuration(v) else v)
          .replace("\\", "\\\\") // backslashes render escaped (CJK comment golden)
        // ReadableSize values normalize through a float rendering
        // ('1KiB' -> '1.0KiB', show/show_create.result)
        val ev =
          if (k == "write_buffer_size" && ev0.matches("\\d+[KMGT]i?B"))
            ev0.replaceFirst("(\\d+)", "$1.0")
          else ev0
        s"  $key = '$ev'" }
    // golden shape: ")", partition clause (or blank slot), ENGINE=<e>,
    // then the WITH block or a trailing blank. Logical metric tables
    // render their physical table's partition clause.
    val engineLabel = "ENGINE=" + tableEngine.getOrElse(name, "mito")
    val partLines: Vector[String] =
      logicalParent.get(name).flatMap(partitionClause.get)
        .orElse(partitionClause.get(name))
        .filter(_._2.nonEmpty)
        .map { case (cols, rules) =>
          (s"PARTITION ON COLUMNS (${cols.map(c => s""""$c"""").mkString(", ")}) (" +:
            rules.zipWithIndex.map { case (r, i) =>
              "  " + r + (if (i < rules.size - 1) "," else "") }.toVector) :+ ")"
        }.getOrElse(Vector(""))
    val lines = (s"""CREATE TABLE IF NOT EXISTS "$name" (""" +: body :+ ")") ++
      partLines ++ Vector(engineLabel) ++
      (if (opts.nonEmpty) ("WITH(" +: opts.zipWithIndex.map { case (o, i) =>
        if (i < opts.size - 1) o + "," else o } :+ ")")
      else if (hasHidden) Vector("WITH(", ")")
      else Vector(""))
    lines.zipWithIndex.map { case (l, i) => (if (i == 0) name else "", l) }
      .toDF("Table", "Create Table")
  }

  /** The information_schema virtual tables with their fixed table ids
    * (reference src/common/catalog/src/consts.rs; pinned by
    * system/information_schema.result). */
  private[graft] val InfoTables: Seq[(String, Int)] = Seq(
    "build_info" -> 8, "character_sets" -> 9, "check_constraints" -> 12,
    "cluster_info" -> 31, "collation_character_set_applicability" -> 11,
    "collations" -> 10, "column_privileges" -> 6, "column_statistics" -> 7,
    "columns" -> 4, "engines" -> 5, "events" -> 13, "files" -> 14,
    "flow_statistics" -> 45, "flows" -> 33, "global_status" -> 25,
    "key_column_usage" -> 16, "optimizer_trace" -> 17, "parameters" -> 18,
    "partitions" -> 28, "procedure_info" -> 34, "process_list" -> 36,
    "profiling" -> 19, "referential_constraints" -> 20, "region_info" -> 41,
    "region_peers" -> 29, "region_statistics" -> 35, "routines" -> 21,
    "schema_privileges" -> 22, "schemata" -> 15, "session_status" -> 26,
    "ssts_index_meta" -> 39, "ssts_manifest" -> 37, "ssts_storage" -> 38,
    "statistics" -> 43, "table_constraints" -> 30, "table_privileges" -> 23,
    "table_semantics" -> 42, "tables" -> 3, "views" -> 32)

  /** SQL LIKE pattern → anchored regex. */
  private def likeRegex(p: String): String =
    p.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+?^$|".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    }

  /** SHOW CREATE TABLE t FOR POSTGRES_FOREIGN_TABLE — renders a Postgres
    * foreign-table DDL over the FDW server (show/show_create.result). */
  private def showCreateForeignTable(name: String): DataFrame = {
    import spark.implicits._
    val spec = catalog.spec(name)
    val metas = colMeta.getOrElse(name, Vector.empty)
      .filterNot(m => droppedCols.getOrElse(name, Set.empty).contains(m.name))
    def pgType(g: String): String = g match {
      case "Int8" | "Int16" | "UInt8" => "INT2"
      case "Int32" | "UInt16" | "UInt32" => "INT4"
      case "Int64" | "UInt64" => "INT8"
      case "Float32" => "FLOAT4"
      case "Float64" => "FLOAT8"
      case "String" => "VARCHAR"
      case "Boolean" => "BOOLEAN"
      case "Binary" => "BYTEA"
      case "Date" => "DATE"
      case t if t.startsWith("Timestamp") => "TIMESTAMP"
      case t if t.startsWith("Decimal") => "NUMERIC"
      case _ => "VARCHAR"
    }
    val cols = metas.zipWithIndex.map { case (m, i) =>
      s"""  "${m.name}" ${pgType(m.gtype)}""" +
        (if (i < metas.size - 1) "," else "")
    }
    val lines = (s"CREATE FOREIGN TABLE ft_$name (" +: cols :+ ")") ++
      Vector("SERVER greptimedb", s"OPTIONS (table_name '$name')")
    lines.zipWithIndex.map { case (l, i) => (if (i == 0) name else "", l) }
      .toDF("Table", "Create Table")
  }

  private def showTables(stmt: String): DataFrame = {
    import spark.implicits._
    val full = stmt.toUpperCase(Locale.ROOT).startsWith("SHOW FULL")
    val fromDb = "(?i)\\b(?:FROM|IN)\\s+([A-Za-z_\"`][A-Za-z0-9_\"`-]*)".r
      .findFirstMatchIn(stmt).map(m => unquote(m.group(1)))
    val like = "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
    val where = "(?is)\\bWHERE\\s+(.*)$".r.findFirstMatchIn(stmt).map(_.group(1).trim)
    val db = fromDb.getOrElse(if (infoDb) "information_schema" else currentDb)
    val rows: Seq[(String, String)] =
      if (db == "information_schema") InfoTables.map(t => (t._1, "LOCAL TEMPORARY"))
      else {
        val base: Seq[(String, String)] =
          if (db == currentDb)
            catalog.tables.map((_, "BASE TABLE")) ++ userViews.toSeq.map((_, "VIEW"))
          else dbSaved.get(db).map(_.specs.keys.toSeq.map((_, "BASE TABLE")))
            .getOrElse(throw new IllegalArgumentException(s"database $db not found"))
        // `numbers` is a public-schema builtin (table/src/table/numbers.rs)
        if (db == "public") base :+ ("numbers" -> "LOCAL TEMPORARY") else base
      }
    val colName = s"Tables_in_$db"
    var df = rows.sortBy(_._1).toDF(colName, "Table_type")
    like.foreach(p => df = df.filter(col(s"`$colName`").rlike("^" + likeRegex(p) + "$")))
    where.foreach(w => df = df.where(
      dialect(w).replaceAll("(?i)\\bTables\\b", s"`$colName`")))
    if (full) df else df.select(s"`$colName`")
  }

  private def showDatabases(stmt: String): DataFrame = {
    import spark.implicits._
    val full = stmt.toUpperCase(Locale.ROOT).startsWith("SHOW FULL")
    val like = "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt).map(_.group(1))
    val where = "(?is)\\bWHERE\\s+(.*)$".r.findFirstMatchIn(stmt).map(_.group(1).trim)
    val names = (dbOpts.keys.toSeq ++ Seq("information_schema", "greptime_private"))
      .distinct.sorted
    val filtered = names
      .filter(n => like.forall(p => n.matches("^" + likeRegex(p) + "$")))
    var df =
      if (!full) filtered.toDF("Database")
      else filtered.flatMap { n =>
        // ttl first, the rest alphabetical, one option per row with a
        // trailing blank row (create_database_opts.result)
        val opts = dbOpts.getOrElse(n, Nil)
        val ordered = opts.filter(_._1 == "ttl") ++
          opts.filterNot(_._1 == "ttl").sortBy(_._1)
        val lines = ordered.map { case (k, v) => s"'$k'='$v'" }
        if (lines.isEmpty) Seq((n, ""))
        else (n, lines.head) +: (lines.tail.map(("", _)) :+ ("", ""))
      }.toDF("Database", "Options")
    where.foreach(w => df = df.where(dialect(w)))
    df
  }

  // ---- databases ------------------------------------------------------

  private val CreateDbRx =
    "(?is)CREATE\\s+DATABASE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?('[^']+'|[A-Za-z_\"`][A-Za-z0-9_\"`]*)\\s*(?:WITH\\s*\\((.*)\\))?".r

  private def createDatabase(stmt: String): DataFrame = stmt match {
    case CreateDbRx(rawName, withPart) =>
      // single-quoted database names are accepted (create_database.result)
      val name = unquote(rawName.stripPrefix("'").stripSuffix("'"))
      if (!name.matches("[A-Za-z_][A-Za-z0-9_-]*"))
        throw new IllegalArgumentException(s"Invalid database name: $name")
      if (Set("pg_catalog", "information_schema", "greptime_private")
          .contains(name.toLowerCase(Locale.ROOT)))
        throw new IllegalArgumentException(
          s"Schema $name already exists") // reserved (system/pg_catalog.sql)
      if (dbOpts.contains(name) || dbSaved.contains(name)) {
        if ("(?is).*IF\\s+NOT\\s+EXISTS.*".r.matches(stmt.take(40)))
          return status(s"database $name exists")
        throw new IllegalArgumentException(s"database $name already exists")
      }
      val opts = Option(withPart).map(w => splitTop(w).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k.trim.stripPrefix("'").stripSuffix("'")
          .toLowerCase(Locale.ROOT) -> v.trim.stripPrefix("'").stripSuffix("'"))
        case _ => None
      })).getOrElse(Nil)
      // validate a ttl option eagerly (alter_database negative tests)
      opts.find(_._1 == "ttl").map(_._2).filter(_.nonEmpty)
        .filterNot(v => v == "instant" || v == "forever").foreach(parseTtlMs)
      dbOpts.put(name, opts)
      dbSaved.put(name, DbState(Map.empty, Map.empty, Map.empty, Map.empty,
        Map.empty, Map.empty, Map.empty))
      status(s"database $name created")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  private def saveCurrentDb(): Unit = {
    dbSaved.put(currentDb, DbState(
      catalog.tables.map(t => t -> catalog.spec(t)).toMap,
      colMeta.toMap, droppedCols.toMap, backfills.toMap, colCasts.toMap,
      tsLiteralUs.toMap, tableOpts.toMap))
  }

  private def useDatabase(name0: String): DataFrame = {
    // database names resolve case-insensitively (the reference corpus
    // issues `USE PUBLIC` against database `public`)
    val name =
      if (dbOpts.contains(name0) || dbSaved.contains(name0)) name0
      else (dbOpts.keysIterator ++ dbSaved.keysIterator)
        .find(_.equalsIgnoreCase(name0)).getOrElse(name0)
    if (name != currentDb) {
      val target = dbSaved.getOrElse(name,
        if (name == "public") DbState(Map.empty, Map.empty, Map.empty,
          Map.empty, Map.empty, Map.empty, Map.empty)
        else throw new IllegalArgumentException(s"database $name not found"))
      if (!dbOpts.contains(name) && name != "public")
        throw new IllegalArgumentException(s"database $name not found")
      saveCurrentDb()
      catalog.tables.foreach { t =>
        spark.catalog.dropTempView(t)
        catalog.deregister(t)
      }
      colMeta.clear(); droppedCols.clear(); backfills.clear()
      colCasts.clear(); tsLiteralUs.clear(); tableOpts.clear()
      target.specs.values.foreach(catalog.register)
      colMeta ++= target.meta; droppedCols ++= target.dropped
      backfills ++= target.bfills; colCasts ++= target.casts
      tsLiteralUs ++= target.tsUs; tableOpts ++= target.opts
      target.specs.keys.foreach(t => refreshView(t))
      currentDb = name
    }
    status(s"using $name")
  }

  private def dropDatabase(stmt: String): DataFrame = {
    val name = unquote(stmt.split("\\s+")
      .filterNot(t => t.equalsIgnoreCase("IF") || t.equalsIgnoreCase("EXISTS"))
      .last.stripPrefix("'").stripSuffix("'"))
    if (name == currentDb) {
      catalog.tables.foreach { t =>
        spark.catalog.dropTempView(t); catalog.deregister(t)
      }
      colMeta.clear(); droppedCols.clear(); backfills.clear()
      colCasts.clear(); tsLiteralUs.clear(); tableOpts.clear()
      currentDb = "public"
      dbSaved.get("public").foreach { s =>
        s.specs.values.foreach(catalog.register)
        colMeta ++= s.meta; droppedCols ++= s.dropped
        backfills ++= s.bfills; colCasts ++= s.casts
        tsLiteralUs ++= s.tsUs; tableOpts ++= s.opts
        s.specs.keys.foreach(t => refreshView(t))
      }
    }
    // per-schema mangled tables/views of the dropped db go away too
    // (select/multi_column_ref.sql's DROP SCHEMA)
    val prefix = s"${name}__schema__"
    catalog.tables.filter(_.startsWith(prefix)).foreach { t =>
      spark.catalog.dropTempView(t)
      catalog.deregister(t)
      colMeta.remove(t); tableOpts.remove(t)
    }
    userViews.filter(_.startsWith(prefix)).foreach { v =>
      spark.catalog.dropTempView(v); userViews -= v; userViewDefs -= v
    }
    dbSaved.remove(name)
    dbOpts.remove(name)
    status(s"database $name dropped")
  }

  /** Spark type → reference `ConcreteDataType` display name, for tables
    * registered without DDL (external parquet). */
  private def greptimeNameOf(t: DataType): String = t match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BooleanType => "Boolean"
    case BinaryType => "Binary"
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "TimestampMillisecond"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case other => other.simpleString.capitalize
  }

  /** `SHOW COLUMNS {FROM|IN} t [{FROM|IN} db] [LIKE p]` in the MySQL
    * 7-column shape (sql/src/statements/show.rs: Field | Type | Null |
    * Key | Default | Extra | Greptime_type), rows ordered by Field,
    * SQL types lowercased (show/show_columns.result). */
  /** (table, non_unique, key_name, seq, column, nullCell, index_type)
    * index rows of a table's declared metadata — shared by SHOW INDEX
    * and information_schema.statistics (show/show_index.sql compares
    * both against the same inventory). */
  private def indexRowsOf(t: String): Seq[(String, Int, String, Int, String, String, String)] = {
    val spec = catalog.spec(t)
    val metas = colMeta.getOrElse(t, Vector.empty)
    def nullCell(c: String): String =
      if (c == spec.timeIndex) ""
      else if (metas.find(_.name == c).forall(_.nullable)) "YES" else ""
    // a metric PHYSICAL table leads its key with the internal
    // __table_id/__tsid columns and skip-indexes __table_id
    // (create/create_metric_table.result)
    // declared tags precede the internals; tags PROPAGATED from
    // logical tables follow them (show/show_create.result's phy)
    val pkCols: Seq[(String, String)] =
      metricPhy.get(t) match {
        case Some(ps) =>
          val added = ps.addedTags.toSet
          spec.tags.filterNot(added).map(c => c -> nullCell(c)) ++
            Seq("__table_id" -> "", "__tsid" -> "") ++
            spec.tags.filter(added).map(c => c -> nullCell(c))
        case None => spec.tags.map(c => c -> nullCell(c))
      }
    val pk = pkCols.zipWithIndex.map { case ((c, nl), i) =>
      (t, 0, "PRIMARY", i + 1, c, nl, "PRIMARY") }
    val phySkip =
      if (metricPhy.contains(t))
        Seq((t, 1, "SKIPPING_INDEX___table_id", 1, "__table_id", "", "SKIPPING"))
      else Nil
    val ti = phySkip ++ Seq((t, 1, "TIME INDEX", 1, spec.timeIndex,
      nullCell(spec.timeIndex), "TIME"))
    val decls = metas.flatMap(cm => cm.indexDecl.toSeq.flatMap { d =>
      Seq("FULLTEXT", "SKIPPING", "INVERTED")
        .filter(k => ("(?i)\\b" + k + "\\b").r.findFirstIn(d).isDefined)
        .map(kind =>
          (t, 1, s"${kind}_INDEX_${cm.name}", 1, cm.name, nullCell(cm.name), kind))
    })
    pk ++ ti ++ decls
  }

  private def showColumns(stmt: String): DataFrame = {
    import spark.implicits._
    val full = "(?is)^SHOW\\s+FULL\\s".r.findFirstIn(stmt.trim).isDefined
    val m = "(?is)^SHOW\\s+(?:FULL\\s+)?COLUMNS\\s+(?:FROM|IN)\\s+(\\S+)" +
      "(?:\\s+(?:FROM|IN)\\s+(\\S+))?(?:\\s+LIKE\\s+'([^']*)')?" +
      "(?:\\s+WHERE\\s+(.+?))?\\s*$"
    val rx = m.r
    stmt match {
      case rx(t, _, likeOpt, whereOpt) =>
        val name = normTable(t)
        // a VIEW has no stored column metadata — the reference returns
        // an empty result (view/create.result:155-163)
        if (!catalog.tables.contains(name) && userViews.contains(name)) {
          val empty = Seq.empty[(String, String, String, String, String, String, String)]
            .toDF("Field", "Type", "Null", "Key", "Default", "Extra", "Greptime_type")
          return empty.limit(0)
        }
        val spec = catalog.spec(name)
        val dropped = droppedCols.getOrElse(name, Set.empty)
        val metas = colMeta.getOrElse(name,
          spark.read.option("mergeSchema", "true").parquet(spec.path).schema
            .filterNot(f => f.name == SeqCol)
            .map(f => ColMeta(f.name, greptimeNameOf(f.dataType), f.nullable, None, None))
            .toVector)
        val like = Option(likeOpt).map(_.replace("%", ".*").replace("_", "."))
        val df0 = metas.filterNot(mm => dropped.contains(mm.name))
          .filter(mm => like.forall(p => mm.name.matches(p)))
          .sortBy(_.name)
          .map { mm =>
            val key =
              if (mm.name == spec.timeIndex) "TIME INDEX"
              else if (spec.tags.contains(mm.name)) "PRI" else ""
            val nul = if (mm.nullable && mm.name != spec.timeIndex) "YES" else "NO"
            val dft = mm.default
              .map(_.stripPrefix("'").stripSuffix("'"))
              .map(d => if (d.matches("(?i)current_timestamp(\\(\\))?"))
                "current_timestamp()" else d)
              .getOrElse("")
            (mm.name, showCreateType(mm.gtype).toLowerCase(Locale.ROOT),
              nul, key, dft, "", mm.gtype)
          } match {
            // SHOW FULL COLUMNS adds Collation/Comment/Privileges
            // (starrocks_compatibility.result: utf8_bin for strings)
            case rows if full => rows.map { case (f, tp, nul, key, dft, ex, gt) =>
              (f, tp, if (gt == "String") "utf8_bin" else "", nul, key, dft,
                "", "select,insert", ex, gt)
            }.toDF("Field", "Type", "Collation", "Null", "Key", "Default",
              "Comment", "Privileges", "Extra", "Greptime_type")
            case rows => rows
              .toDF("Field", "Type", "Null", "Key", "Default", "Extra", "Greptime_type")
          }
        // `SHOW COLUMNS ... WHERE Field = 'x'` filters on the output
        // columns (show/show_columns.sql)
        Option(whereOpt).map(w => df0.where(dialect(w))).getOrElse(df0)
      case _ => throw new IllegalArgumentException(
        "Unexpected token while parsing SQL statement, expected: '{FROM | IN} table'")
    }
  }

  /** DESC TABLE in the reference's six-column shape
    * (sql/src/statements.rs `prepare_describe_arrow`):
    * Column | Type | Key | Null | Default | Semantic Type. */
  private def describeTable(name: String): DataFrame = {
    import spark.implicits._
    val spec = catalog.spec(name)
    val dropped = droppedCols.getOrElse(name, Set.empty)
    val rows: Seq[(String, String, Boolean)] = colMeta.get(name) match {
      case Some(metas) =>
        metas.filterNot(m => dropped.contains(m.name))
          .map(m => (m.name, m.gtype,
            m.nullable && m.name != spec.timeIndex))
      case None =>
        spark.read.option("mergeSchema", "true").parquet(spec.path).schema
          .filterNot(f => dropped.contains(f.name) || f.name == SeqCol)
          .map(f => (f.name, greptimeNameOf(f.dataType),
            f.nullable && f.name != spec.timeIndex))
    }
    val defaults = colMeta.getOrElse(name, Vector.empty)
      .map(m => m.name -> m.default).toMap
    // a metric physical table that ever hosted a logical table exposes
    // the reserved __table_id/__tsid tags between its declared columns
    // and the logically-added ones (create_metric_table.result)
    val withReserved: Seq[(String, String, Boolean)] = metricPhy.get(name) match {
      case Some(ps) if ps.everLogical =>
        val at = rows.indexWhere(r => ps.addedTags.contains(r._1)) match {
          case -1 => rows.length
          case i => i
        }
        rows.take(at) ++ Seq(("__table_id", "UInt32", false),
          ("__tsid", "UInt64", false)) ++ rows.drop(at)
      case _ => rows
    }
    withReserved.map { case (n, t, nullable) =>
      val semantic =
        if (n == spec.timeIndex) "TIMESTAMP"
        else if (spec.tags.contains(n) || n == "__table_id" || n == "__tsid") "TAG"
        else "FIELD"
      val key = if (semantic == "TIMESTAMP" || semantic == "TAG") "PRI" else ""
      // the reference renders defaults through its expression printer:
      // CURRENT_TIMESTAMP -> current_timestamp() (create_type_alias.result)
      val default = defaults.getOrElse(n, None)
        .map(_.stripPrefix("'").stripSuffix("'"))
        .map(d => if (d.matches("(?i)current_timestamp(\\(\\))?")) "current_timestamp()" else d)
        .getOrElse("")
      (n, t, key, if (nullable) "YES" else "NO", default, semantic)
    }.toDF("Column", "Type", "Key", "Null", "Default", "Semantic Type")
  }

  // ---- INSERT ---------------------------------------------------------

  private val InsertRx =
    ("(?is)INSERT\\s+INTO\\s+(?:TABLE\\s+)?((?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)" +
      "(?:\\.(?:\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*))?)\\s*(\\([^)]*\\))?\\s*(VALUES.*|SELECT.*)").r

  /** Drop a `,` that directly precedes `)` outside string literals. */
  private def stripTupleTrailingCommas(s: String): String = {
    if (!s.contains(',')) return s
    val sb = new StringBuilder(s.length)
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { sb.append(c); if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { sb.append(c); inQ = true; i += 1 }
      else if (c == ',') {
        var j = i + 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j < s.length && s.charAt(j) == ')') i += 1 // drop the comma
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `INSERT ... VALUES (DEFAULT, ...)`: the DEFAULT keyword resolves
    * to the column's declared default, else NULL
    * (insert/insert_default.result). */
  private def substituteDefaults(table: String, body: String,
      cols: Seq[String]): String = {
    if (!body.trim.toUpperCase(Locale.ROOT).startsWith("VALUES") ||
      !"(?i)\\bDEFAULT\\b".r.findFirstIn(body).isDefined) return body
    val resolved = colDefaultResolved.getOrElse(table, Map.empty)
    val defaults = colMeta.getOrElse(table, Vector.empty)
      .map(m => m.name -> resolved.get(m.name).orElse(m.default)).toMap
    val ti = scala.util.Try(catalog.spec(table).timeIndex).toOption
    val metas = colMeta.getOrElse(table, Vector.empty)
    val tuples = splitTop(body.trim.substring("VALUES".length)).map { t0 =>
      val t = t0.trim
      if (!t.startsWith("(")) t
      else splitTop(t.stripPrefix("(").stripSuffix(")")).zipWithIndex.map {
        case (f, i) if f.trim.equalsIgnoreCase("default") =>
          val cname = cols.lift(i).getOrElse("?")
          defaults.getOrElse(cname, None).getOrElse {
            // DEFAULT on the time index / a NOT NULL column without a
            // declared default is an error (insert/insert_default.result)
            if (ti.contains(cname) || metas.exists(m => m.name == cname && !m.nullable))
              throw new IllegalArgumentException(
                s"No valid default value can be built automatically, column: $cname")
            "NULL"
          }
        case (f, _) => f
      }.mkString("(", ", ", ")")
    }
    "VALUES " + tuples.mkString(", ")
  }

  private def insert(stmt: String): DataFrame = stmt match {
    case InsertRx(name0, colsOpt, body) =>
      val name = normTable(name0)
      val spec = catalog.spec(name)
      // ttl='instant': rows report 0 affected and are invisible to scans
      // (Catalog.readView filters them) but STILL persist so attached
      // flows can process them (flow/flow_advance_ttl streaming mode)
      val instant = spec.ttlMillis.contains(0L)
      val target = spark.read.option("mergeSchema", "true").parquet(spec.path).schema
      val cols = Option(colsOpt)
        .map(_.stripPrefix("(").stripSuffix(")").split(",").map(c => unquote(c)).toSeq)
        .getOrElse {
          // positional VALUES follow the declared (FIRST/AFTER-adjusted)
          // column order, not the physical parquet order
          val dropped = droppedCols.getOrElse(name, Set.empty)
          colMeta.get(name).map(_.map(_.name).filterNot(dropped.contains))
            .filter(_.nonEmpty)
            .getOrElse(target.map(_.name).toSeq.filterNot(_ == SeqCol))
        }
      // omitting the time index without a default is rejected
      // (insert/logical_metric_table.result t_default)
      if (!cols.exists(_.equalsIgnoreCase(spec.timeIndex)) &&
        !colMeta.getOrElse(name, Vector.empty)
          .find(_.name == spec.timeIndex).exists(_.default.isDefined))
        throw new IllegalArgumentException(
          s"Invalid request for region, reason: missing required time index column ${spec.timeIndex}")
      // the reference accepts trailing commas after the last VALUES
      // tuple (promql/simple_histogram.sql) and INSIDE a tuple before
      // `)` (insert/append_mode.sql); Spark doesn't
      val cleanBody = stripTupleTrailingCommas(body.trim.replaceAll(",\\s*$", ""))
      // a literal with nonzero digits past µs switches the table onto
      // the ns-fidelity read path (rewrites in dialect())
      if (target.exists(_.name.startsWith("__nsr_")) &&
          "[.]\\d{6}\\d*[1-9]".r.findFirstIn(cleanBody).isDefined)
        nsRemainderTables.add(name)
      if (cleanBody.toUpperCase(Locale.ROOT).startsWith("VALUES"))
        splitTop(cleanBody.substring("VALUES".length)).map(_.trim)
          .filter(_.startsWith("(")).foreach { t =>
            val n = splitTop(t.stripPrefix("(").stripSuffix(")")).size
            if (n != cols.size) throw new IllegalArgumentException(
              s"Invalid SQL, error: column count mismatch, columns: ${cols.size}, values: $n")
          }
      // a VALUES column that mixes numeric epoch literals with timestamp
      // exprs (now()) would fail Spark's inline-table coercion — wrap the
      // numerics in the epoch-ms convention up front
      // (system/semantic_graph.sql's `(now(), ...), (0, ...)`)
      def coerceMixedTs(valuesBody: String): String = {
        if (!valuesBody.trim.toUpperCase(Locale.ROOT).startsWith("VALUES"))
          return valuesBody
        val tsIdx = cols.zipWithIndex.filter { case (c, _) =>
          target.find(_.name == c).exists(f =>
            f.dataType == TimestampType || f.dataType == TimestampNTZType)
        }.map(_._2).toSet
        if (tsIdx.isEmpty) return valuesBody
        val tuples = splitTop(valuesBody.trim.substring("VALUES".length)).map(_.trim)
        if (tuples.isEmpty || !tuples.forall(_.startsWith("("))) return valuesBody
        val cells = tuples.map(t => splitTop(t.stripPrefix("(").stripSuffix(")")))
        val us = tsLiteralUs.getOrElse(name, 1000L)
        def isNum(t: String) = t.matches("-?\\d+")
        def isStr(t: String) = t.startsWith("'") && t.endsWith("'")
        val needCoerce = tsIdx.filter { i =>
          val toks = cells.map(_.lift(i).map(_.trim).getOrElse(""))
          val kinds = toks.map(t =>
            if (isNum(t)) 0 else if (isStr(t)) 1 else 2).distinct
          kinds.size > 1
        }
        if (needCoerce.isEmpty) return valuesBody
        "VALUES " + cells.map(_.zipWithIndex.map { case (tok0, i) =>
          val tok = tok0.trim
          if (needCoerce(i) && isNum(tok))
            if (us > 0) s"TIMESTAMP_MICROS(CAST($tok AS BIGINT) * $us)"
            else s"TIMESTAMP_MICROS(CAST($tok AS BIGINT) div 1000)"
          else if (needCoerce(i) && isStr(tok)) s"CAST($tok AS TIMESTAMP)"
          else tok
        }.mkString("(", ", ", ")")).mkString(", ")
      }
      var df = spark.sql(dialect(coerceMixedTs(
        graft.functions.JsonSql.foldParseJsonLiterals(
          // parse_vec over a literal folds to the literal itself — the
          // aligned projection parses strings into VECTOR columns, and
          // inline VALUES reject non-foldable calls (types/vector)
          foldIntProducts(substituteDefaults(name, cleanBody, cols)
            .replaceAll("(?i)\\bparse_vec\\s*\\(\\s*('[^']*')\\s*\\)", "$1"))))))
      df = df.toDF(cols: _*)
      // JSON2 type hints validate + materialize defaults at write time
      // (types/json/json2_type_hints.sql); eager so a violation aborts
      // the statement with the reference's message
      j2Hints.getOrElse(name, Map.empty).foreach { case (c, hs) =>
        if (cols.contains(c)) {
          val hintSpec = j2HintSpecJson(hs)
          df = df.withColumn(c,
            call_udf("__json2_hint", col(s"`$c`").cast(StringType), lit(hintSpec)))
          try df.select(col(s"`$c`")).foreach(_ => ())
          catch { case e: Throwable =>
            var cur: Throwable = e
            while (cur != null && !cur.isInstanceOf[IllegalArgumentException])
              cur = cur.getCause
            throw Option(cur).getOrElse(e)
          }
        }
      }
      // align to full target schema: missing columns become nulls, the
      // sequence column is stamped per statement (write order for the
      // last_row / last_non_null merge views)
      // duplicate keys WITHIN one statement: the later row wins (write
      // order), mirroring the reference's ingest; dedup here because the
      // statement-level seq can't order rows inside the statement
      var dedupApplied = false
      if (spec.mergeMode == MergeMode.LastRow) {
        val pkCols = spec.primaryKey.filter(cols.contains)
        if (pkCols.nonEmpty) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(pkCols.map(k => col(s"`$k`")): _*).orderBy(col("__ord").desc)
          df = df.withColumn("__ord", monotonically_increasing_id())
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__ord", "__rn")
          dedupApplied = true
        }
      }
      // a VALUES cell that cannot cast to the column type fails the whole
      // statement, nothing inserted (insert/mysql_insert.result: '15a'
      // into INT errors and the companion '16' row must not land)
      // type-changed columns store as STRING but validate/convert
      // against the CURRENT logical type (typeHistory semantics)
      val histCols = typeHistory.getOrElse(name, Map.empty).keySet
      def curTypeOf(c: String): DataType = sparkType(showCreateType(
        colMeta.getOrElse(name, Vector.empty).find(_.name == c)
          .map(_.gtype).getOrElse("String")))
      val badCast = target.filter(f => cols.contains(f.name)).flatMap { f =>
        val srcType = df.schema(f.name).dataType
        val logical = if (histCols.contains(f.name)) curTypeOf(f.name) else f.dataType
        if (srcType == StringType && logical != StringType &&
          logical != BinaryType && logical != TimestampType &&
          logical != TimestampNTZType && logical != DateType &&
          // VECTOR literals parse via parse_vec, not a SQL cast
          !logical.isInstanceOf[ArrayType])
          Some(col(s"`${f.name}`").isNotNull &&
            expr(s"try_cast(`${f.name}` AS ${logical.sql})").isNull)
        else None
      }
      if (badCast.nonEmpty && !df.filter(badCast.reduce(_ || _)).isEmpty)
        throw new IllegalArgumentException(
          "Unable to convert value to column datatype")
      val seq = seqCounter.incrementAndGet()
      val numericTypes: Set[DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      val aligned = target.map { f =>
        if (f.name == SeqCol && !cols.contains(SeqCol))
          lit(seq).cast(f.dataType).as(f.name)
        // hidden sub-µs remainder beside a TimestampNanosecond column:
        // digits 7-9 of a string literal's fraction, or epoch-ns % 1000
        // (types/timestamp/ts_precision_comparison.sql)
        else if (f.name.startsWith("__nsr_")) {
          val base = f.name.stripPrefix("__nsr_")
          val srcT = if (cols.contains(base))
            scala.util.Try(df.schema(base).dataType).toOption else None
          (srcT match {
            case Some(StringType) => expr(
              s"CAST(coalesce(CASE WHEN try_cast(`$base` AS BIGINT) IS NOT NULL " +
                s"THEN pmod(try_cast(`$base` AS BIGINT), 1000) " +
                s"WHEN instr(`$base`, '.') > 0 THEN try_cast(substring(rpad(" +
                s"substring(`$base`, instr(`$base`, '.') + 1), 9, '0')" +
                s", 7, 3) AS BIGINT) ELSE 0 END, 0) AS INT)")
            case Some(t) if numericTypes.contains(t) =>
              expr(s"CAST(pmod(CAST(`$base` AS BIGINT), 1000) AS INT)")
            case _ => lit(0)
          }).cast(IntegerType).as(f.name)
        }
        else if (cols.contains(f.name)) {
          val srcType = df.schema(f.name).dataType
          val isTs = f.dataType == TimestampType || f.dataType == TimestampNTZType
          // integer into TIME INDEX = epoch milliseconds (the reference's
          // TIMESTAMP(3) literal convention), not Spark's epoch seconds;
          // fractional numerics truncate toward zero first
          // (insert_select.result: memory=333.3 -> 00:00:00.333)
          if (isTs && (numericTypes.contains(srcType) ||
              srcType == DoubleType || srcType == FloatType ||
              srcType.isInstanceOf[DecimalType])) {
            val us = tsLiteralUs.getOrElse(name, 1000L)
            val micros =
              // exact when in range; saturate instead of ANSI-overflowing
              // (types/string/scan_big_varchar.sql multiplies epoch
              // seconds past the µs-representable horizon)
              if (us > 0) expr(
                s"coalesce(try_multiply(CAST(`${f.name}` AS BIGINT), ${us}L), " +
                  // exact 64-bit WRAPPING multiply via decimal modulus:
                  // out-of-range epochs stay distinct (scan_big_varchar's
                  // doubling counts would collide under saturation)
                  s"CAST(CAST((CAST(CAST(`${f.name}` AS BIGINT) AS DECIMAL(38,0))" +
                  s" * $us % 18446744073709551616" +
                  s" + 27670116110564327424) % 18446744073709551616" +
                  s" - 9223372036854775808 AS DECIMAL(20,0)) AS BIGINT))")
              else expr(s"CAST(`${f.name}` AS BIGINT) div 1000")
            timestamp_micros(micros).cast(f.dataType).as(f.name)
          }
          else if (isTs && srcType == StringType) {
            // numeric strings follow the same epoch convention
            // (insert/mysql_insert.result: '3' -> 00:00:00.003);
            // non-numeric strings parse as datetimes
            val us = tsLiteralUs.getOrElse(name, 1000L)
            val asNum = expr(s"try_cast(`${f.name}` AS BIGINT)")
            val micros =
              if (us > 0) asNum * lit(us) else expr(s"try_cast(`${f.name}` AS BIGINT) div 1000")
            when(asNum.isNotNull, timestamp_micros(micros).cast(f.dataType))
              .otherwise(col(s"`${f.name}`").cast(f.dataType)).as(f.name)
          }
          else if (histCols.contains(f.name))
            // normalize through the current logical type so the stored
            // string renders it faithfully ("1" vs "1.0")
            col(s"`${f.name}`").cast(curTypeOf(f.name)).cast(f.dataType).as(f.name)
          // VECTOR column from a '[1.0, 2.0]' literal (the reference
          // auto-parses; function/vector/vector_index.sql)
          else if (srcType == StringType && (f.dataType match {
              case ArrayType(FloatType, _) => true; case _ => false }))
            expr(s"parse_vec(`${f.name}`)").as(f.name)
          else col(s"`${f.name}`").cast(f.dataType).as(f.name)
        } else {
          // unspecified column: declared DEFAULT, else null
          // (datatypes/src/schema/constraint.rs)
          val d = colDefaultResolved.getOrElse(name, Map.empty).get(f.name)
            .orElse(colMeta.getOrElse(name, Vector.empty)
              .find(_.name == f.name).flatMap(_.default))
          val isTs = f.dataType == TimestampType || f.dataType == TimestampNTZType
          d.map { x =>
            // numeric default on a timestamp column = epoch millis
            // (insert/insert_default.result: DEFAULT -3 -> 23:59:59.997)
            if (isTs && x.matches("-?\\d+"))
              timestamp_micros(lit(x.toLong) * 1000L).cast(f.dataType).as(f.name)
            else if (histCols.contains(f.name))
              expr(dialect(x)).cast(curTypeOf(f.name)).cast(f.dataType).as(f.name)
            // VECTOR DEFAULT '[...]' parses, not casts (types/vector t2)
            else if ((f.dataType match {
                case ArrayType(FloatType, _) => true; case _ => false
              }) && x.trim.startsWith("'"))
              expr(s"parse_vec(${x.trim})").as(f.name)
            else expr(dialect(x)).cast(f.dataType).as(f.name)
          }.getOrElse(lit(null).cast(f.dataType).as(f.name))
        }
      }
      // a literal VALUES insert with no dedup/cast-drop has a known row
      // count — skip the extra count() job (halves insert latency; the
      // 1-second database-ttl test is wall-clock sensitive)
      val n =
        if (cleanBody.toUpperCase(Locale.ROOT).startsWith("VALUES") &&
            badCast.isEmpty && !dedupApplied)
          splitTop(cleanBody.substring("VALUES".length))
            .count(_.trim.startsWith("("))
            .toLong
        else df.count()
      // values truncate to the column's declared precision on write
      // (timestamp_precision_display.result: a TIMESTAMP(0) column
      // drops sub-second input; (3) drops sub-millisecond)
      val gtypeOf = colMeta.getOrElse(name, Vector.empty)
        .map(c => c.name -> c.gtype).toMap
      val alignedP = target.zip(aligned).map { case (f, c) =>
        if (f.dataType == TimestampType || f.dataType == TimestampNTZType)
          gtypeOf.get(f.name) match {
            case Some("TimestampSecond") =>
              date_trunc("second", c).cast(f.dataType).as(f.name)
            case Some("TimestampMillisecond") =>
              date_trunc("millisecond", c).cast(f.dataType).as(f.name)
            case _ => c
          }
        else c
      }
      df.select(alignedP: _*).write.mode("append").parquet(spec.path)
      refreshPath(spec.path)
      refreshView(name)
      logicalParent.get(name).foreach(refreshMetricPhyView)
      // SCHEDULED flows (EVAL INTERVAL) process source writes
      // continuously; flows without a schedule materialize only on
      // FLUSH_FLOW (flow_last_non_null: the un-flushed sibling flow's
      // windows must NOT recompute on the other flow's insert)
      flowMeta.foreach { case (fname, m) =>
        if (m.srcTable.contains(name) && m.evalInterval.isDefined)
          try refreshFlow(fname) catch {
            case e: Throwable =>
              System.err.println(s"[flow-refresh] $fname: ${String.valueOf(e.getMessage).take(160)}")
          }
      }
      status(s"inserted ${if (instant) 0L else n} rows into $name")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  // ---- DELETE ---------------------------------------------------------

  private val DeleteRx =
    "(?is)DELETE\\s+FROM\\s+(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)(?:\\s+WHERE\\s+(.*))?".r

  /** DELETE FROM t [WHERE cond] — rewrite the table's Parquet as the
    * raw rows (all merge versions, with `__seq` kept) minus the matches
    * (operator/src/delete.rs). */
  private def delete(stmt: String): DataFrame = stmt match {
    case DeleteRx(rawName, condOpt) =>
      // same identifier folding as CREATE: unquoted names case-fold
      // (delete.result's `DELETE FROM MoNiToR` hits table `monitor`)
      val name = normTable(rawName)
      val spec = catalog.spec(name)
      val raw = spark.read.option("mergeSchema", "true").parquet(spec.path)
      // integer literals compared against the time index are epoch
      // units of the column's precision (TypeConversionRule)
      val condSql = Option(condOpt).map { c0 =>
        val us = tsLiteralUs.getOrElse(name, 1000L)
        val ti = java.util.regex.Pattern.quote(spec.timeIndex)
        c0.replaceAll(
          s"(?i)\\b($ti)\\s*(=|!=|<>|<=|>=|<|>)\\s*(\\d+)\\b",
          if (us > 0) s"$$1 $$2 TIMESTAMP_MICROS(CAST($$3 AS BIGINT) * $us)"
          else s"$$1 $$2 TIMESTAMP_MICROS(CAST($$3 AS BIGINT) div 1000)")
      }
      val cond = condSql.map(c => expr(dialect(c))).getOrElse(lit(true))
      val kept = raw.filter(!coalesce(cond, lit(false)))
      val n = raw.count() - kept.count()
      val tmp = spec.path + "__del_tmp"
      kept.write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(spec.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(spec.path), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(spec.path))
      refreshPath(spec.path)
      refreshView(name)
      status(s"deleted $n rows from $name")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  /** TRUNCATE [TABLE] t — with or without the TABLE keyword, optionally
    * `FILE RANGE (a, b), ...` (mito region truncate); every form drops
    * all data (truncate/truncate.result pins FILE RANGE wiping the whole
    * table too). */
  private val TruncateRx =
    "(?is)TRUNCATE\\s+(?:TABLE\\s+)?([A-Za-z_\"`][A-Za-z0-9_.\"`-]*)\\s*(?:FILE\\s+RANGE\\b.*)?".r

  private def truncateTable(stmt: String): DataFrame = stmt.trim match {
    case TruncateRx(name0) =>
      val name = normTable(name0)
      if (!catalog.tables.contains(name))
        throw new IllegalArgumentException(
          s"Table not found: greptime.$currentDb.$name")
      migrateParquet(catalog.spec(name))(_.filter(lit(false)))
      refreshView(name)
      status(s"table $name truncated")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  // ---- COPY TO/FROM (§2.1) --------------------------------------------
  // operator/src/statement.rs:269-307 (`COPY TABLE TO/FROM`,
  // `COPY (query) TO`, `COPY DATABASE`), options per
  // operator/src/statement/copy_table_from.rs: format, pattern (regex),
  // start_time/end_time ([start, end) on the time index),
  // timestamp_format/date_format (strftime rendering for text formats),
  // compression_type, LIMIT n (tables only).

  private def parseCopyOpts(withBody: Option[String]): Map[String, String] =
    withBody.map { b =>
      splitTop(b).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(
          k.trim.toLowerCase(Locale.ROOT) ->
            v.trim.stripPrefix("'").stripSuffix("'")
              .stripPrefix("\"").stripSuffix("\""))
        case _ => None
      }).toMap
    }.getOrElse(Map.empty)

  private def parseCopyTime(s: String): java.time.Instant = {
    val t = s.trim.replace(' ', 'T')
    val withZone = if (t.endsWith("Z") || t.contains("+")) t else t + "Z"
    java.time.Instant.parse(
      // Instant.parse needs seconds — pad a bare "HH:mm" if ever given
      if (withZone.count(_ == ':') == 1) withZone.replace("Z", ":00Z") else withZone)
  }

  private def copyTimeFilter(df: DataFrame, tsCol: String,
      opts: Map[String, String]): DataFrame = {
    var out = df
    opts.get("start_time").foreach { s =>
      out = out.filter(col(s"`$tsCol`") >=
        lit(java.sql.Timestamp.from(parseCopyTime(s))).cast(df.schema(tsCol).dataType))
    }
    opts.get("end_time").foreach { s =>
      out = out.filter(col(s"`$tsCol`") <
        lit(java.sql.Timestamp.from(parseCopyTime(s))).cast(df.schema(tsCol).dataType))
    }
    out
  }

  /** strftime-render timestamp/date columns for text exports
    * (copy_to_fs.result timestamp_format='%m-%d-%Y'). */
  private def copyRenderTimes(df: DataFrame, opts: Map[String, String]): DataFrame = {
    val tsFmt = opts.get("timestamp_format")
    val dFmt = opts.get("date_format")
    if (tsFmt.isEmpty && dFmt.isEmpty) return df
    // java8API is on: TIMESTAMP_NTZ surfaces as LocalDateTime in UDFs
    val strf = udf((ts: java.time.LocalDateTime, fmt: String) =>
      if (ts == null) null
      else graft.functions.Registry.Strftime.format(java.sql.Timestamp.valueOf(ts), fmt))
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType if tsFmt.isDefined =>
          strf(col(s"`${f.name}`").cast(TimestampNTZType), lit(tsFmt.get)).as(f.name)
        case DateType if dFmt.isDefined =>
          strf(col(s"`${f.name}`").cast(TimestampNTZType), lit(dFmt.get)).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }.toSeq: _*)
  }

  private def copyWriteOpts(opts: Map[String, String]): graft.sources.Copy.Options =
    graft.sources.Copy.Options(
      format = opts.getOrElse("format", "parquet"),
      compression = opts.get("compression_type"),
      pattern = opts.get("pattern"))

  private def copyExtOf(opts: Map[String, String]): String =
    opts.getOrElse("format", "parquet").toLowerCase

  /** COPY <table> TO: export the visible (merged) rows as one file. */
  private def copyTableTo(name: String, path: String,
      opts: Map[String, String]): Long = {
    val spec = catalog.spec(name)
    var df = spark.table(name)
    df = copyTimeFilter(df, spec.timeIndex, opts)
    val n = df.count()
    graft.sources.Copy.exportSingleFile(
      copyRenderTimes(df, opts), path, copyWriteOpts(opts))
    n
  }

  /** COPY <table> FROM: read files, adapt to the table schema (casts,
    * DEFAULTs for missing columns, extras dropped — copy_table_from.rs),
    * filter the time range, append. */
  private def copyTableFrom(name: String, path: String,
      opts: Map[String, String], limit: Option[Long]): Long = {
    val spec = catalog.spec(name)
    val files = graft.sources.Copy.listSourceFiles(spark, path, opts.get("pattern"))
    val src0 = graft.sources.Copy.importFiles(spark, files, copyWriteOpts(opts))
    val srcCols = src0.schema.fields.map(f => f.name.toLowerCase(Locale.ROOT) -> f.name).toMap
    val target = spark.read.option("mergeSchema", "true").parquet(spec.path).schema
    val metas = colMeta.getOrElse(name, Vector.empty)
    val seq = seqCounter.incrementAndGet()
    val aligned = target.map { f =>
      if (f.name == SeqCol) lit(seq).cast(f.dataType).as(f.name)
      else srcCols.get(f.name.toLowerCase(Locale.ROOT)) match {
        case Some(srcName) =>
          val srcType = src0.schema(srcName).dataType
          val isTs = f.dataType == TimestampType || f.dataType == TimestampNTZType
          // numeric into a timestamp column = epoch milliseconds, same
          // literal convention as INSERT
          if (isTs && (srcType == LongType || srcType == IntegerType ||
              srcType == DoubleType || srcType.isInstanceOf[DecimalType]))
            timestamp_micros(col(s"`$srcName`").cast(LongType) * 1000L)
              .cast(f.dataType).as(f.name)
          else col(s"`$srcName`").cast(f.dataType).as(f.name)
        case None =>
          val d = colDefaultResolved.getOrElse(name, Map.empty).get(f.name)
            .orElse(metas.find(_.name == f.name).flatMap(_.default))
          val isTs = f.dataType == TimestampType || f.dataType == TimestampNTZType
          d.map { x =>
            if (isTs && x.matches("-?\\d+"))
              timestamp_micros(lit(x.toLong) * 1000L).cast(f.dataType).as(f.name)
            else expr(dialect(x)).cast(f.dataType).as(f.name)
          }.getOrElse(lit(null).cast(f.dataType).as(f.name))
      }
    }
    var df = src0.select(aligned: _*)
    df = copyTimeFilter(df, spec.timeIndex, opts)
    limit.foreach(n => df = df.limit(n.toInt))
    val n = df.count()
    df.write.mode("append").parquet(spec.path)
    refreshPath(spec.path)
    refreshView(name)
    n
  }

  private val CopyRx =
    ("(?is)COPY\\s+(DATABASE\\s+)?" +
      "(\\((?:[^()']|'[^']*'|\\([^()]*\\))*\\)|\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*)\\s+" +
      "(TO|FROM)\\s+'([^']+)'\\s*" +
      "(?:WITH\\s*\\((.*?)\\)\\s*)?" +
      "(?:LIMIT\\s+(\\S+)\\s*)?").r

  /** File-engine external table: a read-only view over files at a
    * location (reference `CREATE EXTERNAL TABLE ... WITH (location,
    * format)`, operator/src/statement/ddl.rs; pinned by
    * standalone/local_file_access.result). Schema is inferred from the
    * files; an explicit column list is accepted and used as-declared
    * names only (the file carries the types). */
  private val externalTables = scala.collection.mutable.Set.empty[String]
  private val CreateExtRx =
    ("(?is)CREATE\\s+EXTERNAL\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?" +
      "(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(?:\\(([^)]*)\\))?\\s*WITH\\s*\\((.*)\\)").r
  private def createExternalTable(stmt: String): DataFrame = stmt.trim match {
    case CreateExtRx(name0, _, withBody) =>
      val name = normIdent(unquote(name0))
      val opts = parseCopyOpts(Some(withBody))
      val loc = opts.getOrElse("location", throw new IllegalArgumentException(
        "Invalid SQL, error: location is required for external table"))
      val fmt = opts.getOrElse("format", "parquet").toLowerCase(Locale.ROOT)
      var r = spark.read.format(fmt)
      if (fmt == "csv")
        r = r.option("header", "true").option("inferSchema", "true")
      r.load(loc).createOrReplaceTempView(name)
      externalTables += name
      status("external table created")
    case _ => throw new IllegalArgumentException(
      s"cannot parse CREATE EXTERNAL TABLE: $stmt")
  }

  /** `COMMENT ON TABLE|COLUMN|FLOW <target> IS '<text>'|NULL` —
    * reference operator/src/statement.rs comment statements; pinned by
    * common/comment.result (SHOW CREATE + information_schema echoes). */
  private val CommentOnRx =
    ("(?is)COMMENT\\s+ON\\s+(TABLE|COLUMN|FLOW)\\s+" +
      "([A-Za-z0-9_.\"`]+)\\s+IS\\s+(NULL|'(?:[^']|'')*')\\s*").r
  private def commentOn(stmt: String): DataFrame = stmt.trim match {
    case CommentOnRx(kind, target, value) =>
      val cmt: Option[String] =
        if (value.equalsIgnoreCase("NULL")) None
        else Some(value.substring(1, value.length - 1).replace("''", "'"))
      kind.toUpperCase(Locale.ROOT) match {
        case "TABLE" =>
          val t = normTable(target)
          if (!catalog.tables.contains(t))
            throw new IllegalArgumentException(
              s"Table not found: greptime.$currentDb.$t")
          val rest = tableOpts.getOrElse(t, Nil).filterNot(_._1 == "comment")
          val next = cmt.map(c => rest :+ ("comment" -> c)).getOrElse(rest)
          if (next.isEmpty) tableOpts.remove(t) else tableOpts.put(t, next)
        case "COLUMN" =>
          val i = target.lastIndexOf('.')
          if (i <= 0) throw new IllegalArgumentException(
            "COMMENT ON COLUMN expects table.column")
          val t = normTable(target.substring(0, i))
          val c = normIdent(unquote(target.substring(i + 1)))
          val ms = colMeta.getOrElse(t,
            throw new IllegalArgumentException(
              s"Table not found: greptime.$currentDb.$t"))
          if (!ms.exists(_.name == c))
            throw new IllegalArgumentException(s"Column not found: $c")
          colMeta.put(t, ms.map(m =>
            if (m.name == c) m.copy(comment = cmt) else m))
        case "FLOW" =>
          val f = unquote(target)
          if (!flows.contains(f))
            throw new IllegalArgumentException(s"flow $f not found")
          cmt match {
            case Some(c) => flowComments.put(f, c)
            case None => flowComments.remove(f)
          }
      }
      status("comment set")
    case _ => throw new IllegalArgumentException(s"cannot parse COMMENT ON: $stmt")
  }

  private def copyStatement(stmt: String): DataFrame = stmt.trim match {
    case CopyRx(dbKw, target, dir0, path, withBody, limitTok) =>
      // local paths must stay inside the copy root — reject traversal
      // (operator's object-store path guard; local_file_access.result)
      if (!path.contains("://") && path.split("[/\\\\]+").contains(".."))
        throw new IllegalArgumentException(
          s"Local filesystem path '$path' is outside the configured copy " +
            "root or is unsafe: '..' path components are not allowed; use " +
            "a path relative to the copy root or use S3, OSS, GCS, or AzBlob")
      val opts = parseCopyOpts(Option(withBody))
      val toDir = dir0.equalsIgnoreCase("TO")
      val limit: Option[Long] = Option(limitTok).map { t =>
        if (dbKw != null) throw new IllegalArgumentException(
          "Invalid SQL, error: limit is not supported in COPY DATABASE")
        if (!t.matches("\\d+")) throw new IllegalArgumentException(
          s"Unexpected token while parsing SQL statement, expected: 'the number of maximum rows', found: $t")
        t.toLong
      }
      val n: Long =
        if (dbKw != null) {
          // COPY DATABASE <db> TO/FROM '<dir>': one file per table
          val ext = copyExtOf(opts)
          val tables = catalog.tables.filterNot(_.contains("__schema__"))
          if (toDir)
            tables.map(t => copyTableTo(t, s"${path.stripSuffix("/")}/$t.$ext", opts)).sum +
              externalTables.toSeq.sorted.map { t =>
                val df = spark.table(t)
                val cnt = df.count()
                graft.sources.Copy.exportSingleFile(df,
                  s"${path.stripSuffix("/")}/$t.$ext", copyWriteOpts(opts))
                cnt
              }.sum
          else {
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(p)) throw new IllegalArgumentException(s"path not found: $path")
            fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq
              .flatMap { fn =>
                val i = fn.indexOf('.')
                val base = if (i <= 0) fn else fn.substring(0, i)
                if (tables.contains(base))
                  Some(copyTableFrom(base, s"${path.stripSuffix("/")}/$fn", opts, None))
                else None
              }.sum
          }
        } else if (target.startsWith("(")) {
          // COPY (query) TO
          if (!toDir) throw new IllegalArgumentException("COPY (query) FROM is not supported")
          val df = sql(target.substring(1, target.length - 1))
          val cnt = df.count()
          graft.sources.Copy.exportSingleFile(
            copyRenderTimes(df, opts), path, copyWriteOpts(opts))
          cnt
        } else {
          val name = normTable(target)
          if (!catalog.tables.contains(name))
            throw new IllegalArgumentException(
              s"Table not found: greptime.$currentDb.$name")
          if (toDir) copyTableTo(name, path, opts)
          else copyTableFrom(name, path, opts, limit)
        }
      status(s"copied $n rows")
    case _ => throw new IllegalArgumentException(s"cannot parse COPY: $stmt")
  }

  // ---- CREATE FLOW (§2.10) --------------------------------------------

  private val CreateFlowRx =
    ("(?is)CREATE\\s+(?:OR\\s+REPLACE\\s+)?FLOW\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_][A-Za-z0-9_]*)\\s+" +
      // the sink name may be single-quoted (distributed/flow-tql/
      // tsid_on_phy.sql: SINK TO 'test_tsid_output')
      "SINK\\s+TO\\s+'?([A-Za-z0-9_/.:-]+)'?\\s*" +
      "(?:EVAL\\s+INTERVAL\\s+'([^']*)'\\s*)?" +     // batching refresh period
      "(?:EXPIRE\\s+AFTER\\s+'?([^'\\s]+)'?\\s*)?" + // state retention
      "(?:EVAL\\s+INTERVAL\\s+'([^']*)'\\s*)?" +
      "(?:COMMENT\\s+'([^']*)'\\s*)?" +
      "(?:WITH\\s*\\((.*?)\\)\\s*)?AS\\s+((?:SELECT|WITH|TQL).*)").r

  /** Catalog tables a flow query reads — matches both the bare name and
    * the `db."table"` spelling of per-schema mangled tables
    * (flow/flow_batch_join_subquery.sql joins two qualified sources). */
  private def flowSourceTables(query: String, sink: String): Seq[String] = {
    // TQL bodies: only PromQL SELECTOR names are sources — a token scan
    // would match table `tql` against the TQL keyword itself
    // (flow-tql/flow_tql_cte.sql creates exactly that table)
    if (query.trim.toUpperCase(Locale.ROOT).startsWith("TQL")) {
      import PromParser._
      def sels(e: Expr): Seq[String] = e match {
        case s: Selector => Seq(s.name)
        case Call(_, as) => as.flatMap(sels)
        case Agg(_, _, _, p, b) => p.toSeq.flatMap(sels) ++ sels(b)
        case Binary(_, l, r, _, _) => sels(l) ++ sels(r)
        case Subquery(e2, _, _, _) => sels(e2)
        case Unary(e2) => sels(e2)
        case _ => Nil
      }
      return parseTqlHead(query.trim).toSeq.flatMap { case (_, promql) =>
        (try Some(PromParser.parse(promql)) catch { case _: Throwable => None })
          .toSeq.flatMap(sels)
      }.distinct.filter(t => t != sink && catalog.tables.contains(t)).sorted
    }
    catalog.tables.filter { t =>
      val rx = t.split("__schema__", 2) match {
        case Array(d, tb) =>
          "(?i)\\b" + java.util.regex.Pattern.quote(d) +
            "\\s*\\.\\s*[\"`]?" + java.util.regex.Pattern.quote(tb) + "[\"`]?"
        case _ => "(?i)\\b" + java.util.regex.Pattern.quote(t) + "\\b"
      }
      t != sink && rx.r.findFirstIn(query).isDefined
    }.sorted
  }

  /** A flow body may be plain SELECT, a CTE query, or TQL EVAL
    * (flow/flow_tql_avg.sql, flow/flow_scheduled_late_overlap.sql). */
  private def flowQueryDf(query: String): DataFrame = {
    val u = query.trim.toUpperCase(Locale.ROOT)
    if (u.startsWith("TQL")) tqlEval(query.trim)
    else if (u.startsWith("WITH") &&
        "(?is)\\bTQL\\s+EVAL\\b".r.findFirstIn(query).isDefined)
      sql(rewriteTqlCtes(query))
    else spark.sql(dialect(query))
  }

  /** Per-flow sink metadata: sink table, renamed output columns, and
    * whether the sink carries the reference's __ts_placeholder column. */
  private case class FlowMeta(sinkTable: String, outNames: Seq[String],
      placeholder: Boolean, srcTable: Option[String] = None,
      createSeq: Long = 0L,
      opts: Map[String, String] = Map.empty,
      evalInterval: Option[String] = None,
      streaming: Boolean = false,
      pending: Boolean = false,
      srcEpoch: Long = 0L,
      createdMs: Long = 0L,
      updatedMs: Long = 0L)
  private val flowMeta = scala.collection.concurrent.TrieMap.empty[String, FlowMeta]
  /** stable ids + last-refresh stamps for information_schema.flows /
    * flow_statistics (reference flows.rs, flow_statistics.rs) */
  private val flowIds = scala.collection.concurrent.TrieMap.empty[String, Int]
  private val flowIdCounter = new java.util.concurrent.atomic.AtomicInteger(1023)
  private val flowLastExecMs = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def flowIdOf(name: String): Int =
    flowIds.getOrElseUpdate(name, flowIdCounter.incrementAndGet())
  /** created stays across CREATE OR REPLACE; updated bumps (flow_view) */
  private def flowStamp(name: String): (Long, Long) = {
    val now = System.currentTimeMillis()
    (flowMeta.get(name).map(_.createdMs).filter(_ > 0).getOrElse(now), now)
  }
  /** last source sequence a streaming flow appended through */
  private val flowLastSeq = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** last schedule boundary a scheduled flow ticked at (read-time
    * catch-up; see [[catchUpScheduledFlows]]) */
  private val flowLastTickMs = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** The reference's batching engine ticks an EVAL INTERVAL flow on a
    * background schedule. Emulated deterministically: when a flow's
    * SINK is read, evaluate once per schedule boundary elapsed since
    * the last tick, with now() pinned at each boundary
    * (distributed/flow-tql/flow_eval_interval_schedule.result pins >=2
    * distinct scheduled ticks after a 5 s sleep on a '1s' flow).
    * Restricted to flows whose query references now()/
    * current_timestamp — for any other query a tick on an unchanged
    * source is an idempotent upsert, observationally a no-op. */
  private def catchUpScheduledFlows(stmt: String): Unit = {
    if (flowMeta.isEmpty) return
    flowMeta.foreach { case (f, m) =>
      m.evalInterval.foreach { iv =>
        val usesNow = flows.get(f).exists { case (_, q) =>
          "(?i)\\b(now|current_timestamp)\\s*\\(".r.findFirstIn(q).isDefined }
        val sinkRead = ("(?i)\\b" +
          java.util.regex.Pattern.quote(m.sinkTable) + "\\b").r
          .findFirstIn(stmt).isDefined
        if (usesNow && sinkRead) {
          val ivMs = math.max(1000L, scala.util.Try(intervalMs(iv))
            .getOrElse(PromParser.parseDuration(iv)))
          val nowB = math.floorDiv(System.currentTimeMillis(), 1000L) * 1000L
          var last = flowLastTickMs.getOrElse(f,
            math.floorDiv(m.createdMs, 1000L) * 1000L)
          // bound the backfill to the trailing window — older ticks on
          // the same data are subsumed by the newer ones
          if (nowB - last > 20L * ivMs) last = nowB - 20L * ivMs
          while (last + ivMs <= nowB) {
            last += ivMs
            flowLastTickMs.put(f, last)
            try refreshFlow(f, Some(last)) catch {
              case e: Throwable => System.err.println(
                s"[flow-tick] $f: ${String.valueOf(e.getMessage).take(160)}")
            }
          }
        }
      }
    }
  }
  /** PREPARE name FROM '...' templates (prepare/mysql_prepare.sql) */
  private val preparedStmts = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Open cursors: name → (partition-streaming row iterator, schema).
    * DECLARE/FETCH/CLOSE (operator/src/statement/cursor.rs). */
  private val cursors = scala.collection.concurrent.TrieMap
    .empty[String, (java.util.Iterator[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType)]
  /** DDL procedure log for information_schema.procedure_info */
  private val procedureLog =
    scala.collection.mutable.ListBuffer.empty[(String, String)]
  /** case-collision shadow columns: (name, default, typeTok) per table —
    * declared but not parquet-materialized (alter/add_col.sql "IdC") */
  private val shadowCols =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(String, Option[String], String)]]
  /** per-table generation counter: DROP TABLE bumps it, so a flow bound
    * to the old incarnation stops refreshing (flow_rebuild.result pins
    * that a re-created source is "a different table" to the flow) */
  private val tableEpoch = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Top-level select-list items of the flow query. */
  private def selectList(query: String): Seq[String] = {
    val up = query.toUpperCase(Locale.ROOT)
    val start = up.indexOf("SELECT") + "SELECT".length
    // find the top-level FROM
    var i = start; var depth = 0
    var from = -1
    while (i < query.length && from < 0) {
      val c = query.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && up.startsWith("FROM", i) &&
        (i == 0 || !Character.isLetterOrDigit(up.charAt(i - 1))) &&
        (i + 4 >= up.length || !Character.isLetterOrDigit(up.charAt(i + 4)))) from = i
      i += 1
    }
    val list = query.substring(start, if (from < 0) query.length else from)
      .replaceFirst("(?is)^\\s*DISTINCT\\s+", "")
    splitTop(list)
  }

  /** DataFusion-style output names for the flow's select items: aliases
    * win; an unaliased `fn(col)` becomes `fn(table.col)` (the auto sink
    * column "sum(numbers_input_basic.number)" in flow_basic.result). */
  private def flowOutputNames(query: String, sparkNames: Seq[String]): Seq[String] = {
    // WITH/TQL bodies: the engine's own output names stand
    if (!query.trim.toUpperCase(Locale.ROOT).startsWith("SELECT"))
      return sparkNames
    val table = "(?is)\\bFROM\\s+(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)".r
      .findFirstMatchIn(query).map(m => normTable(m.group(1)))
    val items = selectList(query)
    if (items.length != sparkNames.length) return sparkNames
    val aliasRx = "(?is)\\s+AS\\s+(\"[^\"]+\"|`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)\\s*$".r
    val fnRx = "(?s)^([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)$".r
    items.zip(sparkNames).map { case (item0, sparkName) =>
      val item = item0.trim
      aliasRx.findFirstMatchIn(item) match {
        case Some(m) => normIdent(m.group(1))
        case None => item match {
          case _ if item.matches("[A-Za-z_][A-Za-z0-9_]*") => normIdent(item)
          case fnRx(fn, args) =>
            // DataFusion's generated name qualifies source-column refs
            // at ANY depth: `sum(abs(number))` on numbers_input_df_func
            // names the sink column `sum(abs(numbers_input_df_func
            // .number))` (flow_call_df_func.sql) — qualify exactly the
            // identifiers that are columns of the source table
            val cols: Set[String] = table.toSeq.flatMap(t =>
              scala.util.Try(spark.table(t).columns.toSeq).getOrElse(Nil))
              .map(_.toLowerCase(Locale.ROOT)).toSet
            val qual = "(?<![A-Za-z0-9_.])([A-Za-z_][A-Za-z0-9_]*)(?![A-Za-z0-9_]*\\s*\\()".r
              .replaceAllIn(args, m =>
                if (table.isDefined && cols.contains(m.group(1).toLowerCase(Locale.ROOT)))
                  s"${table.get}.${m.group(1)}"
                else m.group(1))
            s"${fn.toLowerCase(Locale.ROOT)}($qual)"
          case _ => sparkName
        }
      }
    }
  }

  private def sqlTypeTok(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP(3)"
    case BinaryType => "BINARY"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _ => "STRING"
  }

  /** flow WITH-option keys the reference accepts (flows.rs options
    * validation — anything else errors, show_create_flow's
    * `access_key_id` case). */
  private val flowOptionKeys =
    Set("defer_on_missing_source", "keys", "flow_type", "batching_interval",
      "experimental_enable_incremental_read")

  /** CREATE FLOW ... AS TQL EVAL validation, mirroring the reference's
    * flow TQL parser + const-eval (flow-tql/flow_tql.result):
    *  - range bounds must be now()-relative;
    *  - a top-level `+ '...'::interval` tail folds to an
    *    IntervalMonthDayNano, which is not extractable as a timestamp;
    *  - a negative duration bound fails the seconds→Duration convert;
    *  - the source must carry exactly ONE f64 value column. */
  private def validateTqlFlow(query: String): Unit = {
    import PromParser._
    val (args, promql) = parseTqlHead(query.trim).getOrElse(return)
    args.take(2).foreach { a =>
      if (!a.toLowerCase(Locale.ROOT).contains("now"))
        throw new IllegalArgumentException(
          "Invalid TQL syntax: sql parser error: Expected expression containing `now()`")
      if ("(?i)\\+\\s*'[^']*'\\s*::\\s*interval\\s*$".r.findFirstIn(a.trim).isDefined)
        throw new IllegalArgumentException(
          "Invalid TQL syntax: Failed to evaluate TQL expression: " +
            "Failed to extract a timestamp value")
    }
    val (sMs, eMs) = (tqlTimeMs(args(0)), tqlTimeMs(args(1)))
    if (sMs < 0 || eMs < 0)
      throw new IllegalArgumentException(
        "Failed to convert float seconds to duration: " +
          "cannot convert float seconds to Duration: value is negative")
    def sels(e: Expr): Seq[Selector] = e match {
      case s: Selector => Seq(s)
      case Call(_, as) => as.flatMap(sels)
      case Agg(_, _, _, p, b) => p.toSeq.flatMap(sels) ++ sels(b)
      case Binary(_, l, r, _, _) => sels(l) ++ sels(r)
      case Subquery(e2, _, _, _) => sels(e2)
      case Unary(e2) => sels(e2)
      case _ => Nil
    }
    (try Some(PromParser.parse(promql)) catch { case _: Throwable => None })
      .toSeq.flatMap(sels).foreach { s =>
        val fs = tqlFieldsOf(s.name)
        if (fs.length > 1)
          throw new IllegalArgumentException(
            s"Invalid query: TQL query only supports one f64 value column, " +
              s"table `greptime.$currentDb.${s.name}` has ${fs.length} f64 value columns")
      }
  }

  /** Plan-derived sink layout for a TQL flow whose sink doesn't exist:
    * (rename old→new for the value column, sink column order, PK). */
  private def tqlSinkShape(query: String)
      : Option[(Map[String, String], Seq[String], Seq[String])] = {
    import PromParser._
    val (_, promql) = parseTqlHead(query.trim).getOrElse(return None)
    val ast = try PromParser.parse(promql) catch { case _: Throwable => return None }
    ast match {
      case Agg("count_values", _, _, Some(StringLit(dst)), sel: Selector)
          if catalog.tables.contains(sel.name) =>
        val f = valueFieldOf(sel.name).getOrElse(return None)
        // the value lands in qdf under the source's field name (tqlReshape)
        val nm = s"count(${sel.name}.$f)"
        Some((Map(f -> nm), Seq(nm, "ts", dst), Seq(dst)))
      case Call(fn, Seq(sel: Selector)) if sel.rangeMs.isDefined &&
          catalog.tables.contains(sel.name) =>
        val f = valueFieldOf(sel.name).getOrElse(return None)
        val spec = catalog.spec(sel.name)
        val nm = s"prom_${fn.toLowerCase(Locale.ROOT)}(ts_range,$f,${spec.timeIndex}," +
          s"Int64(${sel.rangeMs.get}))"
        // tagged source: tags follow the value, keyed in declared order
        Some((Map(f -> nm), Seq("ts", nm) ++ spec.tags, spec.tags))
      case _ => None
    }
  }

  /** Simplest-form TQL CTE in CREATE FLOW (flow-tql/flow_tql_cte.sql):
    * `WITH name [(aliases)] AS (TQL EVAL ...) SELECT * FROM name` — the
    * reference's flow engine accepts EXACTLY this shape (matching CTE
    * name incl. quoted case) and rejects everything else. */
  private val FlowTqlCteRx =
    ("(?is)^\\s*WITH\\s+(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(?:\\(([^)]*)\\))?\\s*AS\\s*\\(\\s*(TQL\\s+EVAL.*?)\\)\\s*" +
      "SELECT\\s+\\*\\s+FROM\\s+(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$").r

  private def createFlow(stmt: String): DataFrame = stmt match {
    case CreateFlowRx(name, sink, ev1, expire, ev2, cmtPart, withPart, query0) =>
      Option(cmtPart).foreach(flowComments.put(name, _))
      val query00 = rewriteFlowIntDiv(query0)
      // resolve the WITH-TQL-CTE form down to its inner TQL EVAL; CTE
      // column aliases rename the TQL outputs positionally
      val (query, cteAliases): (String, Seq[String]) =
        if (query00.trim.toUpperCase(Locale.ROOT).startsWith("WITH") &&
            "(?is)\\bTQL\\s+EVAL\\b".r.findFirstIn(query00).isDefined) {
          FlowTqlCteRx.findFirstMatchIn(query00.trim) match {
            case Some(mm) =>
              def tok(t: String): String =
                if (t.startsWith("\"")) t.substring(1, t.length - 1)
                else t.toLowerCase(Locale.ROOT)
              if (tok(mm.group(1)) != tok(mm.group(4)))
                throw new IllegalArgumentException(
                  "Invalid flow query: WITH is only supported for the " +
                    "simplest TQL CTE in CREATE FLOW")
              (mm.group(3).trim,
                Option(mm.group(2)).map(_.split(",").map(a => unquote(a.trim)).toSeq)
                  .getOrElse(Nil))
            case None => throw new IllegalArgumentException(
              "Invalid flow query: WITH is only supported for the " +
                "simplest TQL CTE in CREATE FLOW")
          }
        } else (query00, Nil)
      val up0 = stmt.toUpperCase(Locale.ROOT)
      val orReplace = up0.contains("OR REPLACE")
      val ifNotExists = up0.contains("IF NOT EXISTS")
      // the reference rejects combining the two (show_create_flow.result:
      // `CREATE OR REPLACE FLOW IF NOT EXISTS` errors, old flow remains)
      if (orReplace && ifNotExists)
        throw new IllegalArgumentException(
          "create flow: OR REPLACE and IF NOT EXISTS cannot be used together")
      if (flows.contains(name)) {
        if (ifNotExists && !orReplace) return status(s"flow $name exists")
        if (!orReplace)
          throw new IllegalArgumentException(s"flow $name already exists")
      }
      val opts: Map[String, String] = Option(withPart).map { w =>
        splitTop(w).flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase(Locale.ROOT) ->
            v.trim.stripPrefix("'").stripSuffix("'"))
          case _ => None
        }).toMap
      }.getOrElse(Map.empty)
      opts.keys.find(!flowOptionKeys.contains(_)).foreach(k =>
        throw new IllegalArgumentException(s"invalid flow option: $k"))
      val evalInterval = Option(ev1).orElse(Option(ev2))
      val sinkName = normTable(sink)
      val isTqlFlow = query.trim.toUpperCase(Locale.ROOT).startsWith("TQL")
      if (isTqlFlow) validateTqlFlow(query)
      // evaluate once for the output schema (also validates the query) —
      // with defer_on_missing_source a missing source registers the flow
      // in pending state instead (flow/flow_pending.sql)
      val qdf =
        try flowQueryDf(query)
        catch {
          case e: Throwable
              if opts.get("defer_on_missing_source").contains("true") =>
            flows.put(name, (FlowDef(name, "", Nil, identity,
              expireAfter = Option(expire), allowUnpartitioned = true), query))
            val (createdMs, updatedMs) = flowStamp(name)
            flowIdOf(name)
            flowMeta.put(name, FlowMeta(sinkName, Nil, placeholder = false,
              srcTable = None, createSeq = seqCounter.get(), opts = opts,
              evalInterval = evalInterval, pending = true,
              createdMs = createdMs, updatedMs = updatedMs))
            return status(s"flow $name pending")
        }
      // TQL flows auto-create their sink with the PLAN-derived value
      // column name (flow-tql/flow_tql.result: count_values →
      // "count(src.field)" laid out [value, ts, dst]; range fns →
      // "prom_fn(ts_range,field,ts,Int64(range))" laid out [ts, value])
      val tqlShape: Option[(Map[String, String], Seq[String], Seq[String])] =
        if (isTqlFlow && !catalog.tables.contains(sinkName)) tqlSinkShape(query)
        else None
      val names0 = flowOutputNames(query, qdf.schema.fieldNames.toSeq)
        .map(n => tqlShape.flatMap(_._1.get(n)).getOrElse(n))
      val names =
        if (cteAliases.nonEmpty && cteAliases.length == names0.length) cteAliases
        else names0
      val isTsType = (dt: DataType) =>
        dt == TimestampType || dt == TimestampNTZType
      val tsOut = names.zip(qdf.schema.fields)
        .find { case (_, f) => isTsType(f.dataType) }.map(_._1)
      val preExisting = catalog.tables.contains(sinkName)
      val srcTable0 = flowSourceTables(query, sinkName).headOption
      // incremental reads need an append-only source: an upsert source
      // would require old-value compensation (flow_incremental_aggr.sql)
      if (opts.get("experimental_enable_incremental_read").contains("true") &&
          srcTable0.exists(t => catalog.spec(t).mergeMode != MergeMode.Append))
        throw new IllegalArgumentException(
          "Incremental aggregate reads only support append-only source tables")
      if (!preExisting && tqlShape.isDefined) {
        // TQL flow sink: plan-derived layout, NO update_at column
        // (flow-tql/flow_tql.result SHOW CREATE pins the exact shape)
        val Some((_, order, pk)) = tqlShape
        val fieldByName = names.zip(qdf.schema.fields).toMap
        val colDefs = order.filter(fieldByName.contains)
          .map(n => s""""$n" ${sqlTypeTok(fieldByName(n).dataType)}""")
        val ti = tsOut.getOrElse("__ts_placeholder")
        val pkC = if (pk.nonEmpty)
          Seq(pk.map(k => s""""$k"""").mkString("PRIMARY KEY (", ", ", ")"))
        else Nil
        createTable(s"""CREATE TABLE IF NOT EXISTS "$sinkName" (""" +
          (colDefs ++ Seq(s"""TIME INDEX ("$ti")""") ++ pkC).mkString(", ") +
          ") WITH ('comment' = 'Auto created table by flow engine')")
      }
      else if (!preExisting) {
        // auto-create the sink the way the reference flow engine does
        // (flow_auto_sink_table.result): outputs, update_at, and a
        // __ts_placeholder time index when no output is a timestamp
        val items = selectList(query)
        val colDefs = names.zip(qdf.schema.fields).zipWithIndex.map {
          case ((n, f), i) =>
            // 3-arg date_bin (with a string origin) yields nanosecond
            // precision in the reference, 2-arg stays millisecond
            // (flow_basic's ngx_country vs flow_auto_sink_table)
            def dateBin3Args(it: String): Boolean = {
              val lo = it.toLowerCase(Locale.ROOT)
              val at = lo.indexOf("date_bin")
              if (at < 0) false
              else {
                val args = it.substring(it.indexOf('(', at) + 1)
                splitTop(args.substring(0, {
                  var d = 1; var j = 0
                  while (j < args.length && d > 0) {
                    if (args.charAt(j) == '(') d += 1
                    else if (args.charAt(j) == ')') d -= 1
                    if (d > 0) j += 1
                  }
                  j
                })).size >= 3
              }
            }
            val tok =
              if (isTsType(f.dataType) && items.lift(i).exists(dateBin3Args))
                "TIMESTAMP(9)"
              else sqlTypeTok(f.dataType)
            s""""$n" $tok"""
        }
        val ti = tsOut.getOrElse("__ts_placeholder")
        // TQL flow sinks carry no update_at (flow-tql/flow_tql_cte.result)
        val extras = (if (isTqlFlow) Nil else Seq(""""update_at" TIMESTAMP(3)""")) ++
          (if (tsOut.isEmpty) Seq(""""__ts_placeholder" TIMESTAMP(3)""") else Nil)
        // SELECT DISTINCT flows key the sink by the distinct columns
        val isDistinct = "(?is)^\\s*SELECT\\s+DISTINCT\\b".r.findFirstIn(query).isDefined
        val gbKeys =
          if (isDistinct)
            names.zip(qdf.schema.fields)
              .filterNot { case (n, f) => n == ti || isTsType(f.dataType) }.map(_._1)
          else inferGroupByKeys(query)
            .map(normIdent).filter(k => names.contains(k) && k != ti)
        val pk = if (gbKeys.nonEmpty)
          Seq(gbKeys.map(k => s""""$k"""").mkString("PRIMARY KEY (", ", ", ")"))
        else Nil
        // streaming-mode fallback (ttl'd source) labels the sink with the
        // flow id; batching mode uses the generic comment
        val comment =
          if (flowModeStreaming(query, srcTable0))
            s"Sink table for flow flow-id=${1024 + flows.size}" // streaming-mode fallback
          else "Auto created table by flow engine"
        createTable((s"""CREATE TABLE IF NOT EXISTS "$sinkName" (""" +
          (colDefs ++ extras ++ Seq(s"""TIME INDEX ("$ti")""") ++ pk).mkString(", ") +
          s") WITH ('comment' = '$comment')"))
      }
      val spec = catalog.spec(sinkName)
      // a PRE-CREATED sink maps flow outputs POSITIONALLY onto its
      // declared columns (flow_null: `time_window` lands in `ts`) —
      // except when all output names already exist in the sink (TQL
      // flows emit [value, sensor, ts] against a (value, ts, sensor)
      // sink: align by NAME, flow_tql_avg.result)
      val finalNames =
        if (preExisting) {
          val declared = colMeta.getOrElse(sinkName, Vector.empty).map(_.name)
          if (names.length > declared.length)
            throw new IllegalArgumentException(
              s"flow $name: ${names.length} outputs exceed sink $sinkName's " +
                s"${declared.length} columns")
          if (names.toSet.subsetOf(declared.toSet)) {
            // partial column coverage needs per-column merge on the sink:
            // without merge_mode=last_non_null the reference rejects the
            // plan at CREATE FLOW time (flow_last_non_null's 2nd section)
            // columns with a declared default (and the engine's own
            // update_at/placeholder) are fillable — only a defaultless
            // uncovered column demands per-column merge
            val defaulted = colMeta.getOrElse(sinkName, Vector.empty)
              .filter(_.default.isDefined).map(_.name).toSet
            val missing = declared.toSet -- names.toSet -- defaulted -
              "update_at" - "__ts_placeholder"
            if (missing.nonEmpty && spec.mergeMode != MergeMode.LastNonNull)
              throw new IllegalArgumentException(
                "Failed to rewrite plan: flow output misses sink columns " +
                  missing.mkString(", "))
            names
          }
          else {
            // positional mapping must be type-sound: a numeric output
            // cannot land in a timestamp column (show_create_flow's
            // n1,n2 → (number, ts) replace errors in the reference)
            val declMeta = colMeta.getOrElse(sinkName, Vector.empty)
            names.zip(qdf.schema.fields).zipWithIndex.foreach {
              case ((_, f), i) =>
                val declTs = declMeta.lift(i)
                  .exists(m => showCreateType(m.gtype).startsWith("TIMESTAMP"))
                if (declTs && !isTsType(f.dataType))
                  throw new IllegalArgumentException(
                    s"flow $name: output ${f.name} (${f.dataType.simpleString}) " +
                      s"cannot map onto timestamp column ${declMeta(i).name}")
            }
            declared.take(names.length).toSeq
          }
        } else names
      // SELECT DISTINCT flows upsert on the distinct columns — a later
      // eval over only-new rows must not replace earlier sink rows
      // (flow_advance_ttl: dis accumulates 20,22 then 23)
      val distinctKeys =
        if ("(?is)^\\s*SELECT\\s+DISTINCT\\b".r.findFirstIn(query).isDefined)
          names.zip(qdf.schema.fields)
            .filterNot { case (_, f) => isTsType(f.dataType) }.map(_._1)
        else Nil
      // a TQL flow upserts on the PromQL grouping labels + ts
      // (flow_tql_avg: avg by(sensor) keys the sink on sensor)
      val tqlByKeys =
        if (isTqlFlow)
          ("(?i)\\bby\\s*\\(([^)]*)\\)".r.findFirstMatchIn(query)
            .map(_.group(1).split(",").map(_.trim).toSeq).getOrElse(Nil) ++
            tqlShape.map(_._3).getOrElse(Nil))
            .distinct.filter(names.contains)
        else Nil
      val rawKeys = opts.get("keys").map(_.split(",").map(_.trim).toSeq)
        .getOrElse(((if (distinctKeys.nonEmpty) distinctKeys
          else if (tqlByKeys.nonEmpty) tqlByKeys
          else inferGroupByKeys(query).map(normIdent).filter(names.contains)) ++
          tsOut.toSeq).distinct)
      val upsertKeys = rawKeys.flatMap { k =>
        val i = names.indexOf(k)
        if (i >= 0 && i < finalNames.length) Some(finalNames(i)) else None
      }.distinct
      // in-session sinks are small catalog tables; the 100TB path is a
      // FlowDef with time-bucket partitionBy (see streaming/Flow.scala)
      val flowDef = FlowDef(name, spec.path, upsertKeys, identity,
        expireAfter = Option(expire), allowUnpartitioned = true)
      flows.put(name, (flowDef, query))
      // the flow only sees rows written AFTER its creation (flow_flush:
      // pre-existing rows stay invisible even after FLUSH_FLOW)
      val streaming = flowModeStreaming(query, srcTable0)
      val (createdMs, updatedMs) = flowStamp(name)
      flowIdOf(name)
      flowMeta.put(name,
        FlowMeta(sinkName, finalNames, placeholder = !preExisting && tsOut.isEmpty,
          srcTable = srcTable0, createSeq = seqCounter.get(), opts = opts,
          evalInterval = evalInterval, streaming = streaming,
          srcEpoch = srcTable0.map(t => tableEpoch.getOrElse(t, 0L)).getOrElse(0L),
          createdMs = createdMs, updatedMs = updatedMs))
      flowLastSeq.put(name, seqCounter.get())
      // the reference flow engine materializes nothing at creation time —
      // rows appear on FLUSH_FLOW / the eval interval (flow_flush.result)
      status(s"flow $name created")
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  /** Flow execution mode (flows.rs mode selection, pinned by
    * flow_advance_ttl + flow_no_aggr): an instant-ttl source or a
    * non-aggregating query falls back to streaming; aggregations run
    * as batching flows. */
  private def aggregatingQuery(query: String): Boolean = {
    val u = query.toUpperCase(Locale.ROOT)
    u.matches("(?s).*\\bGROUP\\s+BY\\b.*") ||
      u.matches("(?s).*\\bBY\\s*\\(.*") || // TQL `by(...)` grouping
      "(?is)^\\s*SELECT\\s+DISTINCT\\b".r.findFirstIn(query).isDefined ||
      ("(?i)\\b(sum|count|avg|min|max|first_value|last_value|array_agg|" +
        "approx_\\w+|hll|uddsketch_\\w+|stddev\\w*|var\\w*)\\s*\\(").r
        .findFirstIn(query).isDefined
  }

  private def flowModeStreaming(query: String, srcTable: Option[String]): Boolean = {
    val instantSrc = srcTable.exists(s =>
      catalog.tables.contains(s) && catalog.spec(s).ttlMillis.contains(0L))
    // TQL flows always run in the batching engine — a plain-selector TQL
    // is not a streaming append (flow-tql/flow_tql_cte's sink comment +
    // flush rows pin batching behavior)
    if (query.trim.toUpperCase(Locale.ROOT).startsWith("TQL")) instantSrc
    else instantSrc || !aggregatingQuery(query)
  }

  /** DataFusion divides integer aggregates integrally (sum(int)/count →
    * Int64) while Spark's `/` always yields DOUBLE; rewrite a top-level
    * `a/b` select item to `a div b` when both operands analyze to
    * integral types (flow_basic's avg_after_filter_num BIGINT sink). */
  private def rewriteFlowIntDiv(query: String): String = try {
    val m = "(?is)^(\\s*SELECT\\s+(?:DISTINCT\\s+)?)(.*?)(\\sFROM\\s.*)$".r
      .findFirstMatchIn(query).getOrElse(return query)
    val items = splitTop(m.group(2))
    val slash = items.map { it =>
      // top-level single '/' split (outside parens/quotes)
      var depth = 0; var pos = -1
      var i = 0
      while (i < it.length) {
        it.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case '\'' => i += 1 + it.substring(i + 1).indexOf('\'').max(0)
          case '/' if depth == 0 => pos = i
          case _ => ()
        }
        i += 1
      }
      (it, pos)
    }
    if (!slash.exists(_._2 > 0)) return query
    val rewritten = slash.map {
      case (it, -1) => it
      case (it, pos) =>
        val aliasRx = "(?is)^(.*?)(\\s+AS\\s+\\S+\\s*)$".r
        val (exprPart, alias) = it match {
          case aliasRx(e, a) => (e, a)
          case _ => (it, "")
        }
        val p2 = if (pos < exprPart.length) pos else -1
        if (p2 <= 0) it
        else {
          val (l, r) = (exprPart.substring(0, p2), exprPart.substring(p2 + 1))
          val probe = m.group(1) + items.mkString(", ") +
            s", ($l) AS __pl, ($r) AS __pr" + m.group(3)
          val sch = spark.sql(dialect(probe)).schema
          val integral = Set[DataType](LongType, IntegerType, ShortType, ByteType)
          if (integral(sch("__pl").dataType) && integral(sch("__pr").dataType))
            s"($l) div ($r)$alias"
          else it
        }
    }
    m.group(1) + rewritten.mkString(", ") + m.group(3)
  } catch { case _: Exception => query }

  /** Plain column identifiers in the final GROUP BY clause. */
  private[graft] def inferGroupByKeys(query: String): Seq[String] = {
    val gb = "(?is).*GROUP\\s+BY\\s+(.*?)(?:HAVING|ORDER\\s+BY|LIMIT|$).*".r
    query match {
      case gb(cols) =>
        splitTop(cols).filter(c => c.matches("[A-Za-z_][A-Za-z0-9_]*"))
      case _ => Nil
    }
  }

  // ---- TQL EVAL (§2.6) ------------------------------------------------

  /** Trailing `AS alias` on the PromQL body names the value column
    * (tql/tql-cte.sql, tql/basic.sql `{...} AS series`). */
  private val TqlValAliasRx = "(?is)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r

  /** `TQL EVAL (args...) promql` with a PAREN-AWARE arg split — bounds
    * may be arbitrary expressions containing commas
    * (tql/basic.sql: `date_trunc('day', '...'::timestamp)`). */
  private def parseTqlHead(stmt: String): Option[(Seq[String], String)] = {
    val m = "(?is)^\\s*TQL\\s+EVAL\\s*\\(".r.findFirstMatchIn(stmt).getOrElse(
      return None)
    val open = m.end - 1
    var depth = 0; var i = open; var close = -1; var inStr = false
    while (i < stmt.length && close < 0) {
      val c = stmt.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return None
    val args = splitTop(stmt.substring(open + 1, close)).map(_.trim)
    if (args.length < 3 || args.length > 4) None
    else {
      // `TQL EVAL (s,e,step), expr` — the reference's grammar accepts an
      // optional comma before the query (tql/binary_operator.sql)
      Some((args, stmt.substring(close + 1).trim.stripPrefix(",").trim))
    }
  }

  /** Numeric field columns of a catalog table, declared order. */
  private def tqlFieldsOf(name: String): Seq[String] = {
    if (!catalog.tables.contains(name)) return Nil
    val spec = catalog.spec(name)
    scala.util.Try(spark.table(name)).toOption.map(_.schema.fields
      .filter(f => !spec.tags.contains(f.name) && f.name != spec.timeIndex &&
        (f.dataType == DoubleType || f.dataType == FloatType ||
          f.dataType == LongType || f.dataType == IntegerType))
      .map(_.name).toSeq).getOrElse(Nil)
  }

  /** GreptimeDB multi-field PromQL: a binary operator between selectors
    * whose tables carry SEVERAL field columns pairs the fields
    * POSITIONALLY — `data / data` on (val1,val2,val3) yields three value
    * columns `lhs.valN / rhs.valN` (tql/binary_operator.sql; the
    * reference plans this in promql/src/planner.rs via its field-column
    * matrix). Each pair evaluates as an ordinary single-field binary and
    * the results join back on (labels, ts). */
  private def tqlMultiField(promql: String, ep: EvalParams): Option[DataFrame] = {
    import PromParser._
    val ast = try PromParser.parse(promql) catch { case _: Throwable => return None }
    ast match {
      case Binary(op, l: Selector, r: Selector, boolMod, matching)
          if graft.promql.PromQL.ArithOps.contains(op) && !boolMod =>
        def fieldsOf(sel: Selector): Seq[String] = {
          val explicit = sel.matchers.filter(_.label == "__field__").map(_.value)
          if (explicit.nonEmpty) explicit else tqlFieldsOf(sel.name)
        }
        val lf = fieldsOf(l); val rf = fieldsOf(r)
        if ((lf.length < 2 && rf.length < 2) || lf.length != rf.length ||
          lf.isEmpty) return None
        val metrics = catalog.tables.map(t => t -> metricOf(t)).toMap
        val ev = new PromEval(spark, metrics, ep)
        def single(sel: Selector, f: String): Selector =
          sel.copy(matchers =
            sel.matchers.filterNot(_.label == "__field__") :+
              Matcher("__field__", "=", f))
        val parts = lf.zip(rf).map { case (a, b) =>
          ev.eval(Binary(op, single(l, a), single(r, b), boolMod, matching)) match {
            case Right(iv) => (s"lhs.$a $op rhs.$b", iv)
            case Left(_) => return None
          }
        }
        val labels = parts.head._2.labels
        val keys = labels :+ "__ts"
        val joined = parts.map { case (nm, iv) =>
          iv.df.select(keys.map(c => col(s"`$c`")) :+ col("__val").as(nm): _*)
        }.reduce((a, b) => a.join(b, keys, "inner"))
        Some(joined.select(
          (timestamp_millis(col("__ts")).as("ts") +:
            parts.map { case (nm, _) => col(s"`$nm`") }) ++
            labels.sorted.map(c => col(s"`$c`")): _*))
      case _ => None
    }
  }

  private def tqlEval(stmt: String): DataFrame = parseTqlHead(stmt) match {
    case Some((args, promql0)) =>
      val startMs = tqlTimeMs(args(0))
      val endMs = tqlTimeMs(args(1))
      // a bare number is SECONDS, fractions included
      // (promql/binary_time_fn.sql steps by 120, tql/basic.sql by 0.5)
      def durMs(s0: String): Long = {
        val s = s0.stripPrefix("'").stripSuffix("'")
        if (s.matches("\\d+(\\.\\d+)?")) (s.toDouble * 1000.0).toLong
        else PromParser.parseDuration(s)
      }
      val stepMs = durMs(args(2))
      val lookbackMs = args.lift(3).map(durMs).getOrElse(300000L)
      val (promql, valAlias) = promql0.trim match {
        case TqlValAliasRx(body, a)
            // `... offset 50s` and range selectors end in durations, not
            // aliases; only treat the tail as an alias after ')' or an
            // identifier that isn't itself the whole query
            if body.trim.endsWith(")") || body.trim.endsWith("]") ||
              body.trim.endsWith("}") =>
          (body.trim, Some(a))
        case p => (p, None)
      }
      tqlMultiField(promql, EvalParams(startMs, endMs, stepMs, lookbackMs))
        .foreach(df => return df)
      // a whole-body double-quoted string is a PromQL STRING literal:
      // its raw text repeats as the value at every step
      // (tql/literal_only.sql `"1+1"` → rows of the string "1+1")
      val StrLitRx = "(?s)^\"([^\"]*)\"$".r
      promql match {
        case StrLitRx(sv) =>
          val steps = math.max((endMs - startMs) / math.max(stepMs, 1L), 0L)
          return spark.range(0, steps + 1)
            .select(timestamp_millis(lit(startMs) + col("id") * lit(stepMs)).as("ts"),
              lit(sv).as("value"))
        case _ =>
      }
      val metrics = catalog.tables.map(t => t -> metricOf(t)).toMap
      val df = new PromEval(spark, metrics,
        EvalParams(startMs, endMs, stepMs, lookbackMs)).evalQuery(promql)
      tqlReshape(promql, df, valAlias)
    case None
        if "(?is)^\\s*TQL\\s+EVAL\\s+[A-Za-z_{]".r.findFirstIn(stmt).isDefined =>
      // range-less `TQL EVAL <expr>` evaluates over an empty range —
      // zero rows, zero columns (promql/timestamp_fn.result issue 6707)
      spark.emptyDataFrame
    case _ => throw new IllegalArgumentException(s"cannot parse: $stmt")
  }

  // ---- TQL EVAL inside CTEs (tql/tql-cte.sql) -------------------------

  private var tqlCteN = 0

  /** `WITH name [(cols)] AS (TQL EVAL ...)` — evaluate each TQL CTE
    * eagerly into a temp view, leaving a plain-SQL WITH for Spark. The
    * reference plans these inline (query/src/planner.rs); eager
    * evaluation is equivalent because a TQL result is bounded by its
    * (start, end, step) grid. */
  private def rewriteTqlCtes(stmt: String): String = {
    val HeadRx = ("(?is)([A-Za-z_][A-Za-z0-9_]*)\\s*" +
      "(\\(\\s*[A-Za-z_][A-Za-z0-9_]*(?:\\s*,\\s*[A-Za-z_][A-Za-z0-9_]*)*\\s*\\))?" +
      "\\s+AS\\s*\\(").r
    var s = stmt
    var changed = true
    while (changed) {
      changed = false
      for (m <- HeadRx.findAllMatchIn(s).toList if !changed) {
        val open = m.end - 1
        var depth = 0; var i = open; var inStr = false; var close = -1
        while (i < s.length && close < 0) {
          val c = s.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        val body = if (close > 0) s.substring(open + 1, close).trim else ""
        // a RANGE-select CTE body (cte/cte.sql's `AVG(latency) RANGE
        // '2s' ... ALIGN '2s'`) evaluates eagerly the same way — its
        // result is bounded by the source's aligned grid
        val isRangeBody = close > 0 && {
          val up = body.toUpperCase(Locale.ROOT)
          up.startsWith("SELECT") && up.contains(" ALIGN ") &&
            "(?i)\\bRANGE\\s+'".r.findFirstIn(body).isDefined
        }
        if (isRangeBody) {
          var df = sql(body)
          Option(m.group(2)).foreach { lst =>
            val names = lst.trim.stripPrefix("(").stripSuffix(")")
              .split(",").map(_.trim).toIndexedSeq
            df = df.toDF(names: _*)
          }
          tqlCteN += 1
          val view = s"__tql_cte_$tqlCteN"
          df.createOrReplaceTempView(view)
          s = s.substring(0, m.start) +
            s"${m.group(1)} AS (SELECT * FROM $view)" + s.substring(close + 1)
          changed = true
        }
        else if (close > 0 && body.toUpperCase(Locale.ROOT).startsWith("TQL")) {
          var df = tqlEval(body)
          Option(m.group(2)).foreach { lst =>
            val names = lst.trim.stripPrefix("(").stripSuffix(")")
              .split(",").map(_.trim).toIndexedSeq
            // the alias list maps positionally onto the reference PLAN's
            // schema: for an aggregation that is Aggregate's output
            // [ts, by-labels, value] (tql-cte.result's EXPLAIN pins
            // `labels.ts AS ts, sum(labels.cpu) AS summary`) while our
            // rendered shape is [value, by-labels, ts] — reorder first
            val isAgg = parseTqlHead(body).map(_._2).exists { p =>
              try PromParser.parse(p.trim.replaceAll(
                "(?is)\\s+AS\\s+[A-Za-z_][A-Za-z0-9_]*\\s*$", ""))
                .isInstanceOf[PromParser.Agg]
              catch { case _: Throwable => false }
            }
            if (isAgg && df.columns.length >= 2) {
              val cs = df.columns
              df = df.select((cs.last +: cs.drop(1).dropRight(1).toSeq :+ cs.head)
                .map(col): _*)
            }
            df = df.toDF(names: _*)
          }
          tqlCteN += 1
          val view = s"__tql_cte_$tqlCteN"
          df.createOrReplaceTempView(view)
          s = s.substring(0, m.start) +
            s"${m.group(1)} AS (SELECT * FROM $view)" + s.substring(close + 1)
          changed = true
        }
      }
    }
    s
  }

  /** Reorder/retype TQL output to the reference planner's column shape
    * (pinned by the tql/promql sqlness corpus): ts is rendered as a
    * timestamp, and column order depends on the top-level expression —
    * bare selector → [value, (labels∪ts) by name]; aggregation →
    * [value, by-labels, ts]; range-fn / scalar / default →
    * [ts, value, labels]. */
  private def tqlReshape(promql: String, df: DataFrame,
      valAlias: Option[String] = None): DataFrame = {
    def lcol(n: String): org.apache.spark.sql.Column = col(s"`$n`")
    import PromParser._
    val labels = df.columns.filterNot(Set("__ts", "__val")).toSeq
    if (!df.columns.contains("__ts") || !df.columns.contains("__val")) return df
    val ts = timestamp_millis(col("__ts")).as("ts")
    val v = col("__val")
    val setOps = Set("and", "or", "unless")
    def isLit(e: Expr): Boolean = e match {
      case _: NumberLit | _: StringLit => true
      case Call("scalar", _) => true
      case _ => false
    }
    // shape mirrors the reference planner's projection for each plan
    // form (pinned by tql/ + promql/ sqlness goldens)
    def shapeOf(e: Expr): String = e match {
      case Selector(_, _, None, _, _) => "selector"
      case Selector(_, _, Some(_), _, _) => "range"
      case Agg(_, _, _, _, _) => "agg"
      case Call("scalar", _) => "scalar"
      case Call(fn, _) if fn == "label_join" || fn == "label_replace" => "label"
      case Call(_, _) => "range"
      case Binary(op, lhs, rhs, boolMod, _) =>
        val comparison = Set("==", "!=", ">", "<", ">=", "<=").contains(op)
        if (setOps.contains(op.toLowerCase(Locale.ROOT))) shapeOf(lhs)
        else if (isLit(lhs) && isLit(rhs)) "scalar"
        else if (comparison && !boolMod)
          // filter comparison keeps the child plan's projection
          shapeOf(if (isLit(lhs)) rhs else lhs)
        else if (isLit(lhs) || isLit(rhs)) {
          // arithmetic/bool with a literal: NumberLit keeps the child
          // shape; scalar()/time() re-projects to [labels, ts, value]
          val lit = if (isLit(lhs)) lhs else rhs
          lit match {
            case _: NumberLit | _: StringLit =>
              shapeOf(if (isLit(lhs)) rhs else lhs)
            case _ => "vecbinary"
          }
        } else "vecbinary"
      case Unary(inner) => shapeOf(inner)
      case Subquery(inner, _, _, _) => shapeOf(inner)
      case _ => "range"
    }
    def firstSel(x: Expr): Option[String] = x match {
      case Selector(n, _, _, _, _) => Some(n)
      case Binary(_, l, rr, _, _) => firstSel(l).orElse(firstSel(rr))
      case Call(_, as) => as.flatMap(firstSel(_).toSeq).headOption
      case Agg(_, _, _, _, b) => firstSel(b)
      case Subquery(inner, _, _, _) => firstSel(inner)
      case Unary(inner) => firstSel(inner)
      case _ => None
    }
    val ast = try Some(PromParser.parse(promql)) catch { case _: Throwable => None }
    val shape = ast.map(shapeOf).getOrElse("range")
    val table = ast.flatMap(firstSel).filter(catalog.tables.contains)
    val cols: Seq[org.apache.spark.sql.Column] = shape match {
      case "selector" =>
        table match {
          case Some(t) =>
            val spec = catalog.spec(t)
            val declared = colMeta.get(t).map(_.map(_.name))
              .getOrElse(spark.table(t).columns.toVector)
              .filterNot(droppedCols.getOrElse(t, Set.empty))
            def toCol(c: String): Option[org.apache.spark.sql.Column] =
              if (c == spec.timeIndex) Some(ts)
              else if (labels.contains(c)) Some(lcol(c))
              else if (!spec.tags.contains(c)) Some(v) // the value field
              else None
            // labels joined in by set ops (or-union pads the rhs-only
            // columns, e.g. `l`) aren't in the table's declared schema —
            // keep them at the end
            val extra = labels.filterNot(declared.contains).sorted.map(lcol)
            // non-ms time index is cast by the planner, which moves the
            // ts column to the end: [fields, tags, ts]
            (if (tsLiteralUs.get(t).exists(_ != 1000L))
              (declared.filterNot(c => c == spec.timeIndex || spec.tags.contains(c))
                .flatMap(toCol) ++
                declared.filter(spec.tags.contains).flatMap(toCol)) :+ ts
            else declared.flatMap(toCol)) ++ extra
          case None => (v +: labels.sorted.map(lcol)) :+ ts
        }
      case "agg" => (v +: labels.map(lcol)) :+ ts
      case "scalar" => Seq(ts, v)
      case "vecbinary" => labels.sorted.map(lcol) ++ Seq(ts, v)
      case "label" =>
        // new/destination label first, then the original labels
        val dst = ast.flatMap {
          case Call(_, args) => args.collectFirst { case StringLit(s) => s }
          case _ => None
        }
        val rest = labels.filterNot(dst.contains).sorted
        Seq(ts, v) ++ (dst.filter(labels.contains).toSeq ++ rest).map(lcol)
      case _ => (ts +: Seq(v)) ++ labels.map(lcol)
    }
    val out = df.select(cols: _*)
    // name the value column like the reference planner: an explicit
    // `AS alias` wins, else the first selector's value-field name
    // (tql/tql-cte.sql relies on these names in the outer SELECT)
    valAlias.orElse(table.flatMap(valueFieldOf))
      .filterNot(out.columns.contains)
      .map(n => out.withColumnRenamed("__val", n)).getOrElse(out)
  }

  /** First numeric non-tag/non-time field of a table — the column the
    * PromQL planner treats as the metric value (mirrors [[metricOf]]). */
  private def valueFieldOf(name: String): Option[String] = {
    val spec = catalog.spec(name)
    catalog.read(name).schema.fields.find(f =>
      !spec.tags.contains(f.name) && f.name != spec.timeIndex &&
        (f.dataType == DoubleType || f.dataType == FloatType ||
          f.dataType == LongType || f.dataType == IntegerType)).map(_.name)
  }

  private def tqlTimeMs(s: String): Long = {
    // strip quotes only when they wrap the WHOLE token — an expression
    // like `'…'::timestamp + interval …` must stay intact (tql/basic.sql)
    val s1 = s.trim
    val t =
      if (s1.length >= 2 && s1.startsWith("'") && s1.endsWith("'") &&
          !s1.substring(1, s1.length - 1).contains("'"))
        s1.substring(1, s1.length - 1)
      else s1
    if (t.matches("\\d+")) t.toLong * 1000L // epoch seconds, like the reference
    else if (t.matches("\\d+\\.\\d+")) (t.toDouble * 1000.0).toLong // fractional s
    else if (t.matches("[0-9TZ:. +-]+")) java.time.Instant.parse(
      if (t.endsWith("Z")) t else t.replace(" ", "T") + "Z").toEpochMilli
    else {
      // expression bound, e.g. `now() - '1m'::interval`
      // (flow/flow_tql_avg.sql) — evaluate through the dialect layer;
      // truncated to whole seconds like the reference's grid timestamps.
      // An INTERVAL-typed bound (tql/basic.sql `now() - now()`) reads as
      // an offset from the epoch.
      val e = dialect(t)
      val ms =
        try spark.sql(s"SELECT unix_millis(CAST(($e) AS TIMESTAMP))")
          .head.getLong(0)
        catch {
          case _: Exception =>
            spark.sql(s"SELECT unix_millis(timestamp_millis(0) + ($e))")
              .head.getLong(0)
        }
      math.floorDiv(ms, 1000L) * 1000L
    }
  }

  /** Table → PromQL metric: tags are labels, first double/float field is
    * the value, time index normalized to epoch-ms. */
  private def metricOf(name: String): Metric = {
    val spec = catalog.spec(name)
    // the registered VIEW, not the raw storage: a logical metric table's
    // tag columns exist only in the view over its physical region
    // (promql/tsid_binary_join_regression.sql), and the view also
    // carries backfills/casts. Tables without any numeric field fall
    // back to the raw read, whose __seq column stands in as the value
    // (pinned by GraftSessionSpec's TQL-over-logs case).
    val df = scala.util.Try(spark.table(name)).toOption
      .filter(_.schema.fields.exists(f =>
        !spec.tags.contains(f.name) && f.name != spec.timeIndex &&
          (f.dataType == DoubleType || f.dataType == FloatType ||
            f.dataType == LongType || f.dataType == IntegerType)))
      .getOrElse(catalog.read(name))
    val tsType = df.schema(spec.timeIndex).dataType
    val tsMsCol = tsType match {
      case LongType => col(spec.timeIndex) // assume epoch-ms longs
      case _ => unix_millis(col(spec.timeIndex).cast("timestamp"))
    }
    val valueCol = df.schema.fields
      .find(f => !spec.tags.contains(f.name) && f.name != spec.timeIndex &&
        (f.dataType == DoubleType || f.dataType == FloatType ||
          f.dataType == LongType || f.dataType == IntegerType))
      .map(_.name)
      .getOrElse(throw new IllegalArgumentException(s"$name: no value field"))
    Metric(
      df.withColumn("__ms", tsMsCol)
        .withColumn("__value", col(s"`$valueCol`").cast("double")),
      "__ms", "__value", spec.tags)
  }

  // ---- ADMIN stubs ----------------------------------------------------

  /** ADMIN fn(...) — result is a single cell under a column named by
    * the statement itself (sqlness golden shape): FLUSH_FLOW returns
    * the refreshed sink's row count, storage admin fns return `0`. */
  private def admin(stmt: String): DataFrame = {
    import spark.implicits._
    val fn = stmt.stripPrefix("ADMIN").stripPrefix("admin").trim
    val cell =
      if (fn.toLowerCase(Locale.ROOT).startsWith("flush_flow")) {
        // returns the refreshed row count like the reference (every
        // golden redacts it via SQLNESS REPLACE → ` FLOW_FLUSHED  `,
        // which applies to BOTH sides of the compare)
        val name = fn.substring(fn.indexOf('(') + 1, fn.lastIndexOf(')'))
          .trim.stripPrefix("'").stripSuffix("'")
        refreshFlow(name)
        val n = flowMeta.get(name)
          .flatMap(m => scala.util.Try(
            spark.table(m.sinkTable).count()).toOption)
          .getOrElse(0L)
        String.valueOf(n)
      } else {
        // compaction materializes TTL expiry: fully-expired rows are
        // physically dropped, so a later LOOSER ttl cannot resurrect
        // them (ttl/alter_table_ttl.result, ttl/database_ttl.result)
        val fnl = fn.toLowerCase(Locale.ROOT)
        // ADMIN BUILD_INDEX('t'): index SSTs written before the index
        // declaration existed; idempotent
        // (function/admin/build_index_table{,_error,_restart}.sql)
        if (fnl.startsWith("build_index")) {
          val argsRaw = fn.substring(fn.indexOf('(') + 1, fn.lastIndexOf(')')).trim
          if (argsRaw.isEmpty) throw new IllegalArgumentException(
            "1004(InvalidArguments), Expected 1 args, but actual 0")
          if (!argsRaw.startsWith("'")) throw new IllegalArgumentException(
            "1004(InvalidArguments), Failed to build admin function args: " +
              s"failed to cast $argsRaw")
          val name = normTable(argsRaw.stripPrefix("'").stripSuffix("'"))
          if (!catalog.tables.contains(name)) throw new IllegalArgumentException(
            "1002(Unexpected), Failed to execute admin function build_index: " +
              s"Execution error: Table not found: greptime.public.$name")
          addSstIndexEntries(name)
        }
        else if (fnl.startsWith("compact_table") || fnl.startsWith("flush_table")) {
          // first argument only — compact_table('t', 'swcs', '86400')
          // carries strategy options after the table name
          val name = normTable(fn.substring(fn.indexOf('(') + 1, fn.lastIndexOf(')'))
            .split(',')(0).trim.stripPrefix("'").stripSuffix("'"))
          // flushing a metric physical region covers its logical children
          // (ttl/metric_engine_ttl.result)
          val targets = name +: metricPhy.get(name)
            .map(_.children).getOrElse(Nil)
          targets.filter(catalog.tables.contains).foreach { t =>
            val spec = catalog.spec(t)
            spec.ttlMillis.foreach { ttl =>
              if (ttl == 0L) migrateParquet(spec)(_.filter(lit(false)))
              else migrateParquet(spec)(_.filter(
                col(s"`${spec.timeIndex}`") >=
                  (current_timestamp() - expr(s"INTERVAL $ttl MILLISECOND"))))
              refreshView(t)
            }
            if (fnl.startsWith("flush_table")) {
              recordSstFlush(t)
              durableSeq.put(t, seqCounter.get()) // flushed = restart-durable
            }
            // JSON2 shredding generations (types/json/json2.sql)
            if (colMeta.getOrElse(t, Vector.empty).exists(_.gtype == "Json2")) {
              if (fnl.startsWith("compact_table"))
                j2Boundaries.put(t, Vector(seqCounter.get()))
              else j2Boundaries.put(t,
                j2Boundaries.getOrElse(t, Vector.empty) :+ seqCounter.get())
              refreshView(t)
            }
          }
        }
        "0"
      }
    Seq(cell).toDF(stmt)
  }

  private def status(msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}
