package graft.ops

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}

/** WHOLE-SCRIPT SQL FRONT DOOR — the reference artifact IS a
  * multi-statement BigQuery script (`BEGIN … END` with
  * `DECLARE`/`SET`/`IF`/`@@row_count`, ref
  * `Incremental_load_fact_item_status.sql:1-37,342`), and its audience
  * runs it *as a script*. [[graft.etl.IncrementalLoad]] executes the
  * same semantics from Scala and [[SqlMutations]] parses five
  * statement kinds as text; this object closes the last front-door
  * gap: ingest the script's SHAPE — template binding, statement
  * sequencing, variable scope, procedural IF, system row count — and
  * lower each statement onto the engine's existing protocols.
  *
  * Division of labor (no second SQL dialect): everything INSIDE a
  * statement that is legal Spark SQL — the scalar-subquery SET bodies,
  * IF conditions, DELETE predicates, the INSERT's SELECT — goes
  * through Catalyst's own parser/analyzer via `spark.sql`; this layer
  * only handles what Spark has no surface for (script statement
  * structure, `DECLARE`d variable scope, `@@row_count`, and the
  * BigQuery-dialect `CREATE OR REPLACE TABLE … COPY` clone form,
  * ref :23-26, which no Spark parser accepts).
  *
  * Statement lowering:
  *  - `DECLARE v type` → scope entry (timestamp/date/string/int64/
  *    float64, the reference's complete list — SURVEY §1.2);
  *  - `SET v = expr` → `spark.sql(SELECT expr)` with variables
  *    substituted as TYPED literals; timestamps render through
  *    `date_format(…, micros)` so they round-trip losslessly;
  *  - `CREATE OR REPLACE TABLE a COPY b` → file-level clone of `b`'s
  *    directory into a staged sibling, published by rename-aside
  *    (bytes copied verbatim — no decode/re-encode; the file-system
  *    reading of BigQuery's metadata-cheap COPY, ref :22);
  *  - `TRUNCATE TABLE a` → staged empty (schema-bearing) rewrite,
  *    `@@row_count` = rows removed;
  *  - `DELETE FROM a WHERE p` → parsed by Catalyst
  *    (`DeleteFromTable`), survivors (`NOT coalesce(p, FALSE)` — SQL
  *    DELETE removes only rows where p IS TRUE) staged and swapped,
  *    `@@row_count` = removed count, observed in the single pass;
  *  - `INSERT INTO …` → [[SqlMutations.insert]] (observe-counted
  *    append, name-aligned), `@@row_count` = inserted;
  *  - `DROP TABLE a` → directory delete (ref :327);
  *  - `IF c THEN … [ELSE …] END IF` → evaluate `c` via `spark.sql`,
  *    execute the chosen branch (nesting supported);
  *  - `CALL p(args)` → bound procedure registry; [[auditProc]] is the
  *    reference's `proc_elc_audit_insert` (ref :331-341) appending
  *    the [[graft.etl.IncrementalLoad.auditSchema]] row.
  *
  * Tables are bound by LOGICAL name → parquet directory; statement
  * text may use the reference's backticked 3-part names — the last
  * dot-component is the logical name. Every mutation publishes via
  * staged write + rename-aside (a crash leaves a complete generation
  * on disk; [[graft.etl.IncrementalLoad]] remains the
  * marker-certified, partition-pruned engine path for production
  * loads — this front door favors statement fidelity).
  *
  * Unsupported statements throw — never a silent wrong answer.
  *
  * Scale note: the script layer adds NO dataflow of its own — each
  * lowered statement is the same Catalyst plan the Scala API builds,
  * so 100 TB behavior (pruning, pushdown, broadcast) is identical to
  * the protocol paths the statements lower onto. */
object SqlScript {

  // ---------------------------------------------------------------- scope

  private val sparkTypeOf = Map(
    "timestamp" -> "TIMESTAMP", "date" -> "DATE", "string" -> "STRING",
    "int64" -> "BIGINT", "float64" -> "DOUBLE")

  /** One declared scalar: its script type and current value, stored as
    * the lossless string rendering (None = SQL NULL). */
  private final case class Var(sqlType: String, var value: Option[String])

  /** Final state of a script run — declared variables (rendered) and
    * the last `@@row_count`. */
  final case class ScriptResult(vars: Map[String, Option[String]],
      rowCount: Long)

  private final class Ctx(
      val spark: SparkSession,
      val tables: Map[String, String],
      val procs: Map[String, Seq[Any] => Unit]) {
    val vars = mutable.LinkedHashMap.empty[String, Var]
    var rowCount: Long = 0L
    def fs(path: String): FileSystem =
      FileSystem.get(new Path(path).toUri,
        spark.sparkContext.hadoopConfiguration)
  }

  // ------------------------------------------------------------- template

  /** Bind Jinja-style `{{params.x}}` template variables (ref :8-20 —
    * the Airflow pre-parse stage, SURVEY §3 E2 step 1). Unbound
    * parameters throw: a template rendered with a hole would execute
    * `{{params.x}}` as SQL text. */
  def bindTemplate(text: String, params: Map[String, String]): String = {
    val re = raw"\{\{\s*params\.([A-Za-z0-9_]+)\s*\}\}".r
    re.replaceAllIn(text, m => Regex.quoteReplacement(
      params.getOrElse(m.group(1), throw new IllegalArgumentException(
        s"unbound template parameter: params.${m.group(1)}"))))
  }

  // ------------------------------------------------------ lex into stmts

  /** Strip `--` line comments and `/* */` block comments, preserving
    * string literals and backtick-quoted identifiers. */
  private[graft] def stripComments(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var inStr = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { out.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (inTick) { out.append(c); if (c == '`') inTick = false; i += 1 }
      else if (c == '\'') { out.append(c); inStr = true; i += 1 }
      else if (c == '`') { out.append(c); inTick = true; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < s.length &&
          !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, s.length)
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Split the (comment-stripped, BEGIN/END-unwrapped) body on `;` at
    * top level — quotes and backticks respected. Semicolons never
    * appear inside the reference's parenthesized subqueries, but
    * strings may hold anything. */
  private def splitStatements(body: String): List[String] = {
    val stmts = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inStr = false; var inTick = false
    body.foreach { c =>
      if (inStr) { cur.append(c); if (c == '\'') inStr = false }
      else if (inTick) { cur.append(c); if (c == '`') inTick = false }
      else c match {
        case '\'' => cur.append(c); inStr = true
        case '`' => cur.append(c); inTick = true
        case ';' => stmts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    stmts += cur.toString
    stmts.map(_.trim).filter(_.nonEmpty).toList
  }

  // -------------------------------------------------- group IF … END IF

  private sealed trait Node
  private final case class Stmt(text: String) extends Node
  private final case class IfNode(cond: String, thenB: List[Node],
      elseB: List[Node]) extends Node

  private val ifHead: Regex = "(?is)^IF\\s+(.*?)\\s+THEN\\s+(.*)$".r
  private def isIfHead(s: String) = ifHead.findFirstIn(s).isDefined
  private def isEndIf(s: String) = s.matches("(?is)END\\s+IF")
  private def isElse(s: String) = s.matches("(?is)^ELSE\\b.*")

  /** Fold the flat statement list into a tree: an `IF … THEN` opener
    * swallows statements up to its matching `END IF` (nesting tracked
    * by depth), splitting the swallowed span at its own `ELSE`. */
  private def group(stmts: List[String]): List[Node] = stmts match {
    case Nil => Nil
    case head :: rest if isIfHead(head) =>
      val m = ifHead.findFirstMatchIn(head).get
      val (cond, firstThen) = (m.group(1), m.group(2).trim)
      // collect until matching END IF. The THEN-remainder re-enters
      // the scan as a standalone statement: it may itself be a nested
      // IF head (`IF a THEN IF b THEN s` parses as one `;`-statement),
      // and the depth count must see it.
      var depth = 1
      val inner = mutable.ListBuffer.empty[String]
      var remaining =
        if (firstThen.nonEmpty) firstThen :: rest else rest
      while (depth > 0) {
        remaining match {
          case Nil => throw new IllegalArgumentException(
            s"IF without matching END IF near: ${head.take(80)}")
          case s :: tail =>
            if (isIfHead(s)) depth += 1
            else if (isEndIf(s)) depth -= 1
            if (depth > 0) inner += s
            remaining = tail
        }
      }
      // split then/else at this IF's own ELSE (depth-0 within inner)
      var d = 0; var split = -1
      inner.zipWithIndex.foreach { case (s, i) =>
        if (isIfHead(s)) d += 1
        else if (isEndIf(s)) d -= 1
        else if (d == 0 && split < 0 && isElse(s)) split = i
      }
      val (thenRaw, elseRaw) =
        if (split < 0) (inner.toList, Nil)
        else (inner.take(split).toList,
          inner(split).replaceFirst("(?is)^ELSE\\s*", "").trim match {
            case "" => inner.drop(split + 1).toList
            case first => first :: inner.drop(split + 1).toList
          })
      IfNode(cond, group(thenRaw.filter(_.nonEmpty)),
        group(elseRaw)) :: group(remaining)
    case head :: rest => Stmt(head) :: group(rest)
  }

  // ------------------------------------------------------- substitution

  /** Replace `@@row_count` and every declared variable with its typed
    * literal rendering (longest names first; whole-word,
    * case-insensitive — BigQuery scripting variable references).
    * Substitution is textual, so variable names inside STRING LITERALS
    * would be replaced too — declared names use the `v_` convention
    * precisely to keep them out of data values. */
  private def subst(ctx: Ctx, sql: String): String = {
    var out = sql.replaceAll("(?i)@@row_count", ctx.rowCount.toString)
    ctx.vars.toSeq.sortBy(-_._1.length).foreach { case (n, v) =>
      val lit = v.value match {
        case None => s"CAST(NULL AS ${sparkTypeOf(v.sqlType)})"
        case Some(s) => v.sqlType match {
          case "string" => "'" + s.replace("'", "''") + "'"
          case "timestamp" => s"TIMESTAMP '$s'"
          case "date" => s"DATE '$s'"
          case _ => s
        }
      }
      out = out.replaceAll(
        "(?i)(?<![A-Za-z0-9_])" + Regex.quote(n) + "(?![A-Za-z0-9_])",
        Regex.quoteReplacement(lit))
    }
    out
  }

  /** Evaluate a 1-row scalar control statement (a SET body, an IF
    * condition). Script control flow is usually a constant-foldable
    * literal expression after variable substitution, and Catalyst's
    * optimizer has ALREADY evaluated those by the time the optimized
    * plan exists (ConstantFolding → `Project [literal] +-
    * OneRowRelation`) — so the fast path reads the literal off the
    * optimized plan and skips physical planning + execution, which
    * profile at ~3× the optimizer's own cost per statement (the
    * script front door's repeated-analysis tax, VERDICT r11 #3).
    * Anything that doesn't fold to a literal (e.g. a scalar subquery
    * over a bound table) falls back to a real execution — semantics
    * identical either way, because a folded literal IS the
    * optimizer's evaluation of the same expression. */
  private def evalScalar(spark: SparkSession, sql: String): Row = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project}
    val df = spark.sql(sql)
    df.queryExecution.optimizedPlan match {
      case Project(Seq(Alias(l: Literal, _)), _: OneRowRelation) =>
        Row(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case plan =>
        // scalar subquery over a bound table: a script offset SET is
        // `(SELECT IFNULL(MAX(cdc_ts) - INTERVAL …, …) FROM target)` —
        // evaluate the MAX from parquet footer stats when provably
        // exact (ops/MetadataMax), the flat-directory twin of the
        // Scala protocol's latest-partition prune (A1). Refusal falls
        // back to the ordinary full execution.
        MetadataMax.rewrite(spark, plan)
          .map(p => MetadataMax.evalFolded(p).getOrElse(
            org.apache.spark.sql.GraftSqlBridge.ofRows(spark, p).first()))
          .getOrElse(df.first())
    }
  }

  /** Logical table key of a statement-text name: backticks stripped,
    * last dot-component (the reference writes 3-part templated ids). */
  private def tableKey(name: String): String =
    name.replace("`", "").split('.').last

  private def pathFor(ctx: Ctx, name: String): String = {
    val key = tableKey(name)
    ctx.tables.getOrElse(key, throw new IllegalArgumentException(
      s"unbound table in script: $name (bound: ${ctx.tables.keys.mkString(", ")})"))
  }

  /** (Re-)register the bound tables a statement actually REFERENCES
    * as temp views (and drop stale views of dropped tables) —
    * statements see post-mutation state. Scoped to the statement text
    * because each registration is a parquet footer read: a script has
    * many statements and few table references, and re-registering the
    * whole binding per statement was measurable protocol overhead. */
  private def registerBound(ctx: Ctx, stmtText: String): Unit =
    ctx.tables.foreach { case (name, path) =>
      if (("(?i)(?<![A-Za-z0-9_])" + Regex.quote(name) +
          "(?![A-Za-z0-9_])").r.findFirstIn(stmtText).isDefined) {
        if (ctx.fs(path).exists(new Path(path)))
          ctx.spark.read.parquet(path).createOrReplaceTempView(name)
        else ctx.spark.catalog.dropTempView(name)
      }
    }

  // ------------------------------------------------------------ publish

  /** Staged write + rename-aside publish (the engine's swap idiom),
    * under the Recovery discipline ([[graft.ops.Recovery]]): the
    * marker certifying staging completeness lands BEFORE the swap, so
    * a crash anywhere leaves a machine-decidable state —
    * [[recoverTable]] rolls a certified staging forward and a
    * markerless one back. */
  private def publishStaged(ctx: Ctx, path: String)(
      write: String => Unit): Unit = {
    val fs = ctx.fs(path)
    val staging = path + "__scriptstage"
    fs.delete(new Path(staging), true)
    write(staging)
    graft.etl.IncrementalLoad.writeMarker(fs, new Path(staging), "FULL")
    graft.etl.IncrementalLoad.publishFull(fs, new Path(path),
      new Path(staging))
  }

  /** Repair a script-bound table after a crash anywhere in
    * [[publishStaged]] — the Scala protocol's Recovery contract
    * applied to the script front door. Handles, in order: a
    * `__scriptstage` dir (re-run the publish tail if its marker
    * certifies completeness, drop it otherwise), a stranded
    * `__retired` snapshot (restore only when the target is gone), and
    * a stale in-target marker from a crash between swap-in and marker
    * drop. Idempotent; returns the action log (empty = healthy).
    * [[execute]] runs this for every bound table before the first
    * statement, so a re-run after a mid-script crash always sees a
    * complete generation of each table. */
  def recoverTable(spark: SparkSession, path: String): Seq[String] = {
    val fs = FileSystem.get(new Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val staging = new Path(path + "__scriptstage")
    val target = new Path(path)
    val retired = new Path(path + "__retired")
    if (fs.exists(staging)) {
      if (graft.etl.IncrementalLoad.readMarker(fs, staging).isDefined) {
        graft.etl.IncrementalLoad.publishFull(fs, target, staging)
        log += s"rolled certified script staging FORWARD into $path"
      } else {
        fs.delete(staging, true)
        log += s"rolled markerless script staging BACK at $path"
      }
    }
    if (!fs.exists(target) && fs.exists(retired)) {
      fs.rename(retired, target)
      log += s"restored retired snapshot at $path"
    }
    val stale = new Path(target, graft.etl.IncrementalLoad.markerName)
    if (fs.exists(stale)) {
      fs.delete(stale, false)
      log += s"swept stale publish marker inside $path"
    }
    log.toSeq
  }

  // ---------------------------------------------------------- execution

  /** Execute a bound `BEGIN … END` script. `tables` binds logical
    * table names to parquet directories (sources the script only
    * reads may instead be pre-registered temp views); `procs` binds
    * `CALL` targets. Returns the final variable scope. */
  def execute(spark: SparkSession, script: String,
      tables: Map[String, String],
      procs: Map[String, Seq[Any] => Unit] = Map.empty): ScriptResult = {
    val ctx = new Ctx(spark, tables, procs)
    // crash recovery FIRST: a prior run of this (or any) script may
    // have died inside a staged publish — every bound table must be a
    // complete generation before any statement reads it
    tables.values.foreach(recoverTable(spark, _))
    parsedScript(script).foreach(exec(ctx, _))
    ScriptResult(ctx.vars.map { case (k, v) => k -> v.value }.toMap,
      ctx.rowCount)
  }

  /** The statement tree of a bound script, memoized per script TEXT
    * (pure text → immutable tree, so reuse can't change semantics):
    * a load protocol runs the same script per batch, and q172/q173
    * re-execute it twice per invocation — the strip/split/group pass
    * is per-text constant, the q139 plan-memo discipline applied to
    * the script front door. */
  private val parseMemo =
    scala.collection.concurrent.TrieMap.empty[String, List[Node]]

  private def parsedScript(script: String): List[Node] =
    parseMemo.getOrElseUpdate(script, {
      val stripped = stripComments(script).trim
      val body = stripped
        .replaceFirst("(?is)^BEGIN\\b", "")
        .replaceFirst("(?is)\\bEND\\s*;?\\s*$", "")
      group(splitStatements(body))
    })

  private def exec(ctx: Ctx, node: Node): Unit = node match {
    case IfNode(cond, t, e) =>
      registerBound(ctx, cond)
      val b = evalScalar(ctx.spark,
        s"SELECT coalesce((${subst(ctx, cond)}), FALSE)").getBoolean(0)
      (if (b) t else e).foreach(exec(ctx, _))
    case Stmt(text) =>
      if (sys.env.contains("SPARK_GRAFT_SCRIPT_TRACE")) {
        val t0 = System.nanoTime()
        execStmt(ctx, text)
        System.err.println(f"[script] ${(System.nanoTime() - t0) / 1e6}%8.1f ms  ${text.linesIterator.next().take(70)}")
      } else execStmt(ctx, text)
  }

  private val declareRe =
    "(?is)^DECLARE\\s+([A-Za-z0-9_,\\s]+?)\\s+(TIMESTAMP|DATE|STRING|INT64|FLOAT64)$".r
  private val setRe = "(?is)^SET\\s+([A-Za-z0-9_]+)\\s*=\\s*(.+)$".r
  private val copyRe =
    "(?is)^CREATE\\s+OR\\s+REPLACE\\s+TABLE\\s+(\\S+)\\s+COPY\\s+(\\S+)$".r
  private val truncateRe = "(?is)^TRUNCATE\\s+TABLE\\s+(\\S+)$".r
  private val dropRe = "(?is)^DROP\\s+TABLE\\s+(\\S+)$".r
  private val callRe = "(?is)^CALL\\s+(\\S+?)\\s*\\((.*)\\)$".r

  private def execStmt(ctx: Ctx, text: String): Unit = text match {
    case declareRe(names, tpe) =>
      names.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty)
        .foreach { n =>
          require(!ctx.vars.contains(n), s"variable $n declared twice")
          ctx.vars(n) = Var(tpe.toLowerCase, None)
        }

    case setRe(name, expr) =>
      val v = ctx.vars.getOrElse(name.toLowerCase,
        throw new IllegalArgumentException(s"SET of undeclared variable $name"))
      registerBound(ctx, expr)
      // render through SQL so the stored string round-trips as a typed
      // literal: timestamps keep full micros, ints/doubles normalize
      val rendering = v.sqlType match {
        case "timestamp" =>
          s"date_format((${subst(ctx, expr)}), 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
        case "date" => s"date_format((${subst(ctx, expr)}), 'yyyy-MM-dd')"
        case t => s"CAST((${subst(ctx, expr)}) AS ${sparkTypeOf(t)})"
      }
      val row = evalScalar(ctx.spark, s"SELECT $rendering")
      v.value = if (row.isNullAt(0)) None else Some(row.get(0).toString)

    case copyRe(dest, src) =>
      val destPath = pathFor(ctx, dest)
      val srcPath = pathFor(ctx, src)
      val fs = ctx.fs(destPath)
      require(fs.exists(new Path(srcPath)),
        s"COPY source does not exist: $src")
      publishStaged(ctx, destPath) { staging =>
        // byte-level clone (no decode/re-encode): the file-system
        // reading of the reference's metadata-cheap table COPY
        require(org.apache.hadoop.fs.FileUtil.copy(
          ctx.fs(srcPath), new Path(srcPath), fs, new Path(staging),
          false, ctx.spark.sparkContext.hadoopConfiguration),
          s"COPY failed: $src -> $dest")
      }

    case truncateRe(name) =>
      val path = pathFor(ctx, name)
      val df = ctx.spark.read.parquet(path)
      val n = df.count() // parquet footer metadata — no data scan
      publishStaged(ctx, path)(staging =>
        df.limit(0).write.mode("overwrite").parquet(staging))
      ctx.rowCount = n

    case t if t.matches("(?is)^DELETE\\b.*") =>
      import org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
      val d = ctx.spark.sessionState.sqlParser
        .parsePlan(subst(ctx, t)) match {
        case d: DeleteFromTable => d
        case other => throw new IllegalArgumentException(
          s"not a DELETE statement: ${other.getClass.getSimpleName}")
      }
      val name = d.table match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          u.multipartIdentifier.mkString(".")
        case other => throw new IllegalArgumentException(
          s"unsupported DELETE target: ${other.getClass.getSimpleName}")
      }
      val path = pathFor(ctx, name)
      val pred = d.condition.sql
      val df = ctx.spark.read.parquet(path)
      val total = df.count() // footer metadata only
      val obs = new org.apache.spark.sql.Observation()
      publishStaged(ctx, path) { staging =>
        // survivors: rows where pred is FALSE or NULL (SQL DELETE
        // removes only rows where the predicate IS TRUE)
        df.where(s"NOT coalesce(($pred), FALSE)")
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("kept"))
          .write.mode("overwrite").parquet(staging)
      }
      val kept = obs.get("kept") match { case n: java.lang.Number => n.longValue() }
      ctx.rowCount = total - kept

    case t if t.matches("(?is)^INSERT\\b.*") =>
      registerBound(ctx, t)
      ctx.rowCount = SqlMutations.insert(ctx.spark, subst(ctx, t),
        name => pathFor(ctx, name))

    case dropRe(name) =>
      val path = pathFor(ctx, name)
      ctx.fs(path).delete(new Path(path), true)
      ctx.spark.catalog.dropTempView(tableKey(name))

    case callRe(name, argsText) =>
      val proc = ctx.procs.getOrElse(tableKey(name),
        throw new IllegalArgumentException(s"unbound procedure: $name"))
      proc(parseCallArgs(ctx, argsText))

    case other => throw new IllegalArgumentException(
      s"unsupported script statement: ${other.take(120)}")
  }

  /** CALL arguments: top-level comma split; each argument is a string
    * literal, a declared variable (passed as its TYPED value — int64
    * as Long, others as their rendered string), or a numeric
    * literal. */
  private def parseCallArgs(ctx: Ctx, argsText: String): Seq[Any] = {
    val parts = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    argsText.foreach { c =>
      if (inStr) { cur.append(c); if (c == '\'') inStr = false }
      else c match {
        case '\'' => cur.append(c); inStr = true
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    parts += cur.toString
    parts.map(_.trim).filter(_.nonEmpty).map { a =>
      if (a.startsWith("'") && a.endsWith("'"))
        a.substring(1, a.length - 1).replace("''", "'")
      else ctx.vars.get(a.toLowerCase) match {
        case Some(v) => v.sqlType match {
          case "int64" =>
            v.value.map(x => java.lang.Long.valueOf(x.toLong)).orNull
          case "float64" =>
            v.value.map(x => java.lang.Double.valueOf(x.toDouble)).orNull
          case _ => v.value.orNull
        }
        case None =>
          if (a.matches("-?\\d+")) a.toLong
          else if (a.matches("-?\\d*\\.\\d+")) a.toDouble
          else throw new IllegalArgumentException(
            s"unsupported CALL argument: $a")
      }
    }.toSeq
  }

  /** The reference's audit procedure (`proc_elc_audit_insert`, ref
    * :331-341) as a bindable CALL target: appends one
    * [[graft.etl.IncrementalLoad.auditSchema]] row. Argument order
    * follows the reference: (dag_name, target_project, target_dataset,
    * table_name, start_ts, layer, load_type, inserted, deleted,
    * key_expr) — project/dataset are identity the path binding already
    * carries, so they are accepted and unused. */
  def auditProc(spark: SparkSession, auditPath: String): Seq[Any] => Unit =
    args => {
      require(args.length == 10,
        s"proc_elc_audit_insert expects 10 arguments, got ${args.length}")
      def s(i: Int): String = args(i).asInstanceOf[String]
      def l(i: Int): Long = args(i) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"argument $i must be integral, got $other")
      }
      val row = Row(s(0), s(3), s(5), s(6), s(4), l(7), l(8), s(9))
      spark.createDataFrame(
        java.util.List.of[Row](row), graft.etl.IncrementalLoad.auditSchema)
        .write.mode("append").parquet(auditPath)
    }
}
