package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction,
  DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias,
  UpdateAction}

/** SQL FRONT DOOR for the mutation protocols — the reference's audience
  * drives everything through SQL text (ref
  * `Incremental_load_fact_item_status.sql:29-34,40`), so `MERGE INTO`
  * and `DELETE FROM` statements must be executable as TEXT, not only as
  * Scala calls. Plain Spark only executes these statements against
  * v2 catalogs with row-level-operation support; for the file-backed
  * tables this engine manages, this object closes the gap the way
  * engines without native row-level ops do — parse with Catalyst's OWN
  * parser (no second SQL dialect), then lower the logical plan onto the
  * existing protocols:
  *
  *  - [[merge]]: `MergeIntoTable` lowers to the q108 single-pass shape —
  *    ONE left join of target onto source deciding keep/update/delete
  *    per row (first-applicable WHEN clause = SQL `CASE`'s first-match
  *    semantics), plus an anti-join union for the inserts. The lowering
  *    GENERATES a SELECT statement (introspectable via explain, fully
  *    Catalyst-optimized — the join broadcasts when the source is small)
  *    rather than interpreting row-by-row.
  *  - [[delete]]: `DeleteFromTable` routes to [[TargetedDelete.erase]] —
  *    the zone-map-pruned file surgery — binding the statement's table
  *    name to its backing directory. The WHERE clause must be the
  *    tombstone shape (`key IN (…)` / `key = …`) that protocol exists
  *    for; anything else is rejected rather than silently table-scanned.
  *  - [[insert]]: `InsertIntoStatement` (ref sql:40) lowers to the
  *    append protocol — the SELECT runs once (observe-counted), the
  *    rows append to the bound parquet directory, column lists align
  *    by name against the existing target schema.
  *
  * Bounded surface (documented, spec-enforced): MERGE supports any
  * number of conditional WHEN MATCHED UPDATE/DELETE clauses and WHEN
  * NOT MATCHED INSERT clauses; `WHEN NOT MATCHED BY SOURCE` and schema
  * evolution are rejected, and a target row matching more than one
  * source row raises MERGE_CARDINALITY_VIOLATION (pre-flight match
  * count) exactly as SQL and Spark's native MERGE do. UPDATE rejects
  * duplicate SET targets. Unsupported statements throw — never a
  * silent wrong answer. */
object SqlMutations {

  /** (view name, alias) of a parsed relation reference. */
  private def nameAndAlias(p: LogicalPlan): (String, String) = p match {
    case SubqueryAlias(id, child) => (nameAndAlias(child)._1, id.name)
    case u: UnresolvedRelation =>
      (u.multipartIdentifier.mkString("."), u.multipartIdentifier.last)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported relation reference: ${other.getClass.getSimpleName}")
  }

  /** first-applicable chain: the i-th action fires iff its condition
    * holds and no earlier action's did — exactly SQL CASE WHEN. */
  private def actionCase(conds: Seq[Option[Expression]],
      results: Seq[String], default: String): String =
    if (conds.isEmpty) default
    else conds.zip(results).map { case (c, r) =>
      s"WHEN ${c.map(_.sql).getOrElse("TRUE")} THEN $r"
    }.mkString("CASE ", " ", s" ELSE $default END")

  /** Execute a `MERGE INTO` statement over registered temp views,
    * returning the merged table (the caller owns materialization —
    * the lowering itself is a pure dataflow). */
  def merge(spark: SparkSession, sql: String): DataFrame = {
    val m = spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => m
      case other => throw new IllegalArgumentException(
        s"not a MERGE statement: ${other.getClass.getSimpleName}")
    }
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported")
    val (tName, tAlias) = nameAndAlias(m.targetTable)
    val (sName, sAlias) = nameAndAlias(m.sourceTable)
    val targetCols = spark.table(tName).columns.toSeq
    val cond = m.mergeCondition.sql

    // ---- cardinality guard: SQL (and Spark's native MERGE) raise
    // MERGE_CARDINALITY_VIOLATION when a target row matches more than
    // one source row — the left-join lowering below would otherwise
    // duplicate that target row, applying WHEN MATCHED once per match.
    // Checked as a pre-flight aggregate over the same join (tag each
    // target row, count matches per tag) so the main dataflow's plan
    // stays window-free; one extra pass, never a silent wrong answer.
    if (m.matchedActions.nonEmpty) {
      val violated = !spark.sql(
        s"""SELECT 1
           |FROM (SELECT *, monotonically_increasing_id() AS __rid
           |      FROM $tName) AS $tAlias
           |JOIN $sName AS $sAlias ON $cond
           |GROUP BY $tAlias.__rid
           |HAVING count(*) > 1
           |LIMIT 1""".stripMargin).isEmpty
      if (violated) throw new IllegalStateException(
        "MERGE_CARDINALITY_VIOLATION: a target row matched more than " +
          "one source row; WHEN MATCHED actions would apply once per match")
    }

    // ---- matched side: target LEFT JOIN source, one CASE per column ----
    val matched: Seq[(Option[Expression], Option[Seq[Assignment]])] =
      m.matchedActions.map {
        case u: UpdateAction if !u.fromStar =>
          (u.condition, Some(u.assignments))
        case d: DeleteAction => (d.condition, None)
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN MATCHED action: ${other.getClass.getSimpleName}")
      }
    def assignedSql(assignments: Seq[Assignment], col: String,
        keep: String): String =
      assignments.collectFirst {
        case Assignment(k: UnresolvedAttribute, v) if k.nameParts.last.equalsIgnoreCase(col) =>
          v.sql
      }.getOrElse(keep)
    // action index per matched row: -1 keep, i = matched action i fires;
    // unmatched rows (no source hit) always keep. Everything that needs
    // the t/s aliases — kept values, update expressions, the action
    // chain — is computed INSIDE the join select (qualification is lost
    // across a derived table); the outer select only switches on __act.
    val actIdx = actionCase(matched.map(_._1),
      matched.indices.map(_.toString), "-1")
    val deleteIdxs = matched.zipWithIndex.collect {
      case ((_, None), i) => i
    }
    val keepFilter =
      if (deleteIdxs.isEmpty) "TRUE"
      else s"__act NOT IN (${deleteIdxs.mkString(", ")})"
    val innerProjs =
      targetCols.map(c => s"$tAlias.$c AS __t_$c") ++
        matched.zipWithIndex.collect { case ((_, Some(assignments)), i) =>
          targetCols.flatMap { c =>
            val v = assignedSql(assignments, c, s"$tAlias.$c")
            Some(s"$v AS __u${i}_$c")
          }
        }.flatten ++
        Seq(s"""CASE WHEN $sAlias.__src_exists IS NULL THEN -1
               |             ELSE $actIdx END AS __act""".stripMargin)
    val colProjs = targetCols.map { c =>
      val updates = matched.zipWithIndex.collect {
        case ((_, Some(_)), i) => s"WHEN $i THEN __u${i}_$c"
      }
      if (updates.isEmpty) s"__t_$c AS $c"
      else s"CASE __act ${updates.mkString(" ")} ELSE __t_$c END AS $c"
    }
    // insert-only MERGE keeps the target verbatim — joining anyway
    // would duplicate target rows with multiple source matches (which
    // the cardinality guard above only polices when matched actions
    // exist, because only then is multiplicity an error in SQL)
    val survivors =
      if (matched.isEmpty)
        s"""SELECT ${targetCols.map(c => s"$tAlias.$c").mkString(", ")}
           |FROM $tName AS $tAlias""".stripMargin
      else
        s"""SELECT ${colProjs.mkString(",\n       ")}
           |FROM (SELECT ${innerProjs.mkString(",\n        ")}
           |      FROM $tName AS $tAlias
           |      LEFT JOIN (SELECT *, TRUE AS __src_exists FROM $sName)
           |        AS $sAlias ON $cond)
           |WHERE $keepFilter""".stripMargin

    // ---- insert side: source rows with no target match ----
    val inserts: Seq[(Option[Expression], Seq[Assignment])] =
      m.notMatchedActions.map {
        case i: InsertAction => (i.condition, i.assignments)
        case other => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED action: ${other.getClass.getSimpleName}")
      }
    val insertSelects = inserts.zipWithIndex.map { case ((c, assignments), i) =>
      val proj = targetCols.map { col =>
        val v = assignments.collectFirst {
          case Assignment(k: UnresolvedAttribute, v)
              if k.nameParts.last.equalsIgnoreCase(col) => v.sql
        }.getOrElse(throw new IllegalArgumentException(
          s"INSERT action leaves target column $col unassigned"))
        s"$v AS $col"
      }
      // first-applicable: this action's condition, minus earlier ones
      val mine = c.map(_.sql).getOrElse("TRUE")
      val earlier = inserts.take(i).map(_._1)
        .map(_.map(_.sql).getOrElse("TRUE"))
      val guard = (mine +: earlier.map(e => s"NOT coalesce($e, FALSE)"))
        .mkString(" AND ")
      s"""SELECT ${proj.mkString(",\n       ")}
         |FROM $sName AS $sAlias LEFT ANTI JOIN $tName AS $tAlias ON $cond
         |WHERE $guard""".stripMargin
    }

    val full = (survivors +: insertSelects).mkString("\nUNION ALL\n")
    spark.sql(full)
  }

  /** Execute an `UPDATE <name> SET col = expr, … [WHERE pred]`
    * statement over a registered temp view, returning the updated
    * table (the caller owns materialization). Lowers to ONE projection
    * pass — `CASE WHEN pred THEN expr ELSE col END` per assigned
    * column — which is how engines without in-place row mutation
    * execute UPDATE: a rewrite of the affected columns, never a
    * per-row mutation loop. */
  def update(spark: SparkSession, sql: String): DataFrame = {
    val u = spark.sessionState.sqlParser.parsePlan(sql) match {
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
      case other => throw new IllegalArgumentException(
        s"not an UPDATE statement: ${other.getClass.getSimpleName}")
    }
    val (tName, tAlias) = nameAndAlias(u.table)
    val targetCols = spark.table(tName).columns.toSeq
    val pred = u.condition.map(_.sql).getOrElse("TRUE")
    // lowercase keys: Spark resolution is case-insensitive by default
    val pairs: Seq[(String, String)] = u.assignments.map {
      case Assignment(k: UnresolvedAttribute, v) =>
        k.nameParts.last.toLowerCase -> v.sql
      case a => throw new IllegalArgumentException(
        s"unsupported assignment target: ${a.key.getClass.getSimpleName}")
    }
    // standard engines (and Spark's native UPDATE) reject multiple
    // assignments to the same column — never let the last one silently win
    val dups = pairs.map(_._1).diff(pairs.map(_._1).distinct).distinct
    require(dups.isEmpty,
      s"duplicate assignment target(s) in SET: ${dups.mkString(", ")}")
    val assigned: Map[String, String] = pairs.toMap
    val projs = targetCols.map { c =>
      assigned.get(c.toLowerCase) match {
        case Some(v) => s"CASE WHEN $pred THEN $v ELSE $tAlias.$c END AS $c"
        case None => s"$tAlias.$c"
      }
    }
    spark.sql(
      s"""SELECT ${projs.mkString(",\n       ")}
         |FROM $tName AS $tAlias""".stripMargin)
  }

  /** Execute an `INSERT INTO <name> [(cols)] SELECT …` statement — the
    * reference's one remaining statement form (ref sql:40, the branch
    * union inserted into the staging clone) — lowered onto the append
    * protocol: the SELECT runs as a normal Catalyst dataflow and the
    * rows append to the table's backing parquet directory (bound via
    * `pathOf`), with the inserted @@row_count captured by
    * `Dataset.observe` so the SELECT executes exactly once. An
    * explicit column list renames the SELECT's output positionally
    * (SQL semantics), and when the target already exists the columns
    * are then aligned to ITS order by (case-insensitive) name —
    * parquet append is positional on footer schema, so an unaligned
    * append would silently interleave columns. INSERT OVERWRITE and
    * static PARTITION clauses are rejected — truncation is the
    * protocols' FULL_LOAD path, never a side effect of an insert. */
  def insert(spark: SparkSession, sql: String,
      pathOf: String => String): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
    import org.apache.spark.sql.functions.{col, count, lit}
    val ins = spark.sessionState.sqlParser.parsePlan(sql) match {
      case i: InsertIntoStatement => i
      case other => throw new IllegalArgumentException(
        s"not an INSERT statement: ${other.getClass.getSimpleName}")
    }
    require(!ins.overwrite,
      "INSERT OVERWRITE is not supported — truncation is FULL_LOAD's job")
    require(ins.partitionSpec.isEmpty,
      "static PARTITION clauses are not supported")
    val (name, _) = nameAndAlias(ins.table)
    val path = pathOf(name)
    val selected =
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark, ins.query)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val targetCols: Option[Seq[String]] =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Some(spark.read.parquet(path).columns.toSeq)
      else None
    // SQL semantics: WITHOUT a column list the SELECT maps to the
    // target POSITIONALLY; WITH one, the list names the SELECT's
    // output positionally and those names then align to the target's
    // order (case-insensitive)
    val aligned = (ins.userSpecifiedCols.toList, targetCols) match {
      case (Nil, None) => selected
      case (Nil, Some(tc)) =>
        require(tc.length == selected.columns.length,
          s"SELECT produces ${selected.columns.length} columns, target " +
            s"has ${tc.length}")
        selected.toDF(tc: _*)
      case (cols, tcOpt) =>
        require(cols.length == selected.columns.length,
          s"column list names ${cols.length} columns, SELECT produces " +
            s"${selected.columns.length}")
        val named = selected.toDF(cols: _*)
        tcOpt match {
          case None => named
          case Some(tc) =>
            val have = cols.map(_.toLowerCase).toSet
            val missing = tc.filterNot(c => have.contains(c.toLowerCase))
            require(missing.isEmpty && tc.length == cols.length,
              s"insert column list $cols does not cover target columns $tc")
            named.select(tc.map(col): _*)
        }
    }
    val obs = new org.apache.spark.sql.Observation()
    aligned.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(path)
    obs.get("n") match {
      case n: java.lang.Number => n.longValue()
    }
  }

  /** Execute a `DELETE FROM <name> WHERE <key tombstones>` statement,
    * binding `name` to its backing parquet directory via `pathOf`, by
    * routing to the zone-map-pruned [[TargetedDelete.erase]]. */
  def delete(spark: SparkSession, sql: String,
      pathOf: String => String): TargetedDelete.EraseStats = {
    val d = spark.sessionState.sqlParser.parsePlan(sql) match {
      case d: DeleteFromTable => d
      case other => throw new IllegalArgumentException(
        s"not a DELETE statement: ${other.getClass.getSimpleName}")
    }
    val (name, _) = nameAndAlias(d.table)
    val (keyCol, keys) = d.condition match {
      case In(a: UnresolvedAttribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        (a.nameParts.last,
          vs.map(v => longOf(v.asInstanceOf[Literal])))
      case EqualTo(a: UnresolvedAttribute, l: Literal) =>
        (a.nameParts.last, Seq(longOf(l)))
      case other => throw new IllegalArgumentException(
        "targeted delete requires `key IN (…)` or `key = …` tombstones, " +
          s"got: ${other.sql}")
    }
    TargetedDelete.erase(spark, pathOf(name), keyCol, keys)
  }

  private def longOf(l: Literal): Long = l.value match {
    case i: java.lang.Integer => i.toLong
    case j: java.lang.Long => j
    case s: java.lang.Short => s.toLong
    case other => throw new IllegalArgumentException(
      s"tombstone key must be an integer literal, got $other")
  }
}
