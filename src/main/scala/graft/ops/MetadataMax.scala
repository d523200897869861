package graft.ops

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal, NamedExpression, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** METADATA-ONLY AGGREGATES: evaluate a global `MAX(col)` / `MIN(col)`
  * / `COUNT(*)` / `COUNT(col)` over a parquet relation from the files'
  * FOOTER STATISTICS instead of scanning the data — the classic
  * metadata-only aggregates every columnar engine ships (DuckDB,
  * Trino, the table formats' min/max/row-count from manifest stats).
  * Parquet already stores, per row group, an exact min/max for plain
  * INT32/INT64 columns, a row count, and a per-column null count; the
  * global answers are folds over footers — O(files) driver-side
  * metadata reads, zero executor work, zero data scan.
  *
  * Why it exists here: the reference's load script computes its delta
  * offset as `SET v = (SELECT IFNULL(MAX(cdc_ts) - INTERVAL n DAY, …)
  * FROM target)` (ref `Incremental_load_fact_item_status.sql:10-20`).
  * The Scala protocol prunes that MAX to the latest day partition
  * (`etl/IncrementalLoad.latestDay`) and then answers it from that
  * partition's footers through this rewrite; the script front door's
  * target is a flat parquet directory, so the equivalent prune IS the
  * footer fold. At 100 TB an unpruned full-fact MAX per load run is
  * real money; footers are metadata the planner has to touch anyway.
  * COUNT(*)/MIN complete the stats-based-planning face: row counts and
  * watermarks a lakehouse maintenance loop asks for every cycle.
  *
  * Soundness gates (ALL must hold, else the caller falls back to the
  * ordinary scan — the rewrite can refuse, never lie):
  *  - global aggregate (no grouping), every aggregate function is a
  *    plain `MAX(column)` / `MIN(column)` / `COUNT(*)` /
  *    `COUNT(column)` — no DISTINCT, no FILTER clause;
  *  - the child is the bare relation, optionally under a
  *    column-pruning Project and/or a deterministic Filter that
  *    references ONLY partition columns (answered by pruning the file
  *    index — every row of a surviving partition satisfies it): any
  *    other Filter/Join/expression in between invalidates footer
  *    stats;
  *  - MIN/MAX columns are top-level INT64/INT32-backed types whose
  *    parquet stats are exact and ordered like the Catalyst type:
  *    long, int, date (INT32 days), timestamp (INT64 MICROS/MILLIS).
  *    Strings are excluded (parquet-mr may truncate binary stats), as
  *    are floats (NaN ordering differs) and INT96 (no stats at all);
  *  - COUNT(column) columns are top-level atomic types (one parquet
  *    leaf, one value per row — null counts don't truncate, so any
  *    atomic type qualifies) with `numNulls` recorded on every row
  *    group; partition columns are refused for every per-column face;
  *  - every row group of every data file carries the needed stats
  *    (`hasNonNullValue`, or provably all-null via `numNulls`);
  *  - every data file under the relation ends in `.parquet` — a
  *    foreign-written directory (Hive `000000_0` files, tool output)
  *    refuses rather than folding over a subset of the table;
  *  - files written under Spark's LEGACY datetime rebase (footer key
  *    `org.apache.spark.legacyDateTime`) refuse date/timestamp
  *    min/max — the scan rebases Julian→proleptic values on read, so
  *    the raw footer value can differ from the scan answer.
  *
  * All-null columns and empty tables fold MIN/MAX to a NULL literal
  * and counts to 0 — exactly what the scan returns, so IFNULL
  * fallbacks behave identically. The rewrite emits `Project[literal]
  * ← OneRowRelation` in place of the whole aggregate, so the
  * re-planned statement constant-folds and executes ZERO Spark jobs.
  */
object MetadataMax {

  /** Rewrite every eligible `Aggregate[max/min/count] ← parquet
    * relation` inside `plan` (including under scalar subqueries) to a
    * `Project[literal] ← OneRowRelation`: each aggregate becomes its
    * footer-derived literal (NULL min/max and 0 counts for
    * empty/all-null input — exactly what the scan returns), so the
    * re-executed plan folds to a constant and costs ZERO Spark jobs.
    * Returns None when nothing was rewritten. */
  def rewrite(spark: SparkSession, plan: LogicalPlan): Option[LogicalPlan] = {
    var changed = false
    def rewriteAggs(p: LogicalPlan): LogicalPlan = p.transform {
      // a GLOBAL aggregate whose aggregate functions all folded away
      // (e.g. the script's CASE picked the constant branch) returns
      // exactly one constant row regardless of its input — for empty
      // AND non-empty input alike; no scan needed
      case Aggregate(Nil, aggExprs, _, _)
          if aggExprs.flatMap(_.collect {
            case ae: AggregateExpression => ae
          }).isEmpty && aggExprs.forall(_.references.isEmpty) =>
        changed = true
        Project(aggExprs, OneRowRelation())
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        eligibleChild(child).flatMap { case (rel, partFilters) =>
          collectSpecs(aggExprs).flatMap { specs =>
            footerValues(spark, rel, partFilters, specs.values.toSeq.distinct)
              .map { vals =>
                changed = true
                val folded = aggExprs.map(_.transform {
                  case ae: AggregateExpression =>
                    Literal(vals(specs(ae)), ae.dataType)
                }.asInstanceOf[NamedExpression])
                Project(folded, OneRowRelation())
              }
          }
        }.getOrElse(agg)
    }
    val np = rewriteAggs(plan).transformAllExpressions {
      case s: ScalarSubquery =>
        val rp = rewriteAggs(s.plan)
        if (rp ne s.plan) s.withNewPlan(rp) else s
    }
    if (changed) Some(np) else None
  }

  /** Driver-side evaluation of a fully-folded rewritten plan: inline
    * each scalar subquery that became `Project[foldable] ←
    * OneRowRelation`, then evaluate the outer projection if it, too,
    * is foldable over OneRowRelation — zero analysis, zero jobs. None
    * when anything genuinely needs execution (caller re-plans). */
  def evalFolded(plan: LogicalPlan): Option[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions.Alias
    val inlined = plan.transformAllExpressions {
      case s: ScalarSubquery => s.plan match {
        case Project(Seq(Alias(e, _)), _: OneRowRelation) if e.foldable =>
          Literal(e.eval(null), e.dataType)
        case _ => s
      }
    }
    inlined match {
      case Project(exprs, _: OneRowRelation)
          // an Alias is never foldable itself (NamedExpression pins
          // foldable=false) — evaluate THROUGH it
          if exprs.forall {
            case Alias(e, _) => e.foldable
            case e => e.foldable
          } =>
        Some(org.apache.spark.sql.Row.fromSeq(exprs.map {
          case Alias(e, _) =>
            CatalystTypeConverters.convertToScala(e.eval(null), e.dataType)
          case e =>
            CatalystTypeConverters.convertToScala(e.eval(null), e.dataType)
        }))
      case _ => None
    }
  }

  /** Footer row count of the parquet file/directory at `path` —
    * COUNT(*) for a raw path, without a relation in hand (the graph
    * family sizes its sign-bucket width from this; zero Spark jobs).
    * None when the path is missing, any data file is not `.parquet`,
    * or any footer is unreadable — callers fall back to a count. */
  def parquetRowCount(spark: SparkSession, path: String): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = try org.apache.hadoop.fs.FileSystem.get(p.toUri, conf)
      catch { case _: Exception => return None }
    if (!fs.exists(p)) return None
    // a file is visible only if ITSELF and every directory between it
    // and `p` is non-hidden — a Spark scan's InMemoryFileIndex ignores
    // anything under _temporary/.staging leftovers, so counting them
    // here would over-count vs the scan. The walk stops at the
    // QUALIFIED root: listFiles returns fully-qualified paths
    // (scheme://…), so comparing against the raw constructor path
    // would never terminate the loop and a hidden-named ANCESTOR of
    // the table root (/data/.cache/tbl) would filter every file out.
    val qp = fs.makeQualified(p)
    def visible(f: org.apache.hadoop.fs.Path): Boolean = {
      var cur = f
      while (cur != null && cur != qp) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    val files = mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    var sawAny = false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      sawAny = true
      if (visible(f.getPath)) {
        if (!f.getPath.getName.endsWith(".parquet")) return None
        files += f.getPath
      }
    }
    // files exist but every one was filtered as hidden: refuse rather
    // than answer Some(0) — callers fall back to a real count
    if (sawAny && files.isEmpty) return None
    var rows = 0L
    files.foreach { f =>
      val reader = try ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        catch { case _: Exception => return None }
      try reader.getFooter.getBlocks.asScala.foreach(rows += _.getRowCount)
      finally reader.close()
    }
    Some(rows)
  }

  /** One supported aggregate face over the relation. Keyed by the
    * RESOLVED attribute, so two aggregates over the same column (e.g.
    * MIN+MAX) share one accumulator. */
  private sealed trait AggSpec
  private object AggSpec {
    sealed trait ColSpec extends AggSpec { def attr: AttributeReference }
    final case class MaxOf(attr: AttributeReference) extends ColSpec
    final case class MinOf(attr: AttributeReference) extends ColSpec
    final case class CountOf(attr: AttributeReference) extends ColSpec
    case object CountStar extends AggSpec
  }
  import AggSpec._

  /** The bare parquet relation under optional column-pruning Projects
    * and partition-column-only deterministic Filters (collected, to be
    * answered by pruning the file index); None on any other shape. */
  private def eligibleChild(p: LogicalPlan)
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
      Some((l, Nil))
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      eligibleChild(child)
    case Filter(cond, child) =>
      eligibleChild(child).flatMap { case (rel, fs) =>
        val partCols = rel.relation.asInstanceOf[HadoopFsRelation]
          .partitionSchema.fieldNames.toSet
        // a subquery (e.g. `day = (SELECT MAX(day) …)`) references only
        // partition columns but is Unevaluable during partition pruning
        // — refuse rather than crash inside listFiles
        val hasSubquery = cond.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
            .PlanExpression[_]])
        if (!hasSubquery && cond.deterministic && cond.references.nonEmpty &&
            cond.references.forall(a => partCols.contains(a.name)))
          Some((rel, cond +: fs))
        else None
      }
    case _ => None
  }

  /** Each aggregate expression's spec — or None if ANY aggregate
    * function is not a supported face over an eligible column. */
  private def collectSpecs(aggExprs: Seq[NamedExpression])
      : Option[Map[AggregateExpression, AggSpec]] = {
    val fns = aggExprs.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val pairs = fns.map { ae =>
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      val spec = ae.aggregateFunction match {
        case Max(a: AttributeReference) if statsExact(a.dataType) => MaxOf(a)
        case Min(a: AttributeReference) if statsExact(a.dataType) => MinOf(a)
        case c: Count => c.children match {
          // COUNT(*) parses to COUNT(1): any non-null constant counts rows
          case Seq(l: Literal) if l.value != null => CountStar
          case Seq(a: AttributeReference) if countable(a.dataType) =>
            CountOf(a)
          case _ => return None
        }
        case _ => return None
      }
      ae -> spec
    }
    Some(pairs.toMap)
  }

  private def statsExact(t: DataType): Boolean = t match {
    case LongType | IntegerType | DateType | TimestampType => true
    case _ => false
  }

  /** Types whose column is a single top-level parquet leaf with one
    * value per row, so `valueCount - numNulls` IS `COUNT(col)` —
    * every atomic type (null counts never truncate); nested
    * array/map/struct columns span leaves and are refused. */
  private def countable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | BinaryType | DateType |
         TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  private def temporal(t: DataType): Boolean = t match {
    case DateType | TimestampType => true
    case _ => false
  }

  /** The relation's data files — pruned by the partition filters when
    * present. None (refuse) when ANY listed data file is not a
    * `.parquet` file: folding over a subset of a foreign-written
    * directory would be a lie, not an answer. */
  private def dataFiles(fs: HadoopFsRelation,
      partFilters: Seq[Expression]): Option[Seq[String]] = {
    // listFiles evaluates the filters against partition values; any
    // expression it cannot evaluate (belt to eligibleChild's subquery
    // suspenders) must refuse, never crash the caller's statement
    val paths = try {
      if (partFilters.isEmpty) fs.location.inputFiles.toSeq
      else fs.location.listFiles(partFilters, Nil)
        .flatMap(_.files.map(_.getPath.toString))
    } catch { case _: Exception => return None }
    if (paths.exists(!_.endsWith(".parquet"))) None else Some(paths)
  }

  /** Each spec's answer as the Catalyst INTERNAL value (null for
    * empty/all-null min/max input; Long for counts). None when stats
    * are missing/unusable anywhere — the refusal path. */
  private def footerValues(spark: SparkSession, rel: LogicalRelation,
      partFilters: Seq[Expression], specs: Seq[AggSpec])
      : Option[Map[AggSpec, Any]] = {
    val fs = rel.relation.asInstanceOf[HadoopFsRelation]
    val partCols = fs.partitionSchema.fieldNames.toSet
    val colSpecs = specs.collect { case s: ColSpec => s }
    // partition columns have no footer presence (and may be the null
    // partition); refuse every per-column face over them
    if (colSpecs.exists(s => partCols.contains(s.attr.name))) return None
    val files = dataFiles(fs, partFilters).getOrElse(return None)
    val conf = spark.sparkContext.hadoopConfiguration
    val checkRebase = colSpecs.exists {
      case MaxOf(a) => temporal(a.dataType)
      case MinOf(a) => temporal(a.dataType)
      case _ => false
    }

    var rows = 0L
    val minMax = mutable.Map.empty[AggSpec, Long]
    val counts = mutable.Map.empty[AggSpec, Long].withDefaultValue(0L)

    files.foreach { f =>
      val reader = try {
        ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      } catch { case _: Exception => return None }
      try {
        val footer = reader.getFooter
        if (checkRebase) {
          val kv = footer.getFileMetaData.getKeyValueMetaData
          if (kv != null && kv.containsKey("org.apache.spark.legacyDateTime"))
            return None // scan-side Julian→proleptic rebase would differ
        }
        footer.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          colSpecs.foreach { spec =>
            val col = block.getColumns.asScala
              .find(_.getPath.toDotString == spec.attr.name)
              .getOrElse(return None)
            val stats = col.getStatistics
            if (stats == null) return None
            spec match {
              case CountOf(_) =>
                if (!stats.isNumNullsSet) return None
                counts(spec) += col.getValueCount - stats.getNumNulls
              case _ =>
                val isMax = spec.isInstanceOf[MaxOf]
                if (stats.hasNonNullValue) {
                  val raw = (if (isMax) stats.genericGetMax
                    else stats.genericGetMin).asInstanceOf[AnyRef]
                  internalValue(col, raw, spec.attr.dataType) match {
                    case Some(v) =>
                      val better = minMax.get(spec)
                        .forall(b => if (isMax) b < v else b > v)
                      if (better) minMax(spec) = v
                    case None => return None
                  }
                } else if (!(stats.isNumNullsSet &&
                    stats.getNumNulls == col.getValueCount)) {
                  // no extreme recorded AND not provably all-null
                  return None
                }
            }
          }
        }
      } finally reader.close()
    }

    Some(specs.map {
      case CountStar => (CountStar: AggSpec) -> (rows: Any)
      case s: CountOf => (s: AggSpec) -> (counts(s): Any)
      case s: ColSpec =>
        val v: Any = minMax.get(s) match {
          case Some(l) => s.attr.dataType match {
            case IntegerType | DateType => l.toInt
            case _ => l
          }
          case None => null
        }
        (s: AggSpec) -> v
    }.toMap)
  }

  /** Footer min/max → Catalyst internal Long, checking the parquet
    * physical/logical type actually matches the Catalyst type (a
    * mismatch means schema evolution or INT96 — refuse). */
  private def internalValue(col: org.apache.parquet.hadoop.metadata
      .ColumnChunkMetaData, v: AnyRef, t: DataType): Option[Long] = {
    val logical = col.getPrimitiveType.getLogicalTypeAnnotation
    (t, v) match {
      case (TimestampType, l: java.lang.Long) =>
        logical match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => Some(l.longValue)
              case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                Some(Math.multiplyExact(l.longValue, 1000L))
              case _ => None // NANOS: Spark-side rounding is reader-config
            }
          case _ => None // INT96 or untyped INT64
        }
      case (LongType, l: java.lang.Long) if logical == null =>
        Some(l.longValue)
      case (IntegerType, i: java.lang.Integer)
          // mirror the LongType gate: plain INT32, or an explicitly
          // SIGNED int annotation of width <= 32 — a DECIMAL/unsigned
          // annotation surfaced as Catalyst int would fold raw signed
          // order over differently-ordered values
          if logical == null || (logical match {
            case ann: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
              ann.isSigned && ann.getBitWidth <= 32
            case _ => false
          }) =>
        Some(i.longValue)
      case (DateType, i: java.lang.Integer)
          if logical.isInstanceOf[LogicalTypeAnnotation
            .DateLogicalTypeAnnotation] =>
        Some(i.longValue)
      case _ => None
    }
  }
}
