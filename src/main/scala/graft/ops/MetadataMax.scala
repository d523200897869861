package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** METADATA-ONLY MAX: evaluate a global `MAX(col)` over a parquet
  * relation from the files' FOOTER STATISTICS instead of scanning the
  * data — the classic metadata-only aggregate every columnar engine
  * ships (DuckDB, Trino, the table formats' `max` from manifest
  * stats). Parquet already stores an exact per-row-group max for
  * plain INT32/INT64 columns; the global max is the max over
  * footers — O(files) driver-side metadata reads, zero executor work,
  * zero data scan.
  *
  * Why it exists here: the reference's load script computes its delta
  * offset as `SET v = (SELECT IFNULL(MAX(cdc_ts) - INTERVAL n DAY, …)
  * FROM target)` (ref `Incremental_load_fact_item_status.sql:10-20`).
  * The Scala protocol prunes that MAX to the latest day partition
  * (`etl/IncrementalLoad.latestDay`); the script front door's target
  * is a flat parquet directory, so the equivalent prune is footer
  * stats. At 100 TB an unpruned full-fact MAX per load run is real
  * money; footers are metadata the planner has to touch anyway.
  *
  * Soundness gates (ALL must hold, else the caller falls back to the
  * ordinary scan — the rewrite can refuse, never lie):
  *  - global aggregate (no grouping), every aggregate function is a
  *    plain `MAX(column)` — no DISTINCT, no FILTER clause;
  *  - the child is the bare relation (optionally under a
  *    column-pruning Project): any Filter/Join/expression in between
  *    invalidates footer stats;
  *  - the column is a top-level INT64/INT32-backed type whose parquet
  *    stats are exact and ordered like the Catalyst type: long, int,
  *    date (INT32 days), timestamp (INT64 MICROS/MILLIS). Strings
  *    are excluded (parquet-mr may truncate binary stats), as are
  *    floats (NaN ordering differs) and INT96 (no stats at all);
  *  - every row group of every data file carries usable stats for the
  *    column (`hasNonNullValue`, or provably all-null).
  *
  * All-null columns and empty tables fold to a NULL literal — exactly
  * what a global MAX returns over empty input, so IFNULL fallbacks
  * behave identically. The rewrite emits `Project[literal] ←
  * OneRowRelation` in place of the whole aggregate, so the re-planned
  * statement constant-folds and executes ZERO Spark jobs.
  */
object MetadataMax {

  /** Rewrite every eligible `Aggregate[max(c)] ← parquet relation`
    * inside `plan` (including under scalar subqueries) to a
    * `Project[literal] ← OneRowRelation`: each MAX becomes its
    * footer-derived literal (NULL for empty/all-null input — exactly
    * what a global MAX over empty input returns), so the re-executed
    * plan folds to a constant and costs ZERO Spark jobs. Returns None
    * when nothing was rewritten. */
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
        eligibleChild(child).flatMap { rel =>
          val maxed = collectMaxAttrs(aggExprs)
          if (maxed.isEmpty) None
          else footerMaxes(spark, rel, maxed).map { vals =>
            changed = true
            val folded = aggExprs.map(_.transform {
              case ae: AggregateExpression =>
                val attr = ae.aggregateFunction
                  .asInstanceOf[Max].child.asInstanceOf[AttributeReference]
                Literal(vals(attr.exprId), ae.dataType)
            }.asInstanceOf[org.apache.spark.sql.catalyst.expressions
              .NamedExpression])
            Project(folded, OneRowRelation())
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
      case Project(exprs, _: OneRowRelation) if exprs.forall(_.foldable) =>
        Some(org.apache.spark.sql.Row.fromSeq(exprs.map(e =>
          CatalystTypeConverters.convertToScala(e.eval(null), e.dataType))))
      case _ => None
    }
  }

  /** The bare parquet relation under an optional column-pruning
    * Project; None on any other shape. */
  private def eligibleChild(p: LogicalPlan): Option[LogicalRelation] =
    p match {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        Some(l)
      case Project(projList, child)
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        eligibleChild(child)
      case _ => None
    }

  /** The attributes maxed by the aggregate — or Nil if ANY aggregate
    * function is not a plain MAX over an eligible-typed attribute. */
  private def collectMaxAttrs(aggExprs: Seq[org.apache.spark.sql.catalyst
      .expressions.NamedExpression]): Seq[AttributeReference] = {
    val fns = aggExprs.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    val attrs = fns.map { ae =>
      if (ae.isDistinct || ae.filter.nonEmpty) return Nil
      ae.aggregateFunction match {
        case Max(a: AttributeReference) if statsExact(a.dataType) => a
        case _ => return Nil
      }
    }
    attrs.distinct
  }

  private def statsExact(t: DataType): Boolean = t match {
    case LongType | IntegerType | DateType | TimestampType => true
    case _ => false
  }

  /** Each attribute's footer-global max as the Catalyst INTERNAL
    * value keyed by exprId (null for empty/all-null input). None when
    * stats are missing/unusable anywhere — the refusal path. */
  private def footerMaxes(spark: SparkSession, rel: LogicalRelation,
      attrs: Seq[AttributeReference])
      : Option[Map[org.apache.spark.sql.catalyst.expressions.ExprId, Any]] = {
    val fs = rel.relation.asInstanceOf[HadoopFsRelation]
    // partition columns have no footer presence; refuse them
    if (attrs.exists(a => fs.partitionSchema.fieldNames.contains(a.name)))
      return None
    val files = fs.location.inputFiles.filter(_.endsWith(".parquet"))
    val conf = spark.sparkContext.hadoopConfiguration
    Some(attrs.map { a =>
      footerMax(conf, files, a.name, a.dataType) match {
        case FooterMax.Unusable => return None
        case FooterMax.AllNull  => a.exprId -> null
        case FooterMax.Value(v) => a.exprId -> v
      }
    }.toMap)
  }

  private sealed trait FooterMax
  private object FooterMax {
    case object Unusable extends FooterMax
    case object AllNull extends FooterMax
    final case class Value(v: Any) extends FooterMax
  }

  /** Exact global max of a column across all row groups of all files,
    * as the Catalyst INTERNAL value (Long micros for timestamps, Int
    * days for dates). Unusable on the first row group without
    * trustworthy stats. */
  private def footerMax(conf: Configuration, files: Seq[String],
      column: String, t: DataType): FooterMax = {
    var best: Option[Long] = None
    files.foreach { f =>
      val reader = try {
        ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      } catch { case _: Exception => return FooterMax.Unusable }
      try {
        val footer = reader.getFooter
        footer.getBlocks.asScala.foreach { block =>
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(return FooterMax.Unusable)
          val stats = col.getStatistics
          if (stats == null) return FooterMax.Unusable
          if (stats.hasNonNullValue) {
            internalValue(col,
                stats.genericGetMax.asInstanceOf[AnyRef], t) match {
              case Some(v) =>
                if (best.forall(_ < v)) best = Some(v)
              case None => return FooterMax.Unusable
            }
          } else if (!(stats.isNumNullsSet &&
              stats.getNumNulls == col.getValueCount)) {
            // no max recorded AND not provably all-null: unusable
            return FooterMax.Unusable
          }
        }
      } finally reader.close()
    }
    best match {
      case Some(v) => t match {
        case IntegerType | DateType => FooterMax.Value(v.toInt)
        case _ => FooterMax.Value(v)
      }
      case None => FooterMax.AllNull
    }
  }

  /** Footer max → Catalyst internal Long, checking the parquet
    * physical/logical type actually matches the Catalyst type (a
    * mismatch means schema evolution or INT96 — refuse). */
  private def internalValue(col: org.apache.parquet.hadoop.metadata
      .ColumnChunkMetaData, max: AnyRef, t: DataType): Option[Long] = {
    val logical = col.getPrimitiveType.getLogicalTypeAnnotation
    (t, max) match {
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
      case (IntegerType, i: java.lang.Integer) => Some(i.longValue)
      case (DateType, i: java.lang.Integer)
          if logical.isInstanceOf[LogicalTypeAnnotation
            .DateLogicalTypeAnnotation] =>
        Some(i.longValue)
      case _ => None
    }
  }
}
