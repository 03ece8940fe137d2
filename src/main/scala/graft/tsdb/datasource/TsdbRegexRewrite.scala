package graft.tsdb.datasource

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, In, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Regex matchers → postings, the reference's P7 (`querier.go:245-284`):
  * Spark's DSv2 filter API has no regex filter, so an `=~` predicate
  * would otherwise decode EVERY series and filter post-scan. The
  * reference's strategy — enumerate the label's values, keep those the
  * regex matches, union their postings — maps onto Spark as an optimizer
  * rewrite: `label RLIKE 'p'` over a `graft-tsdb` relation becomes
  * `label IN (matching values)`, which the scan builder already pushes
  * as a postings union ([[TsdbScanBuilder]] `In` → [[EqValues]]).
  *
  * The rewrite is exactly semantics-preserving, including nesting under
  * NOT: `In` returns NULL for a NULL input just as `RLIKE` does, and
  * matching uses `find()` (Spark's `RLike` contract — unanchored;
  * Prometheus-style full anchoring comes from the `^(?:re)$` patterns
  * [[graft.tsdb.LabelMatcher]] generates). Runs in the operator-
  * optimization batch (before V2 scan pushdown) via
  * `graft.GraftExtensions`.
  *
  * Value enumeration is driver-side over the per-JVM cached index; a
  * pathological label with more than [[TsdbRegexRewrite.MaxInList]]
  * distinct values is left unrewritten (residual post-scan filter)
  * rather than bloating the plan with a huge literal list.
  */
object TsdbRegexRewrite extends Rule[LogicalPlan] {
  val MaxInList = 100000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[TsdbBlockTable] =>
      val tbl = r.table.asInstanceOf[TsdbBlockTable]
      val labelCols =
        tbl.schema().fieldNames.toSet -- TsdbBlockTable.FixedFields
      val newCond = cond.transform {
        case rl @ RLike(a: AttributeReference, Literal(p: UTF8String, StringType))
            if labelCols.contains(a.name) =>
          rewrite(tbl, a, p.toString).getOrElse(rl)
      }
      if (newCond fastEquals cond) f else Filter(newCond, r)
  }

  private def rewrite(tbl: TsdbBlockTable, a: AttributeReference,
                      pattern: String): Option[Expression] = {
    val compiled =
      try java.util.regex.Pattern.compile(pattern)
      catch { case _: Exception => return None } // let RLike raise it
    val values = TsdbBlockTable.blockDirs(tbl.rootPath).flatMap { d =>
      TsdbIndexCache.get(graft.tsdb.BlockIO.child(d, "index")).labelValues(a.name)
    }.distinct
    if (values.size > MaxInList) None
    else Some(In(a,
      values.filter(v => compiled.matcher(v).find())
        .map(v => Literal(UTF8String.fromString(v), StringType))))
  }
}
