package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** The fifth injection point of the §2.13 Catalyst ladder: a PARSER
  * extension. Spark's grammar has no as-of join; this wrapper gives the
  * native operator a SQL spelling —
  *
  *   ASOF JOIN <left> AND <right>
  *     ON <leftKey> = <rightKey> AT <rightTime> <= <leftTime>
  *     [TIE <col>[, <col>…]]
  *
  * — which parses DIRECTLY to `AsOfJoinPlan` over unresolved relations
  * (the analyzer resolves the views, EnsureRequirements plans one
  * exchange + sort per side, AsOfJoinExec merges — the identical
  * pipeline the DataFrame API entry j11b rides). Everything that is not
  * this one statement shape is delegated verbatim to Spark's parser, so
  * the wrapper can never change the meaning of normal SQL.
  *
  * Declared grammar limits (by design — this is a whole-query match,
  * not a grammar graft): relation names must be bare dotted
  * identifiers (no backtick-quoted names), and the spelling is the
  * WHOLE query — it composes as a view body or via parseQuery (both
  * routed below, so `CREATE VIEW v AS ASOF JOIN …` works through
  * Spark's own delegation to parseQuery), but it cannot appear as one
  * subclause inside a larger SELECT. Wrap it in a view/CTE first —
  * the same restriction Spark itself puts on e.g. TABLESAMPLE-less
  * pipe syntax extensions.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val AsOf = (
    """(?is)\s*ASOF\s+JOIN\s+([\w.]+)\s+AND\s+([\w.]+)""" +
    """\s+ON\s+(\w+)\s*=\s*(\w+)""" +
    """\s+AT\s+(\w+)\s*<=\s*(\w+)""" +
    """(?:\s+TIE\s+([\w\s,]+?))?\s*;?\s*""").r

  private def asOfOrElse(sqlText: String,
                         fallback: String => LogicalPlan): LogicalPlan =
    sqlText match {
      case AsOf(l, r, leftKey, rightKey, rightTime, leftTime, tie) =>
        AsOfJoinPlan(
          UnresolvedRelation(delegate.parseMultipartIdentifier(l)),
          UnresolvedRelation(delegate.parseMultipartIdentifier(r)),
          leftKey = leftKey, leftTime = leftTime,
          rightKey = rightKey, rightTime = rightTime,
          rightTieBreak = Option(tie).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
      case _ => fallback(sqlText)
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    asOfOrElse(sqlText, delegate.parsePlan)

  // parseQuery is what Spark calls for view bodies / CTAS sources —
  // routing it through the same match lets the ASOF spelling compose
  // (e.g. CREATE TEMP VIEW enriched AS ASOF JOIN p AND c ON …)
  override def parseQuery(sqlText: String): LogicalPlan =
    asOfOrElse(sqlText, delegate.parseQuery)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
