package graft.sql

import graft.sources.Formats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Direct-path table references in SQL.
  *
  * The reference lets users write `select * from '/path/order*.csv'`:
  * any table ref with a recognizable file extension is auto-registered
  * as a temp table and the SQL is rewritten to use the generated name
  * (reference: src/data_source/context.rs:83-152). Spark SQL won't
  * parse a quoted string in FROM position, so the rewrite happens on
  * the SQL text *before* parsing: quoted strings in FROM/JOIN position
  * whose extension maps to a known format become temp views.
  *
  * Glob patterns ride along for free — the path is handed to Spark's
  * distributed file index, which expands globs during listing
  * (reference does this driver-side with the glob crate,
  * src/data_source/utils.rs:29-38; here listing is parallelized).
  */
object DirectPath {

  /** Matches `FROM 'path'` / `JOIN 'path'`. */
  private val PathRef = """(?i)\b(from|join)(\s+)'([^']+)'""".r

  /** Rewrite direct-path refs to registered temp views; returns the
    * rewritten SQL. Replacement happens only at the matched FROM/JOIN
    * positions — an identical quoted string elsewhere (a SELECT-list
    * or predicate literal) is left untouched. View names derive from
    * the resolved path, so repeated queries over the same file REPLACE
    * one view instead of accumulating new ones in a long-lived session
    * (the reference registers TEMP catalog rows per query,
    * src/data_source/context.rs:100-128; a server can't afford that).
    */
  def rewrite(spark: SparkSession, sql: String, resolvePath: String => String): String =
    PathRef.replaceAllIn(sql, m => {
      val raw = m.group(3)
      Formats.infer(raw) match {
        case Some(fmt) =>
          val resolved = resolvePath(raw)
          val name = f"graft_path_${graft.functions.TextHashes.fnv1a64(resolved.getBytes("UTF-8"))}%016x"
          Formats.read(spark, resolved, fmt).createOrReplaceTempView(name)
          java.util.regex.Matcher.quoteReplacement(s"${m.group(1)}${m.group(2)}$name")
        case None =>
          java.util.regex.Matcher.quoteReplacement(m.matched) // not a file ref
      }
    })

  /** Table names referenced by `sql` that are not yet resolvable —
    * the set the reference looks up in its catalog
    * (reference: src/sql/parse.rs:17-37 get_table_names).
    * Uses Spark's own parser: every UnresolvedRelation in the plan,
    * including those inside CTEs, subqueries and set operations.
    */
  def unresolvedTables(spark: SparkSession, sql: String): Seq[String] = {
    def collect(plan: LogicalPlan): Seq[String] = {
      val here = plan.collect { case r: UnresolvedRelation => r.multipartIdentifier.mkString(".") }
      val nested = plan.flatMap(_.subqueries).flatMap(collect)
      here ++ nested
    }
    collect(spark.sessionState.sqlParser.parsePlan(sql)).distinct
  }
}
