package graft.sql

import java.util.concurrent.atomic.AtomicLong

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

  private val counter = new AtomicLong()

  /** Matches `FROM 'path'` / `JOIN 'path'` (and a following
    * `, 'path'` in a FROM list).
    */
  private val PathRef = """(?i)\b(from|join)\s+'([^']+)'""".r

  /** Rewrite direct-path refs to registered temp views; returns the
    * rewritten SQL.
    */
  def rewrite(spark: SparkSession, sql: String, resolvePath: String => String): String = {
    val found = PathRef.findAllMatchIn(sql).map(_.group(2)).toSeq.distinct
    found.foldLeft(sql) { (acc, raw) =>
      Formats.infer(raw) match {
        case Some(fmt) =>
          val name = s"temp_${System.currentTimeMillis() / 1000}_${counter.incrementAndGet()}"
          Formats.read(spark, resolvePath(raw), fmt).createOrReplaceTempView(name)
          acc.replace(s"'$raw'", name)
        case None => acc // quoted string that isn't a file ref — leave it
      }
    }
  }

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
