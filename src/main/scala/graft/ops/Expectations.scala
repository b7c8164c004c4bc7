package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ / Great
  * Expectations primitive: a constraint list evaluated against a
  * table in ONE aggregate pass, emitting a per-constraint violation
  * report (the publish gate every ingest pipeline runs before
  * promoting a partition).
  *
  * Scale shape: every row-level constraint compiles to a
  * `sum(CASE WHEN violated)` inside a single map-side-combinable
  * aggregate — the table is read once no matter how many constraints
  * are declared. `Unique` needs its own grain and costs one
  * distinct-style aggregate per declared column (count minus distinct
  * count); everything else shares the one pass.
  */
object Expectations {

  sealed trait Check { def name: String }
  /** Column must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** Column values unique across the table (nulls count as values). */
  final case class Unique(col: String) extends Check {
    def name = s"unique($col)"
  }
  /** lo <= col <= hi (nulls violate — use NotNull + Range for the
    * usual contract; a null is never silently in range).
    */
  final case class InRange(col: String, lo: Double, hi: Double)
    extends Check {
    def name = s"in_range($col)"
  }
  /** Column value member of the allowed set (nulls violate). */
  final case class InSet(col: String, allowed: Seq[String]) extends Check {
    def name = s"in_set($col)"
  }
  /** Column matches the anchored regex (nulls violate). */
  final case class Matches(col: String, regex: String) extends Check {
    def name = s"matches($col)"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(cl) => sum(when(col(cl).isNull, 1L).otherwise(0L))
    case u: Unique =>
      throw new IllegalArgumentException(s"${u.name} has its own grain")
    case InRange(cl, lo, hi) =>
      sum(when(col(cl).isNull || col(cl) < lo || col(cl) > hi, 1L)
        .otherwise(0L))
    case InSet(cl, allowed) =>
      sum(when(col(cl).isNull || !col(cl).isin(allowed: _*), 1L)
        .otherwise(0L))
    case Matches(cl, re) =>
      sum(when(col(cl).isNull || !col(cl).rlike(re), 1L).otherwise(0L))
  }

  /** @return one row per check: `check`, `n_rows`, `n_violations`,
    *         `ok` — deterministic order by check name
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    val spark = df.sparkSession
    val rowChecks = checks.filter(!_.isInstanceOf[Unique])
    val uniqueChecks = checks.collect { case u: Unique => u }
    val base: Option[DataFrame] = if (rowChecks.isEmpty) None else Some {
      val agg = df.agg(count(lit(1)).as("n_rows"),
        rowChecks.map(c => violations(c).as(c.name)): _*)
      agg.selectExpr("n_rows",
          s"stack(${rowChecks.size}, " + rowChecks.map(c =>
            s"'${c.name}', `${c.name}`").mkString(", ") +
            ") AS (check, n_violations)")
        .select(col("check"), col("n_rows"), col("n_violations"))
    }
    // violations = rows - distinct values (null counts as ONE value):
    // every row beyond the first holder of its value violates
    val uniques = uniqueChecks.map { u =>
      df.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - countDistinct(col(u.col)) -
            coalesce(max(when(col(u.col).isNull, 1L).otherwise(0L)),
              lit(0L))).as("n_violations"))
        .select(lit(u.name).as("check"), col("n_rows"),
          col("n_violations"))
    }
    val all = (base.toSeq ++ uniques).reduce(_ unionByName _)
    all.select(col("check"), col("n_rows"), col("n_violations"),
      (col("n_violations") === 0).as("ok"))
  }

  /** Referential-integrity audit for one FK relation: child rows
    * whose key has no parent (left anti count) — the DQ check every
    * star schema runs on load. NULL child keys are counted
    * separately (a null FK is a different defect than an orphan).
    * One semi-join per relation; union the rows for a whole-schema
    * audit.
    *
    * @return one row: `relation`, `n_child`, `n_null_key`,
    *         `n_orphans`, `orphan_ppm`
    */
  def refIntegrity(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      relation: String): DataFrame = {
    val keyed = child.select(col(childKey).as("_k"))
    val nonNull = keyed.where(col("_k").isNotNull)
    val orphans = nonNull.join(
      parent.select(col(parentKey).as("_k")).distinct(),
      Seq("_k"), "left_anti")
    keyed.agg(count(lit(1)).as("n_child"),
        sum(when(col("_k").isNull, 1L).otherwise(0L)).as("n_null_key"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_null_key"), col("n_orphans"),
        expr("(n_orphans * 1000000) DIV n_child").as("orphan_ppm"))
  }
}
