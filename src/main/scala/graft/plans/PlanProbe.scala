package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Analyzed-plan introspection shared by every serving-leg pin: the
  * registry queries, PlanAudit, and the rewrite specs all need "which
  * store did this plan actually scan" — ONE definition, so a change to
  * how scan roots are detected (e.g. a DataSourceV2 migration) edits one
  * place. */
object PlanProbe {

  /** Root paths of every file scan in the analyzed plan. */
  def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _                    => Seq.empty[String]
        }
    }.flatten

  /** True when the plan scans at least one file source and every scan
    * root contains `marker` — the used_view pin. */
  def scansOnly(df: DataFrame, marker: String): Boolean = {
    val roots = scanRoots(df)
    roots.nonEmpty && roots.forall(_.contains(marker))
  }

  /** True when ANY scan root contains `marker` — the used_view pin for
    * DELTA-COMPENSATED serving, whose plan legitimately reads the view
    * plus the gap's delta (and pruned standing-band) files. */
  def scansAny(df: DataFrame, marker: String): Boolean =
    scanRoots(df).exists(_.contains(marker))
}
