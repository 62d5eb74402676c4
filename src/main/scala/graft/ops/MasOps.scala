package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MAS-analog side-channel derivation (M1/M2/M3/W4 in SURVEY.md §2).
  *
  * The reference schedules one machine-annotation job per
  * (masId × unchanged target) for targets whose events set
  * `forceMasSchedule` and carry a non-empty `masList`
  * (service/MasSchedulerService.java:48-83); job rows are
  * `MasJobRequest(masId, DOI_PROXY + targetId, batching=false, agentPid,
  * targetType)` (MasSchedulerService.java:85-94). Re-expressed Spark-first:
  * filter → explode → row construction — one narrow pass, no shuffle.
  */
object MasOps {

  /** One job row per (mas_id × target), for targets passing the reference's
    * filter matrix: `forceCol` true AND `masListCol` non-empty (null list
    * normalizes to empty — no jobs, ApplicationConfiguration.java:26-31).
    * Output: (mas_id, target_id, batching, agent_id, target_type). */
  def masJobRequests(targets: DataFrame, idCol: String, masListCol: String,
      forceCol: Column, targetType: String, agentId: String,
      idPrefix: String = ""): DataFrame =
    targets
      .filter(forceCol && size(coalesce(col(masListCol), array())) > 0)
      .select(
        explode(col(masListCol)).as("mas_id"),
        concat(lit(idPrefix), col(idCol).cast("string")).as("target_id"),
        lit(false).as("batching"),
        lit(agentId).as("agent_id"),
        lit(targetType).as("target_type"))

  /** M2's semi-join gate: restrict `events` to targets present in
    * `unchanged` (the reference's `unchangedMedia.containsKey` = LEFT SEMI,
    * MasSchedulerService.java:71), then derive job rows. */
  def masJobRequestsForUnchanged(events: DataFrame, unchanged: DataFrame,
      idCol: String, masListCol: String, forceCol: Column, targetType: String,
      agentId: String, idPrefix: String = ""): DataFrame =
    masJobRequests(
      events.join(unchanged.select(col(idCol)).distinct(), Seq(idCol), "left_semi"),
      idCol, masListCol, forceCol, targetType, agentId, idPrefix)
}
