package graft.engine

import graft.rules.{Referential, Rule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable, lineage-emitting execution of a rule pack against a pinned
  * snapshot.
  *
  * Resume unit = (snapshot_id, partition_values): a partition whose lineage
  * row already exists for the pinned snapshot is skipped entirely — the
  * engine's analog of the reference only bumping `last_checked` after a
  * batch fully classified (SourceSystemDataCheckerService.java:62-66;
  * SpecimenRepository.java:35-40). Lineage is written LAST, after verdicts
  * and violations landed, so a crash mid-run re-does (idempotently
  * re-appends under a fresh run_id) only unfinished partitions.
  */
final class CheckpointedRunner(store: SnapshotStore, outStore: SnapshotStore) {

  val LineageTable = "lineage"
  val VerdictsTable = "verdicts"
  val ViolationsTable = "violations"
  private val OrphanPv = "table=transcripts"

  def donePartitions(spark: SparkSession, snapshotId: Long): Set[String] =
    if (!outStore.exists(LineageTable)) Set.empty
    else outStore.read(spark, LineageTable)
      .filter(col("snapshot_id") === snapshotId)
      .select("partition_values").distinct()
      .collect().map(_.getString(0)).toSet

  /** Run `rules` over the pinned clips snapshot, skipping finished
    * partitions. Returns the lineage rows written this run (empty ⇒ the
    * run was a no-op resume). */
  def runResumable(
      spark: SparkSession,
      snapshotId: Long,
      rules: Seq[Rule],
      cfg: EngineConfig = EngineConfig()): DataFrame = {

    val clips = store.read(spark, "clips", Some(snapshotId))
    val transcripts = store.read(spark, "transcripts")
    val baseline = store.read(spark, "baseline_clips")

    val done = donePartitions(spark, snapshotId)
    val pv = concat(lit(cfg.partitionCol + "="),
      coalesce(col(cfg.partitionCol).cast("string"), lit("null")))

    val pending = if (done.isEmpty) clips else clips.filter(!pv.isin(done.toSeq: _*))
    // orphan-direction referential check is partition-independent; run it
    // only if its pseudo-partition is not checkpointed yet
    val effRules = if (done.contains(OrphanPv))
      rules.map { case r: Referential => r.copy(bidirectional = false); case r => r }
    else rules

    if (pending.isEmpty && done.contains(OrphanPv)) {
      // no-op resume: everything checkpointed — return the existing lineage
      // (idempotent: the result is "the state after this run" either way)
      return outStore.read(spark, LineageTable).filter(col("snapshot_id") === snapshotId)
    }

    val t0 = System.nanoTime()
    val report = ValidationEngine.run(spark, pending, transcripts, baseline, effRules, cfg)

    // route outputs (A1/W1-W3 analog): violations first, verdicts second,
    // lineage LAST — lineage presence is the commit marker.
    outStore.append(ViolationsTable, report.violations.withColumn("snapshot_id", lit(snapshotId)))
    outStore.append(VerdictsTable, report.verdicts.withColumn("snapshot_id", lit(snapshotId)))
    val wallMs = (System.nanoTime() - t0) / 1000000L

    val lineage = report.verdicts
      .groupBy(col("partition_values"))
      .agg(collect_set(col("rule_id")).as("rules_evaluated"),
        sum(col("violation_count")).as("violation_count"))
      .select(lit(snapshotId).as("snapshot_id"), col("partition_values"),
        col("rules_evaluated"), col("violation_count"), lit(wallMs).as("wall_ms"))
    outStore.append(LineageTable, lineage)
    report.unpersist()
    outStore.read(spark, LineageTable).filter(col("snapshot_id") === snapshotId)
  }
}
