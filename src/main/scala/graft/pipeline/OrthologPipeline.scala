package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** The flagship `--species` flow as one pure batch transformation:
  * `(source relations, prior state, runTs) => (new state, audit outputs)`.
  *
  * Mirrors OrthologRelationLoadingManager.run ->
  * OrthologRelationLoader.run (OrthologRelationLoadingManager.java:120-155,
  * OrthologRelationLoader.java:37-80), with every interleaved read/write
  * recast against the prior-state snapshot (SURVEY.md section 4,
  * "order-dependence"): parse -> resolve (J1/J2) -> drop unmapped (F7) ->
  * group+merge (A1/A3) -> complement (U2) -> cascade (W4/W2) ->
  * reconcile (M1/M2/W3/F11) -> weak-ortholog sync (M4/A7/D1/D2/D3) ->
  * final dedupe (W1).
  */
object OrthologPipeline {

  /** Prior state + dimension snapshot (the parquet-backed "database"). */
  case class State(orthologs: DataFrame, associations: DataFrame,
                   agrOrthologs: DataFrame, xrefs: DataFrame, genes: DataFrame,
                   rgdIds: DataFrame, history: DataFrame)

  case class Result(orthologs: DataFrame, associations: DataFrame,
                    resolutionAudit: DataFrame, strongPicks: DataFrame,
                    mergeAudit: Map[String, DataFrame])

  /** How a phase boundary materializes. The pipeline is a chain of
    * phases that each read the previous phase's full output (and the
    * state snapshot several times over); composing them as one lazy plan
    * makes Catalyst's tree traversals blow up combinatorially, so every
    * phase output is materialized and the plan restarts from it.
    *
    * [[BucketedPhases]] is the PRODUCTION path: each phase output is
    * written as a bucketed parquet state table (via
    * [[graft.sources.StateStore]]) and re-read - a run must survive
    * process loss between phases, and the next phase's equi-joins want
    * the bucket co-location. The benched/oracled flagship runs this
    * path, so the bench pays the real write+read cost.
    * [[InProcessPhases]] (localCheckpoint) is the in-process stand-in
    * for callers without a writable warehouse (unit fixtures, CLI dry
    * runs). */
  trait PhaseStore {
    def apply(name: String, keys: Seq[String], df: DataFrame): DataFrame
  }
  case object InProcessPhases extends PhaseStore {
    def apply(name: String, keys: Seq[String], df: DataFrame): DataFrame =
      df.localCheckpoint()
  }
  /** Bucketed-parquet phase persistence. `prefix` namespaces the catalog
    * tables (one flagship run per prefix); files land under `baseDir`.
    * Bucket count is the TEST/bench-scale value - production sizes
    * buckets for the target table (see StateStore scaladoc). */
  final case class BucketedPhases(prefix: String, baseDir: String,
                                  buckets: Int = 64) extends PhaseStore {
    def apply(name: String, keys: Seq[String], df: DataFrame): DataFrame = {
      val table = s"${prefix}_$name"
      graft.sources.StateStore.writeBucketed(df, table, keys, buckets,
        path = Some(s"$baseDir/$name"))
      graft.sources.StateStore.read(df.sparkSession, table)
    }
  }

  /** Run the per-species load for `speciesTypeKey` over already-parsed
    * relations (output shape of Readers.readHcopPlusNcbi / readNcbi). */
  def runSpecies(relations: DataFrame, state: State, speciesTypeKey: Int,
                 runTs: java.sql.Timestamp, pipelineUserId: Int = 70,
                 phases: PhaseStore = InProcessPhases): Result = {

    // J1/J2 bulk resolution + audit streams (matched/unmatched/...)
    val (resolved, audit) = Resolve.resolveRelations(
      relations, state.xrefs, state.genes, state.rgdIds, state.history)

    // F7 (resolution already drops failures; guard for direct callers)
    val mapped = Resolve.dropUnmapped(resolved)

    // A1/A3 merge + U2 complement
    val merged = Grouping.mergeRelations(mapped)
    val withComplements = phases("relations", Seq("srcRgdId"),
      Grouping.withComplementaryRelations(merged))

    // W4 cascade + W2 best-fit against the prior-state snapshot
    val picks = phases("picks", Seq("srcRgdId"),
      Cascade.run(withComplements, state.orthologs,
        state.agrOrthologs, state.genes))

    // M1/M2: reconcile picks with ortholog state; groupId rides along
    // onto inserted state rows (reference-bean parity)
    val incoming = picks.select(
      col("srcRgdId"), col("destRgdId"),
      col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
      col("xrefDataSrc"), col("xrefDataSet"), col("groupId"))
    val m0 = Merge.reconcile(incoming, state.orthologs, state.genes,
      runTs, speciesTypeKey, pipelineUserId)
    val m = m0.copy(
      newState = phases("merged_state", Seq("key"), m0.newState),
      downgraded = phases("downgraded", Seq("srcRgdId"), m0.downgraded))

    // W1: final duplicate cleanup
    val (dedupedState0, w1Deleted) = Merge.deleteDuplicateNonManualOrthologs(
      m.newState, pipelineUserId)
    val dedupedState = phases("orthologs", Seq("key"), dedupedState0)

    // M4/A7: weak-ortholog sync against the POST-merge ortholog state
    val weakIncoming = WeakSync.dropStrongOrthologs(
      WeakSync.buildIncoming(withComplements, m.downgraded, runTs), dedupedState)
    val assocInScope = state.associations // diff scope: weak orthologs
    val sync = WeakSync.syncDiff(weakIncoming, assocInScope)

    // D1/D2/D3: symmetry repair + delete-flap suppression
    val human = graft.model.Species.HUMAN
    val rep1 = WeakSync.repairOrthologSymmetry(dedupedState, state.associations,
      human, speciesTypeKey, runTs)
    val rep2 = WeakSync.repairOrthologSymmetry(dedupedState, state.associations,
      speciesTypeKey, human, runTs)
    val deletesAfterOrthoRepair = WeakSync.detach(sync.deletes,
      rep1.detachKeys.unionByName(rep2.detachKeys))
    val rep3 = WeakSync.repairAssocSymmetry(state.associations, dedupedState,
      state.rgdIds, deletesAfterOrthoRepair, speciesTypeKey, runTs)
    val finalDeletes = WeakSync.detach(deletesAfterOrthoRepair, rep3.detachKeys)

    // final association state = state - deletes + updates + inserts (+ repairs)
    val repairInserts = rep1.assocInserts
      .unionByName(rep2.assocInserts).unionByName(rep3.assocInserts)
    val untouchedAssocs = state.associations
      .join(finalDeletes.select(col("assocKey")), Seq("assocKey"), "left_anti")
      .join(sync.updates.select(col("assocKey")), Seq("assocKey"), "left_anti")
    val newAssociations = untouchedAssocs
      .unionByName(sync.updates.select(untouchedAssocs.columns.toIndexedSeq.map(col): _*))
      .unionByName(assignAssocKeys(
        sync.inserts.unionByName(repairInserts), state.associations))

    // repair ortholog deletes (D1 downgrades) leave the ortholog state
    val finalOrthologs = dedupedState.join(
      rep1.orthologDeletes.unionByName(rep2.orthologDeletes), Seq("key"), "left_anti")

    Result(
      orthologs = finalOrthologs,
      associations = newAssociations,
      resolutionAudit = audit,
      strongPicks = picks,
      mergeAudit = Map(
        "touched" -> m.touched, "inserted" -> m.inserted,
        "deleted" -> m.deleted, "downgraded" -> m.downgraded,
        "w1Deleted" -> w1Deleted, "syncMatched" -> sync.matched,
        "syncUpdated" -> sync.updates, "syncInserted" -> sync.inserts,
        "syncDeleted" -> finalDeletes))
  }

  /** Deterministic surrogate assoc keys above the current max -
    * distributed sequence, not a single-partition global window (see
    * operators.Keys). The max-key base attaches lazily as a broadcast
    * scalar: a caller that never consumes the association state (the
    * picks-only flagship queries) never pays for this branch. */
  private def assignAssocKeys(inserts: DataFrame, state: DataFrame): DataFrame = {
    val maxKey = state.agg(coalesce(max(col("assocKey")), lit(0L)))
    val base = if (inserts.columns.contains("assocKey"))
      inserts.drop("assocKey") else inserts
    Keys.assignSequentialFrom(base, "assocKey", maxKey,
      Seq(col("masterRgdId"), col("detailRgdId"), col("srcPipeline"),
        col("assocSubType")))
  }
}
