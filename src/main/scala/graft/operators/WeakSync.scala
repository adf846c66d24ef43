package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M4/A7/J4/J5/J6/U6/D1/D2/D3: the weak-ortholog (association) sync.
  *
  * The reference builds association candidates from group relations plus
  * downgraded orthologs, drops pairs that are strong orthologs, diffs the
  * rest against the association state with RgdObjectSyncer, then runs
  * complement-repair passes that detach no-op delete+insert pairs
  * (OrthologRelationLoader.java:98-204, OrthologRelationDao.java:230-350).
  *
  * Set-wise: the group-wise syncer loop collapses into ONE full-outer
  * join on the association unique key; the repair passes are swapped-key
  * self-joins. All decisions read the post-merge ortholog state snapshot.
  */
object WeakSync {

  /** Association unique key (rgdcore Association.equals):
    * (masterRgdId, detailRgdId, assocType, srcPipeline). */
  private val uniqueKey = Seq("masterRgdId", "detailRgdId", "assocType", "srcPipeline")

  /** Build incoming weak-ortholog candidates: every group relation
    * (post-complement) becomes an association; downgraded orthologs are
    * appended (OrthologRelationLoader.java:98-136). */
  def buildIncoming(relations: DataFrame, downgraded: DataFrame,
                    runTs: java.sql.Timestamp): DataFrame = {
    val fromRelations = relations.select(
      col("srcRgdId").as("masterRgdId"),
      col("destRgdId").as("detailRgdId"),
      lit("weak_ortholog").as("assocType"),
      col("dataSetName").as("assocSubType"),
      col("dataSource").as("srcPipeline"),
      lit(runTs).as("creationDate"))
    val fromDowngrades = downgraded.select(
      col("srcRgdId").as("masterRgdId"),
      col("destRgdId").as("detailRgdId"),
      lit("weak_ortholog").as("assocType"),
      col("xrefDataSet").as("assocSubType"),
      col("xrefDataSrc").as("srcPipeline"),
      lit(runTs).as("creationDate"))
    fromRelations.unionByName(fromDowngrades)
  }

  /** J4 as an anti-join: drop candidates whose (master, detail) pair is a
    * strong ortholog in the given state snapshot
    * (OrthologRelationLoader.java:138-149). */
  def dropStrongOrthologs(candidates: DataFrame, orthologState: DataFrame): DataFrame =
    candidates.join(
      orthologState.select(col("srcRgdId").as("masterRgdId"),
        col("destRgdId").as("detailRgdId")),
      Seq("masterRgdId", "detailRgdId"), "left_anti")

  case class SyncResult(matched: DataFrame, updates: DataFrame,
                        inserts: DataFrame, deletes: DataFrame)

  /** S6: the syncer's state scope - weak_ortholog associations whose
    * (master, detail) species are the run pair (HUMAN, speciesTypeKey)
    * in EITHER direction, species resolved through the object registry
    * (OrthologRelationLoader.java:153 reads
    * getAssociationsByType("weak_ortholog", speciesTypeKey, HUMAN), and
    * OrthologRelationDao.java:377-381 unions both directions). The diff
    * must see ONLY this scope: state rows outside it (another species
    * pair's run, another association type) are not this run's data and
    * must never classify as stale deletes. */
  def syncScope(assocState: DataFrame, rgdIds: DataFrame,
                speciesTypeKey: Int): DataFrame = {
    val human = graft.model.Species.HUMAN
    val sp = broadcastableSpecies(rgdIds)
    assocState.filter(col("assocType") === "weak_ortholog")
      .join(sp.select(col("rgdId").as("masterRgdId"), col("spKey").as("masterSp")),
        Seq("masterRgdId"))
      .join(sp.select(col("rgdId").as("detailRgdId"), col("spKey").as("detailSp")),
        Seq("detailRgdId"))
      .filter((col("masterSp") === human && col("detailSp") === speciesTypeKey) ||
        (col("masterSp") === speciesTypeKey && col("detailSp") === human))
      .drop("masterSp", "detailSp")
  }

  /** A7/J6: the syncer diff as one full-outer join on the unique key.
    *
    * - key match + equal subType -> matched
    * - key match + different subType -> update (incoming subType wins)
    * - incoming only -> insert
    * - state only -> delete (deleteStale=true,
    *   OrthologRelationLoader.java:159-161)
    *
    * Incoming duplicates on the unique key are collapsed first (the
    * reference's syncer matches the first; we keep the lexicographically
    * smallest subType for determinism).
    */
  def syncDiff(incoming: DataFrame, assocState: DataFrame): SyncResult = {
    val w = Window.partitionBy(uniqueKey.map(col): _*)
      .orderBy(col("assocSubType").asc_nulls_last)
    val inc = incoming.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .select(uniqueKey.map(col) :+ col("assocSubType").as("incSubType")
        :+ col("creationDate").as("incCreationDate"): _*)

    // four outputs filter the same full-outer join; persist the shared
    // node so one sync evaluates the join once (lazy until consumed)
    val j = assocState.join(inc, uniqueKey, "full_outer").persist()

    // incoming presence is gated on incCreationDate (never null for an
    // incoming row), NOT incSubType: a key-matched incoming row whose
    // subtype is legitimately null must still classify as match/update,
    // not fall through every category
    val incPresent = col("incCreationDate").isNotNull
    val matched = j.filter(incPresent && col("assocKey").isNotNull &&
        col("assocSubType") <=> col("incSubType"))
      .drop("incSubType", "incCreationDate")
    val updates = j.filter(incPresent && col("assocKey").isNotNull &&
        !(col("assocSubType") <=> col("incSubType")))
      .withColumn("assocSubType", col("incSubType"))
      .drop("incSubType", "incCreationDate")
    val inserts = j.filter(col("assocKey").isNull)
      .select(
        lit(null).cast("long").as("assocKey"),
        col("assocType"),
        col("incSubType").as("assocSubType"),
        col("masterRgdId"), col("detailRgdId"), col("srcPipeline"),
        col("incCreationDate").as("creationDate"))
    val deletes = j.filter(!incPresent && col("assocKey").isNotNull)
      .drop("incSubType", "incCreationDate")

    SyncResult(matched, updates, inserts, deletes)
  }

  case class RepairResult(orthologDeletes: DataFrame, assocInserts: DataFrame,
                          detachKeys: DataFrame)

  /** D1: ortholog symmetry repair for one (sp1 -> sp2) direction.
    *
    * For each state ortholog with no reverse ortholog (swapped-key
    * self-anti-join):
    *  - manual -> audit only (never deleted)
    *  - else -> delete the ortholog AND insert the forward weak assoc
    *  - if a reverse weak assoc already exists -> detach (dest, src) from
    *    the delete list (U6); else insert the mirrored assoc
    * Ref: OrthologRelationDao.java:230-299.
    *
    * Status visibility (round 16, pinned in WeakSyncPropertySpec): when
    * `rgdIds` is given, the CANDIDATE set is both-endpoints-ACTIVE -
    * the reference iterates getAllOrthologs(sp1, sp2), whose published
    * SQL inner-joins rgd_ids twice with object_status='ACTIVE' (rgdcore
    * OrthologDAO). A state row with an inactive endpoint is never a
    * repair candidate: not deleted, no assoc synthesized, no detach.
    * The REVERSE-ortholog existence check stays raw by design
    * (areGenesOrthologous has no status condition), as does the
    * reverse-assoc check's master side; its detail side (= the
    * candidate's src) is ACTIVE by candidate construction, so the
    * published detail-ACTIVE join is vacuous here. Species keys come
    * from the state's own columns (definitionally consistent with the
    * registry in this engine's state model). */
  def repairOrthologSymmetry(orthologState: DataFrame, assocState: DataFrame,
                             sp1: Int, sp2: Int,
                             runTs: java.sql.Timestamp,
                             rgdIds: Option[DataFrame] = None): RepairResult = {
    val inDirection = orthologState.filter(
      col("srcSpeciesTypeKey") === sp1 && col("destSpeciesTypeKey") === sp2)
    val orthos = rgdIds match {
      case Some(reg) =>
        val act = broadcast(reg
          .filter(col("objectStatus") === "ACTIVE").select(col("rgdId")))
        inDirection
          .join(act.select(col("rgdId").as("srcRgdId")),
            Seq("srcRgdId"), "left_semi")
          .join(act.select(col("rgdId").as("destRgdId")),
            Seq("destRgdId"), "left_semi")
      case None => inDirection
    }

    val asym = orthos.join(
      orthologState.select(col("srcRgdId").as("destRgdId"),
        col("destRgdId").as("srcRgdId")),
      Seq("srcRgdId", "destRgdId"), "left_anti")
      .persist() // shared by the delete/insert/detach outputs below

    val nonManual = asym.filter(col("xrefDataSrc") =!= "RGD")

    val orthologDeletes = nonManual.select(col("key"))

    // forward assoc replaces the downgraded ortholog
    val forwardInserts = nonManual.select(
      lit(null).cast("long").as("assocKey"),
      lit("weak_ortholog").as("assocType"),
      col("xrefDataSet").as("assocSubType"),
      col("srcRgdId").as("masterRgdId"),
      col("destRgdId").as("detailRgdId"),
      col("xrefDataSrc").as("srcPipeline"),
      lit(runTs).as("creationDate"))

    // reverse weak assoc existence (J5 as a semi/anti join); the repair
    // applies to manual asymmetric rows too (the reference keeps going
    // after logging the manual case)
    val revAssoc = assocState.filter(col("assocType") === "weak_ortholog")
      .select(col("masterRgdId").as("destRgdId"), col("detailRgdId").as("srcRgdId"))
    val withRev = asym.join(revAssoc, Seq("srcRgdId", "destRgdId"), "left_semi")
    val withoutRev = asym.join(revAssoc, Seq("srcRgdId", "destRgdId"), "left_anti")

    // detach keys: (master=dest, detail=src) rows to remove from delete list
    val detachKeys = withRev.select(
      col("destRgdId").as("masterRgdId"), col("srcRgdId").as("detailRgdId"))

    val reverseInserts = withoutRev.select(
      lit(null).cast("long").as("assocKey"),
      lit("weak_ortholog").as("assocType"),
      col("xrefDataSet").as("assocSubType"),
      col("destRgdId").as("masterRgdId"),
      col("srcRgdId").as("detailRgdId"),
      col("xrefDataSrc").as("srcPipeline"),
      lit(runTs).as("creationDate"))

    RepairResult(orthologDeletes, forwardInserts.unionByName(reverseInserts), detachKeys)
  }

  /** D2: association symmetry repair. For each weak assoc of the species
    * pair with no reverse ortholog:
    *  - reverse assoc exists and BOTH directions queued for delete -> let
    *    them be deleted
    *  - reverse assoc exists, not both queued -> detach the reverse from
    *    the delete list
    *  - reverse assoc missing -> insert the mirror
    * Ref: OrthologRelationDao.java:301-350.
    *
    * Status visibility (round 16, pinned in WeakSyncPropertySpec): the
    * reverse-assoc existence check is areGenesAssociated ->
    * getAssociationsForMasterRgdId, whose published SQL inner-joins
    * rgd_ids on the DETAIL side with object_status='ACTIVE' (rgdcore
    * AssociationDAO). The reverse assoc's detail is this row's MASTER,
    * so a scoped assoc with an inactive master sees its existing
    * reverse as MISSING: the reference inserts a (duplicate) mirror
    * instead of detaching. The pair scope itself carries NO status
    * filter (getAssociationsByType joins rgd_ids for species only), so
    * inactive-master rows do reach this branch. */
  def repairAssocSymmetry(assocState: DataFrame, orthologState: DataFrame,
                          rgdIds: DataFrame, deletes: DataFrame, speciesTypeKey: Int,
                          runTs: java.sql.Timestamp): RepairResult = {
    // same (type, species-pair) scope as the syncer diff (S6)
    val pair = syncScope(assocState, rgdIds, speciesTypeKey)

    // no reverse ortholog
    val noRevOrtho = pair.join(
      orthologState.select(col("srcRgdId").as("detailRgdId"),
        col("destRgdId").as("masterRgdId")),
      Seq("masterRgdId", "detailRgdId"), "left_anti")
      .persist() // shared by the withRev/withoutRev split below

    val revAssoc = assocState.filter(col("assocType") === "weak_ortholog")
      .select(col("masterRgdId").as("detailRgdId"),
        col("detailRgdId").as("masterRgdId"))
    // the reverse is VISIBLE only when this row's master (the reverse's
    // detail) is ACTIVE - see scaladoc. A registry without objectStatus
    // (engine-internal species-only dimension) treats every id ACTIVE.
    val revVisible =
      if (rgdIds.columns.contains("objectStatus"))
        revAssoc.distinct().join(
          broadcast(rgdIds.filter(col("objectStatus") === "ACTIVE")
            .select(col("rgdId").as("masterRgdId"))),
          Seq("masterRgdId"), "left_semi")
      else revAssoc.distinct()
    val withRev = noRevOrtho.join(revVisible, Seq("masterRgdId", "detailRgdId"),
      "left_semi")
      .persist() // shared by fwdQueued/revQueued/detachKeys
    val withoutRev = noRevOrtho.join(revVisible, Seq("masterRgdId", "detailRgdId"),
      "left_anti")

    val delKeys = deletes.select(col("masterRgdId").as("dM"), col("detailRgdId").as("dD"))
      .distinct()
    // both directions on the delete list? (forward (m,d) and reverse (d,m))
    val fwdQueued = withRev.join(delKeys,
      col("masterRgdId") === col("dM") && col("detailRgdId") === col("dD"), "left_semi")
    val revQueued = withRev.join(delKeys,
      col("masterRgdId") === col("dD") && col("detailRgdId") === col("dM"), "left_semi")
    val bothQueued = fwdQueued.select(col("masterRgdId"), col("detailRgdId"))
      .intersect(revQueued.select(col("masterRgdId"), col("detailRgdId")))

    val detachKeys = withRev
      .join(bothQueued, Seq("masterRgdId", "detailRgdId"), "left_anti")
      .select(col("detailRgdId").as("masterRgdId"), col("masterRgdId").as("detailRgdId"))

    val inserts = withoutRev.select(
      lit(null).cast("long").as("assocKey"),
      col("assocType"),
      col("assocSubType"),
      col("detailRgdId").as("masterRgdId"),
      col("masterRgdId").as("detailRgdId"),
      col("srcPipeline"),
      lit(runTs).as("creationDate"))

    RepairResult(emptyKeys(assocState), inserts, detachKeys)
  }

  private def broadcastableSpecies(rgdIds: DataFrame): DataFrame =
    rgdIds.select(col("rgdId"), col("speciesTypeKey").as("spKey"))

  private def emptyKeys(any: DataFrame): DataFrame = {
    val spark = any.sparkSession
    import spark.implicits._
    Seq.empty[Long].toDF("key")
  }

  /** U6/D3: detach - remove repaired pairs from the delete list so a
    * symmetric repair doesn't delete-then-reinsert
    * (OrthologRelationDao.java:398-409, OrthologRelationLoader.java:182-191). */
  def detach(deletes: DataFrame, detachKeys: DataFrame): DataFrame =
    deletes.join(detachKeys.distinct(), Seq("masterRgdId", "detailRgdId"), "left_anti")
}
