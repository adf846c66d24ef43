package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J8/J9/J10/A9/O1/U5: the reporting queries.
  *
  * These are plain SQL shapes in the reference (hand-written Oracle SQL
  * or row loops); each becomes a short declarative plan that Catalyst
  * pushes down and broadcasts as appropriate.
  */
object Reports {

  /** J8 + A9 + U5: cross-linked orthologs - genes of `speciesTypeKey`
    * participating in >2 ortholog rows against human/mouse/rat (checked
    * on both the dest and src side, unioned), returned with symbols and
    * ordered case-insensitively (O1).
    * Ref: OrthologRelationDao.java:672-689. */
  def crossLinkedOrthologs(orthologs: DataFrame, genes: DataFrame,
                           rgdIds: DataFrame, speciesTypeKey: Int): DataFrame = {
    val active = rgdIds.filter(col("objectStatus") === "ACTIVE")
      .select(col("rgdId"), col("speciesTypeKey"))

    def side(idCol: String, otherCol: String): DataFrame =
      orthologs
        .join(active.select(col("rgdId").as(idCol),
          col("speciesTypeKey").as("sp1")), Seq(idCol))
        .join(active.select(col("rgdId").as(otherCol),
          col("speciesTypeKey").as("sp2")), Seq(otherCol))
        .filter(col("sp1") === speciesTypeKey && col("sp2").isin(1, 2, 3))
        .groupBy(col(idCol).as("rgdId")).count()
        .filter(col("count") > 2)
        .select(col("rgdId"))

    side("destRgdId", "srcRgdId").union(side("srcRgdId", "destRgdId")).distinct()
      .join(genes.select(col("rgdId"), col("geneSymbol")), Seq("rgdId"))
      .orderBy(lower(col("geneSymbol")))
  }

  /** J10: ACTIVE genes of a species with no ortholog rows on the SRC
    * side, sorted case-insensitively by symbol.
    *
    * Reference-exact (ReportsPropertySpec): the rgdcore SQL
    * (OrthologDAO.getGenesWithoutOrthologs, from the published jar) has
    * NO gene-type exclusion and NO status/species condition on the
    * relation side - the wrapper javadoc's "splices and alleles are
    * excluded" (OrthologRelationDao.java:694-700) describes only the
    * LOG lines, where the per-type report drops the allele and splice
    * GROUPS after the full list (and its count) is built
    * (OrthologRelationLoadingManager.java:189-228). Use
    * [[reportedGeneType]] to reproduce the logged subset; the returned
    * frame is the full list the reference counts. */
  def genesWithoutOrthologs(orthologs: DataFrame, genes: DataFrame,
                            rgdIds: DataFrame, speciesTypeKey: Int): DataFrame =
    genes
      .join(rgdIds.filter(col("objectStatus") === "ACTIVE" &&
          col("speciesTypeKey") === speciesTypeKey).select(col("rgdId")),
        Seq("rgdId"), "left_semi")
      .join(orthologs.select(col("srcRgdId").as("rgdId")), Seq("rgdId"), "left_anti")
      .orderBy(lower(col("geneSymbol")))

  /** The log-line filter of dumpGenesWithoutOrthologs: allele/splice
    * type GROUPS are not reported (the count still includes them). */
  def reportedGeneType(geneTypeLc: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    !coalesce(geneTypeLc, lit("")).isin("allele", "splice")

  /** J9: the OrthoTool AGR report join - for each query gene, its AGR
    * partners of the given species with symbols; when any partner is a
    * mutual-best hit, non-mutual-best partners are dropped
    * (OrthoTool.java:126-166). */
  def agrPartnerReport(agr: DataFrame, genes: DataFrame, rgdIds: DataFrame,
                       partnerSpeciesTypeKey: Int): DataFrame = {
    val partners = agr
      .join(genes.select(col("rgdId").as("geneRgdId2"),
        col("geneSymbol").as("partnerSymbol")), Seq("geneRgdId2"))
      .join(rgdIds.select(col("rgdId").as("geneRgdId2"),
        col("speciesTypeKey").as("partnerSp")), Seq("geneRgdId2"))
      .filter(col("partnerSp") === partnerSpeciesTypeKey)
      .withColumn("isMutualBest",
        (col("isBestScore") === "Y" && col("isBestRevScore") === "Y").cast("int"))

    val w = Window.partitionBy(col("geneRgdId1"))
    partners
      .withColumn("anyBest", max(col("isMutualBest")).over(w))
      .filter(col("anyBest") === 0 || col("isMutualBest") === 1)
      .drop("anyBest")
  }

  /** A5-style per-species-pair ortholog counts with the X11 signed-diff
    * format against an old snapshot
    * (OrthologRelationLoadingManager.java:128-151).
    *
    * When `rgdIds` is given, rows count only when BOTH endpoint rgd ids
    * are ACTIVE - the published getOrthologCount SQL joins rgd_ids on
    * both sides with object_status='ACTIVE' (rgdcore OrthologDAO;
    * pinned in ReportsPropertySpec). Without it the raw state counts
    * (the engine-internal diff, where state rows have no status). */
  def orthologCountDiff(oldState: DataFrame, newState: DataFrame,
                        rgdIds: Option[DataFrame] = None): DataFrame = {
    def activeOnly(df: DataFrame): DataFrame = rgdIds match {
      case None => df
      case Some(ids) =>
        val act = ids.filter(col("objectStatus") === "ACTIVE")
          .select(col("rgdId"))
        df.join(act.select(col("rgdId").as("srcRgdId")),
            Seq("srcRgdId"), "left_semi")
          .join(act.select(col("rgdId").as("destRgdId")),
            Seq("destRgdId"), "left_semi")
    }
    def counts(df: DataFrame, name: String) =
      activeOnly(df).groupBy(col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"))
        .agg(count(lit(1)).as(name))
    counts(oldState, "oldCount")
      .join(counts(newState, "newCount"),
        Seq("srcSpeciesTypeKey", "destSpeciesTypeKey"), "full_outer")
      .withColumn("oldCount", coalesce(col("oldCount"), lit(0L)))
      .withColumn("newCount", coalesce(col("newCount"), lit(0L)))
      .withColumn("diff", format_string("%+d", col("newCount") - col("oldCount")))
  }

  /** D5: Alliance freshness gate - fail when AGR state is empty or its
    * newest row is older than maxAgeDays
    * (OrthologRelationLoadingManager.java:284-298). */
  def checkAllianceFreshness(agr: DataFrame, now: java.sql.Timestamp,
                             maxAgeDays: Int = 60): Unit = {
    // age computed in-plan: collecting the timestamp itself would be
    // JVM-representation-dependent (java8 datetime API returns
    // LocalDateTime, not java.sql.Timestamp)
    val row = agr.agg(max(col("lastUpdateDate")).as("m"))
      .select(col("m").isNull.as("empty"),
        datediff(lit(now), col("m")).as("ageDays")).first()
    require(!row.getBoolean(0), "AGR_ORTHOLOGS is empty -- run the AGR flow first")
    val ageDays = row.getInt(1)
    require(ageDays <= maxAgeDays,
      s"AGR_ORTHOLOGS is stale: newest row is $ageDays days old (threshold $maxAgeDays)")
  }
}
