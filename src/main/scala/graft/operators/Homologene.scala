package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HomoloGene group flow - the downstream of the S4 fixed-column scan
  * (graft.sources.Readers.readHomologene).
  *
  * The reference's deprecated loader walks each homologene group,
  * resolves every member gene id to an RGD gene, and synthesizes one
  * ortholog per ordered pair of distinct member ENTRIES
  * (HomologeneLoader.java:97-150 qcGroups + :278-307 buildIncomingList).
  * Reference semantics pinned here (HomologenePropertySpec):
  *
  *  - an entry resolves through getActiveGenesByXdbId (ACTIVE genes by
  *    EntrezGene id); entries matching ZERO or MULTIPLE genes are
  *    DROPPED from the group (qcGroups:124-134) - a multi-match never
  *    fans out;
  *  - the pair's species keys come from the ENTRY's taxon
  *    (buildIncomingList uses entry.getSpeciesTypeKey() - the taxon
  *    mapping - not the resolved gene's species);
  *  - pairs are formed over ALL ordered pairs of distinct entries in
  *    the group - there is NO cross-species filter (two rat members of
  *    one group produce a rat-rat pair) and NO dedupe (two entries
  *    resolving to the same gene produce a self-pair, and duplicate
  *    member lines each count as their own entry);
  *  - the type key is assigned at insert time: human-involved pairs
  *    direct, others transitive (insertOrthologs,
  *    OrthologRelationDao.java:460-468).
  *
  * Set-wise: resolve = equi-join + a per-gene-id count==1 filter; the
  * per-group pair synthesis = a self-equi-join on the group id with a
  * distinct-entry predicate over a per-group row_number (any total
  * order yields the same ordered-pair multiset). Groups have bounded
  * fan-out (tens of genes), so the within-group join is
  * shuffle-bounded by the group key and never quadratic in table size.
  */
object Homologene {

  /** @param groups     (homologene_group_id, tax_id, gene_id) entry rows
    *                    (S4 scan output; duplicates are distinct entries)
    * @param resolution gene_id -> (rgdId) crosswalk of ACTIVE genes
    *                    (getActiveGenesByXdbId shape; multi-row gene ids
    *                    are dropped here, matching qcGroups)
    * @return one row per ordered pair of distinct resolved entries
    */
  def synthesizePairs(groups: DataFrame, resolution: DataFrame): DataFrame = {
    // exactly-one-active-gene rule: count per gene id, keep == 1
    val uniq = resolution
      .groupBy(col("gene_id"))
      .agg(count(lit(1)).as("n"), max(col("rgdId")).as("rgdId"))
      .filter(col("n") === 1)
      .select(col("gene_id"), col("rgdId"))

    // entry species from the TAXON (HomologeneLoader.java:232-244);
    // unsupported taxa were dropped at parse (SpeciesType.ALL)
    val entries = groups
      .join(uniq, Seq("gene_id"))
      .select(col("homologene_group_id").as("grp"), col("rgdId"),
        entrySpecies(col("tax_id")).as("sp"))

    // a per-group index makes "distinct entries" expressible as an
    // inequality; the ordered-pair multiset is invariant to the order
    // row_number picks among duplicate rows
    val w = Window.partitionBy(col("grp")).orderBy(col("rgdId"), col("sp"))
    val indexed = entries.withColumn("i", row_number().over(w))

    val l = indexed.select(col("grp"), col("i").as("il"),
      col("rgdId").as("srcRgdId"), col("sp").as("srcSp"))
    val r = indexed.select(col("grp"), col("i").as("ir"),
      col("rgdId").as("destRgdId"), col("sp").as("destSp"))
    l.join(r, Seq("grp"))
      .filter(col("il") =!= col("ir"))
      .select(col("grp").as("homologeneGroupId"),
        col("srcRgdId"), col("destRgdId"),
        col("srcSp").as("srcSpeciesTypeKey"),
        col("destSp").as("destSpeciesTypeKey"))
  }

  /** Taxon -> species key (HomologeneLoader.java:232-244). Unsupported
    * taxa map to null (the parse-time badSpecies drop). */
  def entrySpecies(taxId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(taxId === 9606, graft.model.Species.HUMAN)
      .when(taxId === 10090, graft.model.Species.MOUSE)
      .when(taxId === 10116, graft.model.Species.RAT)

  /** The group sync (qcGroups:146-165 + loadGroups): match incoming
    * pairs against the in-RGD HOMOLOGENE rows of the same group on
    * (srcRgdId, destRgdId) - multiset-aware, each in-RGD row matches at
    * most one incoming row - then classify.
    *
    * @param incoming [[synthesizePairs]] output
    * @param inRgd    prior HOMOLOGENE-sourced ortholog state rows with a
    *                 surrogate `key`, `homologeneGroupId`, `srcRgdId`,
    *                 `destRgdId`, `xrefDataSrc` (getOrthologsForGroupId
    *                 filters to the HOMOLOGENE source,
    *                 OrthologRelationDao.java:428-441)
    * @return (inserts, matchedInRgd, deletes): matched rows get the
    *         last-modified touch; deletes exclude xrefDataSrc=="RGD"
    *         rows (deleteOrthologs' manual guard,
    *         OrthologRelationDao.java:482-492). When duplicate
    *         (src,dest) in-RGD rows exceed the incoming multiplicity,
    *         the LOWEST surrogate keys match first (the reference
    *         matches in DB list order, which is unspecified; key order
    *         is the deterministic stand-in).
    */
  def syncGroups(incoming: DataFrame, inRgd: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val hom = inRgd.filter(col("xrefDataSrc") === "HOMOLOGENE")
    val pairKey = Seq("homologeneGroupId", "srcRgdId", "destRgdId")

    val incCounts = incoming.groupBy(pairKey.map(col): _*)
      .agg(count(lit(1)).as("nInc"))
    val w = Window.partitionBy(pairKey.map(col): _*).orderBy(col("key"))
    val ranked = hom.withColumn("rk", row_number().over(w))
      .join(incCounts, pairKey, "left")
      .withColumn("nInc", coalesce(col("nInc"), lit(0L)))

    val matched = ranked.filter(col("rk") <= col("nInc"))
      .drop("rk", "nInc")
    val unmatchedInRgd = ranked.filter(col("rk") > col("nInc"))
      .drop("rk", "nInc")
    // F11-style manual guard on the delete leg
    val deletes = unmatchedInRgd.filter(col("xrefDataSrc") =!= "RGD")

    val rgdCounts = hom.groupBy(pairKey.map(col): _*)
      .agg(count(lit(1)).as("nRgd"))
    val wi = Window.partitionBy(pairKey.map(col): _*)
      .orderBy(col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"))
    val inserts = incoming.withColumn("rk", row_number().over(wi))
      .join(rgdCounts, pairKey, "left")
      .withColumn("nRgd", coalesce(col("nRgd"), lit(0L)))
      .filter(col("rk") > col("nRgd"))
      .drop("rk", "nRgd")
      .withColumn("orthologTypeKey",
        graft.functions.Exprs.orthologTypeKey(
          col("srcSpeciesTypeKey"), col("destSpeciesTypeKey")))
    (inserts, matched, deletes)
  }
}
