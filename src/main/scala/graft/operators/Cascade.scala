package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** W4 + W2: the 4-tier strong-ortholog cascade with conflict invalidation
  * and the best-fit tie-break chain.
  *
  * Reference semantics (OrthologRelationLoader.java:454-578):
  * per (group, srcSpecies, destSpecies) partition -
  *   tier 4: manual orthologs (XREF_DATA_SRC='RGD') - >1 candidate in the
  *           tier is a CONFLICT and yields NO pick (:468-471)
  *   tier 3: Alliance mutual-best rows from AGR_ORTHOLOGS - same conflict
  *           rule (:479-482)
  *   tier 2: incoming HCOP (HGNC) relations, best-fit pick (:490-493)
  *   tier 1: incoming NCBI relations, best-fit pick (:497-500)
  *
  * Best-fit tie-break chain (pickBestFitRelation, :537-578):
  *   (0) singleton wins
  *   (1) strictly-max evidence count wins
  *   (2) else first relation whose dest symbol equals the src symbol
  *       (case-insensitive)
  *   (3) else minimum case-insensitive dest symbol
  * Note rule (3) ranks over ALL candidates regardless of evidence count -
  * a plain argmax window over (evidence, symbol) would be WRONG; the
  * selection is therefore branch-specific on window aggregates.
  *
  * Everything is window functions over one hash partitioning of the
  * candidate set - a single shuffle, no per-row lookups, skew-bounded by
  * the fan-out of a single gene.
  */
object Cascade {

  private val pk = Seq(col("groupId"), col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"))

  /** Build the full candidate set: incoming relations tagged tier 2/1 plus
    * manual (tier 4) and Alliance (tier 3) candidates joined from state.
    *
    * @param relations  post-complement relations with groupId
    *                   (Grouping.withComplementaryRelations output)
    * @param orthologs  current ortholog state (manual rows feed tier 4;
    *                   ref OrthologRelationDao.java:58-71)
    * @param agr        AGR_ORTHOLOGS state (tier 3; mutual-best only;
    *                   ref OrthologRelationDao.java:898-946)
    * @param genes      gene dimension (symbols for tie-breaks, species for
    *                   the Alliance partner-species filter)
    */
  def candidates(relations: DataFrame, orthologs: DataFrame, agr: DataFrame,
                 genes: DataFrame): DataFrame = {

    val incoming = relations.select(
      col("groupId"), col("srcRgdId"), col("destRgdId"),
      col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
      col("dataSource").as("xrefDataSrc"), col("dataSetName").as("xrefDataSet"),
      when(col("dataSource") === "HGNC", 2).otherwise(1).as("tier"))

    // distinct (group, src gene, species pair) keys the state lookups hang off
    val keys = relations.select(
      col("groupId"), col("srcRgdId"),
      col("srcSpeciesTypeKey"), col("destSpeciesTypeKey")).distinct()

    // tier 4: manual orthologs for (srcRgdId, destSpecies) - F9 filter
    val manual = keys.join(
      orthologs.filter(col("xrefDataSrc") === "RGD")
        .select(col("srcRgdId"), col("destRgdId"),
          col("destSpeciesTypeKey"), col("xrefDataSrc"), col("xrefDataSet")),
      Seq("srcRgdId", "destSpeciesTypeKey"))
      .select(col("groupId"), col("srcRgdId"), col("destRgdId"),
        col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
        col("xrefDataSrc"), col("xrefDataSet"), lit(4).as("tier"))

    // tier 3: Alliance mutual-best (F10), both storage directions (J3/U4):
    // symmetrize agr once, then a single equi-join + partner-species filter
    val mutualBest = agr.filter(col("isBestScore") === "Y" && col("isBestRevScore") === "Y")
    val agrSym = mutualBest.select(col("geneRgdId1").as("aSrc"),
        col("geneRgdId2").as("aDest"), col("methodsMatched"))
      .unionByName(mutualBest.select(col("geneRgdId2").as("aSrc"),
        col("geneRgdId1").as("aDest"), col("methodsMatched")))

    val alliance = keys
      .join(agrSym, keys("srcRgdId") === agrSym("aSrc"))
      .join(genes.select(col("rgdId"), col("speciesTypeKey").as("partnerSp")),
        agrSym("aDest") === col("rgdId"))
      .filter(col("partnerSp") === keys("destSpeciesTypeKey"))
      .select(col("groupId"), col("srcRgdId"), col("aDest").as("destRgdId"),
        col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
        lit("Alliance").as("xrefDataSrc"), col("methodsMatched").as("xrefDataSet"),
        lit(3).as("tier"))

    incoming.unionByName(manual).unionByName(alliance)
  }

  /** Run the cascade over the candidate set; returns one pick per
    * (group, species-pair) partition - or none on tier conflict - plus
    * `tier` and `method` columns for the A6 source/method statistics
    * (bestFitFromManual/Alliance/HCOP/NCBI x
    * bestFitOneRel/LongestEvidence/SymbolMatch/ShortestSymbol,
    * OrthologRelationLoader.java:425-435).
    *
    * Physical shape: ONE hash aggregation (collect_list per partition)
    * followed by pure array expressions over the collected candidates -
    * a single shuffle with map-side combine and no sorts. Safe because
    * the per-partition fan-out is bounded by one gene's ortholog
    * candidates (tens, not millions); an earlier window-based variant
    * cost four sorts over the same partitioning.
    */
  def pickStrongOrthologs(cands: DataFrame, genes: DataFrame): DataFrame = {

    // symbols for tie-breaks; genes is the small dimension side -> broadcast
    val symbols = broadcast(genes.select(col("rgdId"), col("geneSymbol")))
    val withSyms = cands
      .join(symbols.select(col("rgdId").as("srcRgdId"),
        col("geneSymbol").as("srcSymbol")), Seq("srcRgdId"), "left")
      .join(symbols.select(col("rgdId").as("destRgdId"),
        col("geneSymbol").as("destSymbol")), Seq("destRgdId"), "left")
      .withColumn("ev", Exprs.evidenceCount(col("xrefDataSet")))
      .withColumn("symMatch",
        when(Exprs.symbolMatches(col("srcSymbol"), col("destSymbol")), 1).otherwise(0))
      // null symbols must sort LAST in ascending tie-breaks (the
      // reference's null-safe compare); sentinel above any real lowercase
      .withColumn("symLower", coalesce(lower(col("destSymbol")), lit("￿")))

    val collected = withSyms
      .groupBy(pk: _*)
      .agg(collect_list(struct(
        col("srcRgdId"), col("destRgdId"), col("xrefDataSrc"),
        col("xrefDataSet"), col("tier"), col("ev"), col("symMatch"),
        col("symLower"))).as("cs"))

    val topTier = array_max(transform(col("cs"), c => c("tier")))
    val top = filter(col("cs"), c => c("tier") === topTier)
    val nTop = size(top)
    val maxEv = array_max(transform(top, c => c("ev")))
    val atMax = filter(top, c => c("ev") === maxEv)
    val matches = filter(top, c => c("symMatch") === 1)

    // comparator-sorted variants (arrays are tiny; sort is in-memory per row)
    def cmpLex(keys: (Column, Column) => Seq[(Column, Column)]) =
      (l: Column, r: Column) => {
        val ks = keys(l, r)
        ks.foldRight(lit(0)) { case ((a, b), tail) =>
          when(a < b, -1).when(a > b, 1).otherwise(tail)
        }
      }
    // rule-2 order: symbol-match desc, evidence desc, symbol asc, dest asc
    val symSorted = array_sort(matches, cmpLex((l, r) => Seq(
      (r("ev"), l("ev")), (l("symLower"), r("symLower")),
      (l("destRgdId"), r("destRgdId")))))
    // rule-3 order: min case-insensitive symbol over ALL top candidates
    val alphaSorted = array_sort(top, cmpLex((l, r) => Seq(
      (l("symLower"), r("symLower")), (l("destRgdId"), r("destRgdId")))))

    val isBestFitTier = topTier <= 2
    val pick =
      when(!isBestFitTier,
        when(nTop === 1, element_at(top, 1))) // conflict -> null (no pick)
        .otherwise(
          when(nTop === 1, element_at(top, 1))
            .when(size(atMax) === 1, element_at(atMax, 1))
            .when(size(matches) >= 1, element_at(symSorted, 1))
            .otherwise(element_at(alphaSorted, 1)))
    val method =
      when(!isBestFitTier, when(nTop === 1, "tierPick").otherwise("conflict"))
        .when(nTop === 1, "oneRel")
        .when(size(atMax) === 1, "longestEvidence")
        .when(size(matches) >= 1, "symbolMatch")
        .otherwise("shortestSymbol")

    collected
      .withColumn("pick", pick)
      .withColumn("method", method)
      .filter(col("pick").isNotNull)
      .select(
        col("groupId"),
        col("pick.srcRgdId").as("srcRgdId"),
        col("pick.destRgdId").as("destRgdId"),
        col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
        col("pick.xrefDataSrc").as("xrefDataSrc"),
        col("pick.xrefDataSet").as("xrefDataSet"),
        col("pick.tier").as("tier"), col("method"))
  }

  /** Convenience: candidates + pick in one call. */
  def run(relations: DataFrame, orthologs: DataFrame, agr: DataFrame,
          genes: DataFrame): DataFrame =
    pickStrongOrthologs(candidates(relations, orthologs, agr, genes), genes)
}
