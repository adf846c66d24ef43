package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HomoloGene group flow - the downstream of the S4 fixed-column scan
  * (graft.sources.Readers.readHomologene).
  *
  * The reference's deprecated loader walks each homologene group, resolves
  * every member gene id to an RGD gene, and synthesizes one ortholog per
  * ordered cross-species member pair (HomologeneLoader.java:96-207).
  * Set-wise: resolve = one equi-join against the id crosswalk; the
  * per-group pair synthesis = a self-equi-join on the group id with a
  * species-inequality filter. Groups have bounded fan-out (tens of genes),
  * so the within-group join is shuffle-bounded by the group key and never
  * quadratic in the table size.
  */
object Homologene {

  /** @param groups     (homologene_group_id, tax_id, gene_id) rows (S4 scan)
    * @param resolution gene_id -> (rgdId, speciesTypeKey) crosswalk
    * @return one row per ordered cross-species pair within a group
    */
  def synthesizePairs(groups: DataFrame, resolution: DataFrame): DataFrame = {
    val resolved = groups.join(resolution, Seq("gene_id"))
      .select(col("homologene_group_id").as("grp"), col("rgdId"),
        col("speciesTypeKey"))
      .distinct()
    val l = resolved.select(col("grp"), col("rgdId").as("srcRgdId"),
      col("speciesTypeKey").as("srcSp"))
    val r = resolved.select(col("grp"), col("rgdId").as("destRgdId"),
      col("speciesTypeKey").as("destSp"))
    l.join(r, Seq("grp"))
      .filter(col("srcSp") =!= col("destSp"))
      .select(col("grp").as("homologeneGroupId"),
        col("srcRgdId"), col("destRgdId"),
        col("srcSp").as("srcSpeciesTypeKey"),
        col("destSp").as("destSpeciesTypeKey"))
  }
}
