package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** M7: the fixXRefDataSet maintenance flow - canonicalize evidence lists
  * in place, rewriting only rows where the deduped+sorted form is
  * different AND strictly shorter.
  *
  * The reference scans every row over JDBC and issues point UPDATEs
  * (OrthologRelationDao.java:707-767); here it's a single `withColumn`
  * pass over the state - one scan, zero shuffles, trivially parallel.
  */
object Maintenance {

  /** Rewrite orthologs.xrefDataSet (OrthologRelationDao.java:707-736).
    * Returns (newState, updatedRows). */
  def fixXrefDataSetInOrthologs(state: DataFrame): (DataFrame, DataFrame) = {
    val fixed = state.withColumn("newXrefDataSet",
      Exprs.canonicalXrefDataSet(col("xrefDataSet")))
    val updated = fixed.filter(!(col("newXrefDataSet") <=> col("xrefDataSet")))
    (fixed.withColumn("xrefDataSet", col("newXrefDataSet")).drop("newXrefDataSet"),
      updated.drop("newXrefDataSet"))
  }

  /** Rewrite associations.assocSubType for weak orthologs
    * (OrthologRelationDao.java:738-767). Returns (newState, updatedRows). */
  def fixXrefDataSetInAssociations(state: DataFrame): (DataFrame, DataFrame) = {
    val isWeak = col("assocType") === "weak_ortholog"
    val fixed = state.withColumn("newSubType",
      when(isWeak, Exprs.canonicalXrefDataSet(col("assocSubType")))
        .otherwise(col("assocSubType")))
    val updated = fixed.filter(!(col("newSubType") <=> col("assocSubType")))
    (fixed.withColumn("assocSubType", col("newSubType")).drop("newSubType"),
      updated.drop("newSubType"))
  }
}
