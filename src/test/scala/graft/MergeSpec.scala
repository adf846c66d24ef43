package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** M1/M2/W1/W3/F11 reconcile semantics
  * (OrthologRelationLoader.java:591-672, OrthologRelationDao.java:73-188,
  * 798-819). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")

  private def stateDf(rows: (Long, Int, Int, String, String)*): DataFrame =
    rows.map { case (k, s, d, src, ev) =>
      (k, s, d, 1, 3, src, ev, 11, 70, ts0, 70, ts0)
    }.toDF("key", "srcRgdId", "destRgdId", "srcSpeciesTypeKey",
      "destSpeciesTypeKey", "xrefDataSrc", "xrefDataSet", "orthologTypeKey",
      "createdBy", "createdDate", "lastModifiedBy", "lastModifiedDate")

  private def incomingDf(rows: (Int, Int, String, String)*): DataFrame =
    rows.map { case (s, d, src, ev) => (s, d, 1, 3, src, ev) }
      .toDF("srcRgdId", "destRgdId", "srcSpeciesTypeKey",
        "destSpeciesTypeKey", "xrefDataSrc", "xrefDataSet")

  private def genes(rows: (Int, String)*): DataFrame =
    rows.map { case (id, sym) => (id, sym, sym, "protein-coding", 3, sym) }
      .toDF("rgdId", "geneSymbol", "geneName", "geneTypeLc",
        "speciesTypeKey", "ensemblGeneSymbol")

  private val g = genes((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))

  test("M1 match: same dest -> touch lastModified by pipeline user") {
    val st = stateDf((1L, 1, 2, "NCBI", "A"))
    val m = Merge.reconcile(incomingDf((1, 2, "NCBI", "A")), st, g, runTs, 3)
    assert(m.touched.count() == 1)
    assert(m.inserted.count() == 0 && m.deleted.count() == 0)
    val row = m.newState.select("key", "lastModifiedDate")
      .as[(Long, java.sql.Timestamp)].head()
    assert(row == ((1L, runTs)))
  }

  test("M1 insert: no state row for (src, destSp)") {
    val m = Merge.reconcile(incomingDf((1, 2, "NCBI", "A")),
      stateDf(), g, runTs, 3)
    assert(m.inserted.count() == 1)
    assert(m.newState.count() == 1)
  }

  test("M1 replace: weaker existing row deleted, incoming inserted (W3)") {
    // existing NCBI loses to incoming HGNC on source priority
    val st = stateDf((1L, 1, 2, "NCBI", "A"))
    val m = Merge.reconcile(incomingDf((1, 3, "HGNC", "A")), st, g, runTs, 3)
    assert(m.deleted.select("key").as[Long].collect().toSeq == Seq(1L))
    assert(m.inserted.select("destRgdId").as[Int].collect().toSeq == Seq(3))
    assert(m.newState.select("destRgdId").as[Int].collect().toSeq == Seq(3))
  }

  test("M1 downgrade: stronger existing row survives, incoming -> weak") {
    val st = stateDf((1L, 1, 2, "RGD", "curated"))
    val m = Merge.reconcile(incomingDf((1, 3, "NCBI", "A")), st, g, runTs, 3)
    assert(m.downgraded.select("destRgdId").as[Int].collect().toSeq == Seq(3))
    // manual row kept and NOT stale-deleted (F11) even though untouched
    assert(m.newState.select("destRgdId").as[Int].collect().toSeq == Seq(2))
  }

  test("M1 duplicate state rows: W3-best kept, rest deleted (Dao:122-133)") {
    val st = stateDf((1L, 1, 2, "NCBI", "A"), (2L, 1, 3, "HGNC", "A"))
    val m = Merge.reconcile(incomingDf((1, 3, "HGNC", "A")), st, g, runTs, 3)
    // HGNC row (key 2) outranks NCBI (key 1): 1 deleted as duplicate,
    // incoming matches key 2 -> touched
    assert(m.deleted.select("key").as[Long].collect().toSet == Set(1L))
    assert(m.touched.select("key").as[Long].collect().toSeq == Seq(2L))
  }

  test("M2 stale sweep: untouched non-manual rows deleted unless sole row") {
    val st = stateDf(
      (1L, 1, 2, "NCBI", "A"),  // matched -> touched -> survives
      (2L, 4, 5, "NCBI", "A"))  // untouched, sole row for (4,3) -> survives
    val m = Merge.reconcile(incomingDf((1, 2, "NCBI", "A")), st, g, runTs, 3)
    assert(m.newState.select("key").as[Long].collect().toSet == Set(1L, 2L))

    // two untouched rows for the same (src,destSp): both stale -> both
    // deletable (pair count > 1); W3 dedupe keeps the best as `existing`,
    // the duplicate goes in the dup-delete set, the remaining one is sole
    // -> survives
    val st2 = stateDf((1L, 4, 2, "NCBI", "A"), (2L, 4, 3, "NCBI", "A, B"))
    val m2 = Merge.reconcile(incomingDf(), st2, g, runTs, 3)
    assert(m2.newState.count() == 1)
  }

  test("W3 null dest symbol is weakest in the classify join (desc_nulls_last)") {
    // existing dest gene 9 is absent from the genes dim -> null symbol ->
    // weakest -> replace (a raw `<` on null would have mis-fallen to
    // downgrade)
    val st = stateDf((1L, 1, 9, "NCBI", "A"))
    val m = Merge.reconcile(incomingDf((1, 2, "NCBI", "A")), st, g, runTs, 3)
    assert(m.deleted.select("key").as[Long].collect().toSeq == Seq(1L))
    assert(m.inserted.select("destRgdId").as[Int].collect().toSeq == Seq(2))
    // symmetric case: incoming's dest symbol null -> existing wins -> downgrade
    val st2 = stateDf((2L, 1, 2, "NCBI", "A"))
    val m2 = Merge.reconcile(incomingDf((1, 9, "NCBI", "A")), st2, g, runTs, 3)
    assert(m2.downgraded.select("destRgdId").as[Int].collect().toSeq == Seq(9))
    assert(m2.newState.select("destRgdId").as[Int].collect().toSeq == Seq(2))
  }

  test("W1: priority dedupe deletes pipeline-owned outranked duplicates") {
    val st = stateDf(
      (1L, 1, 2, "NCBI", "A"),
      (2L, 1, 2, "Alliance", "OMA"),
      (3L, 1, 2, "RGD", "curated"))
    val (kept, deleted) = Merge.deleteDuplicateNonManualOrthologs(st, 70)
    // RGD rank 1 kept; Alliance + NCBI outranked; both created_by=70
    assert(deleted.select("key").as[Long].collect().toSet == Set(1L, 2L))
    assert(kept.select("key").as[Long].collect().toSet == Set(3L))

    // rows owned by someone else are never deleted
    val stCurator = st.withColumn("createdBy", lit(1))
    val (kept2, deleted2) = Merge.deleteDuplicateNonManualOrthologs(stCurator, 70)
    assert(deleted2.count() == 0 && kept2.count() == 3)
  }
}
