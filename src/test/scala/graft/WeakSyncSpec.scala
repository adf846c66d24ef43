package graft

import org.apache.spark.sql.DataFrame
import graft.operators.WeakSync

/** A7 diff + D1/D2 symmetry repair + U6 detach
  * (rgdcore RgdObjectSyncer.qc; OrthologRelationDao.java:230-350,398-409). */
class WeakSyncSpec extends SparkSpec {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def assocDf(rows: (Long, String, Int, Int, String)*): DataFrame =
    rows.map { case (k, sub, m, d, pipe) =>
      (k, "weak_ortholog", sub, m, d, pipe, ts0)
    }.toDF("assocKey", "assocType", "assocSubType", "masterRgdId",
      "detailRgdId", "srcPipeline", "creationDate")

  private def incomingDf(rows: (Int, Int, String, String)*): DataFrame =
    rows.map { case (m, d, sub, pipe) =>
      (0L, "weak_ortholog", sub, m, d, pipe, ts)
    }.toDF("assocKey", "assocType", "assocSubType", "masterRgdId",
      "detailRgdId", "srcPipeline", "creationDate")

  test("A7: full-outer diff classifies match/update/insert/delete") {
    val state = assocDf(
      (1L, "A", 1, 2, "NCBI"),   // same key+subtype -> match
      (2L, "A", 1, 3, "NCBI"),   // same key, diff subtype -> update
      (3L, "A", 1, 4, "NCBI"))   // state only -> delete
    val incoming = incomingDf(
      (1, 2, "A", "NCBI"),
      (1, 3, "B", "NCBI"),
      (1, 5, "C", "NCBI"))       // incoming only -> insert
    val r = WeakSync.syncDiff(incoming, state)
    assert(r.matched.select("assocKey").as[Long].collect().toSeq == Seq(1L))
    val upd = r.updates.select("assocKey", "assocSubType")
      .as[(Long, String)].collect()
    assert(upd.toSeq == Seq((2L, "B"))) // incoming subtype wins
    assert(r.inserts.select("detailRgdId").as[Int].collect().toSeq == Seq(5))
    assert(r.deletes.select("assocKey").as[Long].collect().toSeq == Seq(3L))
  }

  test("A7: duplicate incoming keys collapse before the diff") {
    val incoming = incomingDf((1, 2, "B", "NCBI"), (1, 2, "A", "NCBI"))
    val r = WeakSync.syncDiff(incoming, assocDf())
    val ins = r.inserts.select("assocSubType").as[String].collect()
    assert(ins.toSeq == Seq("A")) // deterministic smallest subtype
  }

  test("A7: null incoming subtype still matches/updates (presence gated on creationDate)") {
    val state = assocDf((1L, "A", 1, 2, "NCBI"), (2L, null, 1, 3, "NCBI"))
    val incoming = incomingDf(
      (1, 2, null, "NCBI"),   // key match, subtype A -> null: legit update
      (1, 3, null, "NCBI"))   // key match, null <=> null: match
    val r = WeakSync.syncDiff(incoming, state)
    assert(r.deletes.count() == 0 && r.inserts.count() == 0)
    assert(r.matched.select("assocKey").as[Long].collect().toSeq == Seq(2L))
    val upd = r.updates.select("assocKey", "assocSubType")
      .as[(Long, Option[String])].collect()
    assert(upd.toSeq == Seq((1L, None)))
  }

  private def orthologDf(rows: (Long, Int, Int, Int, Int, String)*): DataFrame =
    rows.map { case (k, s, d, ssp, dsp, src) =>
      (k, s, d, ssp, dsp, src, "ev", 11, 70, ts0, 70, ts0)
    }.toDF("key", "srcRgdId", "destRgdId", "srcSpeciesTypeKey",
      "destSpeciesTypeKey", "xrefDataSrc", "xrefDataSet", "orthologTypeKey",
      "createdBy", "createdDate", "lastModifiedBy", "lastModifiedDate")

  test("D1: asymmetric non-manual ortholog downgraded; manual kept; " +
    "reverse assoc present -> detach; absent -> mirror insert") {
    val orthos = orthologDf(
      (1L, 1, 2, 1, 3, "NCBI"),  // no reverse, no reverse assoc -> delete + fwd + mirror
      (2L, 3, 4, 1, 3, "RGD"),   // manual asymmetric -> kept (audit only)
      (3L, 5, 6, 1, 3, "NCBI"),  // reverse ortholog exists -> untouched
      (4L, 6, 5, 3, 1, "NCBI"),  // the reverse of key 3
      (5L, 7, 8, 1, 3, "NCBI"))  // no reverse ortholog, reverse ASSOC exists -> detach
    val assocs = assocDf((10L, "x", 8, 7, "NCBI")) // reverse assoc for key 5
    val r = WeakSync.repairOrthologSymmetry(orthos, assocs, 1, 3, ts)

    assert(r.orthologDeletes.as[Long].collect().toSet == Set(1L, 5L))
    val inserts = r.assocInserts.select("masterRgdId", "detailRgdId")
      .as[(Int, Int)].collect().toSet
    // forward assocs for deleted orthologs (1->2, 7->8) + mirrors where the
    // reverse assoc is missing (2->1, 4->3 for the manual row)
    assert(inserts == Set((1, 2), (7, 8), (2, 1), (4, 3)))
    val detach = r.detachKeys.select("masterRgdId", "detailRgdId")
      .as[(Int, Int)].collect().toSet
    assert(detach == Set((8, 7)))
  }

  test("D2: assoc symmetry branch table (both-queued / detach / mirror)") {
    // ref OrthologRelationDao.java:301-350: for each weak assoc of the
    // species pair with no reverse ortholog: both directions queued for
    // delete -> proceed; reverse assoc present otherwise -> detach it;
    // reverse assoc missing -> insert the mirror
    val assocs = assocDf(
      (10L, "A", 1, 2, "NCBI"), // reverse assoc exists, not queued -> detach
      (11L, "A", 2, 1, "NCBI"),
      (12L, "A", 3, 4, "NCBI"), // both directions queued -> let them delete
      (13L, "A", 4, 3, "NCBI"),
      (14L, "A", 5, 6, "NCBI"), // reverse assoc missing -> mirror insert
      (15L, "A", 7, 8, "NCBI"), // reverse ORTHOLOG exists -> out of scope
      (16L, "A", 1, 9, "NCBI")) // wrong species pair -> filtered out
    val orthos = orthologDf((1L, 8, 7, 3, 1, "NCBI"))
    val rgdIds = Seq((1, 1), (3, 1), (5, 1), (7, 1),
      (2, 3), (4, 3), (6, 3), (8, 3), (9, 6)).toDF("rgdId", "speciesTypeKey")
    val deletes = assocDf((12L, "A", 3, 4, "NCBI"), (13L, "A", 4, 3, "NCBI"))
    val r = WeakSync.repairAssocSymmetry(assocs, orthos, rgdIds, deletes, 3, ts)
    val ins = r.assocInserts.select("masterRgdId", "detailRgdId")
      .as[(Int, Int)].collect().toSet
    assert(ins == Set((6, 5)))
    val det = r.detachKeys.select("masterRgdId", "detailRgdId")
      .as[(Int, Int)].collect().toSet
    assert(det == Set((1, 2), (2, 1)))
  }

  test("U6: detach removes repaired pairs from the delete list") {
    val deletes = assocDf((1L, "A", 1, 2, "NCBI"), (2L, "A", 3, 4, "NCBI"))
    val keys = Seq((1, 2)).toDF("masterRgdId", "detailRgdId")
    val left = WeakSync.detach(deletes, keys)
    assert(left.select("assocKey").as[Long].collect().toSeq == Seq(2L))
  }

  test("dropStrongOrthologs removes candidate pairs that are orthologs (J4)") {
    val incoming = incomingDf((1, 2, "A", "NCBI"), (3, 4, "A", "NCBI"))
    val orthos = orthologDf((1L, 1, 2, 1, 3, "NCBI"))
    val kept = WeakSync.dropStrongOrthologs(incoming, orthos)
    assert(kept.select("masterRgdId").as[Int].collect().toSeq == Seq(3))
  }
}
