package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Agr

/** M5 resolution cascade, S9 upsert-merge, A8 threshold guard, X12
  * (AgrTsvLoader.java:273-393, OrthologRelationDao.java:825-877). */
class AgrSpec extends SparkSpec {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
  private val old = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def xrefs(rows: (Long, Int, Int, String)*): DataFrame =
    rows.map { case (k, rgd, xdb, acc) => (k, rgd, xdb, acc, "p", old) }
      .toDF("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline",
        "modificationDate")

  private def genes(rows: (Int, String, Int)*): DataFrame =
    rows.map { case (id, sym, sp) => (id, sym, sym, "protein-coding", sp, sym) }
      .toDF("rgdId", "geneSymbol", "geneName", "geneTypeLc",
        "speciesTypeKey", "ensemblGeneSymbol")

  private def rgdIds(rows: (Int, String)*): DataFrame =
    rows.map { case (id, st) => (id, st, 3) }
      .toDF("rgdId", "objectStatus", "speciesTypeKey")

  test("M5 cascade: map > special-id > symbol > insert, in that order") {
    val curies = Seq(
      ("AGR:1", "symA", 10),   // in curie map -> map
      ("RGD:77", "symB", 3),   // rat special id -> specialId
      ("MGI:5", "symC", 2),    // mouse MGD xref -> specialId
      ("HGNC:9", "symD", 1),   // human HGNC xref -> specialId
      ("FB:1", "symE", 10),    // by symbol -> symbol
      ("FB:2", "symZ", 10),    // nothing -> insert (non-HMR species)
      ("HGNC:99", "symQ", 1)   // nothing, human -> unresolvable (null how)
    ).toDF("curie", "geneSymbol", "speciesTypeKey")

    val x = xrefs(
      (1L, 100, 63, "AGR:1"),   // AGR_GENE map
      (2L, 101, 5, "MGI:5"),    // MGD
      (3L, 102, 21, "HGNC:9"))  // HGNC
    val g = genes((77, "ratgene", 3), (100, "symA", 10), (101, "symC", 2),
      (102, "symD", 1), (103, "symE", 10))
    val ri = rgdIds((77, "ACTIVE"), (100, "ACTIVE"), (101, "ACTIVE"),
      (102, "ACTIVE"), (103, "ACTIVE"))

    val r = Agr.resolveCuries(curies, x, g, ri)
      .select("curie", "rgdId", "how").as[(String, Option[Int], Option[String])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

    assert(r("AGR:1") == ((Some(100), Some("map"))))
    assert(r("RGD:77") == ((Some(77), Some("specialId"))))
    assert(r("MGI:5") == ((Some(101), Some("specialId"))))
    assert(r("HGNC:9") == ((Some(102), Some("specialId"))))
    assert(r("FB:1") == ((Some(103), Some("symbol"))))
    assert(r("FB:2") == ((None, Some("insert"))))
    assert(r("HGNC:99") == ((None, None))) // human can't be auto-inserted

    // id assignment for the insert rows
    val assigned = Agr.assignNewGenes(
      Agr.resolveCuries(curies, x, g, ri), maxExistingRgdId = 1000)
    val fb2 = assigned.filter($"curie" === "FB:2").select("rgdId")
      .as[Int].head()
    assert(fb2 == 1001)
  }

  test("M5 status semantics: map/MGD/HGNC lookups resolve only ACTIVE " +
    "genes; the symbol step resolves a single candidate regardless of " +
    "status but filters to active when multiple match") {
    // getActiveXdbIds / getActiveGenesByXdbId restrict steps 1-2 to
    // active objects (OrthologRelationDao.java:513-521,527);
    // getGeneBySymbol (:595-619) removes inactive candidates ONLY when
    // more than one gene matched - a single withdrawn gene still
    // resolves
    val g = genes((100, "ms", 10), (101, "mm", 2), (102, "soloSym", 10),
      (103, "multiSym", 10), (104, "multiSym", 10))
    val ri = rgdIds((100, "WITHDRAWN"), (101, "WITHDRAWN"),
      (102, "WITHDRAWN"), (103, "WITHDRAWN"), (104, "ACTIVE"))
    val x = xrefs((1L, 100, 63, "AGR:W"), (2L, 101, 5, "MGI:W"))
    val curies = Seq(
      ("AGR:W", "nosuch", 10),  // map hit withdrawn -> falls to insert
      ("MGI:W", "nosuch2", 2),  // MGD hit withdrawn; mouse can't insert
      ("FB:S", "soloSym", 10),  // single symbol candidate, withdrawn ->
                                // still resolves (the reference's
                                // size>1-only inactive filter)
      ("FB:M", "multiSym", 10)  // two candidates -> inactive removed
    ).toDF("curie", "geneSymbol", "speciesTypeKey")
    val r = Agr.resolveCuries(curies, x, g, ri)
      .select("curie", "rgdId", "how").as[(String, Option[Int], Option[String])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r("AGR:W") == ((None, Some("insert"))), s"map: ${r("AGR:W")}")
    assert(r("MGI:W") == ((None, None)), s"mgd: ${r("MGI:W")}")
    assert(r("FB:S") == ((Some(102), Some("symbol"))), s"solo: ${r("FB:S")}")
    assert(r("FB:M") == ((Some(104), Some("symbol"))), s"multi: ${r("FB:M")}")
  }

  test("M5 symbol branch: a degenerate hot symbol causes NO fanout " +
    "(pre-aggregation collapses the gene group before the join)") {
    // one symbol carries 50% of the gene dimension; 50% of curies name
    // it - the worst-case shape behind the exp-1.54 watch item. The
    // per-(symbol, species) min pre-aggregation must keep the resolve
    // output at EXACTLY one row per curie regardless.
    val nGenes = 2000
    val g = genes((1 to nGenes).map(i =>
      (i, if (i % 2 == 0) "HOTSYM" else s"SYM$i", 1)): _*)
    val ri = rgdIds((1 to nGenes).map(i => (i, "ACTIVE")): _*)
    val x = xrefs() // empty: everything falls through to the symbol step
    val curies = (1 to 500).map(i =>
      (s"AGR:$i", if (i % 2 == 0) "HOTSYM" else s"SYM${i % nGenes}", 1))
      .toDF("curie", "geneSymbol", "speciesTypeKey")

    val r = Agr.resolveCuries(curies, x, g, ri).persist()
    try {
      assert(r.count() == 500) // == distinct curies: no fanout
      val hot = r.filter($"geneSymbol" === "HOTSYM")
        .select("rgdId").distinct().as[Int].collect().toSeq
      assert(hot == Seq(2)) // one pick: min rgd id of the hot group
    } finally r.unpersist()
  }

  test("S9 upsert-merge: insert new keys, update existing, keep stale rows") {
    val state = Seq(
      (1, 2, "stringent", "Y", "Y", "OMA", old, old),
      (3, 4, "stringent", "N", "N", "OMA", old, old)
    ).toDF("geneRgdId1", "geneRgdId2", "confidence", "isBestScore",
      "isBestRevScore", "methodsMatched", "createdDate", "lastUpdateDate")
    val incoming = Seq(
      (1, 2, "stringent", "Y", "N", "OMA"),  // key exists -> update flags + ts
      (5, 6, "stringent", "Y", "Y", "OMA")   // new -> insert
    ).toDF("geneRgdId1", "geneRgdId2", "confidence", "isBestScore",
      "isBestRevScore", "methodsMatched")

    val out = Agr.upsertAgrOrthologs(incoming, state, ts)
    val m = out.select("geneRgdId1", "isBestRevScore", "lastUpdateDate")
      .as[(Int, String, java.sql.Timestamp)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(1) == (("N", ts)))   // updated
    assert(m(3) == (("N", old)))  // untouched -> stale candidate
    assert(m(5) == (("Y", ts)))   // inserted
  }

  test("A8: threshold guard refuses large deletes, allows small ones") {
    val state = (1 to 100).map(i =>
      (i, i + 1000, "s", "Y", "Y", "OMA", old,
        if (i <= 30) old else ts))
      .toDF("geneRgdId1", "geneRgdId2", "confidence", "isBestScore",
        "isBestRevScore", "methodsMatched", "createdDate", "lastUpdateDate")
    val cutoff = java.sql.Timestamp.valueOf("2026-06-01 00:00:00")

    // 30 stale of 100; threshold 10% -> refuse
    val (kept, ok) = Agr.deleteStaleWithGuard(state, cutoff, 100, "10%")
    assert(!ok && kept.count() == 100)

    // threshold 50% -> proceed
    val (kept2, ok2) = Agr.deleteStaleWithGuard(state, cutoff, 100, "50%")
    assert(ok2 && kept2.count() == 70)
  }

  test("X12: percent and absolute thresholds parse") {
    assert(Agr.parseThreshold("10%", 250) == 25)
    assert(Agr.parseThreshold("17", 250) == 17)
  }
}
