package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Resolve

/** Brute-force semantic pin for the bulk EntrezGene->RGD resolution
  * (J1/J2/F5/A6 + the F7 consumer contract): a plain-Scala,
  * row-at-a-time model of getRgdIdByEgId2
  * (OrthologRelationLoader.java:301-372) recomputes the outcome and
  * resolved id for every relation over seeded random xref multimaps,
  * gene types, object statuses, and replacement history - including the
  * corners the golden ResolveSpec rows can't cover combinatorially: two
  * withdrawn genes replaced by the SAME active gene (counted twice ->
  * multiple), a replacement that is itself inactive (doesn't count),
  * allele/splice-only candidate sets (unmatched, per the code - the
  * reference's comment contradicts its own SQL there), and the
  * src-shadows-dest audit rule. */
class ResolvePropertySpec extends SparkSpec {
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  test("property: resolution equals a row-at-a-time model of " +
    "getRgdIdByEgId2 - candidate exclusion, status counting, replacement " +
    "rules, and the src-shadows-dest audit") {
    val egGen = Gen.choose(1, 8).map(i => s"EG$i")
    val geneTypeGen = Gen.frequency(4 -> Gen.const("protein-coding"),
      1 -> Gen.const("allele"), 1 -> Gen.const("splice"))
    val statusGen = Gen.frequency(3 -> Gen.const("ACTIVE"),
      2 -> Gen.const("WITHDRAWN"), 1 -> Gen.const("RETIRED"))

    val caseGen = for {
      nG <- Gen.choose(4, 10)
      gTypes <- Gen.listOfN(nG, geneTypeGen)
      gStatus <- Gen.listOfN(nG, statusGen)
      nX <- Gen.choose(0, 14)
      xs <- Gen.listOfN(nX, for {
        eg <- egGen; rgd <- Gen.choose(1, nG)
        xdb <- Gen.frequency(4 -> Gen.const(3), 1 -> Gen.const(63))
      } yield (eg, rgd, xdb))
      nH <- Gen.choose(0, 6)
      hs <- Gen.listOfN(nH, for {
        o <- Gen.choose(1, nG); n <- Gen.choose(1, nG)
      } yield (o, n))
      nR <- Gen.choose(0, 10)
      rels <- Gen.listOfN(nR, for {
        s <- egGen; d <- egGen
      } yield (s, d))
    } yield (gTypes.zipWithIndex.map { case (t, i) => (i + 1) -> t }.toMap,
      gStatus.zipWithIndex.map { case (st, i) => (i + 1) -> st }.toMap,
      xs.distinct, hs.distinct, rels.distinct)

    var sawMultipleActive = 0; var sawWithdrawn = 0; var sawReplacedMatch = 0
    var sawMultiReplaced = 0; var sawSharedReplacement = 0
    var sawUnmatchedNoCand = 0; var sawExcludedOnly = 0
    var sawDestShadowed = 0; var sawDestFail = 0

    def runCase(gType: Map[Int, String], gStatus: Map[Int, String],
                xs: List[(String, Int, Int)], hs: List[(Int, Int)],
                rels: List[(String, String)]): Unit = {
      // ---- the model ----
      def isActive(id: Int) = gStatus.get(id).contains("ACTIVE")
      val replacement: Map[Int, Int] = hs.filter(h => isActive(h._2))
        .groupBy(_._1).map { case (o, ns) => o -> ns.map(_._2).max }

      def classify(eg: String): (String, Option[Int]) = {
        val cands = xs.filter(x => x._1 == eg && x._3 == 3).map(_._2)
          .distinct.filter(id =>
            !Set("allele", "splice").contains(gType(id)))
        if (cands.isEmpty) {
          if (xs.exists(x => x._1 == eg && x._3 == 3)) sawExcludedOnly += 1
          else sawUnmatchedNoCand += 1
          return ("unmatched", None)
        }
        val act = cands.filter(isActive)
        if (act.size > 1) { sawMultipleActive += 1; ("multiple", None) }
        else if (act.size == 1) ("matched", Some(act.head))
        else {
          val nonActive = cands.filterNot(isActive)
          val replaced = nonActive.flatMap(replacement.get)
          if (replaced.size > 1) {
            sawMultiReplaced += 1
            if (replaced.distinct.size < replaced.size) sawSharedReplacement += 1
            ("multiple", None)
          } else if (replaced.size == 1) {
            sawReplacedMatch += 1; ("matched", Some(replaced.head))
          } else { sawWithdrawn += 1; ("withdrawn", None) }
        }
      }

      val expAudit = rels.map { case (s, d) =>
        val (so, sid) = classify(s)
        val (dout, did) = classify(d)
        val outcome = if (so != "matched") so
          else if (dout != "matched") dout else "matched"
        val failedSide = if (so != "matched") Some("src")
          else if (dout != "matched") Some("dest") else None
        if (so != "matched" && dout != "matched") sawDestShadowed += 1
        if (so == "matched" && dout != "matched") sawDestFail += 1
        (s, d, outcome, failedSide,
          if (outcome == "matched") sid else None,
          if (outcome == "matched") did else None)
      }
      val expResolved = expAudit.filter(_._3 == "matched")
        .map(t => (t._1, t._2, t._5.get, t._6.get)).toSet

      // ---- the engine ----
      val genesDf = gType.toSeq.map { case (id, t) =>
          (id, s"sym$id", s"sym$id", t, 1, s"sym$id") }
        .toDF("rgdId", "geneSymbol", "geneName", "geneTypeLc",
          "speciesTypeKey", "ensemblGeneSymbol")
      val rgdIdsDf = gStatus.toSeq.map { case (id, st) => (id, st, 1) }
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val xrefsDf = xs.zipWithIndex.map { case ((eg, rgd, xdb), i) =>
          (100L + i, rgd, xdb, eg, "p", ts0) }
        .toDF("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline",
          "modificationDate")
      val histDf = hs.toDF("oldRgdId", "newRgdId")
      val relsDf = rels.map { case (s, d) => (s, d, 1, 3, "NCBI", "Ortholog") }
        .toDF("srcOtherId", "destOtherId", "srcSpeciesTypeKey",
          "destSpeciesTypeKey", "dataSource", "dataSetName")

      val (resolved, audit) = Resolve.resolveRelations(relsDf, xrefsDf,
        genesDf, rgdIdsDf, histDf)

      val label = s"gType=$gType gStatus=$gStatus xs=$xs hs=$hs rels=$rels"
      val gotAudit = audit
        .select("srcOtherId", "destOtherId", "outcome", "failedSide")
        .as[(String, String, String, Option[String])].collect().toSet
      assert(gotAudit ==
        expAudit.map(t => (t._1, t._2, t._3, t._4)).toSet, s"audit: $label")
      val gotResolved = resolved
        .select("srcOtherId", "destOtherId", "srcRgdId", "destRgdId")
        .as[(String, String, Int, Int)].collect().toSet
      assert(gotResolved == expResolved, s"resolved: $label")
    }

    var seed = Seed(61553L)
    for (_ <- 1 to 16) {
      val (gType, gStatus, xs, hs, rels) =
        caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      runCase(gType, gStatus, xs, hs, rels)
    }
    // DIRECTED case pinning the corners the random pool visits rarely:
    // EG1 -> two ACTIVE coding genes (multiple); EG2 -> two withdrawn
    // genes replaced by the SAME active gene (counted twice ->
    // multiple); EG3 -> allele-only candidates (unmatched per the SQL,
    // against the reference's stale comment); EG4 -> one withdrawn
    // gene with an active replacement (matched); EG5 -> unreplaced
    // withdrawn; EG6 -> no candidates at all
    runCase(
      gType = Map(1 -> "protein-coding", 2 -> "protein-coding",
        3 -> "protein-coding", 4 -> "protein-coding", 5 -> "allele",
        6 -> "protein-coding", 7 -> "protein-coding"),
      gStatus = Map(1 -> "ACTIVE", 2 -> "ACTIVE", 3 -> "WITHDRAWN",
        4 -> "WITHDRAWN", 5 -> "ACTIVE", 6 -> "ACTIVE", 7 -> "WITHDRAWN"),
      xs = List(("EG1", 1, 3), ("EG1", 2, 3), ("EG2", 3, 3), ("EG2", 4, 3),
        ("EG3", 5, 3), ("EG4", 3, 3), ("EG5", 7, 3)),
      hs = List((3, 6), (4, 6)),
      rels = List(("EG1", "EG4"), ("EG4", "EG2"), ("EG3", "EG3"),
        ("EG1", "EG2"), ("EG5", "EG1"), ("EG6", "EG4"), ("EG4", "EG4")))

    assert(sawMultipleActive > 0, "never saw multiple active candidates")
    assert(sawWithdrawn > 0, "never saw an unreplaced withdrawn gene")
    assert(sawReplacedMatch > 0, "never matched through a replacement")
    assert(sawMultiReplaced > 0, "never saw multiple replacements")
    assert(sawSharedReplacement > 0,
      "never saw two withdrawn genes sharing ONE replacement (the " +
        "double-counted corner that still classifies multiple)")
    assert(sawUnmatchedNoCand > 0, "never saw a no-candidate id")
    assert(sawExcludedOnly > 0,
      "never saw an allele/splice-only candidate set")
    assert(sawDestShadowed > 0, "never saw src shadowing a failed dest")
    assert(sawDestFail > 0, "never saw a dest-side failure")
  }
}
