package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Reports

/** Brute-force semantic pin for the reporting family (J8/J9/J10 +
  * O1): row-at-a-time models of the reference's exact SQL and loops
  * recompute each report over seeded random relation multisets,
  * statuses, species, and AGR rows.
  *
  *  - J8 cross-linked (OrthologRelationDao.java:672-689): per side,
  *    COUNT(*) counts JOIN ROWS (duplicate relations each count), the
  *    threshold is >2, BOTH endpoint rgd ids must be ACTIVE, the outer
  *    species is checked on the reported side and the partner side
  *    must be human/mouse/rat (1,2,3 - which can include the reported
  *    species itself), the two sides union DISTINCT, genes join
  *    INNER, ordered by LOWER(symbol).
  *  - J9 OrthoTool partner report (OrthoTool.java:126-166): partners
  *    of the query gene filtered to a species via rgd_ids (NO status
  *    check), and when ANY partner is a mutual-best hit
  *    (is_best_score='Y' AND is_best_rev_score='Y') the non-mutual
  *    partners are dropped; otherwise all partners stay.
  *  - J10 genes-without-orthologs: the published rgdcore SQL has NO
  *    gene-type exclusion and NO status/species condition on the
  *    relation side - ACTIVE genes of the species with no SRC-side
  *    relation row at all; the allele/splice exclusion the wrapper
  *    javadoc mentions applies only to the LOG lines
  *    (OrthologRelationLoadingManager.java:189-228), pinned via
  *    [[Reports.reportedGeneType]].
  *
  * Teeth (verified-to-fail): the pre-round-16 J10 excluded
  * allele/splice rows from the RETURNED list - this spec fails on the
  * first seed containing an ortholog-less allele gene.
  */
class ReportsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: J8 cross-linked equals the reference SQL - join-row " +
    "counting, both-active, species sets, union distinct, symbol order") {
    val caseGen = for {
      nG <- Gen.choose(4, 10)
      gs <- Gen.listOfN(nG, for {
        sym <- Gen.oneOf("Aa", "aA", "bb", "Cc", "dd")
        st <- Gen.frequency(3 -> Gen.const("ACTIVE"), 1 -> Gen.const("WITHDRAWN"))
        sp <- Gen.oneOf(1, 2, 3, 3, 10)
      } yield (sym, st, sp))
      nR <- Gen.choose(0, 30)
      rels <- Gen.listOfN(nR, for {
        s <- Gen.choose(1, nG); d <- Gen.choose(1, nG)
      } yield (s, d)) // duplicates allowed - they each count
    } yield (gs.zipWithIndex.map { case ((sym, st, sp), i) => (i + 1, sym, st, sp) },
      rels)

    var sawDupCounted = 0; var sawBothSides = 0; var sawInactiveDrop = 0
    var sawSelfSpecies = 0; var sawHit = 0

    var seed = Seed(168802L)
    for (_ <- 1 to 20) {
      val (gs, rels) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val spKey = 3
      val status = gs.map(g => g._1 -> g._3).toMap
      val spOf = gs.map(g => g._1 -> g._4).toMap
      val sym = gs.map(g => g._1 -> g._2).toMap

      def act(id: Int) = status.get(id).contains("ACTIVE")
      def side(pick: ((Int, Int)) => Int, other: ((Int, Int)) => Int): Set[Int] = {
        val rows = rels.filter(r => act(pick(r)) && spOf(pick(r)) == spKey &&
          act(other(r)) && Set(1, 2, 3).contains(spOf(other(r))))
        val grouped = rows.groupBy(pick)
        grouped.filter(_._2.size > 2).keySet.toSet
      }
      val destSide = side(_._2, _._1)
      val srcSide = side(_._1, _._2)
      if (destSide.nonEmpty && srcSide.nonEmpty) sawBothSides += 1
      val ids = destSide ++ srcSide
      sawHit += ids.size
      rels.groupBy(identity).foreach { case (r, copies) =>
        if (copies.size > 1 && (ids.contains(r._1) || ids.contains(r._2)))
          sawDupCounted += 1
      }
      if (rels.exists(r => !act(r._1) && spOf(r._1) == spKey)) sawInactiveDrop += 1
      if (ids.exists(id => rels.exists(r => r._2 == id &&
        spOf(r._1) == spKey))) sawSelfSpecies += 1
      val expected = ids.toList.map(id => (id, sym(id)))
        .sortBy { case (id, s) => (s.toLowerCase, id) }

      val orth = rels.toDF("srcRgdId", "destRgdId")
      val genesDf = gs.map(g => (g._1, g._2)).toDF("rgdId", "geneSymbol")
      val rgdDf = gs.map(g => (g._1, g._3, g._4))
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val got = Reports.crossLinkedOrthologs(orth, genesDf, rgdDf, spKey)
        .as[(Int, String)].collect().toList
      assert(got.sortBy { case (id, s) => (s.toLowerCase, id) } == expected,
        s"gs=$gs rels=$rels got=$got exp=$expected")
      // engine order: nondecreasing in lower(symbol)
      val lowers = got.map(_._2.toLowerCase)
      assert(lowers == lowers.sorted, s"order: $got")
    }
    assert(sawDupCounted > 0, "never counted a duplicate relation row")
    assert(sawBothSides > 0, "never saw both union sides contribute")
    assert(sawInactiveDrop > 0, "never saw an inactive endpoint")
    assert(sawHit > 2, "report nearly always empty")
  }

  test("property: J9 partner report equals the OrthoTool model - " +
    "mutual-best suppression per query gene, species via rgd_ids") {
    val caseGen = for {
      nA <- Gen.choose(1, 14)
      as <- Gen.listOfN(nA, for {
        g1 <- Gen.choose(1, 4); g2 <- Gen.choose(10, 16)
        b <- Gen.oneOf("Y", "N"); br <- Gen.oneOf("Y", "N")
      } yield (g1, g2, b, br))
      gs <- Gen.listOfN(7, for {
        sym <- Gen.oneOf("s1", "s2", "s3"); sp <- Gen.oneOf(1, 2, 2, 3)
      } yield (sym, sp))
    } yield (as.groupBy(a => (a._1, a._2)).values.map(_.head).toList,
      gs.zipWithIndex.map { case ((sym, sp), i) => (i + 10, sym, sp) })

    var sawSuppressed = 0; var sawAllKept = 0; var sawSpeciesDrop = 0

    var seed = Seed(168803L)
    for (_ <- 1 to 20) {
      val (as, gs) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val pSp = 2
      val sym = gs.map(g => g._1 -> g._2).toMap
      val spOf = gs.map(g => g._1 -> g._3).toMap

      val partners = as.filter(a => sym.contains(a._2) &&
        spOf.get(a._2).contains(pSp))
      if (as.exists(a => sym.contains(a._2) && !spOf.get(a._2).contains(pSp)))
        sawSpeciesDrop += 1
      val expected = partners.groupBy(_._1).toList.flatMap { case (_, ps) =>
        val best = ps.filter(p => p._3 == "Y" && p._4 == "Y")
        if (best.nonEmpty) { if (best.size < ps.size) sawSuppressed += 1; best }
        else { sawAllKept += 1; ps }
      }.map(p => (p._1, p._2, sym(p._2))).toSet

      val agrDf = as.toDF("geneRgdId1", "geneRgdId2", "isBestScore", "isBestRevScore")
      val genesDf = gs.map(g => (g._1, g._2)).toDF("rgdId", "geneSymbol")
      val rgdDf = gs.map(g => (g._1, "ACTIVE", g._3))
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val got = Reports.agrPartnerReport(agrDf, genesDf, rgdDf, pSp)
        .select($"geneRgdId1", $"geneRgdId2", $"partnerSymbol")
        .as[(Int, Int, String)].collect().toSet
      assert(got == expected, s"as=$as gs=$gs got=$got exp=$expected")
    }
    assert(sawSuppressed > 0, "never suppressed a non-mutual partner")
    assert(sawAllKept > 0, "never kept a best-less partner set")
    assert(sawSpeciesDrop > 0, "never dropped an off-species partner")
  }

  test("property: J10 genes-without-orthologs equals the published SQL " +
    "- no type exclusion in the list, src-side-only anti join, " +
    "allele/splice dropped from report lines only") {
    val caseGen = for {
      gs <- Gen.listOfN(10, for {
        sym <- Gen.oneOf("Aa", "bb", "Cc")
        tp <- Gen.frequency(3 -> Gen.const("protein-coding"),
          1 -> Gen.const("allele"), 1 -> Gen.const("splice"))
        st <- Gen.frequency(3 -> Gen.const("ACTIVE"), 1 -> Gen.const("RETIRED"))
        sp <- Gen.oneOf(3, 3, 1)
      } yield (sym, tp, st, sp))
      nR <- Gen.choose(0, 10)
      rels <- Gen.listOfN(nR, for {
        s <- Gen.choose(1, 10); d <- Gen.choose(1, 10)
      } yield (s, d))
    } yield (gs.zipWithIndex.map { case ((sym, tp, st, sp), i) =>
      (i + 1, sym, tp, st, sp) }, rels)

    var sawAlleleInList = 0; var sawAlleleLineDrop = 0; var sawDestOnlyKept = 0

    var seed = Seed(168804L)
    for (_ <- 1 to 20) {
      val (gs, rels) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val spKey = 3
      val srcIds = rels.map(_._1).toSet
      val expected = gs.filter(g => g._4 == "ACTIVE" && g._5 == spKey &&
        !srcIds.contains(g._1)).map(g => (g._1, g._2, g._3)).toSet
      expected.foreach { case (id, _, tp) =>
        if (tp == "allele" || tp == "splice") sawAlleleInList += 1
        if (rels.exists(_._2 == id)) sawDestOnlyKept += 1
      }

      val orth = rels.toDF("srcRgdId", "destRgdId")
      val genesDf = gs.map(g => (g._1, g._2, g._3)).toDF("rgdId", "geneSymbol", "geneTypeLc")
      val rgdDf = gs.map(g => (g._1, g._4, g._5))
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val got = Reports.genesWithoutOrthologs(orth, genesDf, rgdDf, spKey)
        .select($"rgdId", $"geneSymbol", $"geneTypeLc")
        .as[(Int, String, String)].collect()
      assert(got.toSet == expected, s"gs=$gs rels=$rels got=${got.toSet}")
      // the report-line filter drops allele/splice GROUPS
      val reported = Reports.genesWithoutOrthologs(orth, genesDf, rgdDf, spKey)
        .filter(Reports.reportedGeneType($"geneTypeLc"))
        .select($"rgdId").as[Int].collect().toSet
      val expReported = expected.filter(g => g._3 != "allele" && g._3 != "splice")
        .map(_._1)
      if (reported.size < expected.size) sawAlleleLineDrop += 1
      assert(reported == expReported)
    }
    assert(sawAlleleInList > 0, "never saw an allele/splice in the list")
    assert(sawAlleleLineDrop > 0, "never saw the report-line drop")
    assert(sawDestOnlyKept > 0,
      "never saw a dest-side-only gene stay in the list")
  }

  test("property: the X11 count diff under rgdIds equals the published " +
    "getOrthologCount SQL - both endpoints ACTIVE, per directed pair") {
    val caseGen = for {
      gs <- Gen.listOfN(8, for {
        st <- Gen.frequency(3 -> Gen.const("ACTIVE"), 1 -> Gen.const("RETIRED"))
        sp <- Gen.oneOf(1, 2, 3)
      } yield (st, sp))
      nO <- Gen.choose(0, 12); nN <- Gen.choose(0, 12)
      os <- Gen.listOfN(nO, Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8)))
      ns <- Gen.listOfN(nN, Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8)))
    } yield (gs.zipWithIndex.map { case ((st, sp), i) => (i + 1, st, sp) }, os, ns)

    var sawInactiveExcluded = 0
    var seed = Seed(168805L)
    for (_ <- 1 to 12) {
      val (gs, os, ns) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val act = gs.filter(_._2 == "ACTIVE").map(_._1).toSet
      val spOf = gs.map(g => g._1 -> g._3).toMap
      def model(rels: List[(Int, Int)]): Map[(Int, Int), Long] =
        rels.filter(r => act(r._1) && act(r._2))
          .groupBy(r => (spOf(r._1), spOf(r._2)))
          .view.mapValues(_.size.toLong).toMap
      val mo = model(os); val mn = model(ns)
      if (os.exists(r => !act(r._1) || !act(r._2))) sawInactiveExcluded += 1
      val keys = mo.keySet ++ mn.keySet
      val expected = keys.map { k =>
        val o = mo.getOrElse(k, 0L); val n = mn.getOrElse(k, 0L)
        (k._1, k._2, o, n, f"${n - o}%+d")
      }

      def df(rels: List[(Int, Int)]) = rels
        .map { case (s, d) => (s, d, spOf(s), spOf(d)) }
        .toDF("srcRgdId", "destRgdId", "srcSpeciesTypeKey", "destSpeciesTypeKey")
      val rgdDf = gs.map(g => (g._1, g._2, g._3))
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val got = Reports.orthologCountDiff(df(os), df(ns), Some(rgdDf))
        .select($"srcSpeciesTypeKey", $"destSpeciesTypeKey",
          $"oldCount", $"newCount", $"diff")
        .as[(Int, Int, Long, Long, String)].collect().toSet
      assert(got == expected, s"gs=$gs os=$os ns=$ns")
    }
    assert(sawInactiveExcluded > 0, "never excluded an inactive endpoint")
  }
}
