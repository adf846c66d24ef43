package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.ShardedPrefixSum
import graft.pipeline.AgrPipeline

/** Brute-force semantic pin for the whole --agrOrthologs flow
  * (M5/S9/A8/M6/X12 + the M5 write side effects): a plain-Scala,
  * row-at-a-time model of AgrTsvLoader.run2 recomputes every output of
  * [[AgrPipeline.run]] over seeded random lines / xrefs / genes /
  * statuses / prior state - resolution cascade with the reference's
  * exact status rules (active-only map and MGD/HGNC steps, the
  * getGeneBySymbol single-candidate-ignores-status rule), synthesized
  * gene ids, the full-key line bind, upsert classification, the
  * threshold circuit breaker, the curie QC touch+sweep, and the new
  * AGR_GENE xref bindings with their exact surrogate keys. AgrSpec /
  * AgrPipelineSpec pin hand-built goldens; this closes the collisions
  * between the steps (a curie hitting several lookup tables at once,
  * shared symbols across species, upsert-key ties, guard arithmetic at
  * the boundary).
  */
class AgrPropertySpec extends SparkSpec {
  import spark.implicits._

  private val runTs = java.sql.Timestamp.valueOf("2026-08-01 12:00:00")
  private val cutoff = java.sql.Timestamp.valueOf("2026-08-01 11:00:00")
  private val oldTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private case class GeneRow(id: Int, sym: String, sp: Int, active: Boolean)
  private case class XrefRow(key: Long, rgdId: Int, xdbKey: Int, accId: String,
                             pipe: String, mod: java.sql.Timestamp)
  private case class Line(c1: String, s1: String, sp1: Int,
                          c2: String, s2: String, sp2: Int,
                          algos: String, best: Boolean, bestRev: Boolean)
  private case class AgrRow(g1: Int, g2: Int, conf: String, best: String,
                            bestRev: String, methods: String,
                            created: java.sql.Timestamp,
                            updated: java.sql.Timestamp)

  test("property: the AGR flow equals a row-at-a-time model of the " +
    "reference - cascade status rules, synthesized ids, full-key bind, " +
    "upsert, guard, QC sweep, and the exact new-xref keys") {
    val symGen = Gen.oneOf("sa", "sb", "sc")
    val spGen = Gen.frequency(2 -> Gen.const(1), 2 -> Gen.const(2),
      2 -> Gen.const(3), 3 -> Gen.const(10))
    val curieGen = Gen.oneOf("AGR:1", "AGR:2", "MGI:1", "MGI:2", "HGNC:1",
      "RGD:5", "RGD:6", "RGD:99", "FB:1", "FB:2", "FB:bad")
    val methodsGen = Gen.oneOf("OMA", "OMA|PANTHER")

    val caseGen = for {
      nG <- Gen.choose(3, 10)
      gs <- Gen.listOfN(nG, for {
        sym <- symGen; sp <- spGen; act <- Gen.prob(0.7)
      } yield (sym, sp, act))
      nX <- Gen.choose(0, 8)
      xs <- Gen.listOfN(nX, for {
        rgd <- Gen.choose(1, nG)
        xdb <- Gen.oneOf(63, 5, 21, 3)
        acc <- curieGen
        pipe <- Gen.frequency(3 -> Gen.const("AgrOrtholog"),
          1 -> Gen.const("other"))
        old <- Gen.prob(0.5)
      } yield (rgd, xdb, acc, pipe, old))
      nL <- Gen.choose(0, 8)
      ls <- Gen.listOfN(nL, for {
        c1 <- curieGen; s1 <- symGen; sp1 <- spGen
        c2 <- curieGen; s2 <- symGen; sp2 <- spGen
        al <- methodsGen; b <- Gen.prob(0.5); br <- Gen.prob(0.5)
      } yield Line(c1, s1, sp1, c2, s2, sp2, al, b, br))
      nS <- Gen.choose(0, 6)
      st <- Gen.listOfN(nS, for {
        g1 <- Gen.choose(1, nG + 5); g2 <- Gen.choose(1, nG + 5)
        b <- Gen.oneOf("Y", "N"); br <- Gen.oneOf("Y", "N")
        m <- methodsGen; stale <- Gen.prob(0.5)
      } yield (g1, g2, b, br, m, stale))
      threshold <- Gen.oneOf("10%", "50%", "0", "500")
    } yield {
      val genes = gs.zipWithIndex.map { case ((sym, sp, act), i) =>
        GeneRow(i + 1, sym, sp, act) }
      val xrefs = xs.distinct.zipWithIndex.map { case ((r, x, a, p, old), i) =>
        XrefRow(100L + i, r, x, a, p, if (old) oldTs else runTs) }
      // distinct upsert keys: the table is unique on (g1, g2, methods)
      val state = st.groupBy(t => (t._1, t._2, t._5)).values.map(_.head)
        .toList.sortBy(t => (t._1, t._2, t._5))
        .map { case (g1, g2, b, br, m, stale) =>
          AgrRow(g1, g2, "stringent", b, br, m, oldTs,
            if (stale) oldTs else runTs) }
      (genes, xrefs, ls, state, threshold)
    }

    var sawMap = 0; var sawSpecial = 0; var sawSymbolSolo = 0
    var sawSymbolSoloInactive = 0; var sawSymbolMulti = 0; var sawInsert = 0
    var sawUnresolved = 0; var sawUpsertUpdate = 0; var sawUpsertInsert = 0
    var sawStaleSwept = 0; var sawGuardRefusal = 0; var sawXrefSwept = 0
    var sawNewXref = 0

    val unmatBefore = ShardedPrefixSum.unmaterializedReleases

    def runCase(genes: List[GeneRow], xrefs: List[XrefRow],
                lines: List[Line], state: List[AgrRow],
                threshold: String): Unit = {
      // ---- the model ----
      val geneById = genes.map(g => g.id -> g).toMap
      def active(id: Int) = geneById.get(id).exists(_.active)

      def lookupMin(xdb: Int, curie: String): Option[Int] = {
        val hits = xrefs.filter(x => x.xdbKey == xdb && x.accId == curie &&
          active(x.rgdId)).map(_.rgdId)
        if (hits.isEmpty) None else Some(hits.min)
      }
      def bySymbol(sym: String, sp: Int): Option[Int] = {
        val cands = genes.filter(g => g.sym == sym && g.sp == sp)
        if (cands.size == 1) Some(cands.head.id)
        else {
          val act = cands.filter(_.active).map(_.id)
          if (act.isEmpty) None else Some(act.min)
        }
      }
      // the cascade per distinct (curie, symbol, species)
      val curies = lines.flatMap(l =>
        List((l.c1, l.s1, l.sp1), (l.c2, l.s2, l.sp2))).distinct
      case class Res(curie: String, sym: String, sp: Int,
                     rgdId: Option[Int], how: Option[String])
      val resolved0 = curies.map { case (c, s, sp) =>
        val map = lookupMin(63, c)
        lazy val special = sp match {
          case 3 =>
            if (c.startsWith("RGD:"))
              c.drop(4).toIntOption.filter(geneById.contains)
            else None
          case 2 => lookupMin(5, c)
          case 1 => lookupMin(21, c)
          case _ => None
        }
        lazy val sym = bySymbol(s, sp)
        if (map.isDefined) Res(c, s, sp, map, Some("map"))
        else if (special.isDefined) Res(c, s, sp, special, Some("specialId"))
        else if (sym.isDefined) Res(c, s, sp, sym, Some("symbol"))
        else if (!Set(1, 2, 3).contains(sp)) Res(c, s, sp, None, Some("insert"))
        else Res(c, s, sp, None, None)
      }
      // synthesized ids: maxGeneId + rank over (curie, symbol, species)
      val maxGene = if (genes.isEmpty) 0 else genes.map(_.id).max
      val inserts = resolved0.filter(_.how.contains("insert"))
        .sortBy(r => (r.curie, r.sym, r.sp)).zipWithIndex
        .map { case (r, i) => r.copy(rgdId = Some(maxGene + i + 1)) }
      val resolved = resolved0.filterNot(_.how.contains("insert")) ++ inserts
      val resByKey = resolved.map(r => (r.curie, r.sym, r.sp) -> r).toMap

      resolved.foreach { r =>
        r.how match {
          case Some("map") => sawMap += 1
          case Some("specialId") => sawSpecial += 1
          case Some("symbol") =>
            val cands = genes.filter(g => g.sym == r.sym && g.sp == r.sp)
            if (cands.size == 1) {
              sawSymbolSolo += 1
              if (!cands.head.active) sawSymbolSoloInactive += 1
            } else sawSymbolMulti += 1
          case Some("insert") => sawInsert += 1
          case None => sawUnresolved += 1
          case _ => ()
        }
      }

      // full-key bind + upsert-key dedupe (conf, best, bestRev asc)
      val bound = lines.flatMap { l =>
        for {
          r1 <- resByKey((l.c1, l.s1, l.sp1)).rgdId
          r2 <- resByKey((l.c2, l.s2, l.sp2)).rgdId
        } yield (r1, r2, l.algos,
          if (l.best) "Y" else "N", if (l.bestRev) "Y" else "N")
      }
      val incBest = bound.groupBy(t => (t._1, t._2, t._3)).map {
        case (_, rows) => rows.minBy(r => ("stringent", r._4, r._5))
      }.toList

      // upsert: key-matched state updates flags + timestamp; new keys
      // insert; unmatched state rows ride through (stale candidates)
      val incByKey = incBest.map(t => (t._1, t._2, t._3) -> t).toMap
      val stateKeys = state.map(s => (s.g1, s.g2, s.methods)).toSet
      val upserted = state.map { s =>
        incByKey.get((s.g1, s.g2, s.methods)) match {
          case Some((_, _, _, b, br)) =>
            sawUpsertUpdate += 1
            s.copy(best = b, bestRev = br, updated = runTs)
          case None => s
        }
      } ++ incBest.filterNot(t => stateKeys((t._1, t._2, t._3)))
        .map { t =>
          sawUpsertInsert += 1
          AgrRow(t._1, t._2, "stringent", t._4, t._5, t._3, runTs, runTs)
        }

      // A8 guard (X12 threshold math on the post-upsert count)
      val total = upserted.size.toLong
      val stale = upserted.count(_.updated.before(cutoff)).toLong
      val maxDeletable =
        if (threshold.endsWith("%"))
          threshold.dropRight(1).toInt * total / 100
        else threshold.toLong
      val guardOk = math.abs((total - stale) - state.size) <= maxDeletable
      val expFinal =
        (if (guardOk) upserted.filterNot(_.updated.before(cutoff))
         else upserted).toSet
      if (!guardOk) sawGuardRefusal += 1
      if (guardOk && stale > 0) sawStaleSwept += 1

      // M6 QC + M5 write side effects
      val seen = resolved.filter(_.rgdId.isDefined).map(_.curie).toSet
      def isAgr(x: XrefRow) = x.xdbKey == 63 && x.pipe == "AgrOrtholog"
      val qcd = xrefs.map { x =>
        if (seen(x.accId) && isAgr(x)) x.copy(mod = runTs) else x
      }.filterNot(x => isAgr(x) && x.mod.before(cutoff))
      if (qcd.size < xrefs.size) sawXrefSwept += 1
      val maxXrefKey = if (xrefs.isEmpty) 0L else xrefs.map(_.key).max
      val newXrefRows = resolved
        .filter(r => Set("specialId", "symbol", "insert").exists(r.how.contains))
        .map(r => (r.rgdId.get, r.curie)).distinct
        .sortBy { case (id, acc) => (acc, id) }.zipWithIndex
        .map { case ((id, acc), i) =>
          XrefRow(maxXrefKey + i + 1L, id, 63, acc, "AgrOrtholog", runTs) }
      if (newXrefRows.nonEmpty) sawNewXref += 1
      val expXrefs = (qcd ++ newXrefRows).toSet
      val expNewGenes = inserts
        .map(r => (r.rgdId.get, r.sym, r.sp, "ACTIVE")).toSet
      val expUnresolved = resolved.filter(_.rgdId.isEmpty)
        .map(r => (r.curie, r.sym, r.sp)).toSet
      val expStats = resolved.groupBy(_.how.orNull).view
        .mapValues(_.size.toLong).toMap

      // ---- the engine ----
      val genesDf = genes.map(g => (g.id, g.sym, g.sym, "protein-coding",
          g.sp, g.sym))
        .toDF("rgdId", "geneSymbol", "geneName", "geneTypeLc",
          "speciesTypeKey", "ensemblGeneSymbol")
      val rgdIdsDf = genes.map(g =>
          (g.id, if (g.active) "ACTIVE" else "WITHDRAWN", g.sp))
        .toDF("rgdId", "objectStatus", "speciesTypeKey")
      val xrefsDf = xrefs.map(x => (x.key, x.rgdId, x.xdbKey, x.accId,
          x.pipe, x.mod))
        .toDF("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline",
          "modificationDate")
      val linesDf = lines.map(l => (l.c1, l.s1, l.sp1, l.c2, l.s2, l.sp2,
          l.algos, "2", "9", l.best, l.bestRev))
        .toDF("curie1", "geneSymbol1", "speciesTypeKey1", "curie2",
          "geneSymbol2", "speciesTypeKey2", "algorithms",
          "algorithmsMatch", "outOfAlgorithms", "isBestScore",
          "isBestRevScore")
      val stateDf = state.map(s => (s.g1, s.g2, s.conf, s.best, s.bestRev,
          s.methods, s.created, s.updated))
        .toDF("geneRgdId1", "geneRgdId2", "confidence", "isBestScore",
          "isBestRevScore", "methodsMatched", "createdDate",
          "lastUpdateDate")

      val r = AgrPipeline.run(linesDf, stateDf, xrefsDf, genesDf, rgdIdsDf,
        runTs, cutoff, deleteThreshold = threshold)

      val label = s"genes=$genes xrefs=$xrefs lines=$lines state=$state " +
        s"threshold=$threshold"
      assert(r.guardOk == guardOk, s"guard: $label")
      val gotFinal = r.agrOrthologs
        .select("geneRgdId1", "geneRgdId2", "confidence", "isBestScore",
          "isBestRevScore", "methodsMatched", "createdDate", "lastUpdateDate")
        .as[(Int, Int, String, String, String, String,
          java.sql.Timestamp, java.sql.Timestamp)]
        .collect()
        .map(t => AgrRow(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8))
        .toSet
      assert(gotFinal == expFinal, s"final state: $label")
      val gotXrefs = r.xrefs
        .select("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline",
          "modificationDate")
        .as[(Long, Int, Int, String, String, java.sql.Timestamp)]
        .collect()
        .map(t => XrefRow(t._1, t._2, t._3, t._4, t._5, t._6)).toSet
      assert(gotXrefs == expXrefs, s"xrefs: $label")
      assert(r.newGenes
        .select("rgdId", "geneSymbol", "speciesTypeKey", "objectStatus")
        .as[(Int, String, Int, String)].collect().toSet == expNewGenes,
        s"new genes: $label")
      assert(r.unresolved.select("curie", "geneSymbol", "speciesTypeKey")
        .as[(String, String, Int)].collect().toSet == expUnresolved,
        s"unresolved: $label")
      assert(r.resolutionStats.as[(Option[String], Long)].collect()
        .map { case (k, v) => k.orNull -> v }.toMap == expStats,
        s"stats: $label")

      ShardedPrefixSum.releaseAll()
    }

    var seed = Seed(90217L)
    for (_ <- 1 to 10) {
      val (genes, xrefs, lines, state, threshold) =
        caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      runCase(genes, xrefs, lines, state, threshold)
    }
    // DIRECTED case for the rarest corner: a symbol with exactly ONE
    // candidate gene that is INACTIVE must still resolve (the
    // getGeneBySymbol size>1-only status filter) - the random pool's
    // small symbol alphabet almost always yields multi-candidate groups
    runCase(
      genes = List(GeneRow(1, "solo", 10, active = false)),
      // an old pipeline-owned AGR_GENE binding for a curie NOT seen
      // this run: the M6 sweep must drop it (also pinned here - the
      // seeded random xrefs happened never to produce a sweepable row)
      xrefs = List(XrefRow(100L, 1, 63, "AGR:unseen", "AgrOrtholog", oldTs)),
      lines = List(Line("FB:solo", "solo", 10, "FB:solo", "solo", 10,
        "OMA", best = true, bestRev = true)),
      // the bound (1, 1, OMA) pair key-matches this state row: the
      // upsert-update branch is pinned here too (random state/incoming
      // key collisions are vanishingly rare in the generator's domain)
      state = List(AgrRow(1, 1, "stringent", "N", "N", "OMA", oldTs, oldTs)),
      threshold = "500")

    assert(ShardedPrefixSum.unmaterializedReleases == unmatBefore,
      "a key pin was swept before its product materialized")

    assert(sawMap > 0, "never resolved via the curie map")
    assert(sawSpecial > 0, "never resolved via a special id")
    assert(sawSymbolSolo > 0, "never resolved a single-candidate symbol")
    assert(sawSymbolSoloInactive > 0,
      "never resolved a single INACTIVE symbol candidate (the " +
        "getGeneBySymbol status rule)")
    assert(sawSymbolMulti > 0, "never resolved a multi-candidate symbol")
    assert(sawInsert > 0, "never synthesized a gene")
    assert(sawUnresolved > 0, "never left a curie unresolved")
    assert(sawUpsertUpdate > 0, "never updated an existing upsert key")
    assert(sawUpsertInsert > 0, "never inserted a new upsert key")
    assert(sawStaleSwept > 0, "never swept a stale ortholog")
    assert(sawGuardRefusal > 0, "never tripped the circuit breaker")
    assert(sawXrefSwept > 0, "never swept a stale AGR_GENE xref")
    assert(sawNewXref > 0, "never persisted a new curie binding")
  }
}
