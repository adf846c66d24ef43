package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Homologene

/** Brute-force semantic pin for the HomoloGene group flow (S4
  * downstream): a plain-Scala, row-at-a-time model of
  * HomologeneLoader.qcGroups + buildIncomingList + loadGroups
  * (HomologeneLoader.java:97-207,278-307) recomputes the synthesized
  * pair multiset and the sync classification over seeded random
  * groups, resolutions, and prior state - including the corners a
  * golden can't cover combinatorially:
  *
  *  - entries resolving to ZERO or MULTIPLE active genes DROP (a
  *    multi-match never fans out into pairs);
  *  - pair species come from the entry's TAXON, not the gene;
  *  - pairs include SAME-SPECIES members (two rat entries in one group
  *    pair up - there is no cross-species filter) and self-pairs (two
  *    entries resolving to the same gene), each ordered direction
  *    emitted;
  *  - duplicate member lines are distinct entries and multiply pairs;
  *  - the sync matches incoming to in-RGD HOMOLOGENE rows of the SAME
  *    group multiset-wise on (src,dest); surplus in-RGD rows delete,
  *    surplus incoming rows insert with the human-direct/transitive
  *    type rule; non-HOMOLOGENE state rows never participate.
  *
  * Where the reference is order-dependent (WHICH of several equal-key
  * in-RGD duplicates is matched vs deleted follows unspecified DB list
  * order; WHICH species-variant of a duplicated incoming pair inserts
  * follows file line order), the engine picks deterministically
  * (lowest surrogate key matches first; lowest (srcSp,destSp) ranks
  * first) and the model mirrors that documented stand-in.
  *
  * Teeth (verified-to-fail): the pre-round-16 operator deduped entries
  * and filtered same-species pairs - both make this spec fail on its
  * first seed.
  */
class HomologenePropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Entry(grp: Int, tax: Int, geneId: String)
  private case class StateRow(key: Long, grp: Int, src: Int, dest: Int,
                              srcSp: Int, destSp: Int, xds: String)

  private def spOf(tax: Int): Option[Int] = tax match {
    case 9606 => Some(1); case 10090 => Some(2); case 10116 => Some(3)
    case _ => None
  }

  test("property: pair synthesis + group sync equal a row-at-a-time " +
    "model of HomologeneLoader - qc drops, taxon species, all ordered " +
    "entry pairs, multiset sync") {
    val taxGen = Gen.frequency(3 -> Gen.const(9606), 3 -> Gen.const(10090),
      3 -> Gen.const(10116), 1 -> Gen.const(7955))
    val geneGen = Gen.choose(0, 7).map(i => s"G$i")

    val caseGen = for {
      nE <- Gen.choose(2, 14)
      es <- Gen.listOfN(nE, for {
        g <- Gen.choose(1, 3); t <- taxGen; gid <- geneGen
      } yield Entry(g, t, gid))
      // resolution: each gene id maps to 0..2 active genes
      rs <- Gen.listOfN(10, for {
        gid <- geneGen; n <- Gen.frequency(2 -> Gen.const(1),
          1 -> Gen.const(0), 1 -> Gen.const(2))
        ids <- Gen.listOfN(n, Gen.choose(1, 9))
      } yield gid -> ids.distinct)
      nS <- Gen.choose(0, 8)
      st <- Gen.listOfN(nS, for {
        g <- Gen.choose(1, 3); s <- Gen.choose(1, 9); d <- Gen.choose(1, 9)
        sSp <- Gen.choose(1, 3); dSp <- Gen.choose(1, 3)
        x <- Gen.frequency(4 -> Gen.const("HOMOLOGENE"),
          1 -> Gen.const("RGD"), 1 -> Gen.const("HGNC"))
        // when set (and pairs exist), this row COPIES a synthesized
        // pair's key columns so matches and dup-key splits occur
        usePair <- Gen.prob(0.6)
      } yield (g, s, d, sSp, dSp, x, usePair))
    } yield (es, rs.toMap, st)

    var sawBadTax = 0; var sawMultiDrop = 0; var sawZeroDrop = 0
    var sawSameSpPair = 0; var sawSelfPair = 0; var sawDupEntry = 0
    var sawMatch = 0; var sawInsert = 0; var sawDelete = 0
    var sawNonHomologeneUntouched = 0; var sawDupKeySplit = 0

    var seed = Seed(168801L)
    for (_ <- 1 to 24) {
      val (es, res, stSpec) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      // ---- the model ----
      val parsed = es.filter(e => spOf(e.tax).isDefined)
      sawBadTax += es.size - parsed.size
      val qced = parsed.filter { e =>
        val m = res.getOrElse(e.geneId, Nil)
        if (m.isEmpty) { sawZeroDrop += 1; false }
        else if (m.size > 1) { sawMultiDrop += 1; false }
        else true
      }.map(e => (e.grp, res(e.geneId).head, spOf(e.tax).get))
      if (qced.size != qced.distinct.size) sawDupEntry += 1

      val expPairs = qced.groupBy(_._1).toList.flatMap { case (g, mem) =>
        for {
          i <- mem.indices; j <- mem.indices if i != j
        } yield (g, mem(i)._2, mem(j)._2, mem(i)._3, mem(j)._3)
      }
      expPairs.foreach { case (_, s, d, sSp, dSp) =>
        if (sSp == dSp) sawSameSpPair += 1
        if (s == d) sawSelfPair += 1
      }

      // prior state: random rows plus pair-copying rows (the same
      // derivation feeds model and engine, so adaptivity is sound)
      val st = stSpec.zipWithIndex.map {
        case ((g, s, d, sSp, dSp, x, usePair), i) =>
          if (usePair && expPairs.nonEmpty) {
            // even rows pile onto pair 0 (forcing state multiplicity
            // past the incoming count - the match/delete split); odd
            // rows spread across the pair list
            val p = expPairs(if (i % 2 == 0) 0 else (g + s + d + i) % expPairs.size)
            // the piled-on rows are always HOMOLOGENE so the state
            // multiplicity at pair 0 actually exceeds the incoming count
            StateRow(10L + i, p._1, p._2, p._3, p._4, p._5,
              if (i % 2 == 0) "HOMOLOGENE" else x)
          } else StateRow(10L + i, g, s, d, sSp, dSp, x)
      }

      // sync model: per (grp,src,dest) multiset match; lowest state
      // keys match first, lowest (srcSp,destSp) incoming ranks first
      val homRows = st.filter(_.xds == "HOMOLOGENE")
      sawNonHomologeneUntouched += st.size - homRows.size
      val incByKey = expPairs.groupBy(p => (p._1, p._2, p._3))
      val rgdByKey = homRows.groupBy(r => (r.grp, r.src, r.dest))
      val expMatched = scala.collection.mutable.Set[Long]()
      val expDeleted = scala.collection.mutable.Set[Long]()
      rgdByKey.foreach { case (k, rows) =>
        val nInc = incByKey.getOrElse(k, Nil).size
        val sorted = rows.sortBy(_.key)
        if (nInc > 0 && rows.size > nInc) sawDupKeySplit += 1
        sorted.take(nInc).foreach(r => expMatched += r.key)
        sorted.drop(nInc).foreach(r => expDeleted += r.key)
      }
      val expInserts = incByKey.toList.flatMap { case (k, ps) =>
        val nRgd = rgdByKey.getOrElse(k, Nil).size
        ps.sortBy(p => (p._4, p._5)).drop(nRgd).map { p =>
          val otk = if (p._4 == 1 || p._5 == 1)
            graft.model.Species.directOrthologTypeKey
          else graft.model.Species.transitiveOrthologTypeKey
          (p._1, p._2, p._3, p._4, p._5, otk)
        }
      }
      sawMatch += expMatched.size; sawInsert += expInserts.size
      sawDelete += expDeleted.size

      // ---- the engine ----
      val groupsDf = parsed.map(e => (e.grp, e.tax, e.geneId))
        .toDF("homologene_group_id", "tax_id", "gene_id")
      val resDf = res.toList.flatMap { case (gid, ids) => ids.map(gid -> _) }
        .toDF("gene_id", "rgdId")
      val pairs = Homologene.synthesizePairs(groupsDf, resDf)
      val gotPairs = pairs
        .as[(Int, Int, Int, Int, Int)].collect().toList
      assert(gotPairs.sorted == expPairs.sorted,
        s"pairs: engine=${gotPairs.sorted} model=${expPairs.sorted} es=$es res=$res")

      val stDf = st.map(r => (r.key, r.grp, r.src, r.dest, r.srcSp, r.destSp, r.xds))
        .toDF("key", "homologeneGroupId", "srcRgdId", "destRgdId",
          "srcSpeciesTypeKey", "destSpeciesTypeKey", "xrefDataSrc")
      val (ins, matched, dels) = Homologene.syncGroups(pairs, stDf)
      assert(matched.select($"key").as[Long].collect().toSet == expMatched.toSet,
        s"matched: es=$es st=$st")
      assert(dels.select($"key").as[Long].collect().toSet == expDeleted.toSet,
        s"deletes: es=$es st=$st")
      val gotIns = ins.select($"homologeneGroupId", $"srcRgdId", $"destRgdId",
        $"srcSpeciesTypeKey", $"destSpeciesTypeKey", $"orthologTypeKey")
        .as[(Int, Int, Int, Int, Int, Int)].collect().toList
      assert(gotIns.sorted == expInserts.sorted,
        s"inserts: engine=${gotIns.sorted} model=${expInserts.sorted}")
    }

    assert(sawBadTax > 0, "never dropped an unsupported taxon")
    assert(sawMultiDrop > 0, "never dropped a multi-match entry")
    assert(sawZeroDrop > 0, "never dropped a zero-match entry")
    assert(sawSameSpPair > 0, "never synthesized a same-species pair")
    assert(sawSelfPair > 0, "never synthesized a self pair")
    assert(sawDupEntry > 0, "never saw duplicate entries multiply pairs")
    assert(sawMatch > 0 && sawInsert > 0 && sawDelete > 0,
      "sync never exercised all three classifications")
    assert(sawNonHomologeneUntouched > 0,
      "never saw a non-HOMOLOGENE state row ride through")
    assert(sawDupKeySplit > 0,
      "never split duplicate state keys between match and delete")
  }
}
