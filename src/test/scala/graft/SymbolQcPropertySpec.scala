package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Agr

/** Brute-force semantic pin for the D6 human-symbol QC
  * (AgrTsvLoader.validateGeneSymbol:395-435): a row-at-a-time model
  * recomputes the issue rows over seeded random resolutions, bindings,
  * gene symbols, and statuses.
  *
  * Reference semantics pinned:
  *  - only HUMAN map-resolved occurrences are checked (the in-method
  *    species gate);
  *  - the BINDING leg checks every ACTIVE gene the curie binds to via
  *    an AGR_GENE xref - a multi-bound curie contributes several issue
  *    rows per occurrence; INACTIVE bindings never check
  *    (getGenesByXdbId routes through getActiveGenesByXdbId);
  *  - the RESOLVED leg checks the resolved gene with NO status filter
  *    (getGeneByRgdId);
  *  - a mismatch needs BOTH the RGD symbol and the Ensembl symbol to
  *    differ case-insensitively; null symbols compare as empty strings.
  *
  * Teeth (verified-to-fail): the pre-round-16 operator had no binding
  * leg at all - any case with a mismatching multi-bound curie fails.
  */
class SymbolQcPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: D6 symbol QC equals a row-at-a-time model of " +
    "validateGeneSymbol - binding + resolved legs, active-only " +
    "bindings, case-insensitive double mismatch") {
    val symGen = Gen.oneOf("Abc", "abc", "ABC", "xyz", "Ens1", "")
    val caseGen = for {
      nG <- Gen.choose(3, 8)
      gs <- Gen.listOfN(nG, for {
        sym <- symGen; ens <- symGen; act <- Gen.prob(0.7)
      } yield (sym, ens, act))
      nX <- Gen.choose(0, 10)
      xs <- Gen.listOfN(nX, for {
        c <- Gen.oneOf("AGR:1", "AGR:2", "AGR:3")
        rgd <- Gen.choose(1, nG)
        xdb <- Gen.frequency(3 -> Gen.const(63), 1 -> Gen.const(3))
      } yield (c, rgd, xdb))
      nR <- Gen.choose(0, 8)
      rs <- Gen.listOfN(nR, for {
        c <- Gen.oneOf("AGR:1", "AGR:2", "AGR:3")
        sym <- symGen
        sp <- Gen.frequency(3 -> Gen.const(1), 1 -> Gen.const(3))
        rgd <- Gen.choose(1, nG)
      } yield (c, sym, sp, rgd))
    } yield (gs.zipWithIndex.map { case ((s, e, a), i) => (i + 1, s, e, a) },
      xs.distinct, rs)

    var sawBindingIssue = 0; var sawMultiBound = 0; var sawResolvedIssue = 0
    var sawEnsemblSave = 0; var sawInactiveBindingSkip = 0
    var sawNonHumanSkip = 0; var sawCaseMatch = 0

    var seed = Seed(168806L)
    for (_ <- 1 to 20) {
      val (gs, xs, rs) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val sym = gs.map(g => g._1 -> g._2).toMap
      val ens = gs.map(g => g._1 -> g._3).toMap
      val act = gs.filter(_._4).map(_._1).toSet

      def eq(a: String, b: String) =
        Option(a).getOrElse("").equalsIgnoreCase(Option(b).getOrElse(""))
      def mismatch(lineSym: String, id: Int): Boolean = {
        val m = !eq(sym(id), lineSym) && !eq(ens(id), lineSym)
        if (!m && !eq(sym(id), lineSym) && eq(ens(id), lineSym))
          sawEnsemblSave += 1
        if (!m && eq(sym(id), lineSym) && sym(id) != lineSym) sawCaseMatch += 1
        m
      }

      val expected = rs.flatMap { case (c, lineSym, sp, rgd) =>
        if (sp != 1) { sawNonHumanSkip += 1; Nil }
        else {
          val bound = xs.filter(x => x._1 == c && x._3 == 63).map(_._2)
          if (bound.count(act) > 1) sawMultiBound += 1
          sawInactiveBindingSkip += bound.count(id => !act(id))
          val bindingIssues = bound.filter(act).filter(id => mismatch(lineSym, id))
            .map(id => ("binding", c, lineSym, id, sym(id)))
          val resolvedIssues =
            if (mismatch(lineSym, rgd)) List(("resolved", c, lineSym, rgd, sym(rgd)))
            else Nil
          sawBindingIssue += bindingIssues.size
          sawResolvedIssue += resolvedIssues.size
          bindingIssues ++ resolvedIssues
        }
      }

      val resDf = rs.toDF("curie", "geneSymbol", "speciesTypeKey", "rgdId")
      val xrefDf = xs.map { case (c, rgd, xdb) => (100L, rgd, xdb, c, "p") }
        .toDF("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline")
      val genesDf = gs.map(g => (g._1, g._2, g._3))
        .toDF("rgdId", "geneSymbol", "ensemblGeneSymbol")
      val rgdDf = gs.map(g => (g._1, if (g._4) "ACTIVE" else "WITHDRAWN"))
        .toDF("rgdId", "objectStatus")
      val got = Agr.qcHumanSymbols(resDf, xrefDf, genesDf, rgdDf)
        .as[(String, String, String, Int, String)].collect().toList
      assert(got.sorted == expected.sorted,
        s"gs=$gs xs=$xs rs=$rs got=${got.sorted} exp=${expected.sorted}")
    }

    assert(sawBindingIssue > 0, "never flagged a binding mismatch")
    assert(sawMultiBound > 0, "never saw a multi-bound curie")
    assert(sawResolvedIssue > 0, "never flagged the resolved gene")
    assert(sawEnsemblSave > 0, "never saw an Ensembl-symbol save")
    assert(sawInactiveBindingSkip > 0, "never skipped an inactive binding")
    assert(sawNonHumanSkip > 0, "never skipped a non-human occurrence")
    assert(sawCaseMatch > 0, "never matched case-insensitively")
  }
}
