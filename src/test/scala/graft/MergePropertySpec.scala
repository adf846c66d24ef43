package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Merge, ShardedPrefixSum}

/** Brute-force semantic pin for the flagship reconcile merge
  * (M1/M2/W3/F11 + S7): a plain-Scala, row-at-a-time model of the
  * reference semantics - classification against the W3-best state row,
  * duplicate-state cleanup, surrogate keys, the manual guard, and the
  * stale sweep - recomputes every output of [[Merge.reconcile]] over
  * seeded random states/incomings, INCLUDING the assigned surrogate
  * keys. MergeSpec pins hand-built golden cases; this closes the gaps
  * between them (random collisions of priority/evidence/symbol ties,
  * manual rows in every role, both sweep directions, out-of-pair
  * species, missing gene symbols). */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
  private val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val spKey = 3 // the run's species pair = human <-> rat

  // id domains: 1-5 human (sp 1), 11-15 rat (sp 3), 21-22 mouse (sp 2,
  // outside the sweep pair)
  private def spOf(id: Int): Int = if (id <= 5) 1 else if (id <= 15) 3 else 2

  private case class St(key: Long, src: Int, dest: Int, xsrc: String,
                        xset: Option[String], mb: Int,
                        md: java.sql.Timestamp) {
    def srcSp: Int = spOf(src); def destSp: Int = spOf(dest)
  }
  private case class In(src: Int, dest: Int, xsrc: String,
                        xset: Option[String]) {
    def srcSp: Int = spOf(src); def destSp: Int = spOf(dest)
  }

  // ---- plain-Scala mirrors of the engine's scalar semantics ----
  private def prio(s: String): Int = s match {
    case "RGD" => 4; case "Alliance" => 3; case "HGNC" => 2
    case "NCBI" => 1; case _ => 0
  }
  private def ev(x: Option[String]): Int = x match {
    case None | Some("") => 0
    case Some(s) => s.split(",", -1).length
  }
  private def symMatch(a: Option[String], b: Option[String]): Boolean =
    (a, b) match { // null-safe <=> over lower()
      case (None, None) => true
      case (Some(x), Some(y)) => x.toLowerCase == y.toLowerCase
      case _ => false
    }
  private def canonXset(x: Option[String]): Option[String] = x match {
    case None | Some("") => x
    case Some(s) =>
      // Dao:447-459 verbatim: Java default-limit split, single-token
      // skip, TreeSet + Utils.concatenate (leading "" contributes
      // nothing), rewrite only when strictly shorter
      val toks = s.split(", ")
      if (toks.length <= 1) Some(s)
      else {
        val sb = new StringBuilder
        scala.collection.immutable.TreeSet(toks: _*).foreach { t =>
          if (sb.nonEmpty) sb.append(", "); sb.append(t)
        }
        val canon = sb.toString
        if (canon != s && canon.length < s.length) Some(canon) else Some(s)
      }
  }
  private def otk(srcSp: Int, destSp: Int): Int =
    if (srcSp == 1 || destSp == 1) graft.model.Species.directOrthologTypeKey
    else graft.model.Species.transitiveOrthologTypeKey

  /** W3 "ranks before": priority desc, evidence desc, symbol-match
    * desc, lower(destSymbol) DESC nulls last, destRgdId asc. */
  private def w3Before(aP: Int, aE: Int, aSm: Boolean, aSym: Option[String], aDest: Int,
                       bP: Int, bE: Int, bSm: Boolean, bSym: Option[String], bDest: Int): Boolean = {
    if (aP != bP) return aP > bP
    if (aE != bE) return aE > bE
    if (aSm != bSm) return aSm
    val (al, bl) = (aSym.map(_.toLowerCase), bSym.map(_.toLowerCase))
    if (al != bl) return (al, bl) match {
      case (Some(x), Some(y)) => x > y // reverse-alphabetical
      case (Some(_), None) => true // nulls last
      case _ => false
    }
    aDest < bDest
  }

  test("property: reconcile equals a row-at-a-time model of the reference " +
    "semantics - classification, W3 ties, manual guard, stale sweep, and " +
    "the exact surrogate keys") {
    // RGD-heavy on purpose: the manual-guard corners (a manual row in
    // the duplicate slot, a manual replace target - which needs an
    // RGD-vs-RGD priority tie broken by evidence/symbols) are the
    // rarest collisions and the ones F11 exists for
    val xsrcGen = Gen.frequency(3 -> Gen.const("RGD"),
      1 -> Gen.const("Alliance"), 1 -> Gen.const("HGNC"),
      1 -> Gen.const("NCBI"), 1 -> Gen.const("OMA"))
    val xsetGen = Gen.oneOf[Option[String]](None, Some(""), Some("A"),
      Some("B, A"), Some("A, B"), Some("Ensembl, OMA"), Some("B, A, B"),
      Some("C,A"))
    // a TIGHT id domain on purpose: multi-row (src, destSp) state
    // groups (the duplicate-cleanup path, manual rows in the non-best
    // slot) and incoming/state key collisions must occur routinely,
    // not by luck - the first cut of this generator (src 1-5, dest
    // 11-15, 8 samples) never produced a manual duplicate row, and a
    // deliberately broken F11 guard in the model passed the property
    val humanId = Gen.choose(1, 3)
    val ratId = Gen.choose(11, 13)
    val pairGen = Gen.frequency( // both sweep directions + out-of-pair
      5 -> humanId.flatMap(s => ratId.map(d => (s, d))),
      3 -> ratId.flatMap(s => humanId.map(d => (s, d))),
      1 -> humanId.map(s => (s, 21)))
    val caseGen = for {
      nSt <- Gen.choose(0, 14)
      st <- Gen.listOfN(nSt, for {
        (s, d) <- pairGen
        x <- xsrcGen; e <- xsetGen
        old <- Gen.frequency(2 -> Gen.const(true), 1 -> Gen.const(false))
      } yield (s, d, x, e, old))
      nIn <- Gen.choose(0, 12)
      in <- Gen.listOfN(nIn, for {
        (s, d) <- pairGen
        x <- xsrcGen; e <- xsetGen
      } yield In(s, d, x, e))
      syms <- Gen.listOfN(20, Gen.oneOf[Option[String]](
        Some("ga"), Some("gA"), Some("gB"), None))
    } yield {
      // distinct (src, dest) state pairs: same-pair duplicates are W1's
      // domain and would make the within-group W3 tie-break (dest asc)
      // degenerate; distinct (src, destSp, dest) incomings keep the
      // dedupe pick total for the same reason
      val stRows = st.groupBy(t => (t._1, t._2)).values.map(_.head).toList
        .zipWithIndex.map { case ((s, d, x, e, old), i) =>
          St(100L + i, s, d, x, e, mb = 50,
            md = if (old) ts0 else runTs) }
      val inRows = in.groupBy(t => (t.src, spOf(t.dest), t.dest))
        .values.map(_.head).toList
      val ids = (1 to 5) ++ (11 to 15) ++ Seq(21, 22)
      val symMap = ids.zip(syms).collect { case (id, Some(s)) => id -> s }.toMap
      (stRows, inRows, symMap)
    }

    // coverage probes: the teeth experiments below need these corners
    // to actually occur across the sample set, or the property can
    // silently stop discriminating (it did - see the generator note)
    var sawManualDup = 0
    var sawManualReplaceTarget = 0
    var sawDupDelete = 0
    var sawSole = 0
    var s = Seed(7321L)
    for (_ <- 1 to 16) {
      val (st, in, symMap) = caseGen.pureApply(Gen.Parameters.default, s)
      s = s.next
      val sym: Int => Option[String] = symMap.get

      // ---- the model ----
      def smOf(src: Int, dest: Int) = symMatch(sym(src), sym(dest))
      def w3St(a: St, b: St) = w3Before(
        prio(a.xsrc), ev(a.xset), smOf(a.src, a.dest), sym(a.dest), a.dest,
        prio(b.xsrc), ev(b.xset), smOf(b.src, b.dest), sym(b.dest), b.dest)
      def w3In(a: In, b: In) = w3Before(
        prio(a.xsrc), ev(a.xset), smOf(a.src, a.dest), sym(a.dest), a.dest,
        prio(b.xsrc), ev(b.xset), smOf(b.src, b.dest), sym(b.dest), b.dest)

      val incBest = in.groupBy(r => (r.src, r.destSp)).map { case (k, rs) =>
        k -> rs.sortWith(w3In).head }
      val stByKey = st.groupBy(r => (r.src, r.destSp))
      val stBest = stByKey.map { case (k, rs) => k -> rs.sortWith(w3St).head }
      val dupDeletes = stByKey.values.flatMap(rs =>
        rs.sortWith(w3St).tail.filter(_.xsrc != "RGD")).toSet
      if (stByKey.values.exists(rs =>
        rs.sortWith(w3St).tail.exists(_.xsrc == "RGD"))) sawManualDup += 1

      def existingWeaker(ex: St, i: In): Boolean = {
        val (exP, inP) = (prio(ex.xsrc), prio(i.xsrc))
        if (exP != inP) return exP < inP
        val (exE, inE) = (ev(ex.xset), ev(i.xset))
        if (exE != inE) return exE < inE
        if (smOf(ex.src, ex.dest)) return false
        if (smOf(i.src, i.dest)) return true
        (sym(ex.dest), sym(i.dest)) match {
          case (None, Some(_)) => true
          case (_, None) => false
          case (Some(a), Some(b)) => a.toLowerCase < b.toLowerCase
        }
      }

      var touched = Set.empty[St]
      var insertSrc = List.empty[In]
      var replacedDeletes = Set.empty[St]
      var downgraded = Set.empty[In]
      for ((k, i) <- incBest) stBest.get(k) match {
        case None => insertSrc ::= i
        case Some(ex) if ex.dest == i.dest => touched += ex
        case Some(ex) if existingWeaker(ex, i) =>
          insertSrc ::= i
          if (ex.xsrc != "RGD") replacedDeletes += ex
          else sawManualReplaceTarget += 1
        case Some(_) => downgraded += i
      }
      val maxKey = if (st.isEmpty) 0L else st.map(_.key).max
      val inserted = insertSrc
        .sortBy(i => (i.src, i.destSp, i.dest)).zipWithIndex
        .map { case (i, idx) => St(maxKey + idx + 1L, i.src, i.dest,
          i.xsrc, canonXset(i.xset), mb = 70, md = runTs) }
      val kept = st.filterNot(r => dupDeletes(r) || replacedDeletes(r))
        .map(r => if (touched(r)) r.copy(mb = 70, md = runTs) else r)
      val merged = kept ++ inserted
      val pairCnt = merged.groupBy(r => (r.src, r.destSp)).view
        .mapValues(_.size).toMap
      def inPair(r: St) = (r.srcSp == 1 && r.destSp == spKey) ||
        (r.srcSp == spKey && r.destSp == 1)
      val stale = merged.filter(r => inPair(r) &&
        r.md.before(runTs) && r.xsrc != "RGD" &&
        pairCnt((r.src, r.destSp)) > 1).toSet
      // Model-checked discovery (kept as an executable proof): within a
      // SINGLE reconcile the M2 pair-count sweep is structurally empty.
      // It needs an old, untouched, non-manual row in a group that
      // still has >1 row post-merge - but manual rows always rank
      // W3-first (priority 4 is the max), so every surviving duplicate
      // is manual, every kept non-manual row is its group's best, and
      // a best in a multi-row group means a manual duplicate ranked
      // below it: contradiction. The sweep's OBSERVABLE contract
      // ("untouched non-manual rows go unless sole") is delivered by
      // the W3 dup-cleanup; the stale filter is belt-and-suspenders
      // for state drift (e.g. a prior run's partial write) rather than
      // single-run reachable. If a future refactor makes this set
      // non-empty, the model must be revisited, loudly:
      assert(stale.isEmpty,
        s"single-run stale sweep became reachable - revisit the model: $stale")
      val expState = merged.filterNot(stale).toSet
      val expDeleted = dupDeletes ++ replacedDeletes ++ stale

      // ---- the engine ----
      val stDf = st.map(r => (r.key, r.src, r.dest, r.srcSp, r.destSp,
          r.xsrc, r.xset, otk(r.srcSp, r.destSp), 50, ts0, r.mb, r.md))
        .toDF("key", "srcRgdId", "destRgdId", "srcSpeciesTypeKey",
          "destSpeciesTypeKey", "xrefDataSrc", "xrefDataSet",
          "orthologTypeKey", "createdBy", "createdDate",
          "lastModifiedBy", "lastModifiedDate")
      val inDf = in.map(r => (r.src, r.dest, r.srcSp, r.destSp, r.xsrc, r.xset))
        .toDF("srcRgdId", "destRgdId", "srcSpeciesTypeKey",
          "destSpeciesTypeKey", "xrefDataSrc", "xrefDataSet")
      val genesDf = symMap.toSeq
        .map { case (id, sm) => (id, sm, sm, "protein-coding", spOf(id), sm) }
        .toDF("rgdId", "geneSymbol", "geneName", "geneTypeLc",
          "speciesTypeKey", "ensemblGeneSymbol")
      val m = Merge.reconcile(inDf, stDf, genesDf, runTs, spKey)

      def stSet(df: org.apache.spark.sql.DataFrame): Set[St] =
        df.select("key", "srcRgdId", "destRgdId", "xrefDataSrc",
            "xrefDataSet", "lastModifiedBy", "lastModifiedDate")
          .as[(Long, Int, Int, String, Option[String], Int, java.sql.Timestamp)]
          .collect().map(t => St(t._1, t._2, t._3, t._4, t._5, t._6, t._7)).toSet

      val label = s"st=$st in=$in syms=$symMap"
      assert(stSet(m.newState) == expState, s"newState: $label")
      assert(stSet(m.inserted) == inserted.toSet, s"inserted: $label")
      assert(stSet(m.deleted) == expDeleted, s"deleted: $label")
      assert(stSet(m.touched) ==
        touched.map(_.copy(mb = 70, md = runTs)), s"touched: $label")
      assert(m.downgraded.select("srcRgdId", "destRgdId", "xrefDataSrc",
          "xrefDataSet")
        .as[(Int, Int, String, Option[String])].collect().toSet ==
        downgraded.map(d => (d.src, d.dest, d.xsrc, d.xset)), s"downgraded: $label")
      // sole-survivor evidence: an old, untouched, non-manual row that
      // SURVIVES because it is its group's only row (REQUIREMENT 2) -
      // the observable half of the M2 contract that IS reachable
      if (expState.exists(r => inPair(r) && r.md.before(runTs) &&
        r.xsrc != "RGD" && pairCnt((r.src, r.destSp)) == 1)) sawSole += 1
      if (dupDeletes.nonEmpty) sawDupDelete += 1
      ShardedPrefixSum.releaseAll() // each reconcile pins its key frame
    }
    // the property only discriminates if the guarded corners occurred:
    // a manual row in the duplicate (non-best) slot, a manual row as a
    // replace target, duplicate cleanup firing, and the sole-survivor
    // rule letting an old row live
    assert(sawManualDup > 0, "generator never produced a manual duplicate row")
    assert(sawManualReplaceTarget > 0,
      "generator never produced a manual replace target")
    assert(sawDupDelete > 0, "generator never exercised duplicate cleanup")
    assert(sawSole > 0, "generator never exercised the sole-survivor rule")
  }
}
