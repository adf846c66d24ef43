package graft

/** Row-at-a-time model of one --agrOrthologs run (AgrTsvLoader.run2 +
  * the M5/M6 write side effects), extracted from AgrPropertySpec so the
  * multi-run state-evolution pin (AgrMultiRunPropertySpec) can iterate
  * it: run N's outputs (final AGR state, evolved xref state, synthesized
  * genes) become run N+1's inputs, exactly as the reference's shared
  * database state carries between pipeline invocations
  * (OrthologRelationLoadingManager.java:78-84 dispatching AgrTsvLoader;
  * AgrTsvLoader.java:306-393 resolution writing bindings the NEXT run's
  * map step reads).
  *
  * `counters` records coverage-probe events; callers assert the corners
  * they care about actually occurred.
  */
object AgrRefModel {

  case class GeneRow(id: Int, sym: String, sp: Int, active: Boolean)
  case class XrefRow(key: Long, rgdId: Int, xdbKey: Int, accId: String,
                     pipe: String, mod: java.sql.Timestamp)
  case class Line(c1: String, s1: String, sp1: Int,
                  c2: String, s2: String, sp2: Int,
                  algos: String, best: Boolean, bestRev: Boolean)
  case class AgrRow(g1: Int, g2: Int, conf: String, best: String,
                    bestRev: String, methods: String,
                    created: java.sql.Timestamp,
                    updated: java.sql.Timestamp)

  case class Res(curie: String, sym: String, sp: Int,
                 rgdId: Option[Int], how: Option[String])

  /** One run's products, shaped for handoff into the next run. */
  case class Out(finalState: Set[AgrRow], xrefs: Set[XrefRow],
                 newGenes: Set[(Int, String, Int, String)],
                 unresolved: Set[(String, String, Int)],
                 stats: Map[String, Long], guardOk: Boolean,
                 resolved: List[Res])

  def run(genes: List[GeneRow], xrefs: List[XrefRow],
          lines: List[Line], state: List[AgrRow], threshold: String,
          runTs: java.sql.Timestamp, cutoff: java.sql.Timestamp,
          counters: scala.collection.mutable.Map[String, Int]): Out = {
    def bump(k: String): Unit = counters(k) = counters.getOrElse(k, 0) + 1

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
        case Some("map") => bump("map")
        case Some("specialId") => bump("specialId")
        case Some("symbol") =>
          val cands = genes.filter(g => g.sym == r.sym && g.sp == r.sp)
          if (cands.size == 1) {
            bump("symbolSolo")
            if (!cands.head.active) bump("symbolSoloInactive")
          } else bump("symbolMulti")
        case Some("insert") => bump("insert")
        case None => bump("unresolved")
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
          bump("upsertUpdate")
          s.copy(best = b, bestRev = br, updated = runTs)
        case None => s
      }
    } ++ incBest.filterNot(t => stateKeys((t._1, t._2, t._3)))
      .map { t =>
        bump("upsertInsert")
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
    if (!guardOk) bump("guardRefusal")
    if (guardOk && stale > 0) bump("staleSwept")

    // M6 QC + M5 write side effects
    val seen = resolved.filter(_.rgdId.isDefined).map(_.curie).toSet
    def isAgr(x: XrefRow) = x.xdbKey == 63 && x.pipe == "AgrOrtholog"
    val qcd = xrefs.map { x =>
      if (seen(x.accId) && isAgr(x)) x.copy(mod = runTs) else x
    }.filterNot(x => isAgr(x) && x.mod.before(cutoff))
    if (qcd.size < xrefs.size) bump("xrefSwept")
    val maxXrefKey = if (xrefs.isEmpty) 0L else xrefs.map(_.key).max
    val newXrefRows = resolved
      .filter(r => Set("specialId", "symbol", "insert").exists(r.how.contains))
      .map(r => (r.rgdId.get, r.curie)).distinct
      .sortBy { case (id, acc) => (acc, id) }.zipWithIndex
      .map { case ((id, acc), i) =>
        XrefRow(maxXrefKey + i + 1L, id, 63, acc, "AgrOrtholog", runTs) }
    if (newXrefRows.nonEmpty) bump("newXref")

    Out(
      finalState = expFinal,
      xrefs = (qcd ++ newXrefRows).toSet,
      newGenes = inserts.map(r => (r.rgdId.get, r.sym, r.sp, "ACTIVE")).toSet,
      unresolved = resolved.filter(_.rgdId.isEmpty)
        .map(r => (r.curie, r.sym, r.sp)).toSet,
      stats = resolved.groupBy(_.how.orNull).view
        .mapValues(_.size.toLong).toMap,
      guardOk = guardOk,
      resolved = resolved)
  }
}
