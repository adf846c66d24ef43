package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Grouping

/** Brute-force semantic pin for group construction (A1/A3/O4/U2): a
  * plain-Scala model of OrthologGroup.add + mergeDataSetNames +
  * buildComplementaryRelations (OrthologGroup.java:20-91) recomputes
  * the merged relation set - evidence-token union with the reference's
  * EXACT split regex (comma + one whitespace: "C,A" is a single
  * token), the HGNC+NCBI cross-merge that injects the literal "NCBI"
  * marker and DISCARDS NCBI's own dataset tokens, and the mirrored
  * complement rows - over seeded random relation multisets.
  * GroupingCascadeSpec pins goldens; this closes the collisions
  * (several HGNC rows + an NCBI row on one pair, an HGNC evidence
  * token literally spelled "NCBI" deduping against the marker,
  * no-space tokens riding through splits unharmed). */
class GroupingPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class R(src: Int, dest: Int, ds: String, dsn: String)

  test("property: merge + complement equals a row-at-a-time model of " +
    "OrthologGroup - exact token split, marker cross-merge, mirrors") {
    val dsnGen = Gen.oneOf("A", "B", "A, B", "B, A", "C,A", "A, C,A",
      "NCBI", "Ortholog", "NCBI, A",
      // empty-token corners: an interior ",\s,\s" run splits to an ""
      // token that Utils.concatenate drops WITH its separator; a
      // trailing ",\s" drops via Java's default split limit
      "A, , B", ", A", "A, B, ")
    val caseGen = for {
      n <- Gen.choose(1, 12)
      rs <- Gen.listOfN(n, for {
        s <- Gen.choose(1, 3); d <- Gen.choose(11, 13)
        ds <- Gen.oneOf("HGNC", "NCBI"); dsn <- dsnGen
      } yield R(s, d, ds, dsn))
    } yield rs

    var sawSameSourceUnion = 0; var sawCrossMerge = 0; var sawNcbiOnly = 0
    var sawNoSpaceToken = 0; var sawMarkerCollision = 0; var sawEmptyToken = 0

    var seed = Seed(77191L)
    for (_ <- 1 to 16) {
      val rs = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      // ---- the model ----
      def toks(dsn: String): List[String] = dsn.split(",\\s").toList
      val merged = rs.groupBy(r => (r.src, r.dest)).toList.map {
        case ((s, d), rows) =>
          val hgnc = rows.filter(_.ds == "HGNC")
          val ncbi = rows.filter(_.ds == "NCBI")
          if (hgnc.size > 1) sawSameSourceUnion += 1
          if (hgnc.nonEmpty && ncbi.nonEmpty) sawCrossMerge += 1
          if (hgnc.isEmpty && ncbi.nonEmpty) sawNcbiOnly += 1
          val tokens =
            if (hgnc.nonEmpty) {
              val ht = hgnc.flatMap(r => toks(r.dsn))
              if (ht.contains("NCBI") && ncbi.nonEmpty) sawMarkerCollision += 1
              ht ++ (if (ncbi.nonEmpty) List("NCBI") else Nil)
            } else ncbi.flatMap(r => toks(r.dsn))
          if (tokens.exists(_.contains(","))) sawNoSpaceToken += 1
          if (tokens.contains("")) sawEmptyToken += 1
          // TreeSet + Utils.concatenate: the single "" element sorts
          // first and contributes neither content nor separator
          val dsn = tokens.distinct.sorted.filter(_.nonEmpty).mkString(", ")
          val ds = if (hgnc.nonEmpty) "HGNC" else "NCBI"
          (s, d, ds, dsn)
      }
      val expected = merged.flatMap { case (s, d, ds, dsn) =>
        List((s, d, 1, 3, ds, dsn, s), (d, s, 3, 1, ds, dsn, s))
      }.toSet

      // ---- the engine ----
      val df = rs.map(r => (r.src, r.dest, 1, 3, r.ds, r.dsn))
        .toDF("srcRgdId", "destRgdId", "srcSpeciesTypeKey",
          "destSpeciesTypeKey", "dataSource", "dataSetName")
      val got = Grouping.withComplementaryRelations(
        Grouping.mergeRelations(df))
        .select("srcRgdId", "destRgdId", "srcSpeciesTypeKey",
          "destSpeciesTypeKey", "dataSource", "dataSetName", "groupId")
        .as[(Int, Int, Int, Int, String, String, Int)].collect().toSet
      assert(got == expected, s"rels=$rs")
    }

    assert(sawSameSourceUnion > 0, "never unioned same-source duplicates")
    assert(sawCrossMerge > 0, "never cross-merged HGNC+NCBI")
    assert(sawNcbiOnly > 0, "never kept an NCBI-only pair")
    assert(sawNoSpaceToken > 0, "never saw a no-space token ride through")
    assert(sawMarkerCollision > 0,
      "never saw an HGNC token spelled NCBI collide with the marker")
    assert(sawEmptyToken > 0, "never saw an empty token collapse")
  }
}
