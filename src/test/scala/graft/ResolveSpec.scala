package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Resolve

/** J1/J2 outcome-classification table, mirroring
  * OrthologRelationLoader.getRgdIdByEgId2 (:301-372). */
class ResolveSpec extends SparkSpec {
  import spark.implicits._

  // gene universe:
  //  EG1 -> gene 11 ACTIVE                      => matched(11)
  //  EG2 -> genes 21,22 both ACTIVE             => multiple
  //  EG3 -> gene 31 WITHDRAWN, replaced by 32   => matched(32)
  //  EG4 -> gene 41 WITHDRAWN, no replacement   => withdrawn
  //  EG5 -> genes 51,52 WITHDRAWN, replaced 53,54 => multiple (replaced)
  //  EG6 -> no xref                             => unmatched
  //  EG7 -> gene 71 is an allele                => unmatched (F5 exclusion)
  //  EG8 -> gene 81 ACTIVE + 82 WITHDRAWN       => matched(81)
  private def xrefs: DataFrame = Seq(
    (1L, 11, 3, "EG1"), (2L, 21, 3, "EG2"), (3L, 22, 3, "EG2"),
    (4L, 31, 3, "EG3"), (5L, 41, 3, "EG4"),
    (6L, 51, 3, "EG5"), (7L, 52, 3, "EG5"),
    (8L, 71, 3, "EG7"), (9L, 81, 3, "EG8"), (10L, 82, 3, "EG8")
  ).toDF("accXdbKey", "rgdId", "xdbKey", "accId")

  private def genes: DataFrame = Seq(
    (11, "a", "protein-coding", 3), (21, "b", "protein-coding", 3),
    (22, "c", "protein-coding", 3), (31, "d", "protein-coding", 3),
    (32, "d2", "protein-coding", 3), (41, "e", "protein-coding", 3),
    (51, "f", "protein-coding", 3), (52, "g", "protein-coding", 3),
    (53, "f2", "protein-coding", 3), (54, "g2", "protein-coding", 3),
    (71, "h", "allele", 3), (81, "i", "protein-coding", 3),
    (82, "i0", "protein-coding", 3)
  ).toDF("rgdId", "geneSymbol", "geneTypeLc", "speciesTypeKey")

  private def rgdIds: DataFrame = Seq(
    (11, "ACTIVE"), (21, "ACTIVE"), (22, "ACTIVE"),
    (31, "WITHDRAWN"), (32, "ACTIVE"), (41, "WITHDRAWN"),
    (51, "WITHDRAWN"), (52, "WITHDRAWN"), (53, "ACTIVE"), (54, "ACTIVE"),
    (71, "ACTIVE"), (81, "ACTIVE"), (82, "WITHDRAWN")
  ).toDF("rgdId", "objectStatus").withColumn("speciesTypeKey",
    org.apache.spark.sql.functions.lit(3))

  private def history: DataFrame = Seq(
    (31, 32), (51, 53), (52, 54)
  ).toDF("oldRgdId", "newRgdId")

  private def mapFor(ids: String*): Map[String, (String, Option[Int])] = {
    val egIds = ids.toDF("egId")
    Resolve.resolutionMap(egIds, xrefs, genes, rgdIds, history)
      .collect().map { r =>
        r.getString(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))
      }.toMap
  }

  test("resolution outcomes: the 8-case table") {
    val m = mapFor("EG1", "EG2", "EG3", "EG4", "EG5", "EG6", "EG7", "EG8")
    assert(m("EG1") == ("matched", Some(11)))
    assert(m("EG2") == ("multiple", None))
    assert(m("EG3") == ("matched", Some(32)))
    assert(m("EG4") == ("withdrawn", None))
    assert(m("EG5") == ("multiple", None))
    assert(!m.contains("EG6")) // absent from map -> unmatched downstream
    assert(!m.contains("EG7")) // allele excluded -> no candidates
    assert(m("EG8") == ("matched", Some(81)))
  }

  test("resolveRelations: src failure shadows dest; matched rows resolve ids") {
    val rels = Seq(
      ("EG1", "EG3", 1, 3, "NCBI", "Ortholog"),   // both matched
      ("EG2", "EG1", 1, 3, "NCBI", "Ortholog"),   // src multiple -> dropped
      ("EG1", "EG6", 1, 3, "NCBI", "Ortholog"),   // dest unmatched -> dropped
      ("EG4", "EG6", 1, 3, "NCBI", "Ortholog")    // src withdrawn shadows dest
    ).toDF("srcOtherId", "destOtherId", "srcSpeciesTypeKey",
      "destSpeciesTypeKey", "dataSource", "dataSetName")

    val (resolved, audit) = Resolve.resolveRelations(rels, xrefs, genes, rgdIds, history)
    val res = resolved.select("srcRgdId", "destRgdId").as[(Int, Int)].collect()
    assert(res.toSeq == Seq((11, 32)))

    val outcomes = audit.groupBy("outcome").count().as[(String, Long)]
      .collect().toMap
    assert(outcomes == Map("matched" -> 1L, "multiple" -> 1L,
      "unmatched" -> 1L, "withdrawn" -> 1L))

    // src failure shadows dest: the EG4->EG6 row reports withdrawn/src
    val side = audit.filter($"srcOtherId" === "EG4")
      .select("outcome", "failedSide").as[(String, String)].head()
    assert(side == ("withdrawn", "src"))
  }
}
