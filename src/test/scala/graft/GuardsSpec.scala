package graft

import graft.operators.Reports
import graft.sources.Readers

/** D4 sanity floor (OrthologRelationParser.java:47-49) and D5 Alliance
  * freshness gate (OrthologRelationLoadingManager.java:287-298). */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("D4: sanity floor passes at/above the floor, aborts below it") {
    val big = (1 to 10).map(i => (i, i + 1)).toDF("srcRgdId", "destRgdId")
    assert(Readers.requireSanityFloor(big, floor = 10).count() == 10)

    val small = (1 to 9).map(i => (i, i + 1)).toDF("srcRgdId", "destRgdId")
    val e = intercept[IllegalArgumentException] {
      Readers.requireSanityFloor(small, floor = 10)
    }
    assert(e.getMessage.contains("POSSIBLE PROBLEM WITH SOURCE FILE"))
  }

  test("D5: freshness gate passes fresh state, aborts stale or empty state") {
    val now = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    def agr(ts: String) = Seq((1, 2, java.sql.Timestamp.valueOf(ts)))
      .toDF("geneRgdId1", "geneRgdId2", "lastUpdateDate")

    Reports.checkAllianceFreshness(agr("2026-07-01 00:00:00"), now) // 31d: ok

    val stale = intercept[IllegalArgumentException] {
      Reports.checkAllianceFreshness(agr("2026-05-01 00:00:00"), now) // 92d
    }
    assert(stale.getMessage.contains("stale"))

    val empty = intercept[IllegalArgumentException] {
      Reports.checkAllianceFreshness(
        Seq.empty[(Int, Int, java.sql.Timestamp)]
          .toDF("geneRgdId1", "geneRgdId2", "lastUpdateDate"), now)
    }
    assert(empty.getMessage.contains("empty"))
  }
}
