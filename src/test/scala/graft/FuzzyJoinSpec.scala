package graft

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletion-neighborhood pairs: complete at dist<=1, verified") {
    val d = Seq(
      (1L, "cat"),  // vs bat: substitution at position 0 (prefix
      (2L, "bat"),  //   blocking would miss this; deletion keys catch it)
      (3L, "cats"), // vs cat: insertion at the end
      (4L, "ct"),   // vs cat: deletion in the middle
      (5L, "dog"),  // no neighbors
      (6L, "ab"),   // vs ba: shares deletion keys {a, b} but dist 2 -
      (7L, "ba"),   //   the exact-verify stage must reject it
      (8L, "cat")   // duplicate of 1: dist 0
    ).toDF("id", "name")
    val got = FuzzyJoin.levenshteinPairs(d)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 1), (1L, 8L, 0),
      (2L, 7L, 1), // bat vs ba: trailing deletion
      (2L, 8L, 1), (3L, 8L, 1), (4L, 8L, 1)))
  }

  test("property: pairs equal brute force on random short strings") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 3) {
      val n = 30
      val strs = (0L until n).map(i =>
        i -> (0 until (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val got = FuzzyJoin.levenshteinPairs(strs.toDF("id", "name"))
        .as[(Long, Long, Int)].collect().toSet
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      val expect = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = lev(sa, sb) if d <= 1
      } yield (ia, ib, d)).toSet
      assert(got == expect)
    }
  }
}
