package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join semantics: identical rows to the plain join, and the
  * physical join key carries the salt (so one hot key spreads over
  * `salts` reducers). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join rows on a skewed key") {
    // 10k rows, 90% on one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "payload")
    val dim = (0 to 7).map(i => (i, s"name$i")).toDF("k", "name")

    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), salts = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the join condition includes the salt column
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }
}
