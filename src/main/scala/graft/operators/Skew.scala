package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handles most hot-key cases at runtime, but only for
  * sort-merge joins whose skewed side is directly readable from shuffle
  * files; when the skewed side is mid-pipeline (feeding an aggregation in
  * the same stage) or the join must stay a shuffled hash join, salting is
  * the manual fallback: the big side scatters each hot key across `salts`
  * sub-keys, the dimension side replicates `salts` times, and the join
  * key becomes (key, salt) - one hot key now lands on `salts` reducers.
  *
  * Row->salt assignment uses a seeded uniform draw: correctness never
  * depends on WHICH salt a row gets (the dimension side carries every
  * salt), only on balance.
  */
object Skew {

  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = big.withColumn("__salt",
      floor(rand(42) * salts).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
