package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Fixtures

/** Throwaway decomposition probe for the cascade phase. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val st = Fixtures.state(spark, dir)
    val rel = Fixtures.relations(spark, dir).localCheckpoint()
    rel.count()
    val merged = graft.operators.Grouping.withComplementaryRelations(
      graft.operators.Grouping.mergeRelations(
        graft.operators.Resolve.dropUnmapped(
          graft.operators.Resolve.resolveRelations(
            rel, st.xrefs, st.genes, st.rgdIds, st.history)._1))).localCheckpoint()
    println(s"merged rows: ${merged.count()}")

    val cands = timed("candidates build+count") {
      val c = graft.operators.Cascade.candidates(
        merged, st.orthologs, st.agrOrthologs, st.genes).localCheckpoint()
      println(s"candidate rows: ${c.count()}")
      c
    }
    timed("group-size stats") {
      cands.groupBy(col("groupId"), col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("groups"), max(col("n")).as("maxN"),
          avg(col("n")).as("avgN"),
          sum(when(col("n") > 100, 1).otherwise(0)).as("gt100"))
        .show(false)
    }
    timed("pick (current impl)") {
      graft.operators.Cascade.pickStrongOrthologs(cands, st.genes)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
