package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Fixtures

/** Throwaway A/B: window-based vs aggregation-based cascade pick. */
object Scratch3 {
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
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val st = Fixtures.state(spark, dir)
    val rel = Fixtures.relations(spark, dir).localCheckpoint()
    val merged = graft.operators.Grouping.withComplementaryRelations(
      graft.operators.Grouping.mergeRelations(
        graft.operators.Resolve.dropUnmapped(
          graft.operators.Resolve.resolveRelations(
            rel, st.xrefs, st.genes, st.rgdIds, st.history)._1))).localCheckpoint()
    val cands = graft.operators.Cascade.candidates(
      merged, st.orthologs, st.agrOrthologs, st.genes).localCheckpoint()
    cands.count()

    val oldP = timed("window pick") {
      val d = graft.operators.Cascade.pickStrongOrthologs(cands, st.genes).localCheckpoint()
      println(s"  rows: ${d.count()}"); d
    }
    val newP = timed("agg pick") {
      val d = graft.operators.Cascade.pickStrongOrthologsAgg(cands, st.genes).localCheckpoint()
      println(s"  rows: ${d.count()}"); d
    }
    println(s"old minus new: ${oldP.exceptAll(newP).count()}")
    println(s"new minus old: ${newP.exceptAll(oldP).count()}")
    // second timing round, warm
    timed("window pick warm") {
      graft.operators.Cascade.pickStrongOrthologs(cands, st.genes)
        .write.format("noop").mode("overwrite").save()
    }
    timed("agg pick warm") {
      graft.operators.Cascade.pickStrongOrthologsAgg(cands, st.genes)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
