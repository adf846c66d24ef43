package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Fixtures, OrthologPipeline}

/** Phase-level wall-clock profile of the flagship pipeline (each phase
  * boundary is a localCheckpoint, so timing construction = timing the
  * phase). */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val st = Fixtures.state(spark, dir)
    val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")

    // two iterations: the first carries JVM/codegen warmup, the second is
    // the steady-state per-phase cost
    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val rel = timed("read relations") {
        val r = Fixtures.relations(spark, dir).localCheckpoint(); r.count(); r
      }
      val (resolved, _) = timed("resolve") {
        val p = graft.operators.Resolve.resolveRelations(
          rel, st.xrefs, st.genes, st.rgdIds, st.history)
        (p._1.localCheckpoint(), p._2)
      }
      val merged = timed("group+complement") {
        graft.operators.Grouping.withComplementaryRelations(
          graft.operators.Grouping.mergeRelations(
            graft.operators.Resolve.dropUnmapped(resolved))).localCheckpoint()
      }
      val cands = timed("cascade:candidates") {
        graft.operators.Cascade.candidates(merged, st.orthologs,
          st.agrOrthologs, st.genes).localCheckpoint()
      }
      println(s"  candidate rows: ${cands.count()}")
      timed("cascade:pick(agg)") {
        graft.operators.Cascade.pickStrongOrthologsAgg(cands, st.genes)
          .write.format("noop").mode("overwrite").save()
      }
      val picks = timed("cascade") {
        graft.operators.Cascade.run(merged, st.orthologs, st.agrOrthologs,
          st.genes).localCheckpoint()
      }
      timed("reconcile") {
        val incoming = picks.select(col("srcRgdId"), col("destRgdId"),
          col("srcSpeciesTypeKey"), col("destSpeciesTypeKey"),
          col("xrefDataSrc"), col("xrefDataSet"))
        val r = graft.operators.Merge.reconcile(incoming, st.orthologs,
          st.genes, runTs, graft.model.Species.RAT)
        r.newState.localCheckpoint().count(); r
      }
      timed("full runSpecies") {
        val r = OrthologPipeline.runSpecies(rel, st, graft.model.Species.RAT, runTs)
        r.strongPicks.write.format("noop").mode("overwrite").save()
        r.associations.write.format("noop").mode("overwrite").save()
      }
      // AGR flow step timing
      val agrTs = java.sql.Timestamp.valueOf("2026-08-01 12:00:00")
      val agrCut = java.sql.Timestamp.valueOf("2026-08-01 11:00:00")
      val lines = Fixtures.allianceLines(spark, dir)
      timed("agr:initialCount") { st.agrOrthologs.count() }
      val resolvedAgr = timed("agr:resolveCuries") {
        val curies = lines.select(col("curie1").as("curie"),
            col("geneSymbol1").as("geneSymbol"),
            col("speciesTypeKey1").as("speciesTypeKey"))
          .unionByName(lines.select(col("curie2").as("curie"),
            col("geneSymbol2").as("geneSymbol"),
            col("speciesTypeKey2").as("speciesTypeKey")))
          .distinct()
        val maxRgd = st.genes.agg(coalesce(max(col("rgdId")), lit(0))).first().getInt(0)
        graft.operators.Agr.assignNewGenes(
          graft.operators.Agr.resolveCuries(curies, st.xrefs, st.genes, st.rgdIds),
          maxRgd).localCheckpoint()
      }
      println(s"  resolved curies: ${resolvedAgr.count()}")
      timed("agr:full run") {
        val r = graft.pipeline.AgrPipeline.run(lines, st.agrOrthologs, st.xrefs,
          st.genes, st.rgdIds, agrTs, agrCut)
        r.agrOrthologs.write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
