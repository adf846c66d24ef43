package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.pipeline.Fixtures

/** Job/stage breakdown of the cascade strong-pick aggregation - the
  * hottest single operator of the flagship pipeline at bench scale.
  * Prints per-job wall time and per-stage task-time so fixed scheduling
  * overhead (many small stages) is distinguishable from real compute. */
object PickAggProbe {
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

    val st = Fixtures.state(spark, dir)
    val rel = Fixtures.relations(spark, dir)
    val merged = graft.operators.Grouping.withComplementaryRelations(
      graft.operators.Grouping.mergeRelations(
        graft.operators.Resolve.dropUnmapped(
          graft.operators.Resolve.resolveRelations(
            rel, st.xrefs, st.genes, st.rgdIds, st.history)._1)))
      .localCheckpoint()
    val cands = graft.operators.Cascade.candidates(merged, st.orthologs,
      st.agrOrthologs, st.genes).localCheckpoint()
    println(s"cands rows=${cands.count()} parts=${cands.rdd.getNumPartitions}")

    @volatile var jobs = Vector.empty[(Int, Long, Long, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var stageTaskMs = Vector.empty[(Int, Int, Long)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) jobs :+= ((j.jobId, s._1, System.nanoTime(), s._2))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTaskMs :+= ((sc.stageInfo.stageId, sc.stageInfo.numTasks,
          sc.stageInfo.taskMetrics.executorRunTime))
    }
    spark.sparkContext.addSparkListener(listener)

    for (iter <- 1 to 3) {
      jobs = Vector.empty; stageTaskMs = Vector.empty
      val t0 = System.nanoTime()
      graft.operators.Cascade.pickStrongOrthologsAgg(cands, st.genes)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"--- iter $iter wall=$wall%6.2f s, jobs=${jobs.size}, stages=${stageTaskMs.size}")
      jobs.sortBy(_._2).foreach { case (id, s, e, d) =>
        println(f"  job $id%3d ${(e - s) / 1e9}%6.2f s  ${d.take(80)}")
      }
      val byTask = stageTaskMs.sortBy(-_._3).take(8)
      byTask.foreach { case (sid, n, ms) =>
        println(f"  stage $sid%4d tasks=$n%3d taskTime=${ms}ms")
      }
    }
    spark.stop()
  }
}
