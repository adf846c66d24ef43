package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Species, XdbKeys}
import graft.operators.Agr

/** Degenerate-hot-symbol probe for the AGR resolution cascade (PLANS.md
  * "q_agr_counts trend" / the round-8 exp-1.54 attribution): builds a
  * gene dimension where ONE symbol carries 50% of all genes and a curie
  * stream where 50% of curies name that symbol, runs the PRODUCTION
  * [[Agr.resolveCuries]] symbol branch, and measures what the
  * per-(symbol, species) pre-aggregation guarantees:
  *
  *   - output cardinality == distinct curies (NO fanout: the hot
  *     symbol's thousands of genes collapse to one min-rgdId row
  *     BEFORE the join touches the curie stream)
  *   - max per-task shuffle-read bytes of the executed plan stays flat
  *     as the hot group grows (the straggler bound)
  *
  * A NAIVE variant (join genes by symbol first, aggregate after) is
  * timed alongside as the negative control - its join output is
  * |hot curies| x |hot genes| rows, the quadratic blowup the
  * production shape is immune to.
  *
  * Usage: sbt "runMain graft.tools.AgrHotSymbolProbe [nGenes] [nCuries]"
  */
object AgrHotSymbolProbe {
  def main(args: Array[String]): Unit = {
    val nGenes = if (args.length > 0) args(0).toInt else 200000
    val nCuries = if (args.length > 1) args(1).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // gene dimension: ids 1..nGenes, EVERY EVEN id shares the one hot
    // symbol (50% of genes); odd ids get unique symbols
    val genes = spark.range(1, nGenes + 1).select(
        col("id").cast("int").as("rgdId"),
        when(col("id") % 2 === 0, "HOTSYM")
          .otherwise(concat(lit("SYM"), col("id"))).as("geneSymbol"),
        lit("g").as("geneName"), lit("protein-coding").as("geneTypeLc"),
        lit(Species.HUMAN).as("speciesTypeKey"),
        lit("E").as("ensemblGeneSymbol"))
      .persist()
    val rgdIds = genes.select(col("rgdId"), lit("ACTIVE").as("objectStatus"),
      col("speciesTypeKey"))
    // no curie/special xrefs: every curie falls through to the SYMBOL step
    val xrefs = Seq.empty[(Long, Int, Int, String, String, java.sql.Timestamp)]
      .toDF("accXdbKey", "rgdId", "xdbKey", "accId", "srcPipeline",
        "modificationDate")
    // curie stream: 50% name the hot symbol, the rest name unique symbols
    val curies = spark.range(1, nCuries + 1).select(
        concat(lit("AGR:"), col("id")).as("curie"),
        when(col("id") % 2 === 0, "HOTSYM")
          .otherwise(concat(lit("SYM"), col("id") % lit(nGenes.toLong)))
          .as("geneSymbol"),
        lit(Species.HUMAN).as("speciesTypeKey"))
      .persist()
    genes.count(); curies.count()

    val hotGenes = genes.filter(col("geneSymbol") === "HOTSYM").count()
    println(s"AGRPROBE fixture: genes=$nGenes hotGenes=$hotGenes " +
      s"curies=$nCuries (50% name the hot symbol)")

    def timed(label: String)(df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      val maxTask = PlanMetrics.maxShuffleTaskBytes(
        PlanMetrics.finalPlan(df.queryExecution))
      println(f"AGRPROBE $label%-12s sec=$sec%7.2f " +
        f"maxShuffleTaskBytes=$maxTask%d")
      df
    }

    // PRODUCTION shape: resolveCuries (symbol branch pre-aggregates
    // genes per (symbol, species) BEFORE joining the curie stream)
    val resolved = Agr.resolveCuries(curies, xrefs, genes, rgdIds)
    timed("production")(resolved)
    val outRows = resolved.count()
    val distinctCuries = curies.distinct().count()
    println(s"AGRPROBE production rows=$outRows distinctCuries=$distinctCuries " +
      s"fanout=${if (outRows == distinctCuries) "NONE" else "YES - BUG"}")
    // hot curies must resolve to the min rgd id of the hot group (2)
    val hotPick = resolved.filter(col("geneSymbol") === "HOTSYM")
      .select(countDistinct(col("rgdId")), min(col("rgdId"))).first()
    println(s"AGRPROBE hot symbol: distinctPicks=${hotPick.getLong(0)} " +
      s"pick=${hotPick.getInt(1)} (expect 1 pick = min id 2)")

    // NEGATIVE CONTROL: join first, aggregate after - the fanout the
    // pre-aggregation removes (|hot curies| x |hot genes| join rows).
    // Run at 1/10 scale on both sides: the full fixture's control would
    // materialize (nCuries/2) x (nGenes/2) = O(10^9) join rows, which
    // is exactly the blowup being demonstrated - the 1/100-sized join
    // is already orders of magnitude past the production bound.
    val gSmall = genes.filter(col("rgdId") <= nGenes / 10)
    val cSmall = curies.filter(
      graft.functions.Exprs.stripPrefixToInt(col("curie"), 4) <= nCuries / 10)
    val naive = cSmall
      .join(gSmall.select(col("geneSymbol"), col("speciesTypeKey"),
          col("rgdId")),
        Seq("geneSymbol", "speciesTypeKey"), "left")
      .groupBy(col("curie"), col("geneSymbol"), col("speciesTypeKey"))
      .agg(min(col("rgdId")).as("rgdId"))
    timed("naive-1/10")(naive)
    println(s"AGRPROBE naive hot-key join rows at 1/10 scale = " +
      s"${nCuries / 20}L x ${hotGenes / 10}L = " +
      s"${(nCuries / 20).toLong * (hotGenes / 10)}")

    spark.stop()
  }
}
