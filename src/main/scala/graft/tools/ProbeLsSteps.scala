package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, LabelStore}
object ProbeLsSteps {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", Some(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime()-t0)/1e9}%7.1f s"); r
    }
    val n = 2000000L
    val lab = spark.range(n).select(col("id").as("node"), (col("id")-pmod(col("id"),lit(5L))).as("label"))
    val path = java.nio.file.Files.createTempDirectory("graft_probe_steps_").toString
    timeIt("seed write 4096 buckets") { LabelStore.write(lab, path, nBuckets = 4096) }
    val batch = spark.range(400)
      .select((col("id")*5000L+2L).as("id_a"), (col("id")*5000L+7L).as("id_b"))
      .unionByName(spark.range(100).select((col("id")+900000000L).as("id_a"), (col("id")+900001000L).as("id_b")))
      .persist(); batch.count()
    val p = batch.select(col("id_a").as("u"), col("id_b").as("v")).persist(); p.count()
    val batchNodes = p.select(col("u")).unionByName(p.select(col("v").as("u"))).distinct().persist()
    val nbs = timeIt("collect nb buckets") {
      batchNodes.select(pmod(col("u"), lit(4096L)).as("b")).distinct().collect().map(_.getLong(0)).toSeq.sorted }
    println(s"  nbs=${nbs.size}")
    val raw = timeIt("spark.read.parquet(byn) [listing]") { spark.read.parquet(s"$path/byn") }
    val litsAny: Seq[Any] = raw.schema("nb").dataType match {
      case org.apache.spark.sql.types.IntegerType => nbs.map(_.toInt)
      case org.apache.spark.sql.types.LongType => nbs
      case _ => nbs.map(_.toString) }
    val pruned = raw.filter(col("nb").isin(litsAny: _*)).filter(col("run") =!= "b0").select("node","label")
    timeIt("pruned byn count") { println("  rows="+pruned.count()) }
    val batchCurrent = timeIt("batchCurrent") {
      val bc = pruned.join(batchNodes, col("node")===col("u"), "left_semi")
        .groupBy("node").agg(min(col("label")).as("label")).persist()
      bc.count(); bc }
    val touched = batchCurrent.select("label").distinct().persist()
    val cbs = timeIt("collect cb buckets") {
      touched.select(pmod(col("label"), lit(4096L)).as("b")).distinct().collect().map(_.getLong(0)).toSeq.sorted }
    println(s"  cbs=${cbs.size}")
    val rawC = timeIt("spark.read.parquet(byc) [listing]") { spark.read.parquet(s"$path/byc") }
    val membs = timeIt("members count") {
      val m = rawC.filter(col("cb").isin(cbs.map(x=>x:Any): _*)).filter(col("run") =!= "b0")
        .select("node","label").join(touched, Seq("label"), "left_semi").persist()
      println("  m="+m.count()); m }
    val stars = membs.filter(col("node")=!=col("label")).select(col("node").as("u"), col("label").as("v"))
    val sub = timeIt("CC.run over stars+pairs") { ConnectedComponents.run(stars.unionByName(p), "u", "v") }
    val delta = timeIt("delta anti-join + ckpt") {
      sub.join(membs.unionByName(batchCurrent), Seq("node","label"), "left_anti").localCheckpoint(true) }
    timeIt("write delta byc") {
      graft.llm.RunSlots.write(delta.withColumn("cb", pmod(col("label"), lit(4096L))).repartition(col("cb")), s"$path/byc", "cb", Some("b0")) }
    timeIt("write delta byn") {
      graft.llm.RunSlots.write(delta.withColumn("nb", pmod(col("node"), lit(4096L))).repartition(col("nb")), s"$path/byn", "nb", Some("b0")) }
    spark.stop()
  }
}
