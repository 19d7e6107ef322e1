package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Interleaved A/B of the wedge-generation formulations (self-join vs
 * grouped-pairs) on the REAL q22/q37 inputs at sf0.1 — same session,
 * alternating runs, min-of-3 per side, so environment drift (the
 * r13-r15 adjudication lesson) cancels instead of deciding.
 */
object WedgeAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val events = spark.read.parquet(s"$sfDir/events.parquet")

    // q22-shaped edges
    def edges22 = events.select(
      (col("user_id") % 997).as("src"),
      ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 997).as("dst"))
    def und(e: DataFrame) = e
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    def degrees(u: DataFrame) = u.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    def orientedOf(u: DataFrame): DataFrame = {
      val deg = degrees(u)
      val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
      u.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
        .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
          when(fwd, col("b")).otherwise(col("a")).as("v"),
          when(fwd, col("db")).otherwise(col("da")).as("dv"))
        .localCheckpoint()
    }

    def triJoin(): DataFrame = {
      val oriented = orientedOf(und(edges22))
      val tri = oriented.as("e1")
        .join(oriented.as("e2"),
          col("e1.u") === col("e2.u") &&
            struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
        .join(oriented.as("e3"),
          col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
        .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    }
    def triGrouped(): DataFrame = {
      val oriented = orientedOf(und(edges22))
      val wedges = oriented
        .groupBy("u").agg(collect_list(struct(col("dv"), col("v"))).as("ns"))
        .filter(size(col("ns")) >= 2)
        .select(col("u"), explode(graft.operators.DedupOps.orderedPairs("ns")).as("p"))
        .select(col("u").as("x"), col("p.id_a.v").as("y"), col("p.id_b.v").as("z"))
      val tri = wedges.join(oriented.as("e3"),
          col("e3.u") === col("y") && col("e3.v") === col("z"))
        .select(col("x"), col("y"), col("z"))
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    }

    // q37-shaped link prediction candidate counts
    def edges37 = events.select(
      (col("user_id") % 9973).as("src"),
      ((col("user_id") + get_json_object(col("props"), "$.k").cast("long")) % 9973).as("dst"))
    def cnJoin(): DataFrame = {
      val u = und(edges37).localCheckpoint()
      val deg = degrees(u)
      val adj = u.select(col("a").as("node"), col("b").as("nbr"))
        .union(u.select(col("b").as("node"), col("a").as("nbr")))
      val capped = adj.join(deg.filter(col("deg") <= 500L), "node")
        .select(col("node"), col("nbr"))
      capped.as("x")
        .join(capped.as("y"), col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
        .select(col("x.nbr").as("node_a"), col("y.nbr").as("node_b"))
        .groupBy("node_a", "node_b").agg(count(lit(1)).as("common"))
        .filter(col("common") >= 10L)
    }
    def cnGrouped(): DataFrame = {
      val u = und(edges37).localCheckpoint()
      val adj = u.select(col("a").as("node"), col("b").as("nbr"))
        .union(u.select(col("b").as("node"), col("a").as("nbr")))
      adj.groupBy("node").agg(collect_list(col("nbr")).as("ns"))
        .filter(size(col("ns")) >= 2 && size(col("ns")) <= 500)
        .select(explode(graft.operators.DedupOps.orderedPairs("ns")).as("p"))
        .select(col("p.id_a").as("node_a"), col("p.id_b").as("node_b"))
        .groupBy("node_a", "node_b").agg(count(lit(1)).as("common"))
        .filter(col("common") >= 10L)
    }

    // q41-shaped bipartite projection (doc -> host incidence, 2 hosts/doc)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def he = docs.select(col("doc_id").as("left"),
        concat(lit("h"), col("doc_id") % 23).as("right"))
      .union(docs.select(col("doc_id").as("left"),
        concat(lit("h"), expr("doc_id div 3") % 23).as("right")))
    def bpJoin(): DataFrame = {
      val inc = he.select(col("left"), col("right")).distinct()
      val ldeg = inc.groupBy("left").agg(count(lit(1)).as("ld"))
      val capped = inc.join(ldeg.filter(col("ld") <= 100L), "left")
        .select(col("left"), col("right"))
      capped.as("x")
        .join(capped.as("y"),
          col("x.left") === col("y.left") && col("x.right") < col("y.right"))
        .select(col("x.right").as("node_a"), col("y.right").as("node_b"))
        .groupBy("node_a", "node_b").agg(count(lit(1)).as("w"))
    }
    def bpGrouped(): DataFrame =
      he.groupBy("left").agg(collect_set(col("right")).as("rs"))
        .filter(size(col("rs")) >= 2 && size(col("rs")) <= 100)
        .select(explode(graft.operators.DedupOps.orderedPairs("rs")).as("p"))
        .select(col("p.id_a").as("node_a"), col("p.id_b").as("node_b"))
        .groupBy("node_a", "node_b").agg(count(lit(1)).as("w"))

    // warmup both shapes once
    materialize(triJoin()); materialize(triGrouped())
    materialize(cnJoin()); materialize(cnGrouped())
    materialize(bpJoin()); materialize(bpGrouped())
    graft.core.Blocks.releaseAll(spark)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "tri_join" -> (() => triJoin()), "tri_grouped" -> (() => triGrouped()),
      "cn_join" -> (() => cnJoin()), "cn_grouped" -> (() => cnGrouped()),
      "bp_join" -> (() => bpJoin()), "bp_grouped" -> (() => bpGrouped()))
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (pass <- 1 to 3; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      materialize(fn())
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) ::= dt
      graft.core.Blocks.releaseAll(spark)
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"$name%-12s min=${ts.min}%.2f  all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
