package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorCentroidSpec extends SparkSpec {
  import spark.implicits._

  test("centroid equals the element-wise mean, any partitioning") {
    val df = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (0, Seq(5.0, 6.0)),
      (1, Seq(10.0, 0.0)))
      .toDF("label", "vec").repartition(5)
    val out = df.groupBy("label")
      .agg(VectorCentroid.column(col("vec")).as("centroid"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(out(0) == Seq(3.0, 4.0))
    assert(out(1) == Seq(10.0, 0.0))
  }

  test("centroid over the embeddings table matches the relational mean") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("label"), col("embedding").cast("array<double>").as("vec"))
    val agg = emb.groupBy("label")
      .agg(VectorCentroid.column(col("vec")).as("centroid"))
    val relational = emb
      .select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
    val joined = agg
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "c")))
      .join(relational, Seq("label", "pos"))
      .select(abs(col("c") - col("m")).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(joined < 1e-9, s"max deviation $joined")
  }

  test("empty group yields an empty centroid") {
    val df = Seq((0, Option.empty[Seq[Double]])).toDF("label", "vec")
    val out = df.groupBy("label")
      .agg(VectorCentroid.column(col("vec")).as("centroid"))
      .as[(Int, Seq[Double])].head()
    assert(out._2.isEmpty)
  }
}
