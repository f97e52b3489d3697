package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables(spark, dir, "embeddings")
  // the fixture embeddings are near-uniform random — the HARDEST case
  // for PQ (no cluster structure to exploit), so the spec uses fine
  // subspaces (dsub=2, 64 centroids: 32 bytes/vector vs 512 raw).
  // Real text embeddings sit on much lower-dimensional manifolds and
  // quantize far better at coarser settings. Probed on this fixture:
  // m=8/nc=16 → recall@10 0.34; m=16/nc=64 → 0.60; m=32/nc=64 → 0.84.
  private lazy val model = ProductQuantizer.train(
    emb, "vec_id", "embedding", m = 32, ncent = 64, iters = 10)

  test("training is a pure function of the corpus") {
    val again = ProductQuantizer.train(
      emb, "vec_id", "embedding", m = 32, ncent = 64, iters = 10)
    assert(model.codebooks.flatten.flatten.toSeq ==
      again.codebooks.flatten.flatten.toSeq)
    assert(model.dsub * model.m == model.dim)
  }

  test("map-side encode matches the driver-side encoder, any partitioning") {
    val rows = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
    val sparkCodes = ProductQuantizer.encode(rows.repartition(7), "vec", model)
      .select(col("vec_id"), col("pq_codes"))
      .as[(Long, Seq[Int])].collect().toMap
    rows.as[(Long, Seq[Double])].collect().foreach { case (id, v) =>
      assert(sparkCodes(id) == model.encodeOne(v.toArray).toSeq,
        s"vec $id encodes differently map-side vs driver-side")
    }
  }

  test("low-diversity subspaces pad to uniform codebook length") {
    // subspace 0 of these vectors has only TWO distinct subvectors
    // while subspace 1 has eight — kmeans seeds from distinct
    // subvectors, so without padding codebooks(0) would be shorter
    // than codebooks(1) and the flat ADC table layout would misindex
    val vecs = Seq.tabulate(16)(i =>
      (i.toLong, Seq((i % 2).toDouble, (i % 2).toDouble,
        (i % 8).toDouble, (i * 3 % 8).toDouble)))
      .toDF("id", "vec")
    val m = ProductQuantizer.train(vecs, "id", "vec", m = 2, ncent = 8,
      sampleN = 16, iters = 3)
    assert(m.codebooks.forall(_.length == m.ncent),
      s"ragged codebooks: ${m.codebooks.map(_.length).toSeq}")
    // padded duplicates never win an encode (strict < tiebreak): every
    // code stays inside the pre-padding range of distinct seeds
    val codes = vecs.as[(Long, Seq[Double])].collect()
      .map { case (_, v) => m.encodeOne(v.toArray) }
    assert(codes.forall(c => c(0) < 2), "padding centroid won an encode")
    // a hand-built ragged model fails loudly instead of misindexing
    intercept[IllegalArgumentException] {
      ProductQuantizer.PqModel(4, 2, Array(
        Array(Array(0.0, 0.0)),
        Array(Array(0.0, 0.0), Array(1.0, 1.0))))
    }
  }

  test("quantization reduces distortion far below the global-mean baseline") {
    val vecs = emb.select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val mean = Array.tabulate(model.dim)(i => vecs.map(_(i)).sum / vecs.length)
    val distPq = vecs.map(v => sq(v, model.decode(model.encodeOne(v)))).sum
    val distMean = vecs.map(v => sq(v, mean)).sum
    assert(distPq < distMean * 0.1,
      s"PQ distortion $distPq not materially below baseline $distMean")
  }

  test("ADC search recalls most exact neighbors and never shuffles the corpus") {
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val k = 10
    val exact = VectorSearch.knn(corpus, "id", "vec", queries,
      "query_id", "qvec", k)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val encoded = ProductQuantizer.encode(corpus, "vec", model)
    val approx = ProductQuantizer.search(encoded, "id", "pq_codes",
      queries, "query_id", "qvec", model, k)
    val got = approx.select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q =>
      (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble / k).sum /
      exact.size
    assert(recall >= 0.7, f"ADC recall@$k = $recall%.2f below 0.7")
    // self-neighbor sanity: each query's own vector must rank first
    approx.filter(col("rank") === 1).select("query_id", "id")
      .as[(Long, Long)].collect().foreach { case (q, id) =>
        assert(q == id, s"query $q's ADC rank-1 is $id, not itself")
      }
    // scale shape: the scored scan must rank through the partial
    // bounded-heap aggregate, not a per-query window sort
    approx.collect()
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator"),
      "PQ search lost the grouped bounded-heap aggregate:\n" + plan)
  }

  test("IVFPQ with all cells probed equals the plain PQ scan; pruned " +
      "probes keep material recall") {
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val k = 10
    val index = VectorSearch.buildIvf(corpus, "id", "vec", nCells = 8)
    val cells = ProductQuantizer.encodeIvf(index, "vec", model)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id", "rank").as[(Long, Long, Int)]
        .collect().toSet
    // nprobe = nCells scans everything → must EQUAL the flat ADC scan
    val full = rows(ProductQuantizer.searchIvfPq(index, cells, queries,
      "query_id", "qvec", model, k, nprobe = 8))
    val flat = rows(ProductQuantizer.search(
      ProductQuantizer.encode(corpus, "vec", model), "id", "pq_codes",
      queries, "query_id", "qvec", model, k))
    assert(full == flat,
      "all-cells IVFPQ diverged from the flat PQ scan")
    // pruned probes: recall vs the EXACT neighbors stays material
    val exact = VectorSearch.knn(corpus, "id", "vec", queries,
        "query_id", "qvec", k)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pruned = ProductQuantizer.searchIvfPq(index, cells, queries,
        "query_id", "qvec", model, k, nprobe = 4)
      .select("query_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq.map(q =>
      (pruned.getOrElse(q, Set.empty) & exact(q)).size.toDouble / k)
      .sum / exact.size
    assert(recall >= 0.4, f"IVFPQ recall@$k = $recall%.2f below 0.4")
  }

  test("persisted IVFPQ layout: partition pruning AND the ADC literal " +
      "in ONE executed plan, results identical to in-memory") {
    val corpus = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val queries = corpus.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val k = 10
    val index = VectorSearch.buildIvf(corpus, "id", "vec", nCells = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq").toString
    ProductQuantizer.writeIvfPq(index, "vec", model, dir)
    val onDisk = ProductQuantizer.readIvfPq(spark, dir)
    val hits = ProductQuantizer.searchIvfPq(index, onDisk, queries,
      "query_id", "qvec", model, k, nprobe = 2)
    val got = hits.select("query_id", "id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val mem = ProductQuantizer.searchIvfPq(index,
        ProductQuantizer.encodeIvf(index, "vec", model), queries,
        "query_id", "qvec", model, k, nprobe = 2)
      .select("query_id", "id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == mem, "persisted IVFPQ diverged from in-memory")
    // the r10 stretch contract: the probe's static cell filter reaches
    // the parquet scan as PartitionFilters (probes read nprobe
    // directories) while the distance is the primitive-table ADC
    // literal — both in the SAME executed plan
    val plan = hits.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("""PartitionFilters: \[[^\]]*cell#\d+ (IN|=)""".r
      .findFirstIn(plan).isDefined,
      "cell probe did not become a parquet partition filter:\n" + plan)
    assert(plan.contains("graft_pq_adc_lit"),
      "ADC literal lookup missing from the pruned plan:\n" + plan)
  }
}
