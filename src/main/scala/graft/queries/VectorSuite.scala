package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, QuerySuite, Tables}
import graft.functions.{TextOps, VectorOps}

/** Vector / similarity-search operators — SURVEY.md §2.11 (V1-V7) plus
  * the ANN scale path (IVF cell pruning) from the north-star spec.
  *
  * Oracle determinism: embeddings are quantized to longs at 1e6
  * (`VectorOps.quantize`) so every dot/norm/distance is exact integer
  * arithmetic in both engines, with one trailing IEEE sqrt/division.
  *
  * Scale notes (100 TB): the brute-force kNN broadcasts the (small)
  * query set against the corpus — a map-side cross join ranked by the
  * grouped bounded-heap aggregate (per-partition top-k PER QUERY,
  * only groups×k pairs cross the exchange), no corpus shuffle and no
  * per-query single-task sort. The IVF pair
  * (v06/v07) is the real scale design: cluster assignment is a
  * broadcast-8-centroids map pass, and probes prune to one cell —
  * at 1000 executors that's a partition-pruned scan, not a full sweep.
  */
object VectorSuite extends QuerySuite {
  import VectorOps._

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .withColumn("qv", quantize(col("embedding")))

  /** Oracle-side quantized view, shared by all queries below. */
  private val qvSql =
    """SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       FROM embeddings"""

  /** v01 — deterministic hash embedder (V1 test stand-in for the
    * SentenceTransformer; ref `generate_embeddings.py:245-272`): 16-dim
    * signed feature hashing of document tokens, relational form. */
  private val v01 = GraftQuery(
    "v01_hash_embedder",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .withColumn("h", TextOps.md5Long60(col("w")))
        .groupBy(col("doc_id"), (col("h") % 16).as("dim"))
        .agg(sum(when(col("h") % 32 < 16, 1L).otherwise(-1L)).as("feat")),
    Some("""WITH words AS (
      SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
    hashed AS (
      SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1,16), i ->
          CAST(strpos('0123456789abcdef', substring(md5(w),i,1)) - 1 AS BIGINT))),
        (a,b) -> a*16+b) AS h
      FROM words)
    SELECT doc_id, h % 16 AS dim,
      CAST(SUM(CASE WHEN h % 32 < 16 THEN 1 ELSE -1 END) AS BIGINT) AS feat
    FROM hashed GROUP BY 1, 2"""))

  /** v02 — L2 normalize (V2; ref `generate_embeddings.py:267`),
    * row-per-dimension form so the compare is scalar doubles. */
  private val v02 = GraftQuery(
    "v02_l2_normalize",
    (s, dir) =>
      emb(s, dir)
        .withColumn("ss", sumSqQ(col("qv")))
        .select(col("vec_id"), col("ss"),
          posexplode(col("qv")).as(Seq("pos", "q")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          (col("q").cast("double") / sqrt(col("ss").cast("double")))
            .as("comp")),
    Some(s"""WITH q AS ($qvSql),
    ss AS (SELECT vec_id,
      CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS ss FROM q)
    SELECT q.vec_id, CAST(pos AS BIGINT) AS pos,
      CAST(comp AS DOUBLE) / sqrt(CAST(ss AS DOUBLE)) AS comp
    FROM (SELECT vec_id, unnest(qv) AS comp,
            unnest(range(1, 1+len(qv))) AS pos FROM q) q
    JOIN ss ON q.vec_id = ss.vec_id"""))

  /** v03 — brute-force kNN (V5; ref `generate_embeddings.py:418-452`):
    * 10 query vectors against the full corpus, top-5 each by exact
    * quantized L2, total-ordered tiebreak. The query side is broadcast
    * and ranking is the grouped bounded-heap AGGREGATE
    * ([[graft.ops.Ops.topKPerGroupAgg]]): each scan partition keeps a
    * local top-5 per query map-side, so the corpus×queries product is
    * never shuffled and no query funnels through a single-task sort. */
  private val v03 = GraftQuery(
    "v03_knn_bruteforce",
    (s, dir) => {
      val corpus = emb(s, dir).select(col("vec_id"), col("qv"))
      val queries = emb(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("query_qv"))
      val scored = corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("query_qv")))
      graft.ops.Ops.topKPerGroupAgg(scored, Seq("query_id"),
          col("d2"), col("vec_id"), 5, "d2", "neighbor_id", "rnk")
        .select(col("query_id"), col("neighbor_id"),
          (sqrt(col("d2").cast("double")) / 1e6).as("dist"),
          col("rnk").cast("long").as("rnk"))
    },
    Some(s"""WITH q AS ($qvSql),
    pairs AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(range(1, 1+len(c.qv)),
          i -> (c.qv[i]-qs.qv[i])*(c.qv[i]-qs.qv[i]))) AS BIGINT) AS d2
      FROM q c, q qs WHERE qs.vec_id < 10 AND c.vec_id <> qs.vec_id)
    SELECT query_id, neighbor_id, sqrt(CAST(d2 AS DOUBLE)) / 1e6 AS dist,
      CAST(row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id)
        AS BIGINT) AS rnk
    FROM pairs QUALIFY rnk <= 5"""))

  /** v04 — kNN result join-back + similarity score (V4/V6; ref
    * `generate_embeddings.py:471-490`): nearest neighbor per query with
    * its label and score = 1/(1+dist). */
  private val v04 = GraftQuery(
    "v04_knn_joinback",
    (s, dir) => {
      val corpus = emb(s, dir).select(col("vec_id"), col("qv"))
      val queries = emb(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("query_qv"))
      val labels = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("label"))
      // nearest neighbor = per-query argmin: min over struct(d2, id)
      // compares lexicographically (distance, then id tiebreak) and
      // partial-aggregates map-side — no window, no product shuffle
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("query_qv")))
        .groupBy(col("query_id"))
        .agg(min(struct(col("d2"), col("vec_id"))).as("nn"))
        .select(col("query_id"), col("nn.vec_id").as("neighbor_id"),
          (lit(1.0) / (lit(1.0) +
            sqrt(col("nn.d2").cast("double")) / 1e6)).as("score"))
        // no hint: `labels` is the CORPUS-sized id→label map (never
        // broadcastable at scale); the tiny side here is the k-per-query
        // result, and AQE broadcasts THAT from its measured size
        .join(labels, "neighbor_id")
        .select("query_id", "neighbor_id", "label", "score")
    },
    Some(s"""WITH q AS ($qvSql),
    nn AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
        CAST(list_sum(list_transform(range(1, 1+len(c.qv)),
          i -> (c.qv[i]-qs.qv[i])*(c.qv[i]-qs.qv[i]))) AS BIGINT) AS d2
      FROM q c, q qs WHERE qs.vec_id < 10 AND c.vec_id <> qs.vec_id
      QUALIFY row_number() OVER (PARTITION BY qs.vec_id
        ORDER BY d2, c.vec_id) = 1)
    SELECT query_id, neighbor_id, e.label,
      1.0 / (1.0 + sqrt(CAST(d2 AS DOUBLE)) / 1e6) AS score
    FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id"""))

  /** v05 — embedding-cosine near-duplicate pairs (north-star dedup
    * family): sampled same-label pairs with cosine above threshold.
    * The sample bound (vec_id % 7 = 0) stands in for LSH candidate
    * generation, which d03 demonstrates on text.
    *
    * Scale stance: this is the EXACT-within-block baseline, and its
    * cost is quadratic in block size by semantics (all qualifying
    * pairs must be emitted) — measured 28.7× wall for 10× rows at sf1,
    * the registry's only intentionally-superlinear correctness query
    * besides its v09 consumer. The sublinear scale paths for the same
    * family are v14 (LSH-blocked near-dup, 4.7× at sf1) and v17
    * (semantic dedup on IVF cells); at 100 TB you run those and keep
    * this as the small-block verifier. */
  private val v05 = GraftQuery(
    "v05_cosine_pairs",
    (s, dir) => {
      val sampled = emb(s, dir).filter(col("vec_id") % 7 === 0)
        .select(col("vec_id"), col("label"), col("qv"))
      val a = sampled.select(col("vec_id").as("a_id"),
        col("label").as("a_label"), col("qv").as("a_qv"))
      val b = sampled.select(col("vec_id").as("b_id"),
        col("label").as("b_label"), col("qv").as("b_qv"))
      a.join(b, col("a_id") < col("b_id") && col("a_label") === col("b_label"))
        .withColumn("cos", cosineQ(col("a_qv"), col("b_qv")))
        .filter(col("cos") > 0.3)
        .select(col("a_id"), col("b_id"), col("a_label").as("label"),
          col("cos"))
    },
    Some(s"""WITH q AS ($qvSql),
    sampled AS (SELECT * FROM q WHERE vec_id % 7 = 0)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
      CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> a.qv[i]*b.qv[i])) AS BIGINT)::DOUBLE /
        (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS BIGINT)::DOUBLE)
       * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS BIGINT)::DOUBLE))
        AS cos
    FROM sampled a JOIN sampled b
      ON a.vec_id < b.vec_id AND a.label = b.label
    WHERE cos > 0.3"""))

  /** v06 — IVF cell assignment (ANN scale path): nearest of 8 seed
    * centroids (vectors 0..7) per corpus vector. At scale this is the
    * partitioning key for a cell-pruned ANN index. */
  private val v06 = GraftQuery(
    "v06_ivf_assign",
    (s, dir) => {
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      // per-vector argmin over 8 centroids as min(struct): both
      // aggregations partial-combine map-side; the old window form
      // shuffled and sorted the corpus×8 product
      emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d2",
          aggregate(zip_with(col("qv"), col("cent_qv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .groupBy(col("nn.cent_id").as("cell"))
        .agg(count(lit(1)).as("cell_size"))
    },
    Some(s"""WITH q AS ($qvSql),
    assign AS (
      SELECT v.vec_id, c.vec_id AS cell,
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.qv[i])*(v.qv[i]-c.qv[i]))) AS BIGINT) AS d2
      FROM q v, q c WHERE c.vec_id < 8
      QUALIFY row_number() OVER (PARTITION BY v.vec_id
        ORDER BY d2, c.vec_id) = 1)
    SELECT cell, COUNT(*) AS cell_size FROM assign GROUP BY 1"""))

  /** v07 — IVF probe: kNN for query vec 42 restricted to its own cell —
    * the pruned-scan read path of the v06 index. */
  private val v07 = GraftQuery(
    "v07_ivf_probe",
    (s, dir) => {
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      // same min(struct) argmin assignment as v06 — vec rides the
      // group key (functionally dependent on vec_id), never compared
      val assigned = emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d2",
          aggregate(zip_with(col("qv"), col("cent_qv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
        .groupBy(col("vec_id"), col("qv"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("qv"), col("nn.cent_id").as("cell"))
      val probe = assigned.filter(col("vec_id") === 42)
        .select(col("qv").as("probe_qv"), col("cell").as("probe_cell"))
      // top-3 via orderBy+limit (TakeOrderedAndProject — distributed
      // per-partition top-k, no single-partition window over the cell);
      // the rank window then runs over just the k surviving rows.
      val wq = Window.orderBy(col("d2q"), col("vec_id"))
      assigned
        .join(broadcast(probe), col("cell") === col("probe_cell"))
        .filter(col("vec_id") =!= 42)
        .withColumn("d2q",
          aggregate(zip_with(col("qv"), col("probe_qv"),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
        .orderBy(col("d2q"), col("vec_id"))
        .limit(3)
        .withColumn("rnk", row_number().over(wq).cast("long"))
        .select(col("vec_id").as("neighbor_id"), col("cell"),
          (sqrt(col("d2q").cast("double")) / 1e6).as("dist"), col("rnk"))
    },
    Some(s"""WITH q AS ($qvSql),
    assign AS (
      SELECT v.vec_id, v.qv, c.vec_id AS cell,
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.qv[i])*(v.qv[i]-c.qv[i]))) AS BIGINT) AS d2
      FROM q v, q c WHERE c.vec_id < 8
      QUALIFY row_number() OVER (PARTITION BY v.vec_id
        ORDER BY d2, c.vec_id) = 1),
    probe AS (SELECT qv AS probe_qv, cell AS probe_cell
              FROM assign WHERE vec_id = 42)
    SELECT a.vec_id AS neighbor_id, a.cell,
      sqrt(CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
        i -> (a.qv[i]-p.probe_qv[i])*(a.qv[i]-p.probe_qv[i])))
        AS BIGINT)::DOUBLE) / 1e6 AS dist,
      CAST(row_number() OVER (ORDER BY
        list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> (a.qv[i]-p.probe_qv[i])*(a.qv[i]-p.probe_qv[i]))), a.vec_id)
        AS BIGINT) AS rnk
    FROM assign a JOIN probe p ON a.cell = p.probe_cell
    WHERE a.vec_id <> 42 QUALIFY rnk <= 3"""))

  /** v08 — the declarative pgvector idiom `ORDER BY l2_distance(v, q)
    * LIMIT k` (ref `generate_embeddings.py:418-452`), left for the
    * [[graft.plans.KnnTopKRewrite]] optimizer rule to take over: the
    * executed plan is a KnnTopKLocal/Global pair (PlanSpec-asserted),
    * not a Sort — distances evaluated once per row into bounded heaps.
    * Quantized vectors keep the distance sums exact cross-engine. */
  private val v08 = GraftQuery(
    "v08_topk_rewrite",
    (s, dir) => {
      // self-contained: the rewrite must drive this query even if a
      // sibling bench query toggled the session flag off
      s.conf.set("spark.graft.knnTopK.enabled", "true")
      val corpus = emb(s, dir)
        .select(col("vec_id"), col("qv").cast("array<double>").as("qvd"))
      val qvec: Seq[Double] = corpus.filter(col("vec_id") === 0)
        .select("qvd").collect().head.getSeq[Double](0).toIndexedSeq
      corpus.filter(col("vec_id") =!= 0)
        .withColumn("distq",
          call_function("graft_l2_distance", col("qvd"), typedLit(qvec)))
        .orderBy(col("distq"), col("vec_id"))
        .limit(5)
        .select(col("vec_id").as("neighbor_id"),
          (col("distq") / 1e6).as("dist"))
    },
    Some(s"""WITH q AS ($qvSql),
    probe AS (SELECT qv AS pqv FROM q WHERE vec_id = 0)
    SELECT c.vec_id AS neighbor_id,
      sqrt(CAST(list_sum(list_transform(range(1, 1+len(c.qv)),
        i -> (c.qv[i]-p.pqv[i])*(c.qv[i]-p.pqv[i]))) AS BIGINT)::DOUBLE)
        / 1e6 AS dist
    FROM q c, probe p WHERE c.vec_id <> 0
    ORDER BY dist, neighbor_id LIMIT 5"""))

  /** v09 — embedding-cosine near-dup DEDUP end-to-end (the north-star
    * "embedding-cosine near-dup" family closed the same way d08 closes
    * MinHash): v05's verified cosine pairs → connected components →
    * (vec_id, component) survivor labels. Same NearDedup engine path
    * (driver union-find at this edge count, distributed min-label above
    * the threshold); the oracle recomputes components independently as
    * a recursive-CTE transitive closure over the identical pair SQL. */
  private val v09 = GraftQuery(
    "v09_embed_dedup",
    (s, dir) => {
      val pairs = v05.run(s, dir).select("a_id", "b_id")
      graft.ops.NearDedup.components(pairs)
        .select(col("id").cast("long").as("vec_id"),
          col("component").cast("long").as("component"))
    },
    Some(s"""WITH RECURSIVE q AS ($qvSql),
    sampled AS (SELECT * FROM q WHERE vec_id % 7 = 0),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM sampled a JOIN sampled b
        ON a.vec_id < b.vec_id AND a.label = b.label
      WHERE CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> a.qv[i]*b.qv[i])) AS BIGINT)::DOUBLE /
        (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS BIGINT)::DOUBLE)
       * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS BIGINT)::DOUBLE))
          > 0.3),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS vec_id, LEAST(src, MIN(dst)) AS component
    FROM reach GROUP BY src"""))

  /** v10 — distributed centroid update (the Lloyd/k-means step that
    * pairs with v06's assignment, and the relational twin of the
    * [[graft.functions.VectorCentroid]] typed Aggregator): element-wise
    * mean of each label's quantized vectors. posexplode → one
    * sum-aggregate on (label, pos) — partial sums combine map-side, the
    * shuffle carries d rows per label, never vectors — then the
    * shuffle carries d rows per label, never vectors. Output is one
    * row per (label, element) — scalar columns only, since the
    * driver's row comparator cannot sort array cells (the assembled-
    * vector form is [[graft.functions.VectorCentroid]], spec'd).
    * Integer sums are exact cross-engine; the mean divides once. */
  private val v10 = GraftQuery(
    "v10_label_centroid",
    (s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n_vecs"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          col("n_vecs"),
          (col("sx").cast("double") / col("n_vecs")).as("c")),
    Some(s"""WITH q AS ($qvSql),
      px AS (
        SELECT label, p.pos - 1 AS pos, qv[p.pos] AS x
        FROM q, LATERAL (SELECT unnest(range(1, 1 + len(qv))) AS pos) p)
      SELECT label, pos, COUNT(*) AS n_vecs,
        CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / COUNT(*) AS c
      FROM px GROUP BY 1, 2"""))

  /** v11 — sign-bucket LSH ANN (the second ANN scale path beside IVF,
    * SURVEY north-star "LSH-bucketed variant"): 8 fixed integer
    * hyperplanes, bucket = packed sign bits of exact integer dot
    * products (the codegen `graft_dot_long` — at a decision boundary a
    * double dot's sign could flip on summation order; integer sums
    * cannot, so the HASH is bit-identical cross-engine). Queries probe
    * their own bucket plus every 1-bit flip (multiprobe), exact
    * distances within the probed union. Corpus bucketing is map-side
    * literal math; at scale bucket is the partition key. */
  private val v11 = {
    val B = 8
    val planes: Seq[Seq[Long]] = Seq.tabulate(B)(b =>
      Seq.tabulate(16)(i => ((b * 31 + i * 17) % 19 - 9).toLong))
    def duckList(h: Seq[Long]) = h.mkString("[", ",", "]")
    GraftQuery(
      "v11_lsh_ann",
      (s, dir) => {
        def bucket(vec: Column): Column =
          planes.zipWithIndex.map { case (h, b) =>
            when(call_function("graft_dot_long", vec, typedLit(h)) > 0L,
              lit(1L << b)).otherwise(0L)
          }.reduce(_ + _)
        val corpus = emb(s, dir)
          .select(col("vec_id"), col("qv"), bucket(col("qv")).as("bucket"))
        val probes = emb(s, dir).filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("qv").as("query_qv"),
            bucket(col("qv")).as("own"))
          .select(col("query_id"), col("query_qv"),
            explode(array(col("own") +: (0 until B).map(b =>
              col("own").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
        // rank by the exact integer d2 (sqrt is monotone and, at these
        // magnitudes, injective over distinct longs — ulp(8.4e6) ≈
        // 2e-9 << the ~6e-8 gap between adjacent sqrt values), through
        // the grouped bounded-heap aggregate: candidates never shuffle
        val scored = corpus.join(broadcast(probes), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("d2", call_function("graft_sqdist_long",
            col("qv"), col("query_qv")))
        graft.ops.Ops.topKPerGroupAgg(scored, Seq("query_id"),
            col("d2"), col("vec_id"), 5, "d2", "vec_id", "rnk")
          .select(col("query_id"), col("vec_id"),
            (sqrt(col("d2").cast("double")) / 1e6).as("dist"),
            col("rnk").cast("long").as("rnk"))
      },
      Some(s"""WITH q AS ($qvSql),
      hp AS (SELECT * FROM (VALUES
        ${planes.zipWithIndex.map { case (h, b) =>
          s"($b, ${duckList(h)})" }.mkString(",\n        ")})
        AS t(b, h)),
      bucketed AS (
        SELECT vec_id, qv,
          CAST(SUM(CASE WHEN
              CAST(list_sum(list_transform(range(1, 1 + len(qv)),
                i -> qv[i] * h[i])) AS BIGINT) > 0
            THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS bucket
        FROM q, hp GROUP BY vec_id, qv),
      probes AS (
        SELECT vec_id AS query_id, qv AS query_qv,
          unnest(list_concat([bucket],
            list_transform(range(0, $B),
              b -> xor(bucket, 1::BIGINT << b)))) AS bucket
        FROM bucketed WHERE vec_id < 8),
      cand AS (
        SELECT p.query_id, c.vec_id,
          sqrt(CAST(CAST(list_sum(list_transform(range(1, 1 + len(c.qv)),
            i -> (c.qv[i] - p.query_qv[i]) * (c.qv[i] - p.query_qv[i])))
            AS BIGINT) AS DOUBLE)) / 1e6 AS dist
        FROM bucketed c JOIN probes p USING (bucket)
        WHERE c.vec_id <> p.query_id)
      SELECT query_id, vec_id, dist,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY dist, vec_id) AS BIGINT) AS rnk
      FROM cand QUALIFY rnk <= 5"""))
  }

  /** v12 — per-label embedding outliers (the mislabeled/noisy-vector
    * quality signal: the k vectors farthest from their own label's
    * centroid are the rows a curation pass reviews or drops). All
    * arithmetic is integer-exact on the quantized vectors: the
    * centroid's floor-average rides a +OFF shift so the numerator is
    * provably positive — there DuckDB's floor `//` and Spark's
    * truncating `div` agree — and the distance is a plain long sum of
    * squared deviations. The per-(label,pos) centroid frame is
    * dim-sized and broadcasts; the outlier rank goes through the
    * grouped bounded-heap aggregate so the low-cardinality label key
    * never funnels the corpus through |labels| tasks — or any shuffle
    * of the scored rows at all. */
  private val v12 = {
    val Off = 1L << 40 // >> any |avg quantized| (±~1e6) → shifted sums stay positive
    GraftQuery(
      "v12_label_outliers",
      (s, dir) => {
        val px = emb(s, dir).select(col("label"), col("vec_id"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        val cent = px.groupBy("label", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .select(col("label"), col("pos"),
            expr(s"(sx + n * ${Off}L) div n - ${Off}L").as("cx"))
        val d2 = px.join(broadcast(cent), Seq("label", "pos"))
          .groupBy("vec_id", "label")
          .agg(sum((col("x") - col("cx")) * (col("x") - col("cx")))
            .as("d2"))
        // descending top-5 per label through the grouped aggregate —
        // map-side bounded heaps, nothing label-funneled, nothing sorted
        graft.ops.Ops.topKPerGroupAgg(d2, Seq("label"),
            col("d2"), col("vec_id"), 5, "d2", "vec_id", "rnk",
            descending = true)
          .select(col("label"), col("vec_id"), col("d2"),
            col("rnk").cast("long").as("rnk"))
      },
      Some(s"""WITH q AS ($qvSql),
      px AS (SELECT label, vec_id, p.pos, qv[p.pos] AS x
        FROM q, LATERAL (SELECT unnest(range(1, 1 + len(qv))) AS pos) p),
      cent AS (SELECT label, pos,
          (CAST(SUM(x) AS BIGINT) + COUNT(*) * $Off) // COUNT(*) - $Off
            AS cx
        FROM px GROUP BY 1, 2),
      d AS (SELECT px.vec_id, px.label,
          CAST(SUM((px.x - cent.cx) * (px.x - cent.cx)) AS BIGINT) AS d2
        FROM px JOIN cent USING (label, pos) GROUP BY 1, 2)
      SELECT vec_id, label, d2,
        CAST(row_number() OVER (PARTITION BY label
          ORDER BY d2 DESC, vec_id) AS BIGINT) AS rnk
      FROM d QUALIFY rnk <= 5"""))
  }

  // ---- v13: the degraded external-inference lifecycle, end-to-end ----

  /** Deterministic "flaky endpoint" client for v13: per-input md5
    * decides failure, so the degraded paths are a pure function of the
    * data and DuckDB can replay them row-wise. Exercised through the
    * REAL operators (LlmFill retry→fallback, ExternalEmbedder
    * shape-check/retry→zero-vector) at batchSize=1, where per-batch
    * degradation == per-row and is therefore SQL-expressible. */
  object FlakyClient extends graft.embed.InferenceClient {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

    /** 16-dim signed feature hashing — the v01 embedder on `split(t,
      * " ")` tokens, as integer-valued floats (exact in fp32). */
    def featureHash16(t: String): Array[Float] = {
      val v = new Array[Float](16)
      t.split(" ", -1).foreach { tok =>
        val h = TextOps.md5Long60Jvm(tok)
        v((h % 16).toInt) += (if (h % 32 < 16) 1f else -1f)
      }
      v
    }

    override def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        md5hex(t).charAt(0) match {
          case '0' | '1' => throw new RuntimeException("endpoint down")
          case '2' => new Array[Float](8) // wrong shape → rejected
          case _ => featureHash16(t)
        }
      }

    override def complete(prompts: Seq[String]): Seq[String] =
      prompts.map { p =>
        val h = md5hex(p)
        if ("012345".contains(h.charAt(31)))
          throw new RuntimeException("llm down")
        else "gen:" + h.substring(0, 8)
      }
  }

  object FlakyTransport extends graft.embed.InferenceTransport {
    override def cacheKey: String = "v13-flaky"
    override def connect(): graft.embed.InferenceClient = FlakyClient
  }

  /** v13 — the reference's full external-inference lifecycle (§3.3)
    * with its degraded paths, as ONE oracle-paired plan: LlmFill of
    * missing descriptions (fill-only-missing + empty-string fallback
    * after retries, ref `generate_mock_data.py:42-65`) → batched
    * external embedding (zero-vector fallback on thrown AND misshapen
    * responses, ref `generate_embeddings.py:268-272`) → store build
    * (failed rows excluded, observable as absence) →
    * [[graft.embed.EmbeddingPipeline.search]] top-k with catalog
    * join-back. All failure predicates are md5-of-input, so DuckDB
    * replays the exact degradation row-wise. */
  private[graft] val V13QueryText =
    "fresh strawberry cream cake" // md5 head '8': embeds
  /** Since r16 the query runs `search(withTies = true)` — `rank() <=
    * K` semantics — so the hit SET is deterministic at every SF even
    * when a distance tie straddles the rank-K boundary (the pre-r16
    * contract needed K tuned per fixture to dodge ties: K=8 had
    * dist(8)==dist(9) at sf0.1, and the r16 sf1 check hit a 6-member
    * straddle at K=17). V13BoundarySpec pins the with-ties contract
    * against an independent recompute and a constructed straddle. */
  private[graft] val V13K = 17

  /** v13's persisted intermediates, one generation per session.
    * [[graft.embed.EmbeddingPipeline.search]]'s contract says the
    * store is a MATERIALIZED vector table (it scans the store twice;
    * the reference's is a pgvector table, `generate_embeddings.py`
    * writes it before `test_search` reads it) — so v13 persists the
    * store and the LlmFill output instead of re-running the whole
    * degraded pipeline once per scan (LlmFill 3x, embedder 2x: ~2.4 s
    * of pure recompute at sf0.1). Bench iterations rebuild the query
    * from scratch, so each iteration still pays exactly ONE full
    * degraded-pipeline run + persist + search; building a new
    * generation releases the previous one, and [[releaseCaches]]
    * drops the last at session teardown (same lifecycle as
    * DedupSuite/BenchSuite caches). */
  private val v13Frames = scala.collection.concurrent.TrieMap
    .empty[SparkSession, Seq[DataFrame]]

  private def v13Persist(s: SparkSession, dfs: DataFrame*): Unit =
    v13Frames.put(s, dfs)
      // the previous generation belongs to a finished iteration —
      // nothing reads it anymore; async release is safe and keeps the
      // new iteration's timed region free of blocking block-removal
      .foreach(_.foreach(_.unpersist(blocking = false)))

  /** Lifecycle hook, called by Bench/Verify before `spark.stop()`. */
  def releaseCaches(session: SparkSession): Unit =
    v13Frames.remove(session)
      .foreach(_.foreach(_.unpersist(blocking = true)))

  /** v13's store+catalog construction through the REAL degraded-path
    * operators — shared with the V13 boundary-guard spec, which
    * asserts the fixture has no distance tie straddling rank K (the
    * one place where the engine's internal-hash tie order and the
    * oracle's doc_id tiebreak could legally diverge: the SET of hits
    * is the contract, and a tie ACROSS the boundary changes the set). */
  private[graft] def v13StoreCatalog(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import graft.embed.{EmbeddingPipeline, ExternalEmbedder, LlmFill}
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      // the fixture is one small parquet file → ONE input partition →
      // the whole per-row inference chain (MD5 failure predicates +
      // per-token hashing) runs on a single core. One tiny hash
      // shuffle buys full-width mapPartitions parallelism — the same
      // move a real cluster needs when feeding model endpoints from a
      // few large files (inference cost >> shuffle cost, here ~2 s
      // serial vs ~5 ms of shuffle). The count is EXPLICIT because
      // AQE's byte-based advisory coalescing would fold a few-MB
      // shuffle back to one partition — CPU-bound per-row stages want
      // core-count parallelism, not byte-count
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      // a deterministically-holey description column: ~1/7 empty,
      // ~1/11 null — the two "missing" shapes LlmFill must fill
      .withColumn("description",
        when(col("doc_id") % 7 === 0, lit(""))
          .when(col("doc_id") % 11 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("orig_"), col("lang"))))
    val filled = LlmFill.fillMissing(docs, "description",
        concat(lit("describe:"), col("doc_id").cast("string")),
        FlakyTransport, batchSize = 1, maxAttempts = 2)
      // feeds BOTH the store build and the catalog — one LlmFill pass
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // embed text+description so the FILL is visible in distances
    val toEmbed = filled.select(
      col("doc_id").cast("string").as("product_code"),
      concat_ws(" ", col("text"), col("description")).as("text"))
    val store = EmbeddingPipeline.embedDocuments(
        toEmbed, ExternalEmbedder(FlakyTransport, dim = 16,
          maxAttempts = 2), batchSize = 1)
      // zero vectors (thrown OR misshapen endpoint responses) are
      // not indexable — their absence from the result set is the
      // oracle-visible trace of the fallback
      .filter(exists(col("embedding"), x => x =!= 0f))
      // search's documented store contract: materialized, scanned twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val catalog = filled.select(
      col("doc_id").cast("string").as("product_code"),
      col("description"), col("lang"))
    v13Persist(s, filled, store)
    (store, catalog)
  }

  private val v13 = {
    val QueryText = V13QueryText
    val K = V13K
    val qvec = FlakyClient.featureHash16(QueryText)
    val qvecSql = qvec.map(_.toLong).mkString("[", ", ", "]")
    // v01's DuckDB twin of md5Long60 over the tokens of `col`
    def hashSql(col: String) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(1,16), i ->
           CAST(strpos('0123456789abcdef', substring(md5($col),i,1)) - 1
             AS BIGINT))), (a,b) -> a*16+b)"""
    val dims16 = (0 until 16)
      .map(i => s"CAST(SUM(CASE WHEN dim=$i THEN f ELSE 0 END) AS BIGINT)")
      .mkString("[", ", ", "]")
    GraftQuery(
      "v13_degraded_pipeline",
      (s, dir) => {
        import graft.embed.{EmbeddingPipeline, ExternalEmbedder}
        val (store, catalog) = v13StoreCatalog(s, dir)
        // withTies: rank() <= K semantics — the result SET is then
        // deterministic at ANY scale, including boundary-straddling
        // distance ties (the r16 sf1 check surfaced a 6-member
        // sqrt(7) tie group at rank 17 that the fixture SFs never
        // produce; heap-internal tie order vs the oracle's doc_id
        // order disagreed on 3 members)
        EmbeddingPipeline.search(store, catalog, QueryText,
            ExternalEmbedder(FlakyTransport, dim = 16), K,
            withTies = true)
          .select(col("product_code"), col("description"), col("lang"),
            col("dist"), col("score"))
      },
      Some(s"""WITH docs AS (
        SELECT doc_id, text, lang,
          CASE WHEN doc_id % 7 = 0 THEN ''
               WHEN doc_id % 11 = 0 THEN NULL
               ELSE 'orig_' || lang END AS description,
          'describe:' || CAST(doc_id AS VARCHAR) AS prompt
        FROM documents),
      filled AS (
        SELECT doc_id, text, lang,
          CASE WHEN description IS NULL OR description = '' THEN
            CASE WHEN substring(md5(prompt),32,1) IN
                   ('0','1','2','3','4','5')
              THEN '' ELSE 'gen:' || substring(md5(prompt),1,8) END
          ELSE description END AS description
        FROM docs),
      ft AS (SELECT doc_id, description, lang,
          concat_ws(' ', text, description) AS full_text FROM filled),
      live AS (SELECT * FROM ft
        WHERE substring(md5(full_text),1,1) NOT IN ('0','1','2')),
      words AS (SELECT doc_id, unnest(string_split(full_text,' ')) AS w
        FROM live),
      feats AS (SELECT doc_id, h % 16 AS dim,
          SUM(CASE WHEN h % 32 < 16 THEN 1 ELSE -1 END) AS f
        FROM (SELECT doc_id, ${hashSql("w")} AS h FROM words)
        GROUP BY 1, 2),
      vecs AS (SELECT doc_id, $dims16 AS v FROM feats GROUP BY doc_id),
      scored AS (SELECT doc_id,
          sqrt(CAST(list_sum(list_transform(range(1,17),
            i -> (v[i] - ($qvecSql)[i]) * (v[i] - ($qvecSql)[i])))
            AS DOUBLE)) AS dist
        FROM vecs)
      SELECT CAST(s.doc_id AS VARCHAR) AS product_code, f.description,
        f.lang, s.dist, 1.0 - s.dist AS score
      FROM scored s JOIN filled f ON f.doc_id = s.doc_id
      QUALIFY rank() OVER (ORDER BY s.dist) <= $K"""))
  }

  /** v14 — IVF-cell-BLOCKED embedding near-dup (the corpus-scale form
    * of v05, which samples; north-star dedup family): every vector is
    * assigned to its nearest of 8 seed cells (the v06/v07 broadcast
    * argmin — map-side, no corpus shuffle beyond the cell groupBy),
    * and cosine verification runs ONLY within cells — the same
    * candidates-not-all-pairs stance as the text LSH path (d03/d04),
    * with cell granularity standing in for bands. At 100 TB the cell
    * count scales with the corpus and a hot cell caps exactly like a
    * hot LSH bucket ([[graft.ops.Blocking]]). Recall trade-off is the
    * standard blocked-dedup one: near-dups straddling a cell boundary
    * are missed; multiprobe (assign to top-2 cells) is the knob. */
  private val v14 = GraftQuery(
    "v14_blocked_neardup",
    (s, dir) => {
      // codegen integer distance/dot throughout (the x01-vs-x02
      // lesson: the zip_with lambda fold is ~10x the flat generated
      // loop on a pair-heavy plan), and each vector's sum-of-squares
      // is computed ONCE at assignment, not once per pair
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      val assigned = emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("cent_qv")))
        .groupBy(col("vec_id"), col("qv"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("qv"), col("nn.cent_id").as("cell"),
          call_function("graft_dot_long", col("qv"), col("qv")).as("ss"))
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("qv").as("a_qv"), col("ss").as("a_ss"))
      val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
        col("qv").as("b_qv"), col("ss").as("b_ss"))
      a.join(b, Seq("cell"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("cos",
          call_function("graft_dot_long", col("a_qv"), col("b_qv"))
            .cast("double") /
            (sqrt(col("a_ss").cast("double")) *
              sqrt(col("b_ss").cast("double"))))
        .filter(col("cos") > 0.3)
        .select(col("cell"), col("a_id"), col("b_id"), col("cos"))
    },
    Some(s"""WITH q AS ($qvSql),
    assign AS (
      SELECT v.vec_id, v.qv, c.vec_id AS cell
      FROM q v, q c WHERE c.vec_id < 8
      QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.qv[i])*(v.qv[i]-c.qv[i]))) AS BIGINT),
        c.vec_id) = 1)
    SELECT a.cell, a.vec_id AS a_id, b.vec_id AS b_id,
      CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> a.qv[i]*b.qv[i])) AS BIGINT)::DOUBLE /
        (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS BIGINT)::DOUBLE)
       * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS BIGINT)::DOUBLE))
        AS cos
    FROM assign a JOIN assign b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE cos > 0.3"""))

  /** v15 — RANGE (radius) search: all neighbors within distance r of
    * each query — top-k's sibling with a data-dependent result size
    * (the dedup-threshold form of similarity search: "everything
    * closer than r" is how embedding near-dup thresholds are stated,
    * where kNN would cap the duplicate set arbitrarily). Same
    * exact-integer distance and broadcast-query shape as v03 — the
    * corpus never shuffles, the radius predicate filters map-side in
    * the same codegen projection, and unlike top-k there is no
    * ranking state at all: the operator is a pure scan-filter, the
    * cheapest possible shape at 100 TB. The scale path composes the
    * same way as kNN: IVF probes restrict to cells whose centroid is
    * within r + cell radius (v06/v07 machinery). r=1.3 on this corpus
    * (min pair distance ≈ 1.01, median ≈ 1.41) keeps per-query result
    * sizes data-dependent — not all, not none. */
  private val v15 = GraftQuery(
    "v15_range_search",
    (s, dir) => {
      val corpus = emb(s, dir).select(col("vec_id"), col("qv"))
      val queries = emb(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("query_qv"))
      corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("query_qv")))
        .filter(col("d2") <= lit(1690000000000L)) // r=1.3 → r²·(1e6)²
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (sqrt(col("d2").cast("double")) / 1e6).as("dist"))
    },
    Some(rangeSearchSql))

  /** Shared oracle for v15/v16: brute-force radius search. v16's plan
    * is the IVF-pruned form, but its RESULT is bit-identical by the
    * triangle inequality, so the driver checks both plans against the
    * same DuckDB ground truth independently. */
  private lazy val rangeSearchSql: String =
    s"""WITH q AS ($qvSql)
    SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
      sqrt(CAST(CAST(list_sum(list_transform(range(1, 1+len(c.qv)),
        i -> (c.qv[i]-qs.qv[i])*(c.qv[i]-qs.qv[i]))) AS BIGINT)
        AS DOUBLE)) / 1e6 AS dist
    FROM q c, q qs
    WHERE qs.vec_id < 10 AND c.vec_id <> qs.vec_id
      AND CAST(list_sum(list_transform(range(1, 1+len(c.qv)),
        i -> (c.qv[i]-qs.qv[i])*(c.qv[i]-qs.qv[i]))) AS BIGINT)
        <= 1690000000000"""

  /** v16 — IVF-pruned range search: v15's radius query through the
    * v06/v07 cell index. The probe set keeps only (query, cell) pairs
    * the triangle inequality cannot exclude — d(q,x) ≤ r for x in
    * cell c requires d(q,centroid_c) ≤ r + radius_c, where radius_c
    * (max member→centroid distance) is computed once at index build —
    * then the exact radius filter runs only inside probed cells. The
    * result is therefore IDENTICAL to brute force (no recall
    * trade-off, unlike top-k IVF): the oracle is literally v15's SQL.
    * At 100 TB with a `writeIvfIndexed` layout the probe becomes a
    * partition-pruned scan; the +2 integer margin on the bound
    * absorbs the sqrt's FP rounding (inputs are exact longs).
    *
    * Honesty note (measured): on THIS fixture the bound excludes
    * nothing — all 10×8 (query, cell) probes survive, because the
    * synthetic embeddings are isotropic (seed-centroid cell radii
    * ≈ 1.4-2.0, so r + radius exceeds the unit-sphere diameter).
    * What the oracle proves here is LOSSLESSNESS of the composition;
    * the pruning pays exactly when the corpus clusters, which real
    * embedding corpora do and isotropic random vectors provably
    * don't (distance concentration). */
  private val v16 = GraftQuery(
    "v16_range_ivf",
    (s, dir) => {
      val r2 = 1690000000000L // r=1.3, matching v15
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      val assigned = emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("dc",
          call_function("graft_sqdist_long", col("qv"), col("cent_qv")))
        .groupBy(col("vec_id"), col("qv"))
        .agg(min(struct(col("dc"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("qv"),
          col("nn.cent_id").as("cell"), col("nn.dc").as("dc"))
      val cellRadius = assigned.groupBy("cell")
        .agg(max(col("dc")).as("rad2"))
        .join(cents, col("cell") === col("cent_id"))
        .select(col("cell"), col("rad2"), col("cent_qv"))
      val queries = emb(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv").as("query_qv"))
      val probes = queries.crossJoin(broadcast(cellRadius))
        .withColumn("dqc",
          call_function("graft_sqdist_long",
            col("query_qv"), col("cent_qv")))
        .filter(sqrt(col("dqc").cast("double")) <=
          lit(1.3e6) + sqrt(col("rad2").cast("double")) + lit(2.0))
        .select(col("query_id"), col("query_qv"), col("cell"))
      assigned.join(probes, "cell")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("query_qv")))
        .filter(col("d2") <= lit(r2))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (sqrt(col("d2").cast("double")) / 1e6).as("dist"))
    },
    Some(rangeSearchSql))

  /** v17 — SemDeDup clustered semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540 — the published recipe for pruning web-scale
    * corpora by embedding similarity): cluster the corpus (v06's
    * 8-seed cell assignment stands in for the paper's k-means), then
    * within each cell drop every vector that has an EARLIER-id
    * cell-mate above the cosine threshold; survivors are the semantic
    * representatives. This closes the blocked-pair family the same way
    * v09 closes v05: v14 emits the candidate pairs, v17 makes the
    * keep/drop DECISION.
    *
    * Semantics note: the paper's per-cluster greedy ("keep v unless an
    * already-KEPT earlier item is similar") is inherently sequential
    * within a cluster. The relational form here — "drop v iff ANY
    * earlier similar cell-mate exists, kept or not" — is its
    * order-free relaxation: at-least-as-aggressive, identical on
    * transitively-closed neighborhoods, and deterministic under any
    * partitioning, which a distributed engine must be. (The exact
    * greedy is order-dependent state — expressible via
    * [[graft.ops.NearDedup]] components + min-id if chain-exactness
    * ever matters; v09 demonstrates that composition.)
    *
    * Scale shape (100 TB): assignment is the v06 broadcast argmin (no
    * corpus shuffle beyond the cell groupBy); pairs exist ONLY within
    * cells (cell count scales with the corpus; a hot cell caps exactly
    * like a hot LSH bucket — [[graft.ops.Blocking]]); the drop set is
    * a distinct on b_id (partial-combining) and the final decision is
    * one left join keyed on the high-cardinality vec_id. Nothing here
    * is all-pairs and nothing funnels through the driver. */
  private val v17 = GraftQuery(
    "v17_semantic_dedup",
    (s, dir) => {
      // drop threshold: stricter than v14's 0.3 report cut; 0.4 drops a
      // real-but-small set at BOTH fixture SFs (20 / 262 above-threshold
      // pairs at sf0.01 / sf0.1), so the decision branch is exercised
      val tau = 0.4
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      // same codegen argmin + once-per-vector sum-of-squares as v14
      val assigned = emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("cent_qv")))
        .groupBy(col("vec_id"), col("qv"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("qv"), col("nn.cent_id").as("cell"),
          call_function("graft_dot_long", col("qv"), col("qv")).as("ss"))
      val a = assigned.select(col("cell"), col("vec_id").as("a_id"),
        col("qv").as("a_qv"), col("ss").as("a_ss"))
      val b = assigned.select(col("cell"), col("vec_id").as("b_id"),
        col("qv").as("b_qv"), col("ss").as("b_ss"))
      val dropped = a.join(b, Seq("cell"))
        .filter(col("a_id") < col("b_id"))
        .filter(
          call_function("graft_dot_long", col("a_qv"), col("b_qv"))
            .cast("double") /
            (sqrt(col("a_ss").cast("double")) *
              sqrt(col("b_ss").cast("double"))) > tau)
        .select(col("b_id").as("vec_id")).distinct()
        .withColumn("is_dup", lit(true))
      assigned.select(col("vec_id"), col("cell"))
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          coalesce(!col("is_dup"), lit(true)).as("kept"))
    },
    Some(s"""WITH q AS ($qvSql),
    assign AS (
      SELECT v.vec_id, v.qv, c.vec_id AS cell
      FROM q v, q c WHERE c.vec_id < 8
      QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.qv[i])*(v.qv[i]-c.qv[i]))) AS BIGINT),
        c.vec_id) = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> a.qv[i]*b.qv[i])) AS BIGINT)::DOUBLE /
        (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS BIGINT)::DOUBLE)
       * sqrt(CAST(list_sum(list_transform(b.qv, x -> x*x)) AS BIGINT)::DOUBLE))
          > 0.4)
    SELECT v.vec_id, v.cell,
      (d.vec_id IS NULL) AS kept
    FROM assign v LEFT JOIN dropped d ON d.vec_id = v.vec_id"""))

  /** v18 — one exact Lloyd k-means iteration (assignment → centroid
    * update → reassignment), the refinement loop the IVF/SemDeDup
    * ladder (v06/v14/v17) seeds: v06 assigns to SEED centroids; v18
    * recomputes each cell's centroid from its members and shows which
    * vectors change cells — the convergence step every
    * embedding-clustering pipeline iterates. Entirely exact integer
    * arithmetic: the updated centroid is the truncating-division
    * quantized mean `(100·Σqv_i) div cnt` (both engines truncate
    * toward zero — measured), and round-2 distances compare
    * 100-scaled vectors against it, so `d2` stays an exact long
    * (|100·qv| ≤ 5.8e7 on this fixture → Σ over 64 dims < 2^63) and
    * the argmin ties break on cent_id identically cross-engine.
    * Each seed is its own cell's member at distance 0, so no cell is
    * ever empty and round 2 always has 8 centroids.
    *
    * Plan shape (100 TB): both assignment rounds are broadcast-argmin
    * scans (8 centroids; the corpus NEVER shuffles for assignment —
    * exactly v06); the update is a dim-exploded partial-combining
    * groupBy on (cell, dim) — 8·64 = 512 result rows regardless of
    * corpus size, reassembled with one sort_array per cell. Iterating
    * = repeating this stage; no driver state beyond the 8×64 table. */
  private val v18 = GraftQuery(
    "v18_kmeans_iter",
    (s, dir) => {
      val cents = emb(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("qv").as("cent_qv"))
      val assigned = emb(s, dir).select(col("vec_id"), col("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d2",
          call_function("graft_sqdist_long", col("qv"), col("cent_qv")))
        .groupBy(col("vec_id"), col("qv"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("qv"), col("nn.cent_id").as("cell1"))
      val ncent = assigned
        .select(col("cell1"), posexplode(col("qv")))
        .groupBy(col("cell1"), col("pos"))
        .agg(sum(col("col")).as("sval"), count(lit(1)).as("cnt"))
        .withColumn("cq", expr("(100 * sval) div cnt"))
        .groupBy(col("cell1"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("cq")))),
          x => x("cq")).as("cent_qv"))
        .select(col("cell1").as("cent_id"), col("cent_qv"))
      assigned
        .crossJoin(broadcast(ncent))
        .withColumn("d2", call_function("graft_sqdist_long",
          transform(col("qv"), x => x * 100L), col("cent_qv")))
        .groupBy(col("vec_id"), col("cell1"))
        .agg(min(struct(col("d2"), col("cent_id"))).as("nn"))
        .select(col("vec_id"), col("cell1"),
          col("nn.cent_id").as("cell2"))
        .withColumn("moved", col("cell1") =!= col("cell2"))
    },
    Some(s"""WITH q AS ($qvSql),
    cents AS (SELECT vec_id AS cent_id, qv AS cqv FROM q
      WHERE vec_id < 8),
    a1 AS (
      SELECT v.vec_id, v.qv, c.cent_id AS cell1
      FROM q v, cents c
      QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.cqv[i])*(v.qv[i]-c.cqv[i]))) AS BIGINT),
        c.cent_id) = 1),
    dims AS (SELECT cell1, unnest(range(1, 1+len(qv))) AS dim, qv
      FROM a1),
    sums AS (SELECT cell1, dim, CAST(SUM(qv[dim]) AS BIGINT) AS sval,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM dims GROUP BY 1, 2),
    ncent AS (SELECT cell1 AS cent_id,
        list((100 * sval) // cnt ORDER BY dim) AS cqv
      FROM sums GROUP BY 1),
    a2 AS (
      SELECT v.vec_id, v.cell1, n.cent_id AS cell2
      FROM a1 v, ncent n
      QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (100*v.qv[i]-n.cqv[i])*(100*v.qv[i]-n.cqv[i])))
          AS BIGINT),
        n.cent_id) = 1)
    SELECT vec_id, cell1, cell2, cell1 <> cell2 AS moved FROM a2"""))

  /** v19 — the nightly admit lifecycle, oracled end-to-end (VERDICT
    * r14 item 4: `admitBatch`/`compactIndex` were spec-pinned but had
    * no CORRECTNESS row): build the persisted IVF index from the first
    * nightly slice, ADMIT two more slices on later "nights"
    * ([[graft.ops.VectorDedupIndex.admitBatch]] — append-only, same
    * frozen centroid matrix), COMPACT to one file per cell
    * ([[graft.ops.VectorDedupIndex.compactIndex]]), then probe a
    * sample batch ([[graft.ops.VectorDedupIndex.probePairs]] — the
    * partition-pruned read). The oracle recomputes the pair set
    * BRUTE-FORCE on corpus ∪ admitted (the whole table, by
    * construction of the slices) — so the green row certifies the
    * loop's key invariant: N admits + compaction ≡ the batch recipe
    * on everything ever admitted, pair-for-pair.
    *
    * Exactness: the index is built over the QUANTIZED vectors cast to
    * doubles — integer-valued doubles keep every library dot/distance
    * exact (components ≤ ~1e6 → d2 ≤ 64·4e12 ≪ 2^53), and the one
    * trailing `dot/(sqrt·sqrt)` rounds identically in both engines
    * (the v14 pattern), so this needs NO margin argument, unlike the
    * raw-double library spec. */
  private val v19 = GraftQuery(
    "v19_admit_probe",
    (s, dir) => {
      import graft.ops.VectorDedupIndex
      val all = emb(s, dir).select(col("vec_id"),
        col("qv").cast("array<double>").as("qvd"))
      // the frozen matrix: vectors 0..7 (the v06/v07/v14 convention)
      val cents: Seq[(Long, Seq[Double])] = all.filter(col("vec_id") < 8)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      // three "nights" sliced by modulus (SF-stable); fresh temp dirs
      // per invocation so bench reruns never double-admit
      val idx = java.nio.file.Files
        .createTempDirectory("v19_idx").toString
      VectorDedupIndex.writeIndex(all.filter(col("vec_id") % 3 === 0),
        "vec_id", "qvd", cents, idx)
      VectorDedupIndex.admitBatch(all.filter(col("vec_id") % 3 === 1),
        cents, idx, "vec_id", "qvd")
      VectorDedupIndex.admitBatch(all.filter(col("vec_id") % 3 === 2),
        cents, idx, "vec_id", "qvd")
      val compacted = java.nio.file.Files
        .createTempDirectory("v19_cmp").toString
      VectorDedupIndex.compactIndex(s, idx, compacted)
      VectorDedupIndex.probePairs(s, compacted, cents,
        all.filter(col("vec_id") % 7 === 0), "vec_id", "qvd", tau = 0.3)
    },
    Some(s"""WITH q AS ($qvSql),
    assign AS (
      SELECT v.vec_id, v.qv, c.vec_id AS cell
      FROM q v, q c WHERE c.vec_id < 8
      QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, 1+len(v.qv)),
          i -> (v.qv[i]-c.qv[i])*(v.qv[i]-c.qv[i]))) AS BIGINT),
        c.vec_id) = 1)
    SELECT a.vec_id AS corpus_id, p.vec_id AS new_id,
      CAST(a.cell AS BIGINT) AS cell,
      CAST(list_sum(list_transform(range(1, 1+len(a.qv)),
          i -> a.qv[i]*p.qv[i])) AS BIGINT)::DOUBLE /
        (sqrt(CAST(list_sum(list_transform(a.qv, x -> x*x)) AS BIGINT)::DOUBLE)
       * sqrt(CAST(list_sum(list_transform(p.qv, x -> x*x)) AS BIGINT)::DOUBLE))
        AS cos
    FROM assign a JOIN assign p
      ON a.cell = p.cell AND a.vec_id <> p.vec_id
    WHERE p.vec_id % 7 = 0 AND cos >= 0.3"""))

  override val suite: Seq[GraftQuery] =
    Seq(v01, v02, v03, v04, v05, v06, v07, v08, v09, v10, v11, v12, v13,
      v14, v15, v16, v17, v18, v19)
}
