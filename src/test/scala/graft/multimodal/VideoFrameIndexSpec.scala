package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VideoFrameIndex]] — the standing frame-hash index: probe finds
  * exactly the band-blocked Hamming matches a brute-force reference
  * computes, reads only the batch's partitions (PartitionFilters),
  * and N admits ≡ one rebuild. */
class VideoFrameIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 64-bit "pHash" per (family, frame): four mixed
    * band patterns, top band 15-bit (same no-overflow construction as
    * the m01 fixture). */
  private def hash(family: Int, frame: Int): Long = {
    val h = family.toLong * 1009 + frame * 131
    (h * 2654435761L) % 65536 +
      ((h * 40503) % 65536) * 65536 +
      ((h * 30011) % 65536) * 4294967296L +
      ((h * 12347) % 32768) * 281474976710656L
  }

  /** Corpus: 4 videos × 8 frames, families 0-3 (all content distinct). */
  private def corpus: DataFrame =
    (for (v <- 0 until 4; f <- 0 until 8)
      yield (s"c$v", f.toLong, hash(v, f)))
      .toDF("video", "frame_idx", "phash")

  /** Batch: n0 re-uses family 0 with 2-bit perturbations on half its
    * frames (all within hammingMax), n1 shares 4 of 8 frames with
    * family 2 (a clip reuse), n2 is novel (family 9). */
  private def batch: DataFrame =
    ((0 until 8).map(f =>
      ("n0", f.toLong, if (f % 2 == 0) hash(0, f) ^ 3L else hash(0, f))) ++
      (0 until 8).map(f =>
        ("n1", f.toLong, if (f < 4) hash(2, f) else hash(8, f))) ++
      (0 until 8).map(f => ("n2", f.toLong, hash(9, f))))
      .toDF("video", "frame_idx", "phash")

  /** Brute-force reference: band-key equality then exact Hamming. */
  private def wantPairs(idx: DataFrame, nb: DataFrame): Set[(String, String, Long, Long)] = {
    val c = VideoFrameIndex.bandRows(idx)
      .select(col("video").as("cv"), col("frame_idx").as("cf"),
        col("phash").as("cp"), col("band"), col("bkey"))
    val n = VideoFrameIndex.bandRows(nb)
      .select(col("video").as("nv"), col("frame_idx").as("nf"),
        col("phash").as("np"), col("band"), col("bkey"))
    c.join(n, Seq("band", "bkey"))
      .filter(col("cv") =!= col("nv"))
      .filter(bit_count(col("cp").bitwiseXOR(col("np"))) <= 6)
      .select("cv", "nv", "cf", "nf").distinct()
      .groupBy("cv", "nv")
      .agg(countDistinct("cf").as("mc"), countDistinct("nf").as("mn"))
      .as[(String, String, Long, Long)].collect().toSet
  }

  test("probe = brute-force reference; pruned scan; fractions correct") {
    val path = java.nio.file.Files
      .createTempDirectory("vframe_idx").toString
    VideoFrameIndex.writeIndex(corpus, path)
    val got = VideoFrameIndex.probePairs(spark, path, batch, hammingMax = 6)
    got.collect() // finalize AQE before reading the executed plan
    val gotSet = got
      .select("corpus_video", "new_video", "matched_corpus", "matched_new")
      .as[(String, String, Long, Long)].collect().toSet
    assert(gotSet == wantPairs(corpus, batch), s"got $gotSet")
    // semantic pins: full re-use 1.0, clip re-use 0.5, novel absent
    val frac = got.select("corpus_video", "new_video", "new_frac")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(frac(("c0", "n0")) === 1.0)
    assert(frac(("c2", "n1")) === 0.5)
    assert(!frac.keySet.exists(_._2 == "n2"))
    // and the index scan must be partition-pruned, not a full read
    val plan = got.queryExecution.executedPlan.toString
    val scan = plan.split("\n").find(_.contains("PartitionFilters"))
    assert(scan.isDefined, plan)
    assert(!scan.get.contains("PartitionFilters: []"),
      s"index scan reads all partitions:\n$plan")
  }

  test("admitBatch ≡ rebuild: tomorrow's probe sees tonight's admits") {
    val nightly = java.nio.file.Files
      .createTempDirectory("vframe_admit").toString
    val rebuilt = java.nio.file.Files
      .createTempDirectory("vframe_rebuild").toString
    VideoFrameIndex.writeIndex(corpus, nightly)
    VideoFrameIndex.admitBatch(batch, nightly)
    VideoFrameIndex.writeIndex(corpus.unionByName(batch), rebuilt)
    // a second batch near-dups yesterday's ADMITTED n1 (family 8 tail)
    val batch2 = (0 until 8).map(f => ("m0", f.toLong, hash(8, f)))
      .toDF("video", "frame_idx", "phash")
    def probe(p: String) =
      VideoFrameIndex.probePairs(spark, p, batch2, hammingMax = 6)
        .select("corpus_video", "new_video", "matched_corpus",
          "matched_new", "n_frames_new", "new_frac")
        .as[(String, String, Long, Long, Long, Double)].collect().toSet
    val viaAdmit = probe(nightly)
    assert(viaAdmit == probe(rebuilt))
    // n1's frames 4-7 are family 8 => m0 matches them, 4/8 = 0.5
    assert(viaAdmit == Set(("n1", "m0", 4L, 4L, 8L, 0.5)))
  }

  test("empty batch probes nothing and returns the empty pair frame") {
    val path = java.nio.file.Files
      .createTempDirectory("vframe_empty").toString
    VideoFrameIndex.writeIndex(corpus, path)
    val empty = Seq.empty[(String, Long, Long)]
      .toDF("video", "frame_idx", "phash")
    assert(VideoFrameIndex.probePairs(spark, path, empty).count() === 0)
  }
}
