package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Semantics of the vector-similarity operators, including the LSH
  * properties the rows-only queries rely on: identical vectors always
  * collide; near-duplicates collide in at least one table with high
  * probability; LSH candidate generation recovers the near-dup pairs
  * that the exact all-pairs baseline finds.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val planes = Similarity.PlaneSpec(dim = 8, nbits = 6, tables = 5)

  test("dot / norm / cosine on hand-checkable vectors") {
    val df = Seq((Array(1f, 2f, 2f), Array(2f, 0f, 0f))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.norm(col("a")),
      Similarity.cosine(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1, of orthogonal vectors is 0") {
    val df = Seq((Array(1f, 1f), Array(1f, 1f), Array(1f, -1f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("bruteForceTopK returns k nearest with deterministic ranking") {
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(-1f, 0f))).toDF("vec_id", "embedding")
    val probes = Seq((100L, Array(1f, 0f))).toDF("probe_id", "probe_vec")
    val got = Similarity.bruteForceTopK(corpus, probes, 2)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L), (1L, 2L)))
  }

  test("identical vectors land in the same bucket in every table") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq((0L, v), (1L, v.clone())).toDF("vec_id", "embedding")
    val idx = Similarity.lshIndex(df, "embedding", planes)
      .select("vec_id", "table_id", "bucket").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
    val byVec = idx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byVec(0L) == byVec(1L))
    assert(byVec(0L).size == 5)
  }

  test("native lsh_buckets == composed per-plane bucketId bit-for-bit") {
    val rnd = new scala.util.Random(41)
    val df = Seq.fill(100)(Array.fill(8)(rnd.nextGaussian().toFloat)).toDF("v")
    val composed = array(planes.planes.map(tp => Similarity.bucketId(col("v"), tp)): _*)
    val diff = df.select(
        Similarity.lshBuckets(col("v"), planes).as("fast"),
        composed.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
    // wrong-dimension vectors yield null, not a garbage bucket
    val bad = Seq(Array(1f, 2f)).toDF("v")
      .select(Similarity.lshBuckets(col("v"), planes))
    assert(bad.head().isNullAt(0))
  }

  test("LSH candidates recover near-dup pairs (recall on clustered data)") {
    // 10 base vectors, each with a tiny-noise near-duplicate (cos>0.99)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 10).flatMap { i =>
      val base = Array.fill(8)(rnd.nextGaussian().toFloat)
      val near = base.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, near))
    }
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.lshCandidatePairs(df, "vec_id", "embedding", planes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = (0 until 10).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val recall = truePairs.count(pairs.contains).toDouble / truePairs.size
    assert(recall >= 0.9, s"recall $recall, candidates ${pairs.size}")
    // and it is sub-quadratic: far fewer candidates than all 190 pairs
    assert(pairs.size < 100, s"candidate set ${pairs.size} ~ all-pairs")
  }

  test("exactCosinePairsBlocked == DataFrame all-pairs cosine (random corpora)") {
    // the dense block-pair loop is hand-rolled arithmetic — pin it
    // bit-for-bit against the Column-DSL formulation across corpus
    // sizes that exercise empty blocks, single-element blocks, and
    // blocks > n
    val rnd = new scala.util.Random(23)
    for (n <- Seq(0, 1, 7, 40); blocks <- Seq(1, 3, 8)) {
      val rows = (0 until n).map { i =>
        // planted structure: consecutive ids share a base direction
        val base = Array.fill(8)(rnd.nextGaussian().toFloat)
        (i.toLong, base.map(x => x + (rnd.nextGaussian() * 0.3).toFloat))
      }
      val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
      val dense = Similarity.exactCosinePairsBlocked(df, "vec_id", "embedding",
          rawThreshold = 0.2, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ref = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // every reference pair present with the BIT-identical cosine
      // (dense may hold extra pairs inside its 1e-7 guard band — allowed)
      ref.foreach { case (k, v) =>
        assert(dense.contains(k), s"n=$n blocks=$blocks missing pair $k")
        assert(dense(k) == v, s"n=$n blocks=$blocks cos mismatch at $k: ${dense(k)} != $v")
      }
      assert(dense.keySet.forall { case (a, b) => a < b })
    }
  }

  test("blockedAllPairs emits each unordered pair exactly once (no distinct needed)") {
    val rnd = new scala.util.Random(41)
    val df = (0 until 30).map(i => (i.toLong, Array.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    for (blocks <- Seq(1, 4, 7)) {
      val pairs = Similarity.blockedAllPairs(df, "vec_id", "embedding", blocks)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length == 30 * 29 / 2, s"blocks=$blocks: ${pairs.length}")
      assert(pairs.distinct.length == pairs.length && pairs.forall { case (a, b) => a < b })
    }
  }

  test("dedup_embedding_near plans no nested-loop join (round-2 verdict item 1)") {
    // plan-shape assertion on the registered query itself: candidates
    // must come from the LSH equi-join, never a cartesian
    val df = SparkEntry.queries("dedup_embedding_near")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in plan:\n$plan")
  }
}
