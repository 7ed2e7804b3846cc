package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small, broadcast) query
  *    set against the full corpus — the correctness baseline.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; only vectors sharing a
  *    bucket are compared — the 100 TB path (shuffle is equi on bucket
  *    key; per-bucket work is bounded by bucket size, tunable via the
  *    number of hyperplanes).
  *
  * Dot products are computed in double precision via zip_with + aggregate
  * (sequential left fold — deterministic order, reproducible bits).
  */
object Similarity {

  /** Elementwise dot product of two array<double> columns — a native
    * codegen'd expression (tight loop, no per-element lambda dispatch);
    * same left-fold order as [[dotFold]] / DuckDB's list_reduce, so
    * results are bit-identical across all three. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  /** Composed-builtin reference implementation (kept for equivalence
    * testing against the codegen'd kernel). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` must be small enough to broadcast (typical: a probe/eval
    * set). The corpus side streams: one narrow pass computes scores, then
    * a per-query top-k. At 1000 executors this is a map-side broadcast
    * join + partial top-k — no corpus shuffle. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms computed once per vector (not per pair) — same fold, same bits
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("score", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "score")
  }

  /** Random-hyperplane LSH bucket key: sign bits of dot products with
    * `numPlanes` seeded Gaussian hyperplanes. The planes ship as ONE
    * nested-array literal (`typedlit`) and the bits come from two array
    * folds — a handful of expression nodes regardless of dim×planes.
    * (A per-component expression tree — dim×planes nodes — blows codegen
    * past the JIT method limit and fell back to interpretation ~50×
    * slower.) Deterministic: same seed → same planes → same buckets. */
  def lshBucket(vecCol: Column, dim: Int, numPlanes: Int, seed: Int = 42): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
    val planesLit = typedlit(planes)
    val vd = transform(vecCol, _.cast("double"))
    val bits = transform(planesLit, p =>
      when(dot(vd, p) >= 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Approximate top-k: candidates limited to vectors sharing an LSH
    * bucket with the query (multi-probe via `numTables` independent
    * hash tables to boost recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              dim: Int, k: Int, numPlanes: Int = 12, numTables: Int = 4): DataFrame = {
    // norms staged per vector (once), not per candidate pair
    def banded(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"), asDouble(col(vecCol)).as(s"${side}_v"))
        .select(col(s"${side}_id"), col(s"${side}_v"), norm(col(s"${side}_v")).as(s"${side}_n"),
          posexplode(array((0 until numTables).map(t =>
            lshBucket(col(s"${side}_v"), dim, numPlanes, seed = 1000 + t)): _*))
            .as(Seq("table", "bucket")))
    val c = banded(corpus, "corpus")
    val q = banded(queries, "query")
    val candidates = c.join(q, Seq("table", "bucket"))
      .where(col("corpus_id") =!= col("query_id"))
      .select("query_id", "query_v", "query_n", "corpus_id", "corpus_v", "corpus_n")
      .dropDuplicates("query_id", "corpus_id")
    val scored = candidates.withColumn("score",
      dot(col("query_v"), col("corpus_v")) / (col("query_n") * col("corpus_n")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "rank", "score")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (all-pairs
    * within bucket, threshold filter). */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                     threshold: Double, numPlanes: Int = 10,
                     numTables: Int = 3): DataFrame = {
    // Shape for scale: (1) buckets are computed ONCE and cached — both
    // self-join sides read the same materialization instead of re-running
    // the hash lineage; (2) the candidate dedup shuffles bare id pairs
    // (16 bytes), never the vectors; vectors re-join after dedup for the
    // one scoring pass. Norms are computed once per vector.
    val vecs = df.select(col(idCol).as("vid"), asDouble(col(vecCol)).as("vv"))
      .withColumn("vn", norm(col("vv")))
      .cache()
    val buckets = vecs.select(col("vid"),
      posexplode(array((0 until numTables).map(t =>
        lshBucket(col("vv"), dim, numPlanes, seed = 2000 + t)): _*))
        .as(Seq("table", "bucket")))
    // per-side renames BEFORE the self-join: aliasing the same plan and
    // comparing x.vid < y.vid can resolve both sides to one attribute
    // (trivially-false predicate → silently empty result)
    val bx = buckets.select(col("table"), col("bucket"), col("vid").as("id_a"))
    val by = buckets.select(col("table"), col("bucket"), col("vid").as("id_b"))
    val pairIds = bx.join(by, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates()
    pairIds
      .join(vecs.select(col("vid").as("id_a"), col("vv").as("a_v"), col("vn").as("a_n")), Seq("id_a"))
      .join(vecs.select(col("vid").as("id_b"), col("vv").as("b_v"), col("vn").as("b_n")), Seq("id_b"))
      .withColumn("score", dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .where(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }
}
