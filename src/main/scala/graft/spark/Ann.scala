package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor over an embedding column (Array[Float]).
  *
  * [[cosineTopK]] is the exact baseline: broadcast the (small) query set,
  * score every candidate, per-query top-k via window rank — the big side
  * never shuffles.
  *
  * [[lshCosineTopK]] is the scale path: sign-LSH (random hyperplanes with
  * a deterministic seeded ±1 family) buckets both sides; only bucket-
  * colliding pairs are scored. At 10^9+ vectors this turns the cross
  * product into an equi-join on (table, bucket).
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force top-k: queries broadcast, candidates scored map-side. */
  def cosineTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = candidates.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = cand.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 3).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Deterministic sign-LSH signature: bit h = sign(Σ_j s(h,j)·v_j) with
    * s(h,j) = ±1 from xxhash64 parity. `nTables` independent signatures of
    * `nBits` bits each are emitted as bucket strings.
    */
  def lshBuckets(vec: Column, nTables: Int, nBits: Int): Column = {
    val v = asDouble(vec)
    array((0 until nTables).map { t =>
      val bits = (0 until nBits).map { h =>
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, j) =>
            x * (pmod(xxhash64(lit(t * 1000 + h), j), lit(2)).cast("double") * 2.0 - 1.0)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit("1")).otherwise(lit("0"))
      }
      concat((lit(s"$t:") +: bits): _*)
    }: _*)
  }

  /** LSH-bucketed ANN: candidates and queries bucketed with the same
    * hash family; exact cosine computed only for colliding pairs.
    */
  def lshCosineTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 8, nBits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vout: String): DataFrame =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(vout),
          explode(lshBuckets(col(vecCol), nTables, nBits)).as("bucket"))
    val cand = withBuckets(candidates, "vec_id", "v")
    val q = withBuckets(queries, "query_id", "qv")
    val pairs = cand.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
      .dropDuplicates("query_id", "vec_id")
    val scored = pairs.select(col("query_id"), col("vec_id"),
      round(cosine(col("qv"), col("v")), 3).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}
