package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy-deduplication operators for training-data pipelines: shingling,
  * MinHash + LSH banding, SimHash, n-gram Jaccard. All declarative
  * DataFrame API (codegen'd built-ins, no UDFs) so they scale as
  * shuffle-on-key jobs.
  *
  * Determinism: hash family is md5-based (stable across engines and
  * runs — the MinHash signatures are reproducible and DuckDB can replay
  * them for the oracle).
  */
object Dedup {

  /** Character shingles (lowercased, whitespace-normalized) as an array
    * column — codegen'd transform over substring offsets.
    */
  def shingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(norm) - k + 1, lit(1))),
        i => substring(norm, i, lit(k))))
  }

  /** MinHash signature: for each of `nHashes` seeded hash functions, the
    * minimum md5(seed || shingle) over the doc's shingles. Lexicographic
    * min over hex strings — portable to any engine with md5.
    */
  def minhashSignature(shinglesCol: Column, nHashes: Int): Column =
    array((0 until nHashes).map { seed =>
      array_min(transform(shinglesCol, s => md5(concat(lit(s"$seed#"), s))))
    }: _*)

  /** LSH banding: group the signature into bands of `rowsPerBand`; a pair
    * of docs sharing any band bucket is a candidate pair.
    */
  def bandHashes(signature: Column, nHashes: Int, rowsPerBand: Int): Column = {
    val nBands = nHashes / rowsPerBand
    array((0 until nBands).map { b =>
      md5(concat_ws("|",
        (lit(b.toString) +: (0 until rowsPerBand).map(r =>
          signature.getItem(b * rowsPerBand + r))): _*))
    }: _*)
  }

  /** JVM-side banded MinHash bucket hashes for one text (same md5-hex
    * scheme as the column variant; interpreted Catalyst HOFs are ~50×
    * slower here, so the signature step runs in the typed layer).
    */
  def bucketHashesJvm(text: String, shingleK: Int, nHashes: Int,
      rowsPerBand: Int): Array[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    def md5hex(s: String): String = {
      md.reset()
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = new Array[Char](32)
      var i = 0
      while (i < d.length) {
        out(i * 2) = hex((d(i) >> 4) & 0xf)
        out(i * 2 + 1) = hex(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }
    val norm = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val n = math.max(norm.length - shingleK + 1, 1)
    val seen = new java.util.HashSet[String]()
    val sig = Array.fill(nHashes)("￿")
    var i = 0
    while (i < n) {
      val sh = norm.substring(i, math.min(i + shingleK, norm.length))
      if (seen.add(sh)) {
        var h = 0
        while (h < nHashes) {
          val v = md5hex(s"$h#$sh")
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    val nBands = nHashes / rowsPerBand
    Array.tabulate(nBands) { b =>
      md5hex((b.toString +: (0 until rowsPerBand).map(r => sig(b * rowsPerBand + r))).mkString("|"))
    }
  }

  /** MinHash-LSH near-duplicate candidate pairs over documents(doc_id,
    * text): shingle → minhash (typed layer) → band → self-join on band
    * bucket. Output: (doc_a, doc_b, n_shared_bands), doc_a < doc_b (ids
    * as strings).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleK: Int = 5, nHashes: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = docs
      .select(col(idCol).cast("string").as("id"), col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          bucketHashesJvm(Option(text).getOrElse(""), shingleK, nHashes, rowsPerBand)
            .iterator.zipWithIndex.map { case (bucket, band) => (id, band, bucket) }
        }
      }
      .toDF("id", "band", "bucket")
    val a = sig.select(col("id").as("doc_a"), col("band"), col("bucket"))
    val b = sig.select(col("id").as("doc_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Exact n-gram Jaccard similarity for a set of candidate pairs (or all
    * pairs when `pairs` is null — only for small tables). Pure built-ins:
    * array_intersect / array_union sizes.
    */
  def jaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleK: Int = 5,
      threshold: Double = 0.0): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
    val a = sh.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash (64-bit) over whitespace tokens: per-token xxhash64, bitwise
    * majority vote across tokens — expressed with codegen'd bit ops via
    * aggregate over the 64 positions.
    */
  def simhash(text: Column): Column = {
    val tokens = filter(split(regexp_replace(lower(text), "\\s+", " "), " "), t => t =!= "")
    val hashes = transform(tokens, t => xxhash64(t))
    // for each bit mask: count tokens with the bit set; set the result bit
    // when the majority has it
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    val n = size(hashes)
    aggregate(
      masks,
      lit(0L),
      (acc, mask) => {
        val cnt = aggregate(hashes, lit(0),
          (c, h) => c + when(h.bitwiseAND(mask) =!= 0L, 1).otherwise(0))
        acc.bitwiseOR(when(cnt * 2 >= n, mask).otherwise(lit(0L)))
      })
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
