package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * All operators are pure DataFrame transforms with bounded shuffles —
  * the candidate-generation joins are always bucket-equi-joins (LSH
  * band keys, shared tokens), never cross joins, so they scale with
  * corpus size, not its square.
  */
object Dedup {

  /** Exact dedup: one survivor (minimum `orderCol`) per identical
    * `keyCols` value. Hash-groupBy; at 100 TB prefer a sha2 digest of
    * wide text as the group key so the shuffle carries 32 bytes/row.
    */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Same via groupBy (no window) — cheaper when only ids are needed:
    * map-side partial min, one shuffle, no per-group sort.
    */
  def exactSurvivorIds(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(min(idCol).as(idCol)).select(idCol)

  // ---- tokenization helpers ----

  /** Word n-gram shingles as a distinct array. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    if (n == 1) array_distinct(words)
    else array_distinct(
      filter(
        transform(
          sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => concat_ws(" ", slice(words, i + 1, lit(n)))),
        s => s =!= ""))
  }

  /** Exact n-gram Jaccard near-dup pairs (i < j, jaccard >= threshold).
    *
    * Inverted-index pattern: explode distinct shingles, self-join on
    * the shingle (only docs SHARING a token ever meet — no cross join),
    * count intersections, compute |A∪B| = |A|+|B|−|A∩B|.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int, threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "i").withColumnRenamed("sz", "szi"), "i")
      .join(sizes.withColumnRenamed("id", "j").withColumnRenamed("sz", "szj"), "j")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("szi") + col("szj") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** MinHash signatures: `numHashes` permutations approximated by
    * seeded xxhash64 of each shingle; signature[h] = min over shingles.
    * One explode + one groupBy — linear in total shingle count.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(wordShingles(col(textCol), shingleN)).as("tok"))
    val mins = (0 until numHashes).map(h => min(xxhash64(lit(h), col("tok"))).as(s"h$h"))
    toks.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(h => col(s"h$h")): _*).as("sig"))
  }

  /** MinHash LSH candidate pairs: split the signature into `bands`
    * bands, bucket by (band index, band hash), emit pairs sharing a
    * bucket, then estimate jaccard as matching-signature fraction and
    * filter. Probability a pair with true jaccard s survives:
    * 1 − (1 − s^r)^b with r = numHashes/bands rows per band.
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7): DataFrame = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    val sig = minHashSignatures(df, idCol, textCol, shingleN, numHashes).cache()

    val banded = sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(lit("band"), b, to_json(slice(col("sig"), b * r + 1, lit(r)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.sig").as("sigi"), col("b.sig").as("sigj"))
      .dropDuplicates("i", "j")

    cand.withColumn("est_jaccard",
        aggregate(zip_with(col("sigi"), col("sigj"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select("i", "j", "est_jaccard")
  }

  /** 64-bit SimHash fingerprint per doc: each token votes ±1 on each
    * bit of its xxhash64; fingerprint bit = sign of the vote sum.
    * Pure expressions (shiftright/bitwise-and), fully codegen'd.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(wordShingles(col(textCol), 1)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    toks.groupBy("id").agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming,
    * candidate-generated by the 4×16-bit band trick (pairs within
    * Hamming k<=3 of a 64-bit hash share at least one of 4 16-bit
    * bands by pigeonhole).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol).cache()
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val popcount8 = (c: Column) => {
      // Hamming weight of a 64-bit value via 8 byte-wise bit_count-free sums
      (0 until 64).map(b => shiftright(c, b).bitwiseAND(1L)).reduce(_ + _)
    }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.simhash").as("hi"), col("b.simhash").as("hj"))
      .dropDuplicates("i", "j")
      .withColumn("hamming", popcount8(col("hi").bitwiseXOR(col("hj"))))
      .filter(col("hamming") <= maxHamming)
      .select("i", "j", "hamming")
  }

  /** Embedding-cosine near-dup pairs above `threshold`.
    * `lshBits = 0` → exact inverted self-join on nothing (all pairs via
    * broadcast-range blocking is NOT attempted: small inputs only);
    * `lshBits > 0` → random-hyperplane bucketing first, so only
    * same-bucket pairs are compared (the 100 TB path; recall grows with
    * repeated seeds at the caller's choice).
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lshBits: Int = 0, seed: Int = 42): DataFrame = {
    val base = df.select(col(idCol).as("id"), l2Normalize(col(vecCol)).as("v"))
    val paired =
      if (lshBits <= 0) {
        // Non-equi self join plans as a nested-loop join; spread the
        // stream side across all cores so the O(n²) scoring parallelizes.
        val spread = base.repartition(df.sparkSession.sparkContext.defaultParallelism)
        spread.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      } else {
        val bucketed = base.withColumn("bucket",
          to_json(randomHyperplaneSignature(col("v"), lshBits, seed)))
        bucketed.as("a").join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      }
    paired
      .select(col("a.id").as("i"), col("b.id").as("j"),
        dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
