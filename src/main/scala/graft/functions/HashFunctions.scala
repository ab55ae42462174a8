package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling / minhash / LSH-banding column builders. All pure per-row
  * Catalyst expressions — the only shuffles in the dedup pipelines are
  * the final bucket joins (operators/Dedup.scala).
  */
object HashFunctions {

  /** Word n-gram shingles from a token array; empty array when the doc
    * has fewer than n tokens.
    */
  def wordShingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
      .otherwise(array())

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array())

  /** k-component minhash signature: sig[j] = min over shingles of
    * hash64_seeded(j, shingle). Null-free only when `shingles` is
    * non-empty — callers filter empty docs first.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles, s => GraftFunctions.hash64Seeded(j.cast("long"), s))))

  /** LSH band hashes: the signature is cut into `bands` slices of
    * `rowsPerBand` components; each slice is hashed to one bucket key.
    * Returns array<struct<band:int, bucket:long>>.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.cast("int").as("band"),
        GraftFunctions.hash64Seeded(
          b.cast("long"),
          concat_ws(",", transform(slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand)),
            x => x.cast("string")))).as("bucket")))

  /** Estimated jaccard from two minhash signatures: fraction of equal
    * components.
    */
  def minhashJaccardEstimate(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact jaccard over two string arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** 16-bit chunks of a 64-bit simhash, as (band, key) structs — used to
    * bucket candidates so that any pair within hamming distance 3 shares
    * at least one of the 4 chunks (pigeonhole).
    */
  def simhashBands(h: Column): Column =
    array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(h, b * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
    }: _*)

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
