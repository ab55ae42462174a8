package graft

import org.apache.spark.sql.functions._

/** Invariants of the scale-curve fixture generator ([[ScaleUp]]).
  * A defective fixture silently corrupts the SCALING curve itself —
  * r15's first cut inflated per-row text volume 1.63× and manufactured
  * a phantom 16× "superlinearity" on q176 — so the generator's
  * contract is pinned here, at sf0.001 × 2 copies (in-memory, no
  * files): exact row multiplication, FK-consistent key shifting,
  * length-preserving content rewrites, disjoint cross-copy shingle
  * spaces.
  */
class ScaleUpSpec extends SparkSpec {
  private val n = 2
  private def t(name: String) = ScaleUp.scaled(spark, sf001, name, n)

  test("row counts multiply by exactly n; dims stay single-copy") {
    for (tab <- Seq("customer", "orders", "lineitem", "events",
        "documents", "embeddings")) {
      val base = spark.read.parquet(s"$sf001/$tab.parquet").count()
      assert(t(tab).count() == n * base, s"$tab row count")
    }
    assert(t("region").count() ==
      spark.read.parquet(s"$sf001/region.parquet").count())
    assert(t("nation").count() ==
      spark.read.parquet(s"$sf001/nation.parquet").count())
  }

  test("key bands are disjoint and FK integrity holds across the scale-up") {
    val li = t("lineitem")
    assert(li.select((col("l_orderkey") / ScaleUp.SHIFT).cast("long"))
      .distinct().count() == n, "copy bands")
    val orphans = li.join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0, "lineitem->orders FK broken by the shift")
    val partOrphans = li.join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(partOrphans == 0, "lineitem->part FK broken by the shift")
  }

  test("document rewrite preserves length/token structure, disjoins shingles") {
    val docs = t("documents")
    // the n_chars = length(text) driver invariant survives
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() == 0)
    // per-copy volumes identical: the cipher must not change per-row work
    val perCopy = docs
      .groupBy((col("doc_id") / ScaleUp.SHIFT).cast("long").as("c"))
      .agg(sum("n_chars").as("chars"),
        sum(size(split(col("text"), " "))).as("toks"))
      .select("chars", "toks").distinct().count()
    assert(perCopy == 1, "copies differ in char or token volume")
    // cross-copy token spaces disjoint (rotation cipher): the same doc's
    // token sets in copy 0 and copy 1 must not intersect
    val both = docs
      .select(((col("doc_id") % ScaleUp.SHIFT)).as("base"),
        (col("doc_id") / ScaleUp.SHIFT).cast("long").as("c"),
        split(col("text"), " ").as("toks"))
      .groupBy("base").pivot("c", Seq(0, 1))
      .agg(first("toks"))
      .select(size(array_intersect(
        array_distinct(col("0")), array_distinct(col("1")))).as("shared"))
    // all-letter tokens rotate to new tokens; only letterless tokens
    // (none in this fixture's vocabulary) could collide
    assert(both.agg(max("shared")).head().getInt(0) == 0,
      "copies share tokens — shingle spaces not disjoint")
  }

  test("embedding perturbation is small and copy 0 is verbatim") {
    val em = t("embeddings")
    val base = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("orig"))
    val joined = em
      .withColumn("base_id", col("vec_id") % ScaleUp.SHIFT)
      .join(base, col("base_id") === base("vec_id"))
      .select((em("vec_id") / ScaleUp.SHIFT).cast("long").as("c"),
        aggregate(zip_with(em("embedding"), col("orig"),
            (a, b) => abs(a - b)),
          lit(0.0d), (acc, x) => greatest(acc, x.cast("double"))).as("dmax"))
    val r = joined.groupBy("c").agg(max("dmax").as("m")).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r(0L) == 0.0, "copy 0 must be verbatim")
    assert(r(1L) > 0.0 && r(1L) <= 0.011,
      s"copy 1 perturbation out of band: ${r(1L)}")
  }
}
