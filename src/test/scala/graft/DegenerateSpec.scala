package graft

/** The empty-partition-day gate: every registered SparkEntry query
  * must RUN (no throw) on an EMPTY corpus (every table zero rows,
  * real schema), on a ONE-ROW corpus (each table truncated to a
  * single row), and on a DIRTY corpus (full rows, nulls planted in
  * the payload columns — null text/embedding/user_id/value, the
  * failed-fetch rows every 100 TB corpus carries). A scheduler
  * retrying an empty backfill day, a source with a dead partition,
  * or an over-filtered slice must degrade to the operator's
  * zero/identity — usually an empty frame with the contract schema —
  * never abort the job. Round 11 found 26 entries throwing on
  * empty/one-row (empty-lake schema inference, null day-min
  * unboxing, IVF/PQ trainer-sample requires, MMR candidate floor,
  * WAP/OCC demo asserts) and 28 on dirty (trainer-collect NPEs on
  * null embeddings, multimodal kernels handed null payload arrays,
  * typed-encoder null violations in sequence packing); this spec
  * keeps them fixed.
  *
  * Row counts are deliberately unconstrained (an empty result IS the
  * correct degenerate product for most entries; a one-row corpus
  * legitimately produces 0..n rows per entry) — the gate is
  * executes-to-completion, which is exactly the property production
  * loses when an operator throws.
  */
class DegenerateSpec extends GraftSpecBase {

  private def corpus(name: String, n: Int): String = {
    val dir = s"target/degen-spec/$name"
    tools.DegenSweep.writeCorpus(spark, sf, dir, n)
    dir
  }

  test("every registered entry runs to completion on the empty corpus") {
    val fails = tools.DegenSweep.sweep(spark, corpus("empty", 0))
    assert(fails.isEmpty,
      s"${fails.size} entries threw on the empty corpus:\n" +
        fails.map { case (k, e) => s"  $k -> $e" }.mkString("\n"))
  }

  test("every registered entry runs to completion on the one-row corpus") {
    val fails = tools.DegenSweep.sweep(spark, corpus("one", 1))
    assert(fails.isEmpty,
      s"${fails.size} entries threw on the one-row corpus:\n" +
        fails.map { case (k, e) => s"  $k -> $e" }.mkString("\n"))
  }

  test("every registered entry runs to completion on the dirty (null-payload) corpus") {
    val dir = "target/degen-spec/dirty"
    tools.DegenSweep.writeDirtyCorpus(spark, sf, dir)
    val fails = tools.DegenSweep.sweep(spark, dir)
    assert(fails.isEmpty,
      s"${fails.size} entries threw on the dirty corpus:\n" +
        fails.map { case (k, e) => s"  $k -> $e" }.mkString("\n"))
  }
}
