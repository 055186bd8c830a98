package graft.queries

import graft.SparkSpec

/** Enforces the recall bound that `d07_lsh_recall` measures. The
  * oracle row proves both engines agree on the recall NUMBER; this
  * spec pins its VALUE — a candidate-generation bug that silently
  * lost true near-dup pairs would keep every replay-style oracle
  * green but fail here.
  *
  * Bound: with b=4 bands of r=3 rows, P(candidate | J) = 1-(1-J³)⁴,
  * ≥ 0.98 for J ≥ 0.85 — and every true J ≥ 0.5 pair in the synthetic
  * corpus sits at J ≥ 0.85 (measured min 0.857 at sf0.001, 0.875 at
  * sf0.01; observed recall 1.0 at both). 0.95 leaves slack for corpus
  * regeneration without weakening the gate.
  */
class LshRecallSpec extends SparkSpec {
  for (sf <- Seq("sf0.001", "sf0.01"))
    test(s"LSH candidates catch >= 95% of true J>=0.5 pairs at $sf") {
      val r = Registry.byName("d07_lsh_recall")
        .run(spark, s"/root/testdata/$sf").head()
      // read + assert n_true BEFORE touching the other fields: with no
      // true pairs they are NULL and a primitive get would NPE, masking
      // the vacuity diagnostic below
      val nTrue = r.getLong(0)
      assert(nTrue > 0,
        "corpus has no true near-dup pairs — the recall gate would be vacuous")
      val nCaught = r.getLong(1)
      val recall = r.getDouble(2)
      assert(recall >= 0.95,
        s"LSH candidate recall $recall ($nCaught/$nTrue) is below the S-curve bound")
    }
}
