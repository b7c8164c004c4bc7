package graft

import graft.ops.{Classifier, Profile, Similarity}
import org.apache.spark.sql.functions._

/** Edge semantics for the round-8 scoring/profiling operators: hashed
  * linear classifier, semantic decontamination, column profiler.
  */
class ProfileClassifySpec extends SparkSpec {
  import spark.implicits._

  test("scoreDocs: empty doc nulls out, score bounded, keep = sign") {
    val df = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "alpha"))
      .toDF("id", "text")
    val got = Classifier.scoreDocs(df, "text").orderBy("id")
      .select("n_tokens", "score_ppm", "keep").collect()
    assert(got(1).isNullAt(1) && got(1).isNullAt(2), "empty doc → nulls")
    assert(got(0).getInt(0) == 3 && got(2).getInt(0) == 1)
    val s = got(0).getLong(1)
    assert(s >= -500000L && s <= 500000L,
      s"mean ppm weight in [-5e5, 5e5]: $s")
    // single-token doc: floor(mean) = the weight itself, so keep agrees
    assert(got(2).getBoolean(2) == (got(2).getLong(1) > 0))
  }

  test("scoreDocs: deterministic across runs and partitionings") {
    val df = (1L to 50L).map(i => (i, s"tok$i alpha beta")).toDF("id", "text")
    val a = Classifier.scoreDocs(df, "text")
      .select("id", "score_ppm").as[(Long, Long)].collect().toMap
    val b = Classifier.scoreDocs(df.repartition(7), "text")
      .select("id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("semanticDecontaminate: drops the planted duplicate, keeps rest") {
    val bench = Seq((100L, Array(1f, 0f, 0f))).toDF("id", "v")
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)), // exact bench dup → dropped
      (2L, Array(0.9f, 0.1f, 0f)), // near dup (cos≈0.994) → dropped
      (3L, Array(0f, 1f, 0f)) // orthogonal → kept
    ).toDF("id", "v")
    val got = Similarity.semanticDecontaminate(corpus, bench, "id", "v", 0.9)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("profile: counts, distincts, numeric min/max, string nulls") {
    val df = Seq((1L, 2.5, "a"), (2L, 7.25, "b"), (3L, 7.25, null))
      .toDF("k", "v", "s")
    val got = Profile.summary(df, Seq("k", "v", "s")).orderBy("col_name")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got("k") == ((3L, 3L, 3L, Some(1.0), Some(3.0))))
    assert(got("v") == ((3L, 3L, 2L, Some(2.5), Some(7.25))))
    assert(got("s") == ((3L, 2L, 2L, None, None)),
      "string col: null count drops the null, no numeric min/max")
  }

  test("rocAuc: tie-corrected hand value and exact confusion counts") {
    // pos scores {0.8, 0.6, 0.4}, neg {0.6, 0.2}: of the 6 pairs,
    // 4 are concordant and the 0.6-0.6 tie earns half -> AUC 0.75.
    val df = Seq((0.8, 1), (0.6, 1), (0.4, 1), (0.6, 0), (0.2, 0))
      .toDF("score", "y")
    val got = Classifier.rocAuc(df, "score", "y", Seq(0.5, 0.9))
      .collect().map(r => r.getAs[Double]("thr") -> r).toMap
    val t5 = got(0.5)
    assert(t5.getAs[Double]("auc") == 0.75)
    assert(t5.getAs[Long]("tp") == 2L && t5.getAs[Long]("fp") == 1L)
    assert(t5.getAs[Long]("fn") == 1L && t5.getAs[Long]("tn") == 1L)
    assert(t5.getAs[Long]("precision_ppm") == 666666L)
    assert(t5.getAs[Long]("recall_ppm") == 666666L)
    assert(t5.getAs[Long]("fpr_ppm") == 500000L)
    assert(t5.getAs[Long]("f1_ppm") == 666666L)
    // Threshold above every score: nothing predicted positive,
    // precision null, zero recall.
    val t9 = got(0.9)
    assert(t9.getAs[Long]("tp") == 0L && t9.getAs[Long]("fp") == 0L)
    assert(t9.isNullAt(t9.fieldIndex("precision_ppm")))
    assert(t9.getAs[Long]("recall_ppm") == 0L)
    // Perfect separation -> AUC 1; reversed labels -> AUC 0.
    val sep = Seq((0.9, 1), (0.8, 1), (0.1, 0)).toDF("score", "y")
    assert(Classifier.rocAuc(sep, "score", "y", Seq(0.5))
      .collect()(0).getAs[Double]("auc") == 1.0)
    val rev = Seq((0.9, 0), (0.1, 1)).toDF("score", "y")
    assert(Classifier.rocAuc(rev, "score", "y", Seq(0.5))
      .collect()(0).getAs[Double]("auc") == 0.0)
  }
}
