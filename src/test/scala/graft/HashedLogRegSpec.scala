package graft

import graft.operators.HashedLogReg
import org.apache.spark.sql.functions._

class HashedLogRegSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(41)
  private val catWords = Array("cat", "kitten", "purr", "whisker", "meow")
  private val dogWords = Array("dog", "puppy", "bark", "growl", "fetch")
  private def doc(words: Array[String], n: Int): String =
    Array.fill(n)(words(rng.nextInt(words.length))).mkString(" ")

  test("separable classes: loss falls, holdout accuracy is perfect") {
    val rows = (0 until 200).map { i =>
      val isCat = i % 2 == 0
      (i.toLong, doc(if (isCat) catWords else dogWords, 10 + rng.nextInt(20)),
        if (isCat) 1 else 0)
    }
    val df = rows.toDF("id", "text", "y")
    val train = df.filter($"id" % 5 =!= 0)
    val holdout = df.filter($"id" % 5 === 0)
    val model = HashedLogReg.train(train, "text", col("y"), "id",
      dim = 256, iters = 30, lr = 4.0)
    assert(model.losses.last < model.losses.head / 2,
      s"loss did not fall: ${model.losses.head} -> ${model.losses.last}")
    val scored = HashedLogReg.score(holdout, "text", "id", model)
      .join(holdout.select($"id", $"y"), "id")
      .select(($"prob" > 0.5) === ($"y" === 1)).as[Boolean].collect()
    assert(scored.forall(identity),
      s"holdout accuracy ${scored.count(identity)}/${scored.length} < 1.0")
  }

  test("featurize: hashed tf values sum to 1 per doc") {
    val df = Seq((1L, "a b a c", 1)).toDF("id", "text", "y")
    val f = HashedLogReg.featurize(df, "text", col("y"), "id", 64)
      .select(aggregate(col("_vals"), lit(0.0d), (a, x) => a + x))
      .as[Double].head()
    assert(math.abs(f - 1.0) < 1e-9)
  }
}
