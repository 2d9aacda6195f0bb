package graft

import graft.enrich.{EmbedStage, TransformerEmbedder}
import java.nio.file.Files

/** The real-forward-pass embedder: multi-head attention + GELU FFN +
  * LayerNorm encoder with mean pooling — only the artifact's weights
  * are synthetic. Tests pin the properties a real encoder must have. */
class TransformerEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val artifact = {
    val f = Files.createTempDirectory("graft-tfm")
      .resolve("encoder-v2.gft2").toString
    TransformerEmbedder.save(f)
    spark.sparkContext.addFile(f)
    f
  }

  test("embedColumn: deterministic, unit-norm, null/empty semantics") {
    val docs = Seq((1L, "new orleans jazz quartet"),
        (2L, "brass band on frenchmen street"),
        (3L, null.asInstanceOf[String]), (4L, "  "))
      .toDF("id", "text").repartition(4)
    val emb = new TransformerEmbedder(artifact)
    val out = EmbedStage.embedColumn(docs, "text", "emb", emb)
      .orderBy("id").collect()
    val v1 = out(0).getSeq[Float](2)
    assert(v1.length == 32)
    val norm = math.sqrt(v1.map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(out(2).isNullAt(2) && out(3).isNullAt(2))
    val again = EmbedStage.embedColumn(docs, "text", "emb", emb)
      .orderBy("id").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("attention contextualizes: sentence vector is not a bag-of-words mean") {
    val emb = new TransformerEmbedder(artifact)
    val xy = emb.embed("trumpet drums")
    val x = emb.embed("trumpet")
    val y = emb.embed("drums")
    // mean of the single-word vectors, renormalized
    val avg = x.zip(y).map { case (a, b) => (a + b) / 2 }
    val n = math.sqrt(avg.map(v => v * v.toDouble).sum)
    val cos = xy.zip(avg).map { case (a, b) => a * b / n }.sum
    assert(cos < 0.999,
      s"two-token sentence equals the token mean (cos=$cos) — attention is inert")
    // and position matters: a reordered sentence embeds differently
    val yx = emb.embed("drums trumpet")
    assert(xy.toSeq != yx.toSeq, "position embeddings are inert")
  }

  test("weights load once per JVM across a multi-partition pass") {
    val docs = (1 to 64).map(i => (i.toLong, s"doc number $i about music"))
      .toDF("id", "text").repartition(8)
    val before = TransformerEmbedder.loadCount.get()
    val emb = new TransformerEmbedder(artifact)
    val n = EmbedStage.embedColumn(docs, "text", "emb", emb)
      .filter("emb is not null").count()
    assert(n == 64)
    val loads = TransformerEmbedder.loadCount.get() - before
    // local[*] = one JVM: the artifact must have loaded at most once
    // (0 if an earlier test in this suite already cached it)
    assert(loads <= 1, s"model loaded $loads times — per-task loading leak")
  }

  test("truncation at maxLen and long-input stability") {
    val emb = new TransformerEmbedder(artifact)
    val long = (1 to 500).map(i => s"w$i").mkString(" ")
    val v = emb.embed(long)
    val norm = math.sqrt(v.map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // tokens beyond maxLen cannot influence the embedding
    assert(emb.embed((1 to 64).map(i => s"w$i").mkString(" ")).toSeq ==
      emb.embed((1 to 80).map(i => s"w$i").mkString(" ")).toSeq)
  }
}
