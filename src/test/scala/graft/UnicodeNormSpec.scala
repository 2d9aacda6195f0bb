package graft

import graft.text.UnicodeNorm

class UnicodeNormSpec extends SparkSpec {

  test("NFC composes decomposed sequences to single codepoints") {
    assert(UnicodeNorm.nfcStr("é") == "é")
    assert(UnicodeNorm.nfcStr("Å") == "Å")
    assert(UnicodeNorm.nfcStr("already composed é") ==
      "already composed é")
    // NFC leaves compatibility chars alone; NFKC folds them
    assert(UnicodeNorm.nfcStr("ﬁ") == "ﬁ") // fi ligature
    assert(UnicodeNorm.nfkcStr("ﬁ") == "fi")
    assert(UnicodeNorm.nfkcStr("①") == "1") // circled one
  }

  test("stripAccents removes combining marks from either input form") {
    assert(UnicodeNorm.stripAccentsStr("é") == "e")  // composed
    assert(UnicodeNorm.stripAccentsStr("é") == "e") // decomposed
    assert(UnicodeNorm.stripAccentsStr("Ça va, über, niño") ==
      "Ca va, uber, nino")
    assert(UnicodeNorm.stripAccentsStr("plain ascii 123") ==
      "plain ascii 123")
  }

  test("idempotent and NULL-safe in column form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "Café ﬁne"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select(col("id"),
        UnicodeNorm.nfc(col("t")).as("n"),
        UnicodeNorm.foldKey(col("t")).as("k"))
      .orderBy("id")
      .as[(Long, Option[String], Option[String])].collect()
    assert(got(0)._2 == Some("Café ﬁne"))
    assert(got(0)._3 == Some("cafe ﬁne")) // fold strips the accent, keeps NFC-stable ligature
    assert(got(1)._2.isEmpty && got(1)._3.isEmpty)
    // idempotence: nfc(nfc(x)) == nfc(x)
    assert(UnicodeNorm.nfcStr(UnicodeNorm.nfcStr("éü")) ==
      UnicodeNorm.nfcStr("éü"))
  }

  test("dedup motivation: composed and decomposed hash apart until NFC") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "café"), (2L, "café")).toDF("id", "t")
    val raw = df.select(md5(col("t")).as("h"))
      .as[String].collect().distinct
    val norm = df.select(md5(UnicodeNorm.nfc(col("t"))).as("h"))
      .as[String].collect().distinct
    assert(raw.length == 2)  // different bytes, different hashes
    assert(norm.length == 1) // one form after NFC
  }
}
