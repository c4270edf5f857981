package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The perceptual-dedup contract (m05): duplicates that exact-byte frame
  * dedup (m04) PROVABLY passes — a re-encode and a brightness shift of the
  * same image — must pair under the decoded-pixel dHash.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps going"),
    (2L, "a completely different document about spark physical planning"),
    (3L, "yet another unrelated text with its own byte pattern entirely"))

  test("re-encoded and brightness-shifted copies: m04's bytes differ, dHash pairs them") {
    val docs = texts.toDF("doc_id", "text")
    val base = Multimodal.fromTextPng(docs, "doc_id", "text")
    val shifted = Multimodal.fromTextPng(
      docs.select(($"doc_id" + 100L).as("doc_id"), $"text"), "doc_id", "text", shift = 16)
    val rgb = Multimodal.fromTextPng(
      docs.select(($"doc_id" + 200L).as("doc_id"), $"text"), "doc_id", "text", rgb = true)

    // exact-byte dedup provably passes these copies: zero payload collisions
    val payloads = base.unionByName(shifted).unionByName(rgb)
      .select(md5($"payload").as("fp")).groupBy("fp").count()
      .where($"count" > 1).count()
    assert(payloads == 0L,
      "variant payload bytes collided with base — the fixture no longer " +
        "demonstrates what exact-byte dedup misses")

    // the perceptual hash is IDENTICAL across all three encodings: the RGB
    // re-encode changes no pixel, the uniform +16 shift (no clamping on
    // this ASCII fixture) shifts both sides of every comparison
    val sigs = Multimodal.withDHash(base.unionByName(shifted).unionByName(rgb))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, _) =>
      assert(sigs(id) == sigs(id + 100L), s"shifted copy of $id moved the dHash")
      assert(sigs(id) == sigs(id + 200L), s"re-encoded copy of $id moved the dHash")
    }
    // and unrelated images must NOT pair (hamming far above the gate)
    val cross = for (a <- texts.map(_._1); b <- texts.map(_._1) if a < b)
      yield java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(cross.forall(_ > 4), s"unrelated images within the gate: $cross")
  }

  test("m06 clusters: planted variants label with their base image's id") {
    val dir = tmpDir("m06spec")
    // doc 3 gets a shifted copy (+2e6: 3 % 7 == 3), doc 4 an RGB re-encode
    // (+3e6: 4 % 9 == 4); both must cluster under the base id
    (texts ++ Seq((4L, "fourth text, reencoded downstream by the fixture rule")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val out = graft.queries.PipelineQueries.queries("m06_perceptual_clusters")(
      spark, dir.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2000003L) == 3L, s"shifted copy must cluster under base: $out")
    assert(out(3000004L) == 4L, s"re-encoded copy must cluster under base: $out")
    assert(out(1L) == 1L && out(2L) == 2L, s"unrelated images stay singletons: $out")
  }

  test("m07 adversarial payloads: decode contract per variant (throws map to null rows)") {
    val docs = Seq((0L, "some fixture text"), (50L, ""),
        (100L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val adv = Multimodal.adversarialMedia(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(adv).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d = Multimodal.withDHash(adv).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    for (base <- Seq(0L, 50L, 100L)) {
      val id = (v: Int) => base * 8 + v
      // valid: decodes 16x16, hashes
      assert(!f(id(0)).isNullAt(1) && f(id(0)).getInt(2) == 16 && !d(id(0)))
      // truncated PNG: the codec THROWS — contract is a null row, not a
      // task failure (the catch in decodeImage)
      assert(f(id(1)).isNullAt(1) && f(id(1)).isNullAt(2) && d(id(1)),
        s"truncated payload must yield a null row (base $base)")
      // mislabeled non-image bytes: unrecognized -> null row
      assert(f(id(2)).isNullAt(1) && d(id(2)))
      // thin 1x16: decodes (features, real dims) but sits under the 8x8
      // dHash grid -> no perceptual hash
      assert(!f(id(3)).isNullAt(1) && f(id(3)).getInt(2) == 1 &&
        f(id(3)).getInt(3) == 16 && d(id(3)),
        s"thin image must decode but not hash (base $base)")
      // palette PNG: decodes and hashes (over palette indices)
      assert(!f(id(4)).isNullAt(1) && f(id(4)).getInt(2) == 16 && !d(id(4)))
    }
  }

  test("dHash64 block math: uniform shift invariance and wraparound bits") {
    val px = Array.tabulate(256)(i => (i * 37) % 251)
    val h = Multimodal.dHash64(px, 16, 16)
    assert(h == Multimodal.dHash64(px.map(p => math.min(p + 4, 255)), 16, 16),
      "unclamped uniform shift must not move any bit")
    // non-square and non-divisible dims go through the floor-boundary path
    val wide = Array.tabulate(9 * 24)(i => (i * 53) % 255)
    Multimodal.dHash64(wide, 24, 9) // must not throw
    intercept[IllegalArgumentException](Multimodal.dHash64(px, 4, 64))
  }
}
