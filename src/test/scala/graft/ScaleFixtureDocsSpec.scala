package graft

/** The distributed documents generator (r19) must be row-identical to
  * the r16 sequential driver loop it replaced: the sequential form is
  * preserved HERE as the executable spec and both run at a small
  * factor over the sf0.001 source. This is the contract that lets the
  * 1000x documents decade trust the distributed fixture — planted
  * exact/near-dup rates, chain structure, and every text byte are
  * pinned equal, not just statistically similar.
  */
class ScaleFixtureDocsSpec extends SparkSpec {

  /** The r16 sequential generator, verbatim (ScaleFixture.scala@r18
    * documents()): texts accumulate in generation order and planted
    * tails index into the buffer. */
  private def sequentialReference(src: String, factor: Int)
      : Seq[(Long, String, String, String, Long)] = {
    val docs = Tables.documents(spark, src)
    val texts = docs.select("text").collect().map(_.getString(0))
    val vocabW = texts.flatMap(_.split(" "))
      .groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
    val vocab = vocabW.map(_._1).toArray
    val cum = vocabW.map(_._2.toLong).scanLeft(0L)(_ + _).tail.toArray
    val totW = cum.last
    val lengths = texts.map(_.split(" ").length)
    val langSrc = docs.select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nNew = texts.length * factor
    val nExact = math.max(1, (8.0 * nNew / 5000).round.toInt)
    val nNear = math.max(1, (248.0 * nNew / 5000).round.toInt)
    def pickWord(rnd: scala.util.Random): String = {
      val t = (rnd.nextDouble() * totW).toLong
      val i = java.util.Arrays.binarySearch(cum, t + 1)
      vocab(if (i >= 0) i else -i - 1)
    }
    val built = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until nNew).map { id =>
      val rnd = new scala.util.Random(1000003L * id + 17)
      val text =
        if (id >= nNew - nExact) {
          built(rnd.nextInt(nNew - nExact - nNear))
        } else if (id >= nNew - nExact - nNear) {
          val src = built(rnd.nextInt(id)).split(" ").toBuffer
          if (rnd.nextBoolean() && src.length > 10)
            src.remove(rnd.nextInt(src.length))
          else src.insert(rnd.nextInt(src.length + 1), pickWord(rnd))
          src.mkString(" ")
        } else {
          val l = lengths(rnd.nextInt(lengths.length))
          (0 until l).map(_ => pickWord(rnd)).mkString(" ")
        }
      built += text
      val (lang, source) = langSrc(rnd.nextInt(langSrc.length))
      (id.toLong, text, lang, source, text.length.toLong)
    }
  }

  test("distributed documents generator == the r16 sequential loop, " +
      "row for row (factor 4 over sf0.001 — includes both planted " +
      "tails and chained near-dups)") {
    val src = SparkSpec.sf001
    val dst = s"/tmp/graft_docgen_spec/p${ProcessHandle.current().pid()}"
    ScaleFixture.documents(spark, src, dst, factor = 4)
    val got = spark.read.parquet(s"$dst/documents.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val want = sequentialReference(src, factor = 4)
    assert(got.size == want.size,
      s"row count ${got.size} != ${want.size}")
    // first divergence (if any) reported precisely — a text diff at
    // one id beats a blanket inequality
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"doc_id ${w._1} diverges:\n got $g\nwant $w")
    }
  }
}
