package graft.functions

/** Marker-token language profiles for the n-gram/stopword language-ID
  * heuristic (`text_langid`).
  *
  * Classic lightweight lang-ID: a handful of high-frequency function
  * words per language, joined (broadcast) against document tokens and
  * summed; argmax wins. The table is tiny by construction, so at any
  * corpus scale the join is a broadcast hash join — no shuffle of the
  * corpus side beyond the per-doc aggregation.
  */
object LangId {
  /** (marker word, language, weight). Weights favor words that are
    * near-unique to a language over shared ones. */
  val profileRows: Seq[(String, String, Double)] = Seq(
    // English
    ("the", "en", 1.0), ("and", "en", 0.8), ("of", "en", 0.8),
    ("is", "en", 0.6), ("with", "en", 0.6), ("for", "en", 0.5),
    // German
    ("der", "de", 1.0), ("und", "de", 1.0), ("die", "de", 0.9),
    ("ist", "de", 0.8), ("mit", "de", 0.7), ("nicht", "de", 0.7),
    // Spanish
    ("el", "es", 0.9), ("que", "es", 0.9), ("los", "es", 0.8),
    ("por", "es", 0.7), ("una", "es", 0.7), ("con", "es", 0.6),
    // French
    ("le", "fr", 0.9), ("et", "fr", 0.8), ("les", "fr", 0.8),
    ("dans", "fr", 0.8), ("est", "fr", 0.7), ("pour", "fr", 0.7),
    // Chinese (romanized markers are weak; CJK text is normally
    // detected by script range — see LangId.scriptOf)
    ("de5", "zh", 0.5), ("shi4", "zh", 0.5), ("zai4", "zh", 0.5)
  )

  /** Unicode-script bucket of a code point — the first-pass signal a
    * real lang-ID stack uses before word profiles. */
  def scriptOf(cp: Int): String =
    if (cp >= 0x4E00 && cp <= 0x9FFF) "han"
    else if (cp >= 0x3040 && cp <= 0x30FF) "kana"
    else if (cp >= 0xAC00 && cp <= 0xD7AF) "hangul"
    else if (cp >= 0x0400 && cp <= 0x04FF) "cyrillic"
    else if (cp >= 0x0600 && cp <= 0x06FF) "arabic"
    else "latin"
}
