package graft.i18n

/** Token-level fuzzy string ratio compatible with fuzzywuzzy's `UQRatio`
  * (reference: i18n.py:108-110 uses `process.extract(..., scorer=UQRatio,
  * score_cutoff=90)`): unicode quick ratio = difflib
  * `SequenceMatcher.ratio()` × 100 (rounded) after `full_process`
  * normalization (non-alphanumerics → spaces, lowercase, trim).
  *
  * Pure JVM implementation of the public difflib algorithm (Ratcliff/
  * Obershelp: recursive longest-contiguous-matching-block), so golden
  * outputs match the reference bit-for-bit. Used inside a broadcast-dict
  * UDF — never in a shuffle key.
  */
object Fuzzy {

  /** fuzzywuzzy full_process: strip non-alphanumerics to spaces, lower,
    * trim. Keeps unicode letters/digits (Hebrew/Arabic included).
    */
  def fullProcess(s: String): String =
    s.map(c => if (Character.isLetterOrDigit(c)) Character.toLowerCase(c) else ' ')
      .mkString.trim.replaceAll(" +", " ")

  /** difflib SequenceMatcher.ratio(): 2*M/T where M = sum of sizes of
    * matching blocks, T = len(a)+len(b).
    */
  def ratio(a: String, b: String): Double = {
    val t = a.length + b.length
    if (t == 0) return 1.0
    2.0 * matchingBlocksTotal(a, b) / t
  }

  /** fuzzywuzzy QRatio: int(round(ratio*100)) after full_process. */
  def qratio(a: String, b: String): Int = {
    val (pa, pb) = (fullProcess(a), fullProcess(b))
    if (pa.isEmpty || pb.isEmpty) 0
    else math.round(ratio(pa, pb) * 100).toInt
  }

  private def matchingBlocksTotal(a: String, b: String): Int = {
    // b2j index of b (difflib's autojunk applies only when len(b) >= 200;
    // dictionary keys here are far shorter, so plain indexing matches).
    val b2j = scala.collection.mutable.HashMap.empty[Char, List[Int]]
    for (j <- b.length - 1 to 0 by -1)
      b2j(b(j)) = j :: b2j.getOrElse(b(j), Nil)

    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var (besti, bestj, bestsize) = (alo, blo, 0)
      var j2len = Map.empty[Int, Int]
      for (i <- alo until ahi) {
        var newj2len = Map.empty[Int, Int]
        for (j <- b2j.getOrElse(a(i), Nil)) {
          if (j >= blo && j < bhi) {
            val k = j2len.getOrElse(j - 1, 0) + 1
            newj2len += (j -> k)
            if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
          }
        }
        j2len = newj2len
      }
      // difflib extends the match over "junk-adjacent" elements; with no
      // junk set, only the popularity filter would apply — not used here.
      (besti, bestj, bestsize)
    }

    def recurse(alo: Int, ahi: Int, blo: Int, bhi: Int): Int = {
      val (i, j, k) = longestMatch(alo, ahi, blo, bhi)
      if (k == 0) 0
      else recurse(alo, i, blo, j) + k + recurse(i + k, ahi, j + k, bhi)
    }

    recurse(0, a.length, 0, b.length)
  }

  /** process.extract top-n over candidate keys with a score cutoff
    * (reference: i18n.py:108-110, limit=2, cutoff=90). Returns
    * (candidate, score) sorted by score desc, preserving candidate order
    * on ties like fuzzywuzzy (stable sort over input order).
    */
  def extract(query: String, choices: Seq[String], limit: Int = 2, cutoff: Int = 90): Seq[(String, Int)] =
    extractPrepared(query, choices, choices.map(fullProcess), limit, cutoff)

  /** `extract` with the choices' `fullProcess` precomputed once (the dict
    * side is identical for every row — recomputing it per row dominated
    * the translate stage). Two sound upper bounds skip the O(n·m)
    * Ratcliff/Obershelp DP wherever the cutoff is provably unreachable:
    *
    *  - length bound: M ≤ min(|a|,|b|)
    *  - character-multiset bound: M ≤ |count-vector intersection| —
    *    matching blocks consume one occurrence per matched char, so the
    *    shared-character count caps M. This is the bound that actually
    *    fires on unrelated strings of similar length.
    *
    * Both cap score = round(200·M/T); round is monotone, so bound <
    * cutoff ⟹ score < cutoff. Results are bit-identical to the
    * unfiltered scan.
    */
  def extractPrepared(query: String, choices: Seq[String],
      processedChoices: Seq[String], limit: Int = 2, cutoff: Int = 90): Seq[(String, Int)] = {
    val pq = fullProcess(query)
    val qCounts = charCounts(pq)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var i = 0
    while (i < choices.length) {
      val pc = processedChoices(i)
      val score =
        if (pq.isEmpty || pc.isEmpty) 0
        else {
          val t = pq.length + pc.length
          val lenBound = math.round(200.0 * math.min(pq.length, pc.length) / t).toInt
          if (lenBound < cutoff) -1
          else {
            val interBound = math.round(200.0 * countIntersection(qCounts, pc) / t).toInt
            if (interBound < cutoff) -1
            else math.round(ratio(pq, pc) * 100).toInt
          }
        }
      if (score >= cutoff) out += ((choices(i), score))
      i += 1
    }
    out.sortBy(-_._2).take(limit).toSeq
  }

  private def charCounts(s: String): java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    var i = 0
    while (i < s.length) {
      val c: Character = s.charAt(i)
      val prev = m.get(c)
      m.put(c, if (prev == null) 1 else prev + 1)
      i += 1
    }
    m
  }

  private def countIntersection(qc: java.util.HashMap[Character, Integer], b: String): Int = {
    val seen = new java.util.HashMap[Character, Integer]()
    var inter = 0
    var i = 0
    while (i < b.length) {
      val c: Character = b.charAt(i)
      val avail = qc.get(c)
      if (avail != null) {
        val used = seen.get(c)
        val u = if (used == null) 0 else used.intValue()
        if (u < avail.intValue()) { inter += 1; seen.put(c, u + 1) }
      }
      i += 1
    }
    inter
  }
}
