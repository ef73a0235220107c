package graft.ops

/** Misra-Gries frequent-items summary (Misra & Gries 1982): one pass,
  * O(k) space, with the guarantee that every item whose true count
  * exceeds n/(k+1) survives in the summary.
  *
  * Used per partition (graft.queries.SketchOps q75): if a token's GLOBAL
  * count exceeds n/(k+1), then on at least one partition its local count
  * exceeds that partition's n_p/(k+1) (otherwise summing the per-
  * partition bounds caps the global count at n/(k+1)), so the union of
  * per-partition summaries is a candidate superset of the global heavy
  * hitters. A second exact counting pass over ONLY the candidates makes
  * the final answer exact — the standard two-pass shape for exact heavy
  * hitters at scale: pass one ships <= k tokens per partition, pass two
  * shuffles only candidate rows.
  */
object MisraGries {

  /** The summary's keys after one pass over `it` with capacity k. */
  def candidates(k: Int, it: Iterator[String]): Iterator[String] = {
    val m = new java.util.HashMap[String, Long](k * 2)
    while (it.hasNext) {
      val x = it.next()
      val cur = m.getOrDefault(x, 0L) // values are always >= 1, so 0 = absent
      if (cur > 0L) m.put(x, cur + 1)
      else if (m.size < k) m.put(x, 1L)
      else {
        val entries = m.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue == 1L) entries.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    val out = new Array[String](m.size)
    val keys = m.keySet().iterator()
    var i = 0
    while (keys.hasNext) { out(i) = keys.next(); i += 1 }
    out.iterator
  }
}
