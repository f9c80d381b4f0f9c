package graft.queries

/** In-memory reference BPE trainer shared by TextOpsSpec (fixed
  * example) and PropertySpec (random corpora): word-frequency symbol
  * table, argmax (count desc, "l r" pair-string asc), greedy
  * left-to-right non-rescanning merge — the exact semantics t23/t24
  * implement via literal replace. */
object BpeReference {

  type Wf = Map[Vector[String], Long]

  def initial(texts: Seq[String]): Wf =
    texts.flatMap(_.split("[^A-Za-z0-9-]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.length.toLong }

  /** One merge round; returns None when no pair remains. */
  def round(wf: Wf): Option[((String, String, Long), Wf)] = {
    val counts = wf.toSeq.flatMap { case (syms, c) =>
      syms.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    if (counts.isEmpty) None
    else {
      val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l + " " + r) }
      val next = wf.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector -> cnt
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      Some(((l, r, c), next))
    }
  }

  /** Full training run: (merge table rows, final symbol table). */
  def train(texts: Seq[String], rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Wf) = {
    var wf = initial(texts)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      round(wf) match {
        case Some(((l, rr, c), next)) =>
          merges += ((r.toLong, l, rr, l + rr, c)); wf = next
        case None => done = true
      }
      r += 1
    }
    (merges.toSeq, wf)
  }

  /** t24's vocabulary-head statistics off a final symbol table. */
  def vocabHead(wf: Wf, topK: Int): Seq[(String, Long, Long)] =
    wf.toSeq.flatMap { case (syms, c) => syms.map(_ -> c) }
      .groupBy(_._1).map { case (tok, g) =>
        (tok, g.map(_._2).sum, g.length.toLong) }
      .toSeq.sortBy { case (tok, occ, _) => (-occ, tok) }
      .take(topK)
}
