package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial top-k aggregator over (sim, id) pairs: each partition
  * keeps only its k best candidates (sim desc, id asc) and merge folds
  * buffers pairwise — so a groupBy(query).agg(topK) ships k rows per
  * query per partition instead of shuffling every candidate to a window
  * operator. That asymptotic cut (n·k vs n·m rows through the shuffle)
  * is the difference between a top-k that survives a 100 TB corpus and
  * one that re-materializes the candidate set.
  *
  * The buffer is a sorted Vector (k is small); determinism matches the
  * window formulation: sim desc, neighbor id asc.
  */
/** [[TopK]] over (score, term) pairs — same map-side k-bounded buffers,
  * ordered score desc then term asc (the l6 window's tie-break). Keeps
  * the per-source TF-IDF top-k from sorting a whole vocabulary on one
  * task: vocab grows with the corpus (Heaps' law), so the rank-filter
  * window form ships every (source, word) row of a source to a single
  * reducer where this ships k rows per partition (VERDICT r8 #5).
  */
class TopKTerms(k: Int) extends Aggregator[(Double, String), Vector[(Double, String)], Seq[(Double, String)]] {

  private def better(a: (Double, String), b: (Double, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Vector[(Double, String)], x: (Double, String)): Vector[(Double, String)] = {
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val pos = buf.indexWhere(cur => better(x, cur)) match {
        case -1 => buf.size
        case p => p
      }
      (buf.take(pos) :+ x) ++ buf.drop(pos).take(k - pos - 1)
    }
  }

  override def zero: Vector[(Double, String)] = Vector.empty
  override def reduce(buf: Vector[(Double, String)], x: (Double, String)): Vector[(Double, String)] =
    insert(buf, x)
  override def merge(a: Vector[(Double, String)], b: Vector[(Double, String)]): Vector[(Double, String)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Vector[(Double, String)]): Seq[(Double, String)] = buf

  override def bufferEncoder: Encoder[Vector[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** [[TopK]] over (value, id) LONG pairs — the a18 grouped top-k
  * kernel: exact integer ordering (value desc, id asc; total because
  * ids are unique), same k-bounded partial buffers, so the grouped
  * aggregate ships k rows per (group, partition) where the window-rank
  * form shuffles every input row.
  */
class TopKLong(k: Int) extends Aggregator[(Long, Long), Vector[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Vector[(Long, Long)], x: (Long, Long)): Vector[(Long, Long)] = {
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val pos = buf.indexWhere(cur => better(x, cur)) match {
        case -1 => buf.size
        case p => p
      }
      (buf.take(pos) :+ x) ++ buf.drop(pos).take(k - pos - 1)
    }
  }

  override def zero: Vector[(Long, Long)] = Vector.empty
  override def reduce(buf: Vector[(Long, Long)], x: (Long, Long)): Vector[(Long, Long)] =
    insert(buf, x)
  override def merge(a: Vector[(Long, Long)], b: Vector[(Long, Long)]): Vector[(Long, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Vector[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

class TopK(k: Int) extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Vector[(Double, Long)], x: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.size >= k && !better(x, buf.last)) buf
    else {
      val pos = buf.indexWhere(cur => better(x, cur)) match {
        case -1 => buf.size
        case p => p
      }
      (buf.take(pos) :+ x) ++ buf.drop(pos).take(k - pos - 1)
    }
  }

  override def zero: Vector[(Double, Long)] = Vector.empty
  override def reduce(buf: Vector[(Double, Long)], x: (Double, Long)): Vector[(Double, Long)] =
    insert(buf, x)
  override def merge(a: Vector[(Double, Long)], b: Vector[(Double, Long)]): Vector[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Vector[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
