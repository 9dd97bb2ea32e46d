package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.schemes.{IterationScheme, Schemes, SequentialExampleScheme}
import graft.sources.Indexed

/** The consumption API — fuel's DataStream + DataIterator (reference:
  * fuel/streams.py:96-183, fuel/iterator.py:28-36): a dataset plus an
  * iteration scheme, yielding epochs of minibatches to a (driver-side)
  * training loop.
  *
  * Execution model: the epoch is ONE deterministic distributed plan
  * (scheme compilation = pure column derivation); iteration pulls it with
  * `toLocalIterator`, which fetches one partition at a time — driver memory
  * is bounded by a partition, not the dataset. Epoch replay re-executes the
  * plan: determinism comes from seeded hash ordering, not iterator state, so
  * "pickling an iterator mid-epoch" (fuel/tests/test_serialization.py)
  * becomes "remember (plan, epoch, cursor) and re-run with
  * `__pos >= cursor`" — see [[DataStream.resumeFrom]].
  */
final class DataStream(val source: DataFrame, val scheme: IterationScheme,
    order: Seq[Column]) {

  /** The compiled epoch plan: source + `__pos` (+ `__batch_id`). */
  lazy val compiled: DataFrame = {
    val indexed =
      if (source.columns.contains(Indexed.Idx)) source
      else Indexed.withIdx(source, order)
    Schemes.compile(indexed, scheme)
  }

  private def dataCols: Seq[String] =
    compiled.columns.filterNot(c => c == Indexed.Idx || c == Schemes.Pos || c == Schemes.BatchId).toSeq

  /** One epoch of minibatches (example schemes yield singleton batches).
    * Rows carry only the data columns, in scheme order. */
  def epochIterator(): Iterator[Seq[Row]] = epochFrom(compiled)

  /** Resume an epoch mid-way: yields batches whose first row position is
    * `>= cursor` (the deterministic-replay answer to iterator pickling). */
  def resumeFrom(cursor: Long): Iterator[Seq[Row]] =
    epochFrom(compiled.filter(col(Schemes.Pos) >= cursor))

  private def epochFrom(df: DataFrame): Iterator[Seq[Row]] = {
    val hasBatch = df.columns.contains(Schemes.BatchId)
    if (!hasBatch) {
      val it = df.orderBy(col(Schemes.Pos))
        .selectExpr((Schemes.Pos +: dataCols): _*)
        .toLocalIterator()
      new Iterator[Seq[Row]] {
        def hasNext = it.hasNext
        def next() = Seq(stripFirst(it.next()))
      }
    } else {
      val it = df.orderBy(col(Schemes.BatchId), col(Schemes.Pos))
        .selectExpr((Schemes.BatchId +: dataCols): _*)
        .toLocalIterator()
      // Group consecutive rows sharing a batch id.
      new Iterator[Seq[Row]] {
        private var pending: Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = pending != null
        def next(): Seq[Row] = {
          val bid = pending.getLong(0)
          val buf = scala.collection.mutable.ArrayBuffer[Row](stripFirst(pending))
          pending = null
          var done = false
          while (!done && it.hasNext) {
            val r = it.next()
            if (r.getLong(0) == bid) buf += stripFirst(r)
            else { pending = r; done = true }
          }
          buf.toSeq
        }
      }
    }
  }

  private def stripFirst(r: Row): Row =
    Row.fromSeq(r.toSeq.drop(1))

  /** Endless epochs (fuel/streams.py:113-119 `iterate_epochs`). Each epoch
    * re-executes the same deterministic plan. */
  def iterateEpochs(): Iterator[Iterator[Seq[Row]]] =
    Iterator.continually(epochIterator())
}

object DataStream {
  /** Stream over `df` ordered by `order` (must be a total order — include a
    * unique key). Default scheme: one example at a time in order, matching
    * `DataStream(dataset)` with an example scheme in fuel. */
  def apply(df: DataFrame, scheme: IterationScheme = SequentialExampleScheme(),
      order: Seq[Column]): DataStream =
    new DataStream(df, scheme, order)
}
