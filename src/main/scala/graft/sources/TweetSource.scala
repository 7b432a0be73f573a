package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source exposing the deterministic synthetic producer
  * as a first-class Spark source format — the engine-native replacement for
  * the reference's out-of-process generator (fake_producer.py pushes to
  * Kafka; here the same messages materialize directly as a table):
  *
  * {{{
  *   spark.read.format("graft.sources.TweetSourceProvider")
  *     .option("seed", 42).option("total", 1000).option("partitions", 4)
  *     .load()
  * }}}
  *
  * Scale shape: generation is split into `partitions` independent slices,
  * each seeded as `seed + index` and produced entirely on its executor —
  * no driver materialization, rows stream straight out of each
  * `PartitionReader`. Output is deterministic per (seed, total,
  * partitions); each slice independently honors the producer's 20–50%
  * keyword-injection contract, so the union does too.
  */
class TweetSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TweetSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TweetSource.TweetTable
}

object TweetSource {
  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("created_at", StringType, nullable = false),
    StructField("sentiment", StringType, nullable = false),
    StructField("entities", ArrayType(StringType, containsNull = false),
      nullable = false)))

  private[sources] class TweetTable extends Table with SupportsRead {
    override def name(): String = "graft_synthetic_tweets"
    override def schema(): StructType = Schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new TweetScan(
        options.getLong("seed", 42L),
        options.getInt("total", 1000),
        options.getInt("partitions", 4))
  }

  private class TweetScan(seed: Long, total: Int, partitions: Int)
      extends ScanBuilder with Scan with Batch {
    require(total >= 0 && partitions > 0,
      s"need total >= 0 and partitions > 0, got total=$total partitions=$partitions")
    override def build(): Scan = this
    override def readSchema(): StructType = Schema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val base = total / partitions
      val extra = total % partitions
      Array.tabulate(partitions) { i =>
        TweetSlice(seed + i, base + (if (i < extra) 1 else 0))
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      TweetReaderFactory
  }

  private case class TweetSlice(sliceSeed: Long, count: Int)
      extends InputPartition

  private object TweetReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val slice = p.asInstanceOf[TweetSlice]
      new PartitionReader[InternalRow] {
        private val it =
          SyntheticTweets.generate(slice.sliceSeed, slice.count).iterator
        private var row: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          val t = it.next()
          row = new GenericInternalRow(Array[Any](
            UTF8String.fromString(t.text),
            UTF8String.fromString(t.created_at),
            UTF8String.fromString(t.sentiment),
            ArrayData.toArrayData(
              t.entities.map(UTF8String.fromString).toArray)))
          true
        }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }
}
