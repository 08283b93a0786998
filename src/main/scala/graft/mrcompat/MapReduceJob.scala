package graft.mrcompat

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** MapReduce-compat veneer (SURVEY.md §3.2 E3) — the thin API that proves
  * reference-surface parity with MIT 6.824 Lab 1's engine
  * (/root/reference is the empty-shell repo `mapreduce-6.824-lab1`; the
  * lab spec fixes this surface: user Map(filename, contents) → [(k,v)],
  * hash-partition into R buckets, sort each bucket, group equal keys,
  * Reduce(key, values) → value, write R files of "key value" lines).
  *
  * Mapping to Spark (1:1 with the lab's phases):
  *  - map tasks            → `wholeTextFiles` + `flatMap(mapF)`
  *  - ihash(k) % R shuffle → `HashPartitioner(R)` (Murmur-family not FNV:
  *    partition *assignment* differs, grouping semantics identical)
  *  - per-bucket sort      → `repartitionAndSortWithinPartitions`
  *  - reduce over groups   → `mapPartitions` scanning runs of equal keys
  *  - mr-out-Y atomic write→ `saveAsTextFile` (FileCommitProtocol gives
  *    the temp+rename atomicity the lab hand-rolls)
  *  - crash recovery       → lineage re-execution (the lab's 10 s
  *    reassignment); `spark.task.maxFailures`, `spark.speculation`
  *
  * Everything is executor-side streaming — no driver collect, no
  * materialized intermediate files; a 100 TB input only ever exists as
  * shuffle blocks.
  */
object MapReduceJob {

  type KV = (String, String)
  type MapF = (String, String) => Iterable[KV]
  type ReduceF = (String, Seq[String]) => String

  /** Run a map/reduce job; returns the grouped-and-reduced pairs as an
    * RDD sorted within each of the `nReduce` partitions (the lab's
    * user-visible ordering guarantee). */
  def run(spark: SparkSession, inputs: String, mapF: MapF, reduceF: ReduceF,
          nReduce: Int): RDD[KV] = {
    val files = spark.sparkContext.wholeTextFiles(inputs)
    val mapped = files.flatMap { case (name, contents) => mapF(name, contents) }
    val sorted = mapped
      .map(kv => (kv._1, kv._2))
      .repartitionAndSortWithinPartitions(new HashPartitioner(nReduce))
    sorted.mapPartitions(it =>
      // scan runs of equal keys (input is sorted) → one reduce call per key
      new Iterator[KV] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): KV = {
          val key = buf.head._1
          val values = Seq.newBuilder[String]
          while (buf.hasNext && buf.head._1 == key) values += buf.next()._2
          key -> reduceF(key, values.result())
        }
      }, preservesPartitioning = true)
  }

  /** Run and write the lab's output format: R files of "key value" lines
    * (mr-out-Y ≙ part-0000Y), committed atomically. */
  def runToDir(spark: SparkSession, inputs: String, mapF: MapF,
               reduceF: ReduceF, nReduce: Int, outDir: String): Unit =
    run(spark, inputs, mapF, reduceF, nReduce)
      .map { case (k, v) => s"$k $v" }
      .saveAsTextFile(outDir)

  // ---- the lab's shipped plugin apps, re-expressed -------------------

  /** wc.go: letters-only tokenizer, count per word. */
  val wcMap: MapF = (_, contents) =>
    contents.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(_ -> "1")
  val wcReduce: ReduceF = (_, values) => values.size.toString

  /** indexer.go: word → "df doc1,doc2,..." over distinct docs. */
  val indexerMap: MapF = (name, contents) =>
    contents.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).distinct
      .map(_ -> name)
  val indexerReduce: ReduceF = (_, values) => {
    val docs = values.distinct.sorted
    s"${docs.size} ${docs.mkString(",")}"
  }

  /** Distributed grep (MRPAPER §2.3): map emits matching lines keyed by
    * file; reduce concatenates per-file match counts. */
  def grepMap(pattern: String): MapF = (name, contents) =>
    contents.linesIterator.filter(_.contains(pattern)).map(name -> _).toSeq
  val grepReduce: ReduceF = (_, values) => values.size.toString

  /** Distributed sort (MRPAPER §2.3): identity map keyed by the sort
    * key; the engine's partition-sorted output IS the result (with
    * ordered partition boundaries this is TeraSort). */
  val sortMap: MapF = (_, contents) =>
    contents.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(w => w -> w)
  val sortReduce: ReduceF = (k, _) => k

  /** Sequential in-process oracle — the analog of mrsequential.go that
    * the lab's test-mr.sh cmp's against. Single-threaded, no Spark. */
  def sequential(inputs: Seq[(String, String)], mapF: MapF,
                 reduceF: ReduceF): Seq[KV] = {
    val mapped = inputs.flatMap { case (n, c) => mapF(n, c) }.sortBy(_._1)
    mapped.foldLeft(Vector.empty[(String, Vector[String])]) {
      case (acc, (k, v)) if acc.nonEmpty && acc.last._1 == k =>
        acc.init :+ (k, acc.last._2 :+ v)
      case (acc, (k, v)) => acc :+ (k, Vector(v))
    }.map { case (k, vs) => k -> reduceF(k, vs) }
  }
}
