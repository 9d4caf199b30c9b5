package graft.mr

import scala.collection.mutable
import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD

/** The fidelity core: the reference's entire user API, typed.
  *
  * The reference (mincemeat.py) is a lightweight distributed MapReduce
  * framework whose user surface is exactly three functions:
  *
  *   - `mapfn(k, v)` — a generator of (k2, v2) pairs (mincemeat.py:167-173);
  *   - `collectfn(k2, values)` — an OPTIONAL per-map-task combiner whose
  *     single result is re-wrapped as a singleton list (mincemeat.py:174-176);
  *   - `reducefn(k2, values)` — sees the ENTIRE value list for one key at
  *     once and returns one result (mincemeat.py:179-182).
  *
  * Spark restatement (SURVEY.md §7.1): `flatMap` → optional per-partition
  * hash-group combine → `groupByKey` → `mapValues(reducefn)`. We use
  * `groupByKey`, NOT `reduceByKey`: `reducefn` is holistic — it is never
  * required to be associative or commutative, and it observes the whole
  * list (mincemeat.py:181). Users who know their reducer is associative
  * should use [[MapReduceJob.associative]], which lowers to `reduceByKey`
  * (map-side partial aggregation, no value-list materialization) and is the
  * 100 TB-safe path for high-cardinality / skewed keys.
  *
  * Scale contract (SURVEY.md §7.5): the holistic path materializes one
  * key's full value list on a single executor — same contract the
  * reference imposes (its master holds ALL keys' lists in RAM,
  * mincemeat.py:344-347; we only ever hold one partition's worth).
  *
  * Unlike the reference, functions here are plain Scala closures shipped
  * by Spark's closure serializer — the reference's "no access to enclosing
  * environment" restriction (README.md:93-96) does not apply.
  *
  * @param mapfn     (k1, v1) => iterator of (k2, v2)   [mincemeat.py:167-173]
  * @param reducefn  (k2, all values) => result          [mincemeat.py:179-182]
  * @param collectfn optional combiner, output type = value type
  *                  (singleton-list rewrap semantics)   [mincemeat.py:174-176]
  */
final case class MapReduceJob[K1, V1, K2: ClassTag, V2: ClassTag](
    mapfn: (K1, V1) => IterableOnce[(K2, V2)],
    reducefn: (K2, Seq[V2]) => V2,
    collectfn: Option[(K2, Seq[V2]) => V2] = None,
    numPartitions: Option[Int] = None) extends Serializable {

  /** Distributed result as an RDD — the scalable output surface. */
  def resultRDD(data: RDD[(K1, V1)]): RDD[(K2, V2)] = {
    val mapped = data.flatMap { case (k, v) => mapfn(k, v) }
    // Combiner fidelity: applied once per map task, client-side only
    // (mincemeat.py:174-176) — the reduce-side merge does NOT re-apply it
    // (mincemeat.py:344-347 only list-extends). mapPartitions mirrors
    // "per map task" exactly: one partition = one map task.
    val combined = collectfn match {
      case Some(cf) =>
        mapped.mapPartitions { it =>
          val groups = mutable.LinkedHashMap.empty[K2, mutable.ArrayBuffer[V2]]
          it.foreach { case (k, v) =>
            groups.getOrElseUpdate(k, mutable.ArrayBuffer.empty[V2]) += v
          }
          groups.iterator.map { case (k, vs) => (k, cf(k, vs.toSeq)) }
        }
      case None => mapped
    }
    val parts = numPartitions.getOrElse(combined.sparkContext.defaultParallelism)
    combined.groupByKey(parts).map { case (k, vs) => (k, reducefn(k, vs.toSeq)) }
  }

  /** API-fidelity result: the reference returns an in-memory dict from
    * `run_server` (mincemeat.py:225, :324). Only for results that fit the
    * driver — use [[resultRDD]] at scale.
    */
  def run(data: RDD[(K1, V1)]): Map[K2, V2] =
    resultRDD(data).collectAsMap().toMap

  /** Convenience entry matching the reference's dict-datasource idiom
    * (`s.datasource = dict(...)`, example.py:10).
    */
  def run(sc: org.apache.spark.SparkContext, datasource: Map[K1, V1]): Map[K2, V2] =
    run(sc.parallelize(datasource.toSeq))
}

object MapReduceJob {

  /** Associative fast path: when the user's reducer is a commutative,
    * associative binary fold, lower to `reduceByKey` — map-side partial
    * aggregation, constant memory per key, no per-key list. This is the
    * optimization the reference can't offer (its reduce is always the
    * whole list on the master, mincemeat.py:179-182, :325-329).
    */
  def associative[K1, V1, K2: ClassTag, V2: ClassTag](
      mapfn: (K1, V1) => IterableOnce[(K2, V2)],
      op: (V2, V2) => V2,
      numPartitions: Option[Int] = None): AssociativeJob[K1, V1, K2, V2] =
    AssociativeJob(mapfn, op, numPartitions)

  final case class AssociativeJob[K1, V1, K2: ClassTag, V2: ClassTag](
      mapfn: (K1, V1) => IterableOnce[(K2, V2)],
      op: (V2, V2) => V2,
      numPartitions: Option[Int]) extends Serializable {

    def resultRDD(data: RDD[(K1, V1)]): RDD[(K2, V2)] = {
      val mapped = data.flatMap { case (k, v) => mapfn(k, v) }
      numPartitions match {
        case Some(n) => mapped.reduceByKey(op, n)
        case None    => mapped.reduceByKey(op)
      }
    }

    def run(data: RDD[(K1, V1)]): Map[K2, V2] =
      resultRDD(data).collectAsMap().toMap

    def run(sc: org.apache.spark.SparkContext, datasource: Map[K1, V1]): Map[K2, V2] =
      run(sc.parallelize(datasource.toSeq))
  }
}
