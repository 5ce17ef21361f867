package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** DAG-flavored facade mirroring the reference's client API surface —
  * `DAG.addVertex/addEdge/createVertexGroup/verify`
  * (tez-api/src/main/java/org/apache/tez/dag/api/DAG.java:80,129,198,278,513)
  * and the EdgeProperty data-movement matrix (EdgeProperty.java:44-66) —
  * compiled down to Dataset transformations so Catalyst/AQE still own
  * optimization and the physical plan.
  *
  * A vertex is a data source or a processor (Seq[DataFrame] => DataFrame ≅
  * LogicalIOProcessor with N inputs / 1 output); an edge declares the data
  * movement the reference would configure on the connection:
  *
  *  - [[Edge.scatterGatherSorted]]   ≅ OrderedPartitionedKVEdgeConfig
  *    (partition + sort: OrderedPartitionedKVOutput.java:63)
  *  - [[Edge.scatterGather]]         ≅ UnorderedPartitionedKVEdgeConfig
  *    (hash repartition, no sort: UnorderedPartitionedKVOutput.java:55)
  *  - [[Edge.broadcastEdge]]         ≅ UnorderedKVEdgeConfig broadcast
  *    (UnorderedKVOutput.java:58, HashJoinExample.java:231-236)
  *  - [[Edge.oneToOne]]              ≅ ONE_TO_ONE narrow edge
  *    (EdgeProperty.java:49, OneToOneEdgeManager.java:49)
  *
  * Vertex groups (`addUnion`) ≅ VertexGroup + GroupInputEdge with
  * ConcatenatedMergedKeyValuesInput (DAG.java:198,306).
  *
  * The builder only assembles a `DataFrame`; nothing executes until the
  * caller acts on [[DagBuilder.output]] — same laziness as submitDAG.
  */
object Edge {
  sealed trait Movement
  final case class ScatterGatherSorted(keys: Seq[String], numPartitions: Option[Int] = None) extends Movement
  final case class ScatterGather(keys: Seq[String], numPartitions: Option[Int] = None) extends Movement
  case object Broadcast extends Movement
  case object OneToOne extends Movement
  /** User-supplied Partitioner ≅ the reference's pluggable Partitioner
    * extension point (tez-runtime-library/.../api/Partitioner.java:44-53):
    * `key` extracts the routing key from a row, `partitioner` decides
    * placement. Routed through an RDD `partitionBy` bridge — the one
    * movement Catalyst cannot express, so it deliberately steps outside
    * the optimizer, exactly like a CUSTOM EdgeManager steps outside the
    * reference's stock routing.
    */
  final case class Custom(partitioner: org.apache.spark.Partitioner,
      key: org.apache.spark.sql.Row => Any) extends Movement

  def scatterGatherSorted(keys: String*): Movement = ScatterGatherSorted(keys.toSeq)
  def scatterGather(keys: String*): Movement = ScatterGather(keys.toSeq)
  def broadcastEdge: Movement = Broadcast
  def oneToOne: Movement = OneToOne
  def custom(partitioner: org.apache.spark.Partitioner)(key: org.apache.spark.sql.Row => Any): Movement =
    Custom(partitioner, key)

  /** Apply the declared movement to the producer's output. */
  private[plans] def apply(m: Movement, df: DataFrame): DataFrame = m match {
    case ScatterGatherSorted(keys, n) =>
      val cols = keys.map(col)
      val rep = n.map(df.repartition(_, cols: _*)).getOrElse(df.repartition(cols: _*))
      rep.sortWithinPartitions(cols: _*)
    case ScatterGather(keys, n) =>
      n.map(df.repartition(_, keys.map(col): _*)).getOrElse(df.repartition(keys.map(col): _*))
    case Broadcast => broadcast(df)
    case OneToOne  => df
    case Custom(p, key) =>
      val schema = df.schema
      val rdd = df.rdd.map(r => (key(r), r)).partitionBy(p).values
      df.sparkSession.createDataFrame(rdd, schema)
  }
}

/** The reference's default partitioner formula, verbatim semantics:
  * `(key.hashCode & Integer.MAX_VALUE) % numPartitions`
  * (tez-runtime-library/.../library/partitioner/HashPartitioner.java:30-35)
  * — as a Spark Partitioner for [[Edge.Custom]], so a user can reproduce
  * the reference's exact task placement (Spark's own HashPartitioner
  * normalizes negative hashes differently).
  */
final class RefHashPartitioner(val parts: Int) extends org.apache.spark.Partitioner {
  override def numPartitions: Int = parts
  override def getPartition(key: Any): Int =
    (key.hashCode & Integer.MAX_VALUE) % parts
}

final class DagBuilder(val name: String) {
  import DagBuilder.{Node, Processor, Source}

  private val vertices = mutable.LinkedHashMap.empty[String, Node]
  private val inEdges = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[(String, Edge.Movement)]]

  /** Root-input vertex ≅ Vertex.addDataSource (Vertex.java:332). */
  def addSource(vertexName: String)(df: => DataFrame): this.type = {
    require(!vertices.contains(vertexName), s"duplicate vertex $vertexName")
    vertices(vertexName) = Source(() => df)
    this
  }

  /** Processing vertex ≅ Vertex.create(name, processor) (Vertex.java:129);
    * inputs arrive in edge-declaration order.
    */
  def addProcessor(vertexName: String)(f: Seq[DataFrame] => DataFrame): this.type = {
    require(!vertices.contains(vertexName), s"duplicate vertex $vertexName")
    vertices(vertexName) = Processor(f)
    this
  }

  /** ≅ DAG.addEdge (DAG.java:278). */
  def addEdge(from: String, to: String, movement: Edge.Movement): this.type = {
    inEdges.getOrElseUpdate(to, mutable.ArrayBuffer.empty) += ((from, movement))
    this
  }

  /** ≅ createVertexGroup + GroupInputEdge: members' outputs are unioned
    * and fed to `to` as one input (DAG.java:198,306).
    */
  def addUnion(members: Seq[String], to: String, movement: Edge.Movement = Edge.OneToOne): this.type = {
    val groupName = s"__group_${members.mkString("_")}_$to"
    addProcessor(groupName)(ins => ins.reduce(_ unionByName _))
    members.foreach(m => addEdge(m, groupName, Edge.OneToOne))
    addEdge(groupName, to, movement)
  }

  /** ≅ DAG.verify (DAG.java:513): all edge endpoints exist, no cycles. */
  def verify(): this.type = {
    for ((to, es) <- inEdges; (from, _) <- es) {
      require(vertices.contains(from), s"edge references unknown vertex $from")
      require(vertices.contains(to), s"edge references unknown vertex $to")
    }
    // Kahn's: every vertex must be reachable in a topological order
    val indeg = mutable.Map(vertices.keys.map(_ -> 0).toSeq: _*)
    for ((to, es) <- inEdges) indeg(to) = es.size
    val queue = mutable.Queue(indeg.collect { case (v, 0) => v }.toSeq: _*)
    var seen = 0
    val adj = inEdges.toSeq.flatMap { case (to, es) => es.map { case (f, _) => f -> to } }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    while (queue.nonEmpty) {
      val v = queue.dequeue(); seen += 1
      for (n <- adj.getOrElse(v, Seq())) {
        indeg(n) -= 1; if (indeg(n) == 0) queue.enqueue(n)
      }
    }
    require(seen == vertices.size, s"DAG $name has a cycle")
    this
  }

  /** Compile the subgraph feeding `vertexName` into a DataFrame (lazy —
    * the Spark action is the caller's, like DAGClient.getDAGStatus polling
    * only observes).
    */
  def output(vertexName: String): DataFrame = {
    verify()
    val memo = mutable.Map.empty[String, DataFrame]
    def eval(v: String): DataFrame = memo.getOrElseUpdate(v, {
      vertices(v) match {
        case Source(df) => df()
        case Processor(f) =>
          val ins = inEdges.getOrElse(v, mutable.ArrayBuffer.empty)
            .map { case (from, m) => Edge(m, eval(from)) }
          require(ins.nonEmpty, s"processor vertex $v has no inputs")
          f(ins.toSeq)
      }
    })
    eval(vertexName)
  }
}

object DagBuilder {
  // vertex payloads live on the companion so case-class pattern matches
  // carry no outer-instance reference
  private sealed trait Node
  private final case class Source(df: () => DataFrame) extends Node
  private final case class Processor(f: Seq[DataFrame] => DataFrame) extends Node

  /** ≅ DAG.create(name) (DAG.java:80). */
  def create(name: String): DagBuilder = new DagBuilder(name)

  /** Two-input ONE_TO_ONE pairing: the i-th partition of `a` meets the
    * i-th partition of `b` in one task — the
    * BroadcastAndOneToOneExample shape (tez-examples/.../
    * BroadcastAndOneToOneExample.java:171 connects two vertices with a
    * ONE_TO_ONE edge so task i consumes exactly producer task i's
    * output). Spark's narrow equivalent is `zipPartitions`: no shuffle,
    * both inputs must have equal partition counts (same precondition the
    * OneToOneEdgeManager enforces via equal task parallelism).
    */
  def pairedOneToOne(a: DataFrame, b: DataFrame,
      schema: org.apache.spark.sql.types.StructType)(
      f: (Iterator[org.apache.spark.sql.Row], Iterator[org.apache.spark.sql.Row]) => Iterator[org.apache.spark.sql.Row]): DataFrame = {
    require(a.rdd.getNumPartitions == b.rdd.getNumPartitions,
      "ONE_TO_ONE pairing requires equal parallelism on both producers")
    a.sparkSession.createDataFrame(a.rdd.zipPartitions(b.rdd)(f), schema)
  }
}
