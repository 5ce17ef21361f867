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

  def scatterGatherSorted(keys: String*): Movement = ScatterGatherSorted(keys.toSeq)
  def scatterGather(keys: String*): Movement = ScatterGather(keys.toSeq)
  def broadcastEdge: Movement = Broadcast
  def oneToOne: Movement = OneToOne

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
  }
}

final class DagBuilder(val name: String) {
  private sealed trait Node
  private final case class Source(df: () => DataFrame) extends Node
  private final case class Processor(f: Seq[DataFrame] => DataFrame) extends Node

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
  /** ≅ DAG.create(name) (DAG.java:80). */
  def create(name: String): DagBuilder = new DagBuilder(name)
}
