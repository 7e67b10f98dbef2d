package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.Random

/** Property test of the mapping-DSL COMPILER against a row-at-a-time
  * reference interpreter of the same action tree.
  *
  * The compiler folds `when`/`section`/`exit`/`stop` control flow into
  * per-field guard Columns (one declarative `select`, no per-row branching)
  * — an algebra that scenario tests pin only pointwise. Here random action
  * trees (nested sections, exits at every depth including top level,
  * absent-propagating guards, null-producing values) are run both ways:
  *
  *  - compiled via [[MappingDsl.mapping]] and executed by Spark;
  *  - interpreted directly per row with the REFERENCE semantics
  *    (`DslRecordMapping.java:144-200`): `when` runs its body iff the cond
  *    is true (absent = false), `exit` aborts the remainder of the
  *    innermost section (the whole script when none is open), `stop`
  *    aborts the whole script, `map X onto f` assigns only when the
  *    produced value is present.
  *
  * Conditions/values are a tiny shared AST rendered to a Column on one
  * side and evaluated with Option/Kleene semantics on the other, so both
  * engines see the same expression — the same double-pinning pattern as
  * `MincodeSamplesSpec` for the wire format. Seed fixed per the round-gate
  * reproducibility rule (commit 0ce0745). */
class MappingDslPropertySpec extends SparkSpec {

  // ------------------------------------------------------- shared mini-AST
  private sealed trait CExp
  private case class CCol(i: Int) extends CExp          // b_i: nullable bool
  private case class CGt(i: Int, k: Int) extends CExp   // x_i > k, null-prop
  private case class CLit(b: Boolean) extends CExp
  private case object CNullLit extends CExp
  private case class CNot(c: CExp) extends CExp
  private case class CAnd(a: CExp, b: CExp) extends CExp // SQL 3VL &&
  private case class COr(a: CExp, b: CExp) extends CExp
  // the reference's mapping-condition algebra (DslRecordMapping.java:
  // 1148-1184, SURVEY §7.4): absent if EITHER side is absent — stricter
  // than Kleene (absent AND false is absent, not false). Both algebras in
  // one tree is the production shape: user conditions mix `and`/`or`
  // producers with comparison operators that null-propagate SQL-style.
  private case class CAndAbs(a: CExp, b: CExp) extends CExp
  private case class COrAbs(a: CExp, b: CExp) extends CExp

  private sealed trait VExp
  private case class VCol(i: Int) extends VExp          // x_i: nullable int
  private case class VLit(k: Int) extends VExp
  private case class VAdd(i: Int, k: Int) extends VExp  // x_i + k, null-prop

  private sealed trait TNode
  private case class TAssign(f: Int, v: VExp) extends TNode
  private case class TWhen(c: CExp, body: Vector[TNode]) extends TNode
  private case class TSection(body: Vector[TNode]) extends TNode
  private case class TExit(c: CExp) extends TNode
  private case class TStop(c: CExp) extends TNode

  // ------------------------------------------------- render to Spark side
  private def colC(c: CExp): Column = c match {
    case CCol(i)    => col(s"b$i")
    case CGt(i, k)  => col(s"x$i") > lit(k)
    case CLit(b)    => lit(b)
    case CNullLit   => lit(null).cast("boolean")
    case CNot(a)    => !colC(a)
    case CAnd(a, b) => colC(a) && colC(b)
    case COr(a, b)  => colC(a) || colC(b)
    case CAndAbs(a, b) => graft.functions.GraftFunctions.absentAnd(colC(a), colC(b))
    case COrAbs(a, b)  => graft.functions.GraftFunctions.absentOr(colC(a), colC(b))
  }
  private def colV(v: VExp): Column = v match {
    case VCol(i)    => col(s"x$i")
    case VLit(k)    => lit(k)
    case VAdd(i, k) => col(s"x$i") + lit(k)
  }
  private def build(b: MappingDsl.Builder, ns: Vector[TNode]): Unit = ns.foreach {
    case TAssign(f, v)   => b.map(colV(v)) onto s"f$f"
    case TWhen(c, body)  => b.when(colC(c))(inner => build(inner, body))
    case TSection(body)  => b.section(inner => build(inner, body))
    case TExit(c)        => b.exitWhen(colC(c))
    case TStop(c)        => b.stopWhen(colC(c))
  }

  // -------------------------------------------- reference interpreter side
  private case class In(rid: Int, x: Array[Option[Int]], b: Array[Option[Boolean]])

  /** Kleene/SQL 3-valued logic — what Spark's !, &&, || and > compute. */
  private def evalC(c: CExp, r: In): Option[Boolean] = c match {
    case CCol(i)   => r.b(i)
    case CGt(i, k) => r.x(i).map(_ > k)
    case CLit(b)   => Some(b)
    case CNullLit  => None
    case CNot(a)   => evalC(a, r).map(!_)
    case CAnd(a, b) => (evalC(a, r), evalC(b, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case COr(a, b) => (evalC(a, r), evalC(b, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    // absent-propagating: None dominates regardless of the other side —
    // flatMap is exactly the reference's Optional.flatMap chain
    case CAndAbs(a, b) =>
      evalC(a, r).flatMap(x => evalC(b, r).map(y => x && y))
    case COrAbs(a, b) =>
      evalC(a, r).flatMap(x => evalC(b, r).map(y => x || y))
  }
  private def evalV(v: VExp, r: In): Option[Int] = v match {
    case VCol(i)    => r.x(i)
    case VLit(k)    => Some(k)
    case VAdd(i, k) => r.x(i).map(_ + k)
  }

  /** Direct transcription of the reference's per-event walk. */
  private def interpret(ns: Vector[TNode], r: In, nFields: Int): Array[Option[Int]] = {
    val fields = Array.fill(nFields)(Option.empty[Int])
    object StopEx extends RuntimeException
    object ExitEx extends RuntimeException
    def run(nodes: Vector[TNode]): Unit = nodes.foreach {
      case TAssign(f, v)  => evalV(v, r).foreach(x => fields(f) = Some(x))
      case TWhen(c, body) => if (evalC(c, r).getOrElse(false)) run(body)
      case TSection(body) => try run(body) catch { case ExitEx => }
      case TExit(c)       => if (evalC(c, r).getOrElse(false)) throw ExitEx
      case TStop(c)       => if (evalC(c, r).getOrElse(false)) throw StopEx
    }
    // a top-level exit (no section open) kills the whole script, like stop
    try run(ns) catch { case StopEx | ExitEx => }
    fields
  }

  // ------------------------------------------------------------ generators
  private def genC(rnd: Random, depth: Int): CExp =
    rnd.nextInt(if (depth > 0) 9 else 4) match {
      case 0 => CCol(rnd.nextInt(3))
      case 1 => CGt(rnd.nextInt(4), rnd.nextInt(5) - 2)
      case 2 => CLit(rnd.nextBoolean())
      case 3 => CNullLit
      case 4 => CNot(genC(rnd, depth - 1))
      case 5 => CAnd(genC(rnd, depth - 1), genC(rnd, depth - 1))
      case 6 => COr(genC(rnd, depth - 1), genC(rnd, depth - 1))
      case 7 => CAndAbs(genC(rnd, depth - 1), genC(rnd, depth - 1))
      case _ => COrAbs(genC(rnd, depth - 1), genC(rnd, depth - 1))
    }
  private def genV(rnd: Random): VExp = rnd.nextInt(3) match {
    case 0 => VCol(rnd.nextInt(4))
    case 1 => VLit(rnd.nextInt(10))
    case _ => VAdd(rnd.nextInt(4), rnd.nextInt(5))
  }
  private def genBody(rnd: Random, depth: Int): Vector[TNode] =
    Vector.fill(1 + rnd.nextInt(4)) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => TAssign(rnd.nextInt(4), genV(rnd))
        case 4 | 5 if depth > 0 => TWhen(genC(rnd, 2), genBody(rnd, depth - 1))
        case 6 | 7 if depth > 0 => TSection(genBody(rnd, depth - 1))
        case 8 => TExit(genC(rnd, 1))
        case 9 => TStop(genC(rnd, 1))
        case _ => TAssign(rnd.nextInt(4), genV(rnd))
      }
    }
  private def genRow(rnd: Random, rid: Int): In = In(rid,
    Array.fill(4)(if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(8) - 2)),
    Array.fill(3)(if (rnd.nextInt(4) == 0) None else Some(rnd.nextBoolean())))

  private def pretty(ns: Vector[TNode], ind: String = ""): String = ns.map {
    case TAssign(f, v)  => s"${ind}f$f <- $v"
    case TWhen(c, body) => s"${ind}when($c) {\n${pretty(body, ind + "  ")}\n$ind}"
    case TSection(body) => s"${ind}section {\n${pretty(body, ind + "  ")}\n$ind}"
    case TExit(c)       => s"${ind}exitWhen($c)"
    case TStop(c)       => s"${ind}stopWhen($c)"
  }.mkString("\n")

  // ---------------------------------------------------------------- driver
  private val inputSchema = StructType(
    StructField("rid", IntegerType, nullable = false) +:
    (0 until 4).map(i => StructField(s"x$i", IntegerType, nullable = true)) ++:
    (0 until 3).map(i => StructField(s"b$i", BooleanType, nullable = true)))
  private val target = StructType(
    StructField("rid", IntegerType, nullable = true) +:
    (0 until 4).map(i => StructField(s"f$i", IntegerType, nullable = true)))

  test("compiled guard algebra == reference interpreter on random action trees") {
    // Fixed seed: the gate must be reproducible round to round (bump it
    // when hunting for new counterexamples in a dev run).
    val rnd = new Random(0x5eedD51L)
    (1 to 60).foreach { treeIdx =>
      val tree = genBody(rnd, depth = 3)
      val rows = (0 until 40).map(genRow(rnd, _))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row.fromSeq(r.rid +: (r.x.map(_.map(Int.box).orNull).toSeq ++
            r.b.map(_.map(Boolean.box).orNull).toSeq))), 2),
        inputSchema)
      val mapping = MappingDsl.mapping(target) { b =>
        b.map(col("rid")) onto "rid" // row identity rides field 0, pre-stop
        build(b, tree)
      }
      val got = mapping(df).collect()
        .map(r => r.getInt(0) -> (1 to 4).map(i =>
          if (r.isNullAt(i)) None else Some(r.getInt(i))).toVector).toMap
      rows.foreach { r =>
        val exp = interpret(tree, r, 4).toVector
        assert(got(r.rid) === exp,
          s"\ntree #$treeIdx diverged on row rid=${r.rid} " +
            s"x=${r.x.mkString(",")} b=${r.b.mkString(",")}\n" +
            s"compiled=${got(r.rid)} interpreted=$exp\n${pretty(tree)}")
      }
    }
  }
}
