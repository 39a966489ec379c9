package graft.functions

import java.lang.reflect.{Method, Modifier}
import java.net.{URL, URLClassLoader}
import java.util.concurrent.ConcurrentHashMap
import java.util.jar.JarFile

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.ql.exec.{Description, UDF}
import org.apache.hadoop.io.{BooleanWritable, BytesWritable, DoubleWritable => HadoopDoubleWritable, FloatWritable, IntWritable, LongWritable, Text}
import org.apache.hadoop.hive.serde2.io.{ByteWritable, DoubleWritable, ShortWritable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.types._

/** Hive UDF bridge — the reference's jar-loaded Hive function surface
  * (tajo-core/src/main/java/org/apache/tajo/engine/function/hiveudf/HiveFunctionLoader.java:52-160)
  * re-expressed for Spark: classic `org.apache.hadoop.hive.ql.exec.UDF`
  * subclasses register as typed Spark SQL functions by reflecting their
  * `evaluate` method, converting Spark values to the Hadoop writables the
  * method expects and the returned writable back to a Spark value.
  *
  * Naming follows the reference: `@Description.name` (comma-separated
  * aliases) when present, else the fully-qualified class name with dots
  * replaced by underscores (HiveFunctionLoader.java:100-117).
  *
  * Execution notes:
  *   - one UDF instance per (task thread x class): classic Hive UDFs reuse
  *     a result writable across calls, so instances must not be shared
  *     across threads; the registry hands out thread-locals per executor
  *     JVM, and the converted (immutable) Spark value is extracted on the
  *     calling thread before the instance can be reused.
  *   - the bridge is driver-independent: the SQL-function closure carries
  *     only (class name, jar path) strings; classes load lazily per JVM, so
  *     the same registration works on a multi-node cluster when the jar is
  *     distributed (pass it through `--jars`, which puts it on every
  *     executor classpath).
  */
object HiveUdf {

  // ------------------------------------------------------- type mapping

  /** evaluate() return class -> Spark type. */
  private def sparkType(c: Class[_]): DataType = c match {
    case _ if c == classOf[Text] || c == classOf[String]            => StringType
    case _ if c == classOf[IntWritable] || c == classOf[java.lang.Integer] || c == java.lang.Integer.TYPE => IntegerType
    case _ if c == classOf[LongWritable] || c == classOf[java.lang.Long] || c == java.lang.Long.TYPE      => LongType
    case _ if c == classOf[DoubleWritable] || c == classOf[HadoopDoubleWritable] ||
              c == classOf[java.lang.Double] || c == java.lang.Double.TYPE                                => DoubleType
    case _ if c == classOf[FloatWritable] || c == classOf[java.lang.Float] || c == java.lang.Float.TYPE   => FloatType
    case _ if c == classOf[BooleanWritable] || c == classOf[java.lang.Boolean] || c == java.lang.Boolean.TYPE => BooleanType
    case _ if c == classOf[ShortWritable] || c == classOf[java.lang.Short] || c == java.lang.Short.TYPE   => ShortType
    case _ if c == classOf[ByteWritable] || c == classOf[java.lang.Byte] || c == java.lang.Byte.TYPE      => ByteType
    case _ if c == classOf[BytesWritable] || c == classOf[Array[Byte]]                                    => BinaryType
    case other =>
      throw new IllegalArgumentException(s"hive udf: unsupported evaluate() type ${other.getName}")
  }

  private def supported(c: Class[_]): Boolean =
    try { sparkType(c); true } catch { case _: IllegalArgumentException => false }

  /** Spark value -> the parameter class evaluate() expects. */
  private def toParam(v: Any, target: Class[_]): AnyRef = {
    if (v == null) return null
    (v, target) match {
      case (s: String, t) if t == classOf[Text]                 => new Text(s)
      case (s: String, t) if t == classOf[String]               => s
      case (i: java.lang.Integer, t) if t == classOf[IntWritable]    => new IntWritable(i)
      case (l: java.lang.Long, t) if t == classOf[LongWritable]      => new LongWritable(l)
      case (d: java.lang.Double, t) if t == classOf[DoubleWritable]  => new DoubleWritable(d)
      case (d: java.lang.Double, t) if t == classOf[HadoopDoubleWritable] => new HadoopDoubleWritable(d)
      case (f: java.lang.Float, t) if t == classOf[FloatWritable]    => new FloatWritable(f)
      case (b: java.lang.Boolean, t) if t == classOf[BooleanWritable] => new BooleanWritable(b)
      case (s: java.lang.Short, t) if t == classOf[ShortWritable]    => new ShortWritable(s)
      case (b: java.lang.Byte, t) if t == classOf[ByteWritable]      => new ByteWritable(b)
      case (b: Array[Byte], t) if t == classOf[BytesWritable]        => new BytesWritable(b)
      // boxed/primitive pass-through (evaluate(int), evaluate(Integer), ...)
      case (x: java.lang.Integer, t) if t == java.lang.Integer.TYPE || t == classOf[java.lang.Integer] => x
      case (x: java.lang.Long, t) if t == java.lang.Long.TYPE || t == classOf[java.lang.Long]          => x
      case (x: java.lang.Double, t) if t == java.lang.Double.TYPE || t == classOf[java.lang.Double]    => x
      case (x: java.lang.Float, t) if t == java.lang.Float.TYPE || t == classOf[java.lang.Float]       => x
      case (x: java.lang.Boolean, t) if t == java.lang.Boolean.TYPE || t == classOf[java.lang.Boolean] => x
      case (x: java.lang.Short, t) if t == java.lang.Short.TYPE || t == classOf[java.lang.Short]       => x
      // numeric widening (Spark INT literal into a long/double parameter)
      case (x: java.lang.Integer, t) if t == classOf[LongWritable]   => new LongWritable(x.longValue)
      case (x: java.lang.Integer, t) if t == classOf[DoubleWritable] => new DoubleWritable(x.doubleValue)
      case (x: java.lang.Integer, t) if t == classOf[HadoopDoubleWritable] => new HadoopDoubleWritable(x.doubleValue)
      case (x: java.lang.Long, t) if t == classOf[DoubleWritable]    => new DoubleWritable(x.doubleValue)
      case _ =>
        throw new IllegalArgumentException(
          s"hive udf: cannot convert ${v.getClass.getName} to ${target.getName}")
    }
  }

  /** evaluate() result -> immutable Spark value (extracted before the UDF
    * instance can mutate its reused writable). */
  private def fromResult(v: AnyRef): Any = v match {
    case null                   => null
    case t: Text                => t.toString
    case i: IntWritable         => i.get
    case l: LongWritable        => l.get
    case d: DoubleWritable      => d.get
    case d: HadoopDoubleWritable => d.get
    case f: FloatWritable       => f.get
    case b: BooleanWritable     => b.get
    case s: ShortWritable       => s.get
    case b: ByteWritable        => b.get
    case b: BytesWritable       => java.util.Arrays.copyOf(b.getBytes, b.getLength)
    case other                  => other // boxed primitive or String
  }

  // ----------------------------------------------------------- registry

  private final case class Binding(method: Method, local: ThreadLocal[AnyRef])
  private val bindings = new ConcurrentHashMap[(String, Int), Binding]()

  private def binding(className: String, arity: Int): Binding =
    bindings.computeIfAbsent((className, arity), { _ =>
      val cls = Class.forName(className)
      val m = selectEvaluate(cls, arity).getOrElse(throw new IllegalArgumentException(
        s"hive udf $className has no supported $arity-arg evaluate()"))
      Binding(m, ThreadLocal.withInitial(() =>
        cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]))
    })

  /** Pick the evaluate() overload: matching arity, all parameter and
    * return types convertible; Text-parameter overloads win ties (the
    * common string surface). */
  private def selectEvaluate(cls: Class[_], arity: Int): Option[Method] = {
    val candidates = cls.getMethods.filter { m =>
      m.getName == "evaluate" && !Modifier.isStatic(m.getModifiers) &&
        m.getParameterCount == arity &&
        m.getParameterTypes.forall(supported) && supported(m.getReturnType)
    }
    candidates.sortBy { m =>
      -m.getParameterTypes.count(c => c == classOf[Text] || c == classOf[String])
    }.headOption
  }

  /** Executor-side invocation. */
  def call(className: String, arity: Int, args: Seq[Any]): Any = {
    val b = binding(className, arity)
    val params = args.zip(b.method.getParameterTypes).map { case (v, t) => toParam(v, t) }
    fromResult(b.method.invoke(b.local.get(), params: _*))
  }

  // ------------------------------------------------------- registration

  /** Register one classic Hive UDF class as a SQL function. Returns the
    * declared Spark return type. `arity` defaults to the smallest
    * supported evaluate() overload. */
  def register(spark: SparkSession, name: String, className: String,
               arity: Option[Int] = None): DataType = {
    val cls = Class.forName(className)
    require(classOf[UDF].isAssignableFrom(cls),
      s"$className is not a classic org.apache.hadoop.hive.ql.exec.UDF")
    val arities = cls.getMethods
      .filter(m => m.getName == "evaluate" && !Modifier.isStatic(m.getModifiers))
      .map(_.getParameterCount).distinct.sorted
    val n = arity.getOrElse(arities.find(a => selectEvaluate(cls, a).isDefined)
      .getOrElse(throw new IllegalArgumentException(
        s"$className has no evaluate() with supported types")))
    val m = selectEvaluate(cls, n).getOrElse(throw new IllegalArgumentException(
      s"$className has no supported $n-arg evaluate()"))
    val rt = sparkType(m.getReturnType)
    val cn = className
    n match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        override def call(): Any = HiveUdf.call(cn, 0, Nil) }, rt)
      case 1 => spark.udf.register(name, new UDF1[Any, Any] {
        override def call(a: Any): Any = HiveUdf.call(cn, 1, Seq(a)) }, rt)
      case 2 => spark.udf.register(name, new UDF2[Any, Any, Any] {
        override def call(a: Any, b: Any): Any = HiveUdf.call(cn, 2, Seq(a, b)) }, rt)
      case 3 => spark.udf.register(name, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any): Any = HiveUdf.call(cn, 3, Seq(a, b, c)) }, rt)
      case 4 => spark.udf.register(name, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any): Any = HiveUdf.call(cn, 4, Seq(a, b, c, d)) }, rt)
      case k => throw new IllegalArgumentException(s"hive udf $name: unsupported arity $k (max 4)")
    }
    rt
  }

  // ------------------------------------------------------- GenericUDF

  /** GenericUDF bridge (beyond the reference, which only loads classic
    * UDF subclasses — HiveFunctionLoader.java:80 scans `UDF.class`; most
    * modern Hive functions are GenericUDFs, so a user carrying a Hive jar
    * gets both here). The class initializes once per (thread x signature)
    * with writable-constant-free java ObjectInspectors derived from the
    * declared Spark input types, and evaluates with deferred java
    * objects; the return type comes from the OI `initialize` returns. */
  private final case class GenericBinding(udf: AnyRef, eval: Method,
                                          deferredCtor: java.lang.reflect.Constructor[_],
                                          resultOi: AnyRef, getJava: Method)
  private val genericBindings = new ConcurrentHashMap[(Long, String, Seq[DataType]), GenericBinding]()

  private def javaOi(dt: DataType): AnyRef = {
    val f = Class.forName(
      "org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory")
    val name = dt match {
      case StringType => "javaStringObjectInspector"
      case IntegerType => "javaIntObjectInspector"
      case LongType => "javaLongObjectInspector"
      case DoubleType => "javaDoubleObjectInspector"
      case FloatType => "javaFloatObjectInspector"
      case BooleanType => "javaBooleanObjectInspector"
      case ShortType => "javaShortObjectInspector"
      case ByteType => "javaByteObjectInspector"
      case BinaryType => "javaByteArrayObjectInspector"
      case other => throw new IllegalArgumentException(s"hive generic udf: unsupported input type $other")
    }
    f.getField(name).get(null)
  }

  private def oiSparkType(oi: AnyRef): DataType = {
    val cat = oi.getClass.getMethod("getPrimitiveCategory").invoke(oi).toString
    cat match {
      case "STRING" | "VARCHAR" | "CHAR" => StringType
      case "INT" => IntegerType
      case "LONG" => LongType
      case "DOUBLE" => DoubleType
      case "FLOAT" => FloatType
      case "BOOLEAN" => BooleanType
      case "SHORT" => ShortType
      case "BYTE" => ByteType
      case "BINARY" => BinaryType
      case other => throw new IllegalArgumentException(s"hive generic udf: unsupported return category $other")
    }
  }

  private def genericBinding(className: String, inputTypes: Seq[DataType]): GenericBinding =
    genericBindings.computeIfAbsent(
      (Thread.currentThread().getId, className, inputTypes), { _ =>
        val cls = Class.forName(className)
        val udf = cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
        val oiCls = Class.forName("org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector")
        val oiArr = java.lang.reflect.Array.newInstance(oiCls, inputTypes.length)
        inputTypes.zipWithIndex.foreach { case (dt, i) =>
          java.lang.reflect.Array.set(oiArr, i, javaOi(dt)) }
        val init = cls.getMethod("initialize", oiArr.getClass.asInstanceOf[Class[_]])
        val resultOi = init.invoke(udf, oiArr).asInstanceOf[AnyRef]
        val deferredCls = Class.forName(
          "org.apache.hadoop.hive.ql.udf.generic.GenericUDF$DeferredObject")
        val deferredArrCls = java.lang.reflect.Array.newInstance(deferredCls, 0).getClass
        val eval = cls.getMethod("evaluate", deferredArrCls)
        val deferredCtor = Class.forName(
          "org.apache.hadoop.hive.ql.udf.generic.GenericUDF$DeferredJavaObject")
          .getConstructor(classOf[Object])
        val getJava = Class.forName(
          "org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector")
          .getMethod("getPrimitiveJavaObject", classOf[Object])
        GenericBinding(udf, eval, deferredCtor, resultOi, getJava)
      })

  /** Executor-side GenericUDF invocation. */
  def callGeneric(className: String, inputTypes: Seq[DataType], args: Seq[Any]): Any = {
    val b = genericBinding(className, inputTypes)
    val deferredCls = Class.forName(
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDF$DeferredObject")
    val arr = java.lang.reflect.Array.newInstance(deferredCls, args.length)
    args.zipWithIndex.foreach { case (a, i) =>
      java.lang.reflect.Array.set(arr, i, b.deferredCtor.newInstance(a.asInstanceOf[Object])) }
    val raw = b.eval.invoke(b.udf, arr)
    if (raw == null) null
    else fromResult(b.getJava.invoke(b.resultOi, raw))
  }

  /** Register a GenericUDF under `name` for the given input signature.
    * Returns the Spark return type derived from the initialize() OI. */
  def registerGeneric(spark: SparkSession, name: String, className: String,
                      inputTypes: Seq[DataType]): DataType = {
    val b = genericBinding(className, inputTypes)
    val rt = oiSparkType(b.resultOi)
    val (cn, its) = (className, inputTypes)
    inputTypes.length match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        override def call(): Any = callGeneric(cn, its, Nil) }, rt)
      case 1 => spark.udf.register(name, new UDF1[Any, Any] {
        override def call(a: Any): Any = callGeneric(cn, its, Seq(a)) }, rt)
      case 2 => spark.udf.register(name, new UDF2[Any, Any, Any] {
        override def call(a: Any, b2: Any): Any = callGeneric(cn, its, Seq(a, b2)) }, rt)
      case 3 => spark.udf.register(name, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b2: Any, c: Any): Any = callGeneric(cn, its, Seq(a, b2, c)) }, rt)
      case 4 => spark.udf.register(name, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b2: Any, c: Any, d: Any): Any = callGeneric(cn, its, Seq(a, b2, c, d)) }, rt)
      case k => throw new IllegalArgumentException(s"hive generic udf $name: unsupported arity $k (max 4)")
    }
    rt
  }

  /** Reference-parity names for a UDF class: `@Description.name` aliases
    * when present (comma-separated), else the dotted class name with
    * underscores (HiveFunctionLoader.java:100-117). */
  def namesOf(cls: Class[_]): Seq[String] = {
    val desc = cls.getAnnotation(classOf[Description])
    if (desc != null && desc.name() != null && desc.name().nonEmpty)
      desc.name().split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq(cls.getName.replace('.', '_'))
  }

  /** Scan a jar for classic UDF subclasses under `packagePrefix` and
    * register each under its reference-parity names (skipping classes
    * whose evaluate() uses types outside the bridge). Returns the
    * registered (name, class) pairs. The jar must already be on the
    * classpath (executors: `--jars`). */
  def loadJar(spark: SparkSession, jarPath: String,
              packagePrefix: String = ""): Seq[(String, String)] = {
    val prefixPath = packagePrefix.replace('.', '/')
    val out = ArrayBuffer.empty[(String, String)]
    val jar = new JarFile(jarPath)
    try {
      val loader = new URLClassLoader(Array(new URL(s"file:$jarPath")), getClass.getClassLoader)
      jar.entries().asScala.foreach { e =>
        val n = e.getName
        if (n.endsWith(".class") && n.startsWith(prefixPath) && !n.contains("$")) {
          val className = n.stripSuffix(".class").replace('/', '.')
          try {
            val cls = Class.forName(className, false, loader)
            if (classOf[UDF].isAssignableFrom(cls) &&
                !Modifier.isAbstract(cls.getModifiers) &&
                cls.getMethods.exists(m => m.getName == "evaluate" &&
                  m.getParameterTypes.forall(supported) && supported(m.getReturnType))) {
              namesOf(cls).foreach { name =>
                try {
                  register(spark, name, className)
                  out += name -> className
                } catch { case _: Throwable => () } // unsupported overload set
              }
            }
          } catch { case _: Throwable => () } // unloadable class: skip, like the reference
        }
      }
    } finally jar.close()
    out.toSeq
  }
}
