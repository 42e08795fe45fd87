package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** lemmatize(lang, word) / synonyms(extension, token) (ref
  * src/Functions/lemmatize.cpp, synonyms.cpp). The reference loads both
  * from server-configured dictionary files (lemmagen .bin models,
  * plain/WordNet synonym lists) and throws when the named
  * dictionary/extension is not configured. The engine-side analog keeps
  * the same contract with user-registered dictionaries:
  * [[NlpDicts.registerLemmaDict]] / [[NlpDicts.registerSynonymSets]]
  * install a map once per process; the SQL functions then resolve
  * per-row (unknown word → itself for lemmatize, empty array for
  * synonyms — lemmagen/plain-list behavior), and an unregistered
  * name throws the same POORLY_FORMATTED error class as the reference.
  *
  * Scale note: the maps ride the expression closure to executors, so
  * keep them dictionary-sized (the Dictionaries.MaxDictRows ceiling
  * applies in spirit); corpus-scale normalization tables should join
  * through Dictionaries.dictGet (broadcast) instead.
  */
object NlpDicts {
  private val lemmas =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()
  private val synonymSets =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Seq[String]]]()

  def registerLemmaDict(lang: String, dict: Map[String, String]): Unit = {
    require(dict.size <= graft.operators.Dictionaries.MaxDictRows,
      s"lemma dictionary '$lang' exceeds the in-plan dictionary ceiling; " +
        "use Dictionaries.dictGet (broadcast join) for corpus-scale tables")
    lemmas.put(lang, dict)
  }

  /** Each set expands every member to the full set (the reference's
    * plain-list format: one line per synonym group). */
  def registerSynonymSets(name: String, sets: Seq[Seq[String]]): Unit = {
    val m = sets.flatMap(set => set.map(w => w -> set)).toMap
    require(m.size <= graft.operators.Dictionaries.MaxDictRows,
      s"synonym extension '$name' exceeds the in-plan dictionary ceiling")
    synonymSets.put(name, m)
  }

  /** Plan-build-time lookup (driver side): the returned map is captured
    * in the expression and ships with the task closure — executors never
    * consult this registry (which would be empty off-driver). */
  def lemmaDict(lang: String): Map[String, String] = {
    val d = lemmas.get(lang)
    if (d == null) throw new IllegalArgumentException(
      s"Lemmatizer dictionary for language '$lang' is not registered; " +
        "call NlpDicts.registerLemmaDict (the reference requires the " +
        "equivalent server-side lemmatizers config)")
    d
  }

  def synonymDict(name: String): Map[String, Seq[String]] = {
    val d = synonymSets.get(name)
    if (d == null) throw new IllegalArgumentException(
      s"Synonym extension '$name' is not registered; call " +
        "NlpDicts.registerSynonymSets (the reference requires the " +
        "equivalent server-side synonyms_extensions config)")
    d
  }

  def constStr(e: Expression, what: String): String = {
    require(e.foldable,
      s"$what must be a constant (the reference requires a const " +
        "dictionary-name argument)")
    String.valueOf(e.eval(null))
  }
}

/** Word → lemma with the dictionary baked in at plan build (so it is
  * task-serialized, cluster-correct). Unknown word → itself (lemmagen). */
case class ChLemmatize(dict: Map[String, String], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lemmatize"
  override protected def nullSafeEval(word: Any): Any = {
    val w = word.toString
    UTF8String.fromString(dict.getOrElse(w, w))
  }
  override protected def withNewChildInternal(c: Expression): ChLemmatize =
    copy(child = c)
}

/** Token → its synonym group (empty when absent), dictionary baked in
  * at plan build. */
case class ChSynonyms(dict: Map[String, Seq[String]], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "synonyms"
  override protected def nullSafeEval(token: Any): Any =
    new GenericArrayData(dict.getOrElse(token.toString, Seq.empty)
      .map(UTF8String.fromString))
  override protected def withNewChildInternal(c: Expression): ChSynonyms =
    copy(child = c)
}
