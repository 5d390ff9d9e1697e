package graft.io

/** Column-name normalization shared by the file importers
  * (`lwetl/table_import.py:27-49` `unique_column_name`). */
object Naming {

  private val StartsWithChar = "^[A-Z_].*".r

  /** Normalize one header cell against the already-defined columns:
    * blank/invalid → C<n> (1-based position), else trimmed UPPERCASE;
    * duplicates get a numeric suffix. */
  def uniqueColumnName(raw: String, defined: Seq[String]): String = {
    val base = Option(raw).map(_.trim.toUpperCase).filter(_.nonEmpty) match {
      case Some(n) if StartsWithChar.matches(n) => n
      case _ => s"C${defined.length + 1}"
    }
    if (!defined.contains(base)) base
    else {
      var x = 1
      while (defined.contains(s"$base$x")) x += 1
      s"$base$x"
    }
  }

  /** Normalize a whole header row. */
  def uniqueColumnNames(raw: Seq[String]): Seq[String] =
    raw.foldLeft(Vector.empty[String])((acc, n) => acc :+ uniqueColumnName(n, acc))
}
