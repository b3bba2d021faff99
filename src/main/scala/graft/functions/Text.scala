package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{filter, split}

/** Shared tokenization contract: whitespace words with empty tokens
  * dropped — the reference's tokenization (whitespace split,
  * SURVEY.md §2.B G10). Every query-side tokenizer imports THIS
  * definition so the contract cannot silently diverge between files.
  */
object Text {
  def wordsCol(text: Column): Column =
    filter(split(text, " "), w => w =!= "")
}
