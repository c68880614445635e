package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared by the in-row (zero-shuffle) ml
  * kernels. */
private[ml] object ColOps {

  /** Let-binding for column expressions: evaluate `value` exactly ONCE
    * and expose it to `body` as a lambda variable. Plain withColumn
    * intermediates get re-inlined by plan rewrites (CollapseProject /
    * ConvertToLocalRelation), and an expensive intermediate referenced
    * per array element then re-evaluates per access — for a sorted
    * array that is O(L² log L) per row. A lambda variable is bound once
    * by construction, whatever the optimizer does around it. */
  def letBound(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
