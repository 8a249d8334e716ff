package graft.ml

import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame

/** Versioned feature-vector layouts (SURVEY §7.4 trap 8). The reference
  * hard-asserts its vector widths — 134/135/157/158 depending on model
  * generation (xgboost_training_for_big_data.py:790-791) — because a
  * silently re-ordered, padded, or partially-joined feature vector
  * poisons a model without failing anything. Same contract here: each
  * layout is a named, ordered, immutable column list; assembly fails
  * fast on a missing column and asserts the assembled width, and no
  * code path pads.
  */
object FeatureLayout {

  sealed abstract class Layout(val version: String, val names: Seq[String]) {
    def width: Int = names.length
  }

  /** M1's base layout — the no-discount twin (the reference's "134"). */
  case object BaseV1
    extends Layout("base-v1", LinkPredict.featureNames.filterNot(_ == "discount"))

  /** M2's discount layout — base + discount (the reference's "135"). */
  case object DiscountV1 extends Layout("discount-v1", LinkPredict.featureNames)

  val all: Seq[Layout] = Seq(BaseV1, DiscountV1)

  /** Assemble `outCol` per the layout: rejects missing columns up front
    * and asserts the assembled vector width from the column metadata
    * (no job launched) — the runtime twin of the reference's width
    * assert. */
  def assemble(df: DataFrame, layout: Layout,
               outCol: String = "features"): DataFrame = {
    val missing = layout.names.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"layout ${layout.version} (width ${layout.width}) missing: " +
        missing.mkString(", "))
    val out = new VectorAssembler()
      .setInputCols(layout.names.toArray).setOutputCol(outCol)
      .transform(df)
    val width = AttributeGroup.fromStructField(out.schema(outCol)).size
    require(width == layout.width,
      s"layout ${layout.version}: assembled width $width != ${layout.width}")
    out
  }
}
