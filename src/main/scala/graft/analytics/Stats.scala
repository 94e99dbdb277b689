package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic two-variable statistics. Spark's own `corr`/`covar_*`
  * sum doubles, so their low bits depend on partitioning and AQE; these
  * variants quantize each observation ONCE (floor of an IEEE product —
  * identical on any engine evaluating the same double expression) and
  * push all aggregation through integer/decimal sums, which are
  * associative. The five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
  * Σy²) condense map-side, so the shuffle carries one row per
  * partition at any scale; the only float math happens once, on the
  * single aggregated row.
  */
object Stats {

  /** Pearson correlation + least-squares slope/intercept of y on x,
    * exact-deterministic: x and y are quantized to integer micro-units
    * via floor(v·10^6) per row, moments are exact DECIMAL(38,0) sums,
    * and the closed-form estimates are computed on the one result row.
    * Output: (n, corr, slope, intercept), floats rounded to 6dp.
    */
  def corrRegression(df: DataFrame, x: Column, y: Column): DataFrame = {
    val d380 = DecimalType(38, 0)
    val xi = floor(x.cast("double") * 1e6).cast("long")
    val yi = floor(y.cast("double") * 1e6).cast("long")
    val agg = df.select(xi.as("xi"), yi.as("yi"))
      // complete observation pairs only — n must count exactly the rows
      // the moment sums saw
      .filter(col("xi").isNotNull && col("yi").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(d380)).as("sx"),
        sum(col("yi").cast(d380)).as("sy"),
        sum(col("xi").cast(d380) * col("yi").cast(d380)).as("sxy"),
        sum(col("xi").cast(d380) * col("xi").cast(d380)).as("sxx"),
        sum(col("yi").cast(d380) * col("yi").cast(d380)).as("syy"))
    // cov and variances share the n·Σab − Σa·Σb shape; all still exact
    // decimal — one double division/sqrt each at the very end
    val covN = (col("n").cast(d380) * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val varXN = (col("n").cast(d380) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val varYN = (col("n").cast(d380) * col("syy") - col("sy") * col("sy"))
      .cast("double")
    agg.select(col("n"),
      round(covN / sqrt(varXN * varYN), 6).as("corr"),
      round(covN / varXN, 6).as("slope"),
      round((col("sy").cast("double") - covN / varXN * col("sx").cast("double"))
        / col("n").cast("double") / 1e6, 6).as("intercept"))
  }
}
