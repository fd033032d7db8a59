from crick_spark.functions.stats import nan_to_null, summary_stats_exprs  # noqa: F401
from crick_spark.functions.quantiles import cdf_exprs, exact_percentile_exprs, histogram  # noqa: F401
from crick_spark.functions.topk import exact_topk, exact_topk_per_group  # noqa: F401
