"""Engine column functions: deterministic hashing, exact arithmetic, vectors, text."""

from forklift_spark.functions.exact import dec, money_sum, ratio_double
from forklift_spark.functions.hashing import md5_long, md5_long_seeded

__all__ = ["dec", "money_sum", "ratio_double", "md5_long", "md5_long_seeded"]
