from opensmile_spark.functionals.kernels import FAMILIES, compute_all  # noqa: F401
from opensmile_spark.functionals.bank import (  # noqa: F401
    DEFAULT_FAMILIES,
    feature_names,
    functionals_kernel,
    functionals_sql,
)
