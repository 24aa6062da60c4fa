from opensmile_spark.operators.windows import (  # noqa: F401
    clamped_lag,
    clamped_lead,
    contour_direction,
    delta_regression,
    median_smooth,
    preemphasis,
    sma,
    trailing_agg,
)
from opensmile_spark.operators.windower import (  # noqa: F401
    apply_window,
    weighted_sma,
    window_weights,
)
from opensmile_spark.operators.sessionize import (  # noqa: F401
    session_bounds, sessionize, turn_detector,
)
from opensmile_spark.operators.asof import asof_join, backfill_functionals  # noqa: F401
from opensmile_spark.operators.select import (  # noqa: F401
    data_selector,
    max_index,
    valbased_selector,
)
from opensmile_spark.operators.vector_ops import (  # noqa: F401
    mono_mixdown,
    vector_binary_op,
    vector_op,
    vector_reduce,
)
from opensmile_spark.operators.normalize import (  # noqa: F401
    fullinput_mean, mvn, mvn_fit, mvn_transform,
)
from opensmile_spark.operators.framing import (  # noqa: F401
    frame_vector,
    interval_join,
    segment_by_meta,
    tumbling_frames,
)
from opensmile_spark.operators.salt import overlap_salt, salted_partial_stats  # noqa: F401
from opensmile_spark.operators.resample import resample  # noqa: F401
from opensmile_spark.operators.viterbi import viterbi_smooth_df  # noqa: F401
