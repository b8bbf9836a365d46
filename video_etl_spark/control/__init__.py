"""Driver-side control plane (SURVEY.md §2.10, §4.3).

Ports of the reference's pure-logic components, re-architected for the Spark
engine: the data plane is DataFrames/streams; these classes consume tiny
aggregate tables (histograms, profiles, plans) on the driver and emit plan
tables that are broadcast back into the pipeline.  None of this touches
per-row data — the reference's paper shows switcher decisions cost <1 ms and
the planner <1 s (paper §5.5), so distributing them would be pure overhead.
"""

from video_etl_spark.control.buffer import ProcessingBuffer  # noqa: F401
from video_etl_spark.control.planner import KnobPlanner, assign_knobs_linear  # noqa: F401
from video_etl_spark.control.simulator import (  # noqa: F401
    Task,
    detect_to_track,
    simulate_cost,
    simulate_runtime,
)
from video_etl_spark.control.switcher import KnobSwitcher, Profile  # noqa: F401
from video_etl_spark.control.tuner import Knob, MultiKnob  # noqa: F401
