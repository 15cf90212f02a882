from . import logsetup  # noqa: F401
from .metrics import MetricsWriter, read_metrics  # noqa: F401
from .checkpoint import CheckpointManager, load_weights  # noqa: F401
from .callbacks import (  # noqa: F401
    Callback, CheckpointCallback, GradientsCallback, HistogramCallback,
    MetricsCallback, SummaryImageCallback,
)
from .textsummary import capture_model_summary, count_parameters  # noqa: F401
from .profiler import FrameTimer, trace  # noqa: F401
