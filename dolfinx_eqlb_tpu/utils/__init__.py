from .perftest import run_perftest  # noqa: F401
from .profiling import timed, trace, sync  # noqa: F401
