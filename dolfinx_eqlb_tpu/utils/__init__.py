from .perftest import run_perftest  # noqa: F401
