from vct.utils.profiling import StepTimer, device_trace, write_history  # noqa: F401
