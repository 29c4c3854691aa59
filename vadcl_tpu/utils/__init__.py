from vadcl_tpu.utils.profiling import StepTimer, trace_steps

__all__ = ["StepTimer", "trace_steps"]
