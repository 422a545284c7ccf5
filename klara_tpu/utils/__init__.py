from klara_tpu.utils.profiling import trace_profile

__all__ = ["trace_profile"]
