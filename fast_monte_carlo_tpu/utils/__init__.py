from .profiling import SimMeter, trace_context, device_memory_stats

__all__ = ["SimMeter", "trace_context", "device_memory_stats"]
