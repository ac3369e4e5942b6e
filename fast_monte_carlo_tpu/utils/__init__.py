from .aot import aot_compile_cached, aot_fingerprint
from .profiling import SimMeter, trace_context, device_memory_stats
from .transfer import fetch_tree

__all__ = ["SimMeter", "trace_context", "device_memory_stats", "fetch_tree",
           "aot_compile_cached", "aot_fingerprint"]
