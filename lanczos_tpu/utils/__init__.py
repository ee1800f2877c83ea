from lanczos_tpu.utils.timing import benchmark_best, benchmark_chained, roofline

__all__ = ["benchmark_best", "benchmark_chained", "roofline"]
