from .timers import Timer, timed, profile_trace, spmv_rates

__all__ = ["Timer", "timed", "profile_trace", "spmv_rates"]
