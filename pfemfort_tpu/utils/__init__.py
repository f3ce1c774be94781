from pfemfort_tpu.utils.timing import Timer, timed

__all__ = ["Timer", "timed"]
