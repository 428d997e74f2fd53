from . import dedup, ids, similarity, stats, text_analysis, windows

__all__ = ["dedup", "ids", "similarity", "stats", "text_analysis", "windows"]
