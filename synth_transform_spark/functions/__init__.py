from . import cleaning, dates, doi

__all__ = ["cleaning", "dates", "doi"]
