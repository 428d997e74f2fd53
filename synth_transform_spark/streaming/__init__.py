from . import events, tws

__all__ = ["events", "tws"]
