from .runner import ContainOptions, contain
