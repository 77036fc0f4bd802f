from .types import AdjustStatus, AniResult, GenomeSketch, SequencesSketch
