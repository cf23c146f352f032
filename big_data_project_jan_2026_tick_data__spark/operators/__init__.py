from . import ticks, stats, joins, dedup, similarity, text, mlfeat, multimodal  # noqa: F401
