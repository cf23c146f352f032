from . import ticks, stats, joins, dedup, similarity, text, mlfeat, multimodal, autoencoder  # noqa: F401
