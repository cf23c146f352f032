from . import ticks, stats, joins, dedup, similarity, text, mlfeat, multimodal, autoencoder, classifier  # noqa: F401
