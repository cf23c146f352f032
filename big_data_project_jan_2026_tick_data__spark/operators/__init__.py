from . import ticks, stats, joins, dedup, similarity, text, mlfeat, multimodal, autoencoder, classifier, graph  # noqa: F401
