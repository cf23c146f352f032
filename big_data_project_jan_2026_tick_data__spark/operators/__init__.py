from . import ticks, stats, joins, dedup, similarity, text, mlfeat, multimodal, sketches, autoencoder, classifier, graph  # noqa: F401
