from . import networks, neural_points, aggregator, renderer, losses  # noqa: F401
